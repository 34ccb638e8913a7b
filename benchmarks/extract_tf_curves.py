"""One-shot extractor used to bake ops/tf_presets_data.py.

Each reference `Content/Curves/TF_CT-*.uasset` (CurveLinearColor) embeds a
256x256 RGBA thumbnail that is the curve's gradient — vertically constant,
linear-encoded (verified against a linear evaluation of the RichCurveKey
records also present in the binary: e.g. TF_CT-Bone channel values match to
~1e-3). The center row therefore IS the 256-texel TF table. This script
re-bakes the data module; requires PIL and the reference checkout.
"""

import base64
import glob
import io
import os
import zlib

import numpy as np

REF = "/root/reference/Content/Curves"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tbraymarcherplugin_tpu", "ops", "tf_presets_data.py",
)


def extract(path):
    from PIL import Image

    data = open(path, "rb").read()
    i = data.find(b"\x89PNG")
    e = data.find(b"IEND", i) + 8
    a = np.asarray(Image.open(io.BytesIO(data[i:e])))
    assert a.shape == (256, 256, 4)
    assert np.abs(a.astype(int) - a[128:129].astype(int)).max() == 0
    return a[128]


def main():
    out = {
        os.path.basename(p)[:-7]: extract(p)
        for p in sorted(glob.glob(os.path.join(REF, "TF_CT-*.uasset")))
    }
    # Re-bake the data module: emit the same compressed-base64 _RAW dict
    # that tf_presets_data.py decodes (zlib of the 256x4 u8 row bytes).
    with open(OUT) as f:
        module = f.read()
    head, _, tail = module.partition("_RAW = {")
    _, _, tail = tail.partition("\n}\n")
    entries = []
    for name, row in sorted(out.items()):
        b64 = base64.b64encode(
            zlib.compress(row.astype(np.uint8).tobytes(), 9)
        ).decode()
        chunks = "\n".join(
            f"        {b64[i:i + 72]!r}" for i in range(0, len(b64), 72)
        )
        entries.append(f"    {name!r}:\n{chunks}\n    ,")
    with open(OUT, "w") as f:
        f.write(head + "_RAW = {\n" + "\n".join(entries) + "\n}\n" + tail)
    print(f"re-baked {len(out)} presets -> {OUT}")


if __name__ == "__main__":
    main()
