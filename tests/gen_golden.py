"""Regenerate the committed golden images (tests/golden/*.npz).

Run from the repo root after an INTENTIONAL rendering-semantics change:

    python tests/gen_golden.py

The goldens are produced by the independent numpy oracle
(`ops/cpu_reference.py`), not by the JAX kernels, so they catch drift in
either implementation (SURVEY §4: the TPU-side replacement for the
reference's manual visual verification).
"""

import os

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# See tests/conftest.py: sitecustomize's TPU plugin overrides JAX_PLATFORMS.
jax.config.update("jax_platforms", "cpu")

from tbraymarcherplugin_tpu.ops import cpu_reference as R  # noqa: E402
from tbraymarcherplugin_tpu.ops import synthetic  # noqa: E402
from tbraymarcherplugin_tpu.ops import transfer as T  # noqa: E402
from tbraymarcherplugin_tpu.ops.rays import setup_rays  # noqa: E402
from tbraymarcherplugin_tpu.scene import Camera, VolumeTransform  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def golden_scene():
    dims = (16, 16, 16)
    volume = np.asarray(synthetic.sphere_volume(dims, radius=0.4))
    tf = np.asarray(
        T.tf_from_keypoints([0, 1], [[0.1, 0.2, 0.8, 0.1], [1, 0.9, 0.2, 1]])
    )
    cam = Camera.look_at([0.4, -2.2, 0.6], [0.0, 0.0, 0.0], fov_degrees=30.0)
    rays = setup_rays(cam, VolumeTransform.create(), 16, 16)
    windowing = np.array([0.5, 0.9, 1.0, 0.0], np.float32)
    clip_center = np.array([0.45, 0.5, 0.5], np.float32)
    clip_dir = np.array([0.8, 0.0, 0.6], np.float32)
    clip_dir /= np.linalg.norm(clip_dir)
    return dims, volume, tf, rays, windowing, clip_center, clip_dir


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    dims, volume, tf, rays, windowing, clip_center, clip_dir = golden_scene()

    light_volume = R.propagate_light(
        volume, tf, windowing, clip_center, clip_dir,
        local_light_dir=np.array([0.3, 0.2, -0.93]),
        intensity=1.0, light_dims=dims, apply_write_threshold=False,
    )
    image = R.render_lit(
        volume, tf, light_volume,
        np.asarray(rays.entry), np.asarray(rays.direction),
        np.asarray(rays.thickness),
        windowing, clip_center, clip_dir, step_count=24,
    )
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "lit_16.npz"),
        light_volume=light_volume.astype(np.float32),
        image=image.astype(np.float32),
    )
    print("wrote", os.path.join(GOLDEN_DIR, "lit_16.npz"),
          "image sum", float(image.sum()), "lv sum", float(light_volume.sum()))


if __name__ == "__main__":
    main()
