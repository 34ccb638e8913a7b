"""Loader tests: MHD / raw / zlib round-trips and asset persistence."""

import os
import zlib

import numpy as np
import pytest

from tbraymarcherplugin_tpu.io import MHDLoader, RawLoader, VolumeAsset, load_volume
from tbraymarcherplugin_tpu.utils.volume_info import VoxelFormat


def _write_mhd(tmp_path, data_zyx, met_type, compressed=False, spacing="1 1 2"):
    raw = data_zyx.tobytes()
    data_name = "vol.zraw" if compressed else "vol.raw"
    lines = [
        "ObjectType = Image",
        "NDims = 3",
        f"DimSize = {data_zyx.shape[2]} {data_zyx.shape[1]} {data_zyx.shape[0]}",
        f"ElementSpacing = {spacing}",
        f"ElementType = {met_type}",
    ]
    if compressed:
        blob = zlib.compress(raw)
        lines += ["CompressedData = True", f"CompressedDataSize = {len(blob)}"]
    else:
        blob = raw
    lines += [f"ElementDataFile = {data_name}"]
    (tmp_path / data_name).write_bytes(blob)
    mhd = tmp_path / "vol.mhd"
    mhd.write_text("\n".join(lines) + "\n")
    return str(mhd)


def test_mhd_u8_roundtrip(tmp_path, rng):
    data = (rng.random((5, 4, 3)) * 255).astype(np.uint8)  # (z, y, x)
    path = _write_mhd(tmp_path, data, "MET_UCHAR")
    loaded = MHDLoader().load(path, normalize=False)
    assert loaded.info.dimensions == (3, 4, 5)
    assert loaded.info.spacing == (1.0, 1.0, 2.0)
    assert loaded.data.shape == (3, 4, 5)
    # (X, Y, Z) transposition: data[x, y, z] == file[z][y][x].
    np.testing.assert_array_equal(
        loaded.data, data.transpose(2, 1, 0).astype(np.float32)
    )


def test_mhd_i16_normalized(tmp_path, rng):
    data = (rng.random((4, 4, 4)) * 4000 - 1000).astype(np.int16)
    path = _write_mhd(tmp_path, data, "MET_SHORT")
    loaded = MHDLoader().load(path, normalize=True)
    assert loaded.info.is_normalized
    assert loaded.data.min() >= 0.0 and loaded.data.max() <= 1.0
    assert loaded.info.min_value == float(data.min())
    assert loaded.info.max_value == float(data.max())
    # Denormalization recovers the original values.
    rec = loaded.info.denormalize_value(loaded.data)
    np.testing.assert_allclose(rec, data.transpose(2, 1, 0), atol=0.01)


def test_mhd_zlib_compressed(tmp_path, rng):
    data = (rng.random((6, 5, 4)) * 65535).astype(np.uint16)
    path = _write_mhd(tmp_path, data, "MET_USHORT", compressed=True)
    loaded = MHDLoader().load(path, normalize=False)
    np.testing.assert_array_equal(
        loaded.data, data.transpose(2, 1, 0).astype(np.float32)
    )


def test_mhd_float(tmp_path, rng):
    data = rng.random((3, 3, 3)).astype(np.float32)
    path = _write_mhd(tmp_path, data, "MET_FLOAT")
    loaded = MHDLoader().load(path, normalize=False)
    np.testing.assert_allclose(loaded.data, data.transpose(2, 1, 0), rtol=1e-6)


def test_mhd_size_check(tmp_path, rng):
    data = (rng.random((4, 4, 4)) * 255).astype(np.uint8)
    path = _write_mhd(tmp_path, data, "MET_UCHAR")
    # Truncate the payload -> loader must raise.
    raw_path = tmp_path / "vol.raw"
    raw_path.write_bytes(raw_path.read_bytes()[:10])
    with pytest.raises(ValueError, match="bytes"):
        MHDLoader().load(path)


def test_raw_loader(tmp_path, rng):
    data = (rng.random((4, 3, 2)) * 255).astype(np.uint8)  # (z, y, x)
    p = tmp_path / "blob.raw"
    p.write_bytes(data.tobytes())
    loader = RawLoader(dimensions=(2, 3, 4), voxel_format=VoxelFormat.UINT8)
    loaded = loader.load(str(p), normalize=False)
    np.testing.assert_array_equal(
        loaded.data, data.transpose(2, 1, 0).astype(np.float32)
    )


def test_load_volume_dispatch(tmp_path, rng):
    data = (rng.random((4, 4, 4)) * 255).astype(np.uint8)
    path = _write_mhd(tmp_path, data, "MET_UCHAR")
    loaded = load_volume(path)
    assert loaded.info.is_normalized


def test_volume_asset_roundtrip(tmp_path, rng):
    data = rng.random((4, 5, 6)).astype(np.float32)
    tf = rng.random((256, 4)).astype(np.float32)
    asset = VolumeAsset.create_transient(data, tf_table=tf)
    asset.info.spacing = (0.5, 0.5, 1.0)
    asset.info.default_windowing.center = 0.3
    p = str(tmp_path / "asset.npz")
    asset.save(p)
    back = VolumeAsset.load(p)
    np.testing.assert_array_equal(back.data, data)
    np.testing.assert_array_equal(back.tf_table, tf)
    assert back.info.spacing == (0.5, 0.5, 1.0)
    assert back.info.default_windowing.center == 0.3


def test_dicom_loader_gated():
    # pydicom is absent in this environment: the loader must fail with a
    # clear ImportError, not crash at use time.
    try:
        import pydicom  # noqa: F401

        pytest.skip("pydicom available; gating not applicable")
    except ImportError:
        pass
    from tbraymarcherplugin_tpu.io import DICOMLoader

    with pytest.raises(ImportError, match="pydicom"):
        DICOMLoader()
