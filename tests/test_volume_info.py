"""Tests for the volume data model (SURVEY §2.4 semantics)."""

import numpy as np

from tbraymarcherplugin_tpu.utils.volume_info import (
    VolumeInfo,
    VoxelFormat,
    WindowingParameters,
    normalize_array,
    to_normalized_float,
)


def test_voxel_format_roundtrip():
    assert VoxelFormat.from_dtype(np.uint16) is VoxelFormat.UINT16
    assert VoxelFormat.INT16.byte_size == 2
    assert VoxelFormat.FLOAT32.is_signed
    assert not VoxelFormat.UINT8.is_signed


def test_normalize_denormalize_roundtrip():
    info = VolumeInfo(min_value=-1000.0, max_value=3000.0)
    assert np.isclose(info.normalize_value(-1000.0), 0.0)
    assert np.isclose(info.normalize_value(3000.0), 1.0)
    # Values outside the range map outside [0, 1] (`VolumeInfo.cpp:18-25`).
    assert np.isclose(info.normalize_value(-5000.0), -1.0)
    assert np.isclose(info.denormalize_value(info.normalize_value(123.0)), 123.0)
    assert np.isclose(info.normalize_range(4000.0), 1.0)
    assert np.isclose(info.denormalize_range(0.25), 1000.0)


def test_world_dimensions():
    info = VolumeInfo(dimensions=(100, 200, 50), spacing=(0.5, 0.5, 2.0))
    assert info.world_dimensions == (50.0, 100.0, 100.0)
    assert info.total_voxels == 100 * 200 * 50


def test_normalize_array_u8():
    data = np.array([[-100, 0], [100, 300]], np.int16)
    norm, lo, hi = normalize_array(data, VoxelFormat.UINT8)
    assert lo == -100 and hi == 300
    assert norm.dtype == np.uint8
    assert norm.min() == 0 and norm.max() == 255
    # Round-trip through the stored min/max.
    rec = norm.astype(np.float32) / 255.0 * (hi - lo) + lo
    assert np.allclose(rec, data, atol=(hi - lo) / 255.0)


def test_normalize_array_float():
    data = np.linspace(-5, 5, 11)
    norm, lo, hi = normalize_array(data)
    assert norm.dtype == np.float32
    assert np.isclose(norm[0], 0.0) and np.isclose(norm[-1], 1.0)


def test_normalize_constant_volume():
    data = np.full((4, 4), 7.0)
    norm, lo, hi = normalize_array(data)
    assert np.all(norm == 0.0)


def test_to_normalized_float_unorm():
    u8 = np.array([0, 128, 255], np.uint8)
    f = to_normalized_float(u8, VoxelFormat.UINT8)
    assert np.allclose(f, [0.0, 128 / 255, 1.0])
    u16 = np.array([0, 65535], np.uint16)
    assert np.allclose(to_normalized_float(u16, VoxelFormat.UINT16), [0.0, 1.0])


def test_windowing_vec4():
    w = WindowingParameters(center=0.3, width=0.4, low_cutoff=True, high_cutoff=False)
    v = np.asarray(w.as_vec4())
    assert np.allclose(v, [0.3, 0.4, 1.0, 0.0])


def test_min_max_slice_tracking():
    info = VolumeInfo()
    info.update_min_max_slice_number(5)
    info.update_min_max_slice_number(2)
    info.update_min_max_slice_number(9)
    assert info.min_slice_number == 2 and info.max_slice_number == 9
