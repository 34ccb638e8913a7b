"""Native data-path library tests (threaded C++ vs numpy reference)."""

import zlib

import numpy as np
import pytest

from tbraymarcherplugin_tpu.utils import native as N

needs_native = pytest.mark.skipif(
    not N.native_available(), reason="native library not built"
)


@needs_native
@pytest.mark.parametrize("dtype", ["uint8", "int16", "uint16", "float32"])
def test_minmax_matches_numpy(dtype, rng):
    a = (rng.random(100_003) * 4000 - 1000).astype(dtype)
    lo, hi = N.minmax(a)
    assert lo == float(a.min()) and hi == float(a.max())


@needs_native
def test_normalize_matches_numpy(rng):
    a = (rng.random((64, 64, 64)) * 4000 - 1000).astype(np.int16)
    lo, hi = float(a.min()), float(a.max())
    got = N.normalize_to_f32(a, lo, hi)
    want = (a.astype(np.float32) - lo) / (hi - lo)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.dtype == np.float32


@needs_native
def test_transpose_matches_numpy(rng):
    a = rng.random((13, 7, 5)).astype(np.float32)  # (z, y, x)
    got = N.transpose_zyx_to_xyz(a)
    np.testing.assert_array_equal(got, a.transpose(2, 1, 0))
    assert got.flags["C_CONTIGUOUS"]


@needs_native
def test_zlib_roundtrip(rng):
    raw = (rng.random(10_000) * 255).astype(np.uint8).tobytes()
    assert N.zlib_decompress(zlib.compress(raw), len(raw)) == raw


@needs_native
def test_read_file(tmp_path, rng):
    blob = (rng.random(1000) * 255).astype(np.uint8).tobytes()
    p = tmp_path / "f.bin"
    p.write_bytes(blob)
    assert N.read_file(str(p), 1000) == blob
    assert N.read_file(str(p), 10, offset=5) == blob[5:15]


def test_fallbacks_without_native(monkeypatch, rng):
    # Force the numpy fallback path and check identical results.
    monkeypatch.setattr(N, "_load", lambda: None)
    a = (rng.random(1000) * 100).astype(np.int16)
    lo, hi = N.minmax(a)
    assert lo == float(a.min()) and hi == float(a.max())
    f = N.normalize_to_f32(a, lo, hi)
    np.testing.assert_allclose(f, (a.astype(np.float32) - lo) / (hi - lo))
