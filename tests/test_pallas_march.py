"""Pallas fused march vs the jnp reference path (interpret mode on CPU).

The kernel's semantics contract is exact equivalence with
:func:`ops.march.march_lit` (itself oracle-tested against
`ops/cpu_reference.py`); these tests run the Mosaic kernel through the Pallas
interpreter so CI needs no TPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tbraymarcherplugin_tpu.ops import march as M
from tbraymarcherplugin_tpu.ops import pallas_march as PM
from tbraymarcherplugin_tpu.ops import synthetic
from tbraymarcherplugin_tpu.ops import transfer as T
from tbraymarcherplugin_tpu.ops.rays import jitter_values, setup_rays
from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

NO_CLIP = ClipPlane.disabled()

RAMP_TF = T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]])


def _scene(vol_dims=(33, 28, 17), light_dims=(16, 14, 8), img=(40, 40)):
    volume = synthetic.sphere_volume(vol_dims, radius=0.4)
    lv = jnp.asarray(
        np.random.default_rng(7).random(light_dims, np.float32)
    )
    cam = Camera.look_at([0.3, -2.4, 0.5], [0.0, 0.0, 0.0], fov_degrees=30.0)
    rays = setup_rays(cam, VolumeTransform.create(), img[0], img[1])
    return volume, lv, rays


def _both(volume, lv, rays, win, clip, tf=RAMP_TF, jitter=None,
          step_count=24, **kw):
    want = np.asarray(
        M.march_lit(
            volume, tf, lv, rays, win, clip.center, clip.direction,
            jitter=jitter, step_count=step_count, **kw,
        )
    )
    pv = PM.swizzle_volume(volume)
    plv = PM.swizzle_volume(lv)
    got = np.asarray(
        PM.march_lit_pallas(
            pv, tf, plv, rays, win, clip.center, clip.direction,
            jitter=jitter, step_count=step_count, interpret=True, **kw,
        )
    )
    return got, want


def test_pallas_march_matches_reference():
    volume, lv, rays = _scene()
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    got, want = _both(volume, lv, rays, win, NO_CLIP)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)
    assert want[..., 3].max() > 0.5  # scene actually renders


def test_pallas_march_clip_window_cutoffs():
    volume, lv, rays = _scene()
    clip = ClipPlane.create([0.5, 0.5, 0.5], [0.1, 0.2, 0.97])
    win = jnp.array([0.6, 0.5, 1.0, 0.0])  # low cutoff on, high off
    got, want = _both(volume, lv, rays, win, clip)
    # Looser atol: the kernel's clip dot product associates differently, so
    # samples exactly on the plane can flip inclusion (a handful of texels at
    # ~1e-4 each); everything else matches to the usual tolerance.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
    got2, want2 = _both(volume, lv, rays, win, NO_CLIP)
    assert not np.allclose(got, got2)  # the clip did something


@pytest.mark.slow
def test_pallas_march_jitter():
    volume, lv, rays = _scene(img=(32, 64))  # width 32, height 64
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    jit = jitter_values(32, 64, frame_index=3)
    # step_count pinned: the kernel's DMA window was calibrated for this
    # scene at 48 steps (fewer steps -> larger stride -> window miss).
    got, want = _both(volume, lv, rays, win, NO_CLIP, jitter=jit,
                      step_count=48)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


@pytest.mark.slow
def test_pallas_march_early_termination():
    # Opaque volume: every center ray crosses 0.95 and snaps to exactly 1.
    volume = jnp.ones((16, 16, 16), jnp.float32)
    lv = jnp.full((8, 8, 8), 0.5, jnp.float32)
    cam = Camera.look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0], fov_degrees=20.0)
    rays = setup_rays(cam, VolumeTransform.create(), 32, 32)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    got, want = _both(volume, lv, rays, win, NO_CLIP,
                      tf=T.default_grayscale_tf(), step_count=64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)
    assert np.isclose(got[16, 16, 3], 1.0)


@pytest.mark.slow
def test_pallas_march_compat_final_step_flag():
    volume = jnp.full((16, 16, 16), 0.3, jnp.float32)
    lv = jnp.ones((8, 8, 8), jnp.float32)
    tf = T.tf_from_keypoints(
        [0.0, 1.0], [[0, 0, 0, 0], [1.0, 1.0, 1.0, 0.05]]
    )
    cam = Camera.look_at([0.0, -2.2, 0.1], [0.0, 0.0, 0.0], fov_degrees=25.0)
    rays = setup_rays(cam, VolumeTransform.create(), 32, 32)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    for flag in (True, False):
        got, want = _both(volume, lv, rays, win, NO_CLIP, tf=tf,
                          step_count=49, compat_final_step=flag)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


@pytest.mark.slow
def test_pallas_march_full_res_light():
    # Light volume at (almost) volume resolution exercises the 3x3 light
    # window path.
    volume, _, rays = _scene()
    lv = jnp.asarray(
        np.random.default_rng(3).random((33, 28, 17), np.float32)
    )
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    got, want = _both(volume, lv, rays, win, NO_CLIP)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


@pytest.mark.slow
def test_pallas_march_nonmultiple_image():
    # 30x27 image: edge-replicated tile padding must not leak into output.
    volume, lv, _ = _scene()
    cam = Camera.look_at([0.3, -2.4, 0.5], [0.0, 0.0, 0.0], fov_degrees=30.0)
    rays = setup_rays(cam, VolumeTransform.create(), 54, 60)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    got, want = _both(volume, lv, rays, win, NO_CLIP)
    assert got.shape == (60, 54, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_swizzle_roundtrip():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((20, 13, 9), np.float32))
    pv = PM.swizzle_volume(vol)
    assert pv.dims == (20, 13, 9)
    p = np.asarray(pv.pencils).reshape(pv.npx, pv.npy, pv.zp // 2, 2, 8, 8)
    # element (x, y, z) -> pencils[px*npy+py, z//2, (z%2)*64 + lx*8 + ly]
    v = np.asarray(vol)
    for x, y, z in [(0, 0, 0), (7, 7, 1), (8, 12, 8), (19, 3, 5)]:
        got = p[x >> 3, y >> 3, z >> 1, z & 1, x & 7, y & 7]
        assert got == v[x, y, z]
    # padding replicates the edge
    assert p[20 >> 3, 0, 0, 0, 20 & 7, 0] == v[19, 0, 0]


def test_footprint_guard():
    # Window-fit depends on ray spacing: pin the resolution this guard was
    # calibrated at (the default fast-tier scene is smaller).
    volume, lv, rays = _scene(img=(64, 64))
    # The standard test scene fits; the same scene at 1/4 resolution with
    # few steps does not.
    assert PM.fits_pallas_window(rays, volume.shape, 48)
    cam = Camera.look_at([0.3, -2.4, 0.5], [0.0, 0.0, 0.0], fov_degrees=30.0)
    tiny = setup_rays(cam, VolumeTransform.create(), 16, 16)
    assert not PM.fits_pallas_window(tiny, volume.shape, 8)


@pytest.mark.slow
def test_pallas_march_custom_window():
    """Non-default static DMA window (asymmetric pencils + deeper z), as
    chosen by choose_window for zoomed-out/coarse-step scenes."""
    volume, lv, rays = _scene()
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    want = np.asarray(
        M.march_lit(
            volume, RAMP_TF, lv, rays, win, NO_CLIP.center,
            NO_CLIP.direction, step_count=48,
        )
    )
    window = (4, 3, 10)
    lwindow = PM.scale_light_window(window, volume.shape, lv.shape)
    pv = PM.swizzle_volume(volume, min_window=window)
    plv = PM.swizzle_volume(lv, min_window=lwindow)
    got = np.asarray(
        PM.march_lit_pallas(
            pv, RAMP_TF, plv, rays, win, NO_CLIP.center, NO_CLIP.direction,
            step_count=48, window=window, light_window=lwindow,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_choose_window_covers_footprint():
    volume, lv, rays = _scene()
    cw = PM.choose_window(rays, volume.shape, 16, light_dims=lv.shape)
    assert cw is not None
    window, lwindow = cw
    assert PM.fits_pallas_window(rays, volume.shape, 16, window)
    # A window the chooser returns is never smaller than the footprint needs.
    fp = PM.max_tile_footprint_voxels(rays, volume.shape, 16)
    assert window[0] * 8 - 8 >= fp[0] and window[1] * 8 - 8 >= fp[1]
    assert 2 * window[2] - 3 >= fp[2]
