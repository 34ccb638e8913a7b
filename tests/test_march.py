"""Forward-march tests: jnp path vs the numpy oracle (BASELINE config 1/2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tbraymarcherplugin_tpu.ops import cpu_reference as ref
from tbraymarcherplugin_tpu.ops import march as M
from tbraymarcherplugin_tpu.ops import synthetic
from tbraymarcherplugin_tpu.ops import transfer as T
from tbraymarcherplugin_tpu.ops.rays import RayBatch, jitter_values, setup_rays
from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

NO_CLIP = ClipPlane.disabled()


def _scene(vol_dims=(32, 32, 32), img=24, fov=35.0):
    volume = synthetic.sphere_volume(vol_dims)
    tf = T.default_grayscale_tf()
    cam = Camera.look_at([0.0, -2.5, 0.3], [0.0, 0.0, 0.0], fov_degrees=fov)
    xf = VolumeTransform.create()
    rays = setup_rays(cam, xf, img, img)
    return volume, tf, rays


@pytest.mark.parametrize("step_count", [40, 150])
def test_lit_march_matches_oracle(step_count):
    volume, tf, rays = _scene()
    lv = jnp.ones((16, 16, 16), jnp.float32)  # uniform light
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    got = np.asarray(
        M.march_lit(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
            step_count=step_count,
        )
    )
    want = ref.render_lit(
        np.asarray(volume), np.asarray(tf), np.asarray(lv),
        np.asarray(rays.entry), np.asarray(rays.direction),
        np.asarray(rays.thickness),
        (0.5, 1.0, 1.0, 1.0),
        np.asarray(NO_CLIP.center), np.asarray(NO_CLIP.direction),
        step_count=step_count,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
    # The sphere must actually render something.
    assert want[..., 3].max() > 0.5


def test_lit_march_with_clip_and_window():
    volume, tf, rays = _scene()
    lv = jnp.ones((8, 8, 8), jnp.float32)
    clip = ClipPlane.create([0.5, 0.5, 0.5], [0.0, 0.0, 1.0])  # clip lower half
    win = jnp.array([0.6, 0.5, 1.0, 0.0])
    got = np.asarray(
        M.march_lit(
            volume, tf, lv, rays, win, clip.center, clip.direction, step_count=60
        )
    )
    want = ref.render_lit(
        np.asarray(volume), np.asarray(tf), np.asarray(lv),
        np.asarray(rays.entry), np.asarray(rays.direction),
        np.asarray(rays.thickness),
        (0.6, 0.5, 1.0, 0.0),
        np.asarray(clip.center), np.asarray(clip.direction),
        step_count=60,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
    # Clipping changed the image vs unclipped.
    unclipped = np.asarray(
        M.march_lit(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
            step_count=60,
        )
    )
    assert not np.allclose(got, unclipped)


def test_lit_march_jitter_matches_oracle():
    volume, tf, rays = _scene(img=16)
    lv = jnp.ones((8, 8, 8), jnp.float32)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    jit = jitter_values(16, 16, frame_index=2)
    got = np.asarray(
        M.march_lit(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
            jitter=jit, step_count=50,
        )
    )
    want = ref.render_lit(
        np.asarray(volume), np.asarray(tf), np.asarray(lv),
        np.asarray(rays.entry), np.asarray(rays.direction),
        np.asarray(rays.thickness),
        (0.5, 1.0, 1.0, 1.0),
        np.asarray(NO_CLIP.center), np.asarray(NO_CLIP.direction),
        jitter=np.asarray(jit), step_count=50,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_early_termination_snaps_alpha():
    # A very opaque volume must terminate early with alpha exactly 1.
    volume = jnp.ones((8, 8, 8), jnp.float32)
    tf = T.default_grayscale_tf()
    lv = jnp.ones((4, 4, 4), jnp.float32)
    cam = Camera.look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0], fov_degrees=20.0)
    rays = setup_rays(cam, VolumeTransform.create(), 5, 5)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    out = np.asarray(
        M.march_lit(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
            step_count=100,
        )
    )
    assert np.isclose(out[2, 2, 3], 1.0)


def _alpha_ramp_tf():
    # The reference default TF has alpha == 1 everywhere (RaymarchUtils.cpp:128)
    # which makes the first empty-space sample opaque black — useless for
    # testing rgb behavior. Use a ramped-alpha TF so empty space is transparent.
    return T.tf_from_keypoints(
        [0.0, 1.0], [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]]
    )


def test_light_volume_modulates_rgb():
    volume, _, rays = _scene(img=12)
    tf = _alpha_ramp_tf()
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    bright = M.march_lit(
        volume, tf, jnp.ones((8, 8, 8), jnp.float32), rays, win,
        NO_CLIP.center, NO_CLIP.direction, step_count=40,
    )
    dark = M.march_lit(
        volume, tf, jnp.full((8, 8, 8), 0.25, jnp.float32), rays, win,
        NO_CLIP.center, NO_CLIP.direction, step_count=40,
    )
    b, d = np.asarray(bright), np.asarray(dark)
    # Alpha identical (lighting modulates rgb only, usf:30).
    np.testing.assert_allclose(b[..., 3], d[..., 3], atol=1e-6)
    assert (b[..., :3].sum() > d[..., :3].sum())
    hit = b[..., 3] > 0.1
    np.testing.assert_allclose(
        d[..., :3][hit], 0.25 * b[..., :3][hit], rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("block_size", [7, 32])
def test_blocked_march_matches_scan(block_size):
    # march_lit_blocked is the TPU-throughput path; semantics must equal the
    # step-sequential scan march up to float reassociation (cumprod vs
    # sequential multiply).
    volume, _, rays = _scene()
    tf = _alpha_ramp_tf()
    lv = jnp.full((8, 8, 8), 0.7, jnp.float32)
    clip = ClipPlane.create([0.5, 0.5, 0.5], [0.0, 0.0, 1.0])
    win = jnp.array([0.6, 0.5, 1.0, 0.0])
    jit = jitter_values(24, 24, frame_index=3)
    kw = dict(jitter=jit, step_count=50)
    a = np.asarray(
        M.march_lit(volume, tf, lv, rays, win, clip.center, clip.direction, **kw)
    )
    b = np.asarray(
        M.march_lit_blocked(
            volume, tf, lv, rays, win, clip.center, clip.direction,
            block_size=block_size, **kw,
        )
    )
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_blocked_march_early_termination_parity():
    volume = jnp.ones((8, 8, 8), jnp.float32)
    tf = T.default_grayscale_tf()
    lv = jnp.full((4, 4, 4), 0.5, jnp.float32)
    cam = Camera.look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0], fov_degrees=20.0)
    rays = setup_rays(cam, VolumeTransform.create(), 5, 5)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    a = np.asarray(
        M.march_lit(volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
                    step_count=100)
    )
    b = np.asarray(
        M.march_lit_blocked(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
            step_count=100,
        )
    )
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)
    assert np.isclose(b[2, 2, 3], 1.0)  # early-terminated alpha snaps to 1


def test_intensity_march_matches_oracle():
    volume, tf, rays = _scene(img=20)
    win = jnp.array([0.5, 0.8, 1.0, 1.0])
    got = np.asarray(
        M.march_intensity(
            volume, rays, win, NO_CLIP.center, NO_CLIP.direction, step_count=80
        )
    )
    want = ref.render_intensity(
        np.asarray(volume),
        np.asarray(rays.entry), np.asarray(rays.direction),
        np.asarray(rays.thickness),
        (0.5, 0.8, 1.0, 1.0),
        np.asarray(NO_CLIP.center), np.asarray(NO_CLIP.direction),
        step_count=80,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
    assert want[..., 3].max() == 1.0  # something was hit


def test_miss_rays_transparent():
    volume, tf, _ = _scene()
    # Rays that miss the cube entirely: thickness 0 -> rgba 0.
    rays = RayBatch(
        entry=jnp.zeros((4, 3)),
        direction=jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (4, 1)),
        thickness=jnp.zeros((4,)),
    )
    lv = jnp.ones((4, 4, 4), jnp.float32)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    out = np.asarray(
        M.march_lit(volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
                    step_count=50)
    )
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def _ess_scene(rng):
    """Sparse scene (one dense blob) for empty-space-skipping tests."""
    vol = np.zeros((33, 32, 30), np.float32)  # non-pow2: padding cells exist
    vol[4:12, 4:12, 4:12] = rng.random((8, 8, 8), dtype=np.float32)
    volume = jnp.asarray(vol)
    tf = _alpha_ramp_tf()
    cam = Camera.look_at([0.0, -2.5, 0.3], [0.0, 0.0, 0.0], fov_degrees=35.0)
    rays = setup_rays(cam, VolumeTransform.create(), 24, 24)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    return volume, tf, rays, win


def test_skip_blocks_exact_vs_ungated(rng):
    from tbraymarcherplugin_tpu.ops import octree as O

    volume, tf, rays, win = _ess_scene(rng)
    lv = jnp.full((8, 8, 8), 0.7, jnp.float32)
    oc = O.build_octree(volume)
    og = O.occupancy_grid(oc, win, tf, mip=2)
    kw = dict(step_count=50, block_size=16)
    a = np.asarray(
        M.march_lit_blocked(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction, **kw
        )
    )
    b = np.asarray(
        M.march_lit_blocked(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
            occ_grid=og.grid, occ_scale=og.cell_scale, skip_blocks=True, **kw,
        )
    )
    # Exactness: skipped samples have windowed-TF alpha == 0 by construction
    # (tolerance is for TPU/fusion reassociation only; on CPU this is ulp).
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    assert a[..., 3].max() > 0.1  # the blob renders


def test_skip_blocks_saturated_early_exit():
    # Fully opaque volume: all rays terminate in the first blocks and the
    # all-terminated predicate must not change the image.
    volume = jnp.ones((8, 8, 8), jnp.float32)
    tf = T.default_grayscale_tf()
    lv = jnp.full((4, 4, 4), 0.5, jnp.float32)
    cam = Camera.look_at([0.0, -2.0, 0.0], [0.0, 0.0, 0.0], fov_degrees=20.0)
    rays = setup_rays(cam, VolumeTransform.create(), 5, 5)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    a = np.asarray(
        M.march_lit_blocked(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
            step_count=100,
        )
    )
    b = np.asarray(
        M.march_lit_blocked(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
            step_count=100, skip_blocks=True,
        )
    )
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_tiled2d_matches_blocked(rng):
    from tbraymarcherplugin_tpu.ops import octree as O

    volume, tf, rays, win = _ess_scene(rng)
    lv = jnp.full((8, 8, 8), 0.7, jnp.float32)
    jit = jitter_values(24, 24, frame_index=5)
    kw = dict(jitter=jit, step_count=50, block_size=16)
    a = np.asarray(
        M.march_lit_blocked(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction, **kw
        )
    )
    # 2D tiling that does NOT divide the image evenly (24 % 9 != 0).
    b = np.asarray(
        M.march_lit_tiled(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
            tile2d=(9, 8), **kw,
        )
    )
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    # And with skipping on top: still identical.
    oc = O.build_octree(volume)
    og = O.occupancy_grid(oc, win, tf, mip=2)
    c = np.asarray(
        M.march_lit_tiled(
            volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
            tile2d=(8, 8), occ_grid=og.grid, occ_scale=og.cell_scale,
            skip_blocks=True, **kw,
        )
    )
    np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-7)


def test_compat_final_step_flag_changes_result():
    # The flag only affects the final fractional step of rays that exit the
    # cube without early termination — so the volume must be non-zero at the
    # cube boundary and translucent enough that rays run to completion.
    _, _, rays = _scene(img=8)
    volume = jnp.full((8, 8, 8), 0.3, jnp.float32)
    tf = T.tf_from_keypoints(
        [0.0, 1.0], [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 0.05]]
    )
    lv = jnp.ones((4, 4, 4), jnp.float32)
    win = jnp.array([0.5, 1.0, 1.0, 1.0])
    a = M.march_lit(volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
                    step_count=33, compat_final_step=True)
    b = M.march_lit(volume, tf, lv, rays, win, NO_CLIP.center, NO_CLIP.direction,
                    step_count=33, compat_final_step=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))
