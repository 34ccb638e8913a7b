"""Tests for the shear-warp factorized renderer (`ops/shearwarp.py`).

Strategy (SURVEY §4): the fast path (batched-matmul resample + blocked
composite + two-pass warp) is checked exactly against
:func:`shearwarp_reference` / :func:`warp_reference` — independent
plane-by-plane gather implementations of the same algorithm — and then
golden-compared (tolerance) against the ray-space march for quality.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tbraymarcherplugin_tpu.ops import shearwarp as SW
from tbraymarcherplugin_tpu.ops import synthetic
from tbraymarcherplugin_tpu.ops import transfer as T
from tbraymarcherplugin_tpu.ops.rays import setup_rays
from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

DIMS = (32, 32, 32)
W, H = 96, 64


def _scene(light_dims=None, cam_pos=(0.1, -2.3, 0.4)):
    vol = jnp.asarray(synthetic.ct_like_phantom(DIMS, seed=0))
    ld = light_dims or DIMS
    # smooth synthetic light volume in [0.2, 1].
    x, y, z = np.meshgrid(*[np.linspace(0, 1, d) for d in ld], indexing="ij")
    lv = jnp.asarray(0.2 + 0.8 * (0.5 + 0.5 * np.sin(4 * x) * np.cos(3 * y + z)),
                     jnp.float32)
    tf = T.tf_ct_bone()
    cam = Camera.look_at(list(cam_pos), [0.0, 0.0, 0.0], fov_degrees=40.0)
    tr = VolumeTransform.create()
    win = jnp.asarray([0.45, 0.7, 1.0, 1.0], jnp.float32)
    return vol, lv, tf, cam, tr, win


def _plan(cam, tr, ld=None, **kw):
    plan = SW.plan_shearwarp(cam, tr, DIMS, ld or DIMS, W, H, **kw)
    assert plan is not None
    return plan


def test_plan_geometry_covers_cube():
    _, _, _, cam, tr, _ = _scene()
    plan = _plan(cam, tr)
    # every plane's [0,1]^2 slice must map inside the grid footprint
    lam = np.asarray(plan.lam)
    for arr_a, arr_b, n in ((plan.a1, plan.b1, plan.n1),
                            (plan.a2, plan.b2, plan.n2)):
        a, b = np.asarray(arr_a), np.asarray(arr_b)
        # sample voxel coords at grid edges must bracket the full slice
        v_lo = a + b * 0.0
        v_hi = a + b * (n - 1)
        lo = np.minimum(v_lo, v_hi)
        hi = np.maximum(v_lo, v_hi)
        # grid centers span the slice footprint to within half a grid pixel
        half_px = np.abs(np.asarray(arr_b)) * 0.5
        assert np.all(lo <= -0.5 + half_px + 1e-3), "grid misses low edge"
        assert np.all(hi >= 31.5 - half_px - 1e-3), "grid misses high edge"
    assert lam[0] == pytest.approx(1.0)
    assert np.all(np.diff(np.abs(lam)) > 0)


@pytest.mark.parametrize("cam_pos", [(0.1, -2.3, 0.4), (2.1, 0.7, 0.9),
                                     (-0.4, 0.9, 2.4)])
def test_intermediate_matches_reference(cam_pos):
    vol, lv, tf, cam, tr, win = _scene(cam_pos=cam_pos)
    clip = ClipPlane.disabled()
    plan = _plan(cam, tr, max_n=128)
    got = np.asarray(
        SW.shearwarp_intermediate(
            vol, tf, lv, plan, win, clip.center, clip.direction
        )
    )
    want = SW.shearwarp_reference(
        vol, tf, lv, plan, win, clip.center, clip.direction
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_intermediate_clip_plane_matches_reference():
    vol, lv, tf, cam, tr, win = _scene()
    clip = ClipPlane.create([0.5, 0.5, 0.5], [0.3, 0.8, 0.52])
    plan = _plan(cam, tr, max_n=128)
    got = np.asarray(
        SW.shearwarp_intermediate(
            vol, tf, lv, plan, win, clip.center, clip.direction
        )
    )
    want = SW.shearwarp_reference(
        vol, tf, lv, plan, win, clip.center, clip.direction
    )
    assert want[..., 3].max() > 0.05  # clip leaves something visible
    assert not np.allclose(
        want,
        SW.shearwarp_reference(
            vol, tf, lv, plan, win,
            ClipPlane.disabled().center, ClipPlane.disabled().direction,
        ),
    )  # and actually clips
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_intermediate_early_termination_matches_reference():
    vol, lv, tf, cam, tr, _ = _scene()
    # wide-open window + opaque TF so rays terminate mid-volume
    win = jnp.asarray([0.3, 1.5, 0.0, 0.0], jnp.float32)
    clip = ClipPlane.disabled()
    plan = _plan(cam, tr, max_n=128)
    got = np.asarray(
        SW.shearwarp_intermediate(
            vol, tf, lv, plan, win, clip.center, clip.direction
        )
    )
    want = SW.shearwarp_reference(
        vol, tf, lv, plan, win, clip.center, clip.direction
    )
    assert (want[..., 3] == 1.0).any(), "scene should saturate some rays"
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_stop_early_matches_scan_path():
    vol, lv, tf, cam, tr, _ = _scene()
    win = jnp.asarray([0.3, 1.5, 0.0, 0.0], jnp.float32)
    clip = ClipPlane.disabled()
    plan = _plan(cam, tr, max_n=128)
    args = (vol, tf, lv, plan, win, clip.center, clip.direction)
    a = np.asarray(SW.shearwarp_intermediate(*args, stop_early=False))
    b = np.asarray(SW.shearwarp_intermediate(*args, stop_early=True))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_half_res_light_matches_reference():
    ld = (16, 16, 16)
    vol, lv, tf, cam, tr, win = _scene(light_dims=ld)
    clip = ClipPlane.disabled()
    plan = _plan(cam, tr, ld=ld, max_n=128)
    got = np.asarray(
        SW.shearwarp_intermediate(
            vol, tf, lv, plan, win, clip.center, clip.direction
        )
    )
    want = SW.shearwarp_reference(
        vol, tf, lv, plan, win, clip.center, clip.direction
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_warp_matches_reference():
    _, _, _, cam, tr, _ = _scene()
    plan = _plan(cam, tr, max_n=128)
    rng = np.random.default_rng(7)
    inter = jnp.asarray(rng.random((plan.n1, plan.n2, 4)), jnp.float32)
    got = np.asarray(SW.warp_to_screen(inter, plan, W, H))
    want = SW.warp_reference(inter, plan, W, H)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert got.max() > 0.05  # the volume projects onto the screen


def test_screen_image_close_to_ray_march():
    """Quality golden: the shear-warp screen render approximates the
    ray-space march (different sample parameterization -> tolerance)."""
    from tbraymarcherplugin_tpu.ops import march as M

    vol, lv, tf, cam, tr, win = _scene()
    clip = ClipPlane.disabled()
    plan = _plan(cam, tr, oversample=1.5)
    sw = np.asarray(
        SW.shearwarp_lit(
            vol, tf, lv, plan, win, clip.center, clip.direction, W, H
        )
    )
    rays = setup_rays(cam, tr, W, H)
    ref = np.asarray(
        M.march_lit(
            vol, tf, lv, rays, win, clip.center, clip.direction,
            step_count=64,
        )
    )
    # Interior-sample parameterizations differ; compare at image level.
    diff = np.abs(sw - ref)
    assert diff.mean() < 0.015, diff.mean()
    assert np.quantile(diff, 0.98) < 0.12, np.quantile(diff, 0.98)


def test_gradients_flow_and_match_fd():
    vol, lv, _, cam, tr, win = _scene()
    clip = ClipPlane.disabled()
    plan = _plan(cam, tr, max_n=64)
    # FD-friendly configuration (same conventions as test_grads.py): smooth
    # keypoint TF, cutoffs off, early termination disabled — the cutoff step
    # and the alpha snap are genuine discontinuities.
    tf = T.tf_from_keypoints(
        [0, 0.5, 1.0],
        [[0.1, 0.2, 0.8, 0.0], [0.9, 0.4, 0.2, 0.5], [1.0, 1.0, 0.9, 1.0]],
    )

    def loss(center):
        w = jnp.asarray([center, 0.7, 0.0, 0.0], jnp.float32)
        img = SW.shearwarp_intermediate(
            vol, tf, lv, plan, w, clip.center, clip.direction,
            early_termination=2.0,
        )
        return jnp.mean(img**2)

    g = jax.grad(loss)(jnp.asarray(0.45))
    eps = 1e-3
    fd = (loss(0.45 + eps) - loss(0.45 - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=2e-2,
                               atol=1e-5)
    assert np.isfinite(np.asarray(g))

    gv = jax.grad(
        lambda v: jnp.mean(
            SW.shearwarp_intermediate(
                v, tf, lv, plan, win, clip.center, clip.direction
            )[..., 3]
        )
    )(vol)
    assert np.isfinite(np.asarray(gv)).all()
    assert float(jnp.abs(gv).sum()) > 0.0


def test_plan_rejects_camera_inside_slab():
    _, _, _, _, tr, _ = _scene()
    cam = Camera.look_at([0.01, 0.02, 0.03], [0.5, 0.5, 0.5],
                         fov_degrees=60.0)
    # camera UVW ~ (0.51, 0.52, 0.53) -> inside every slab
    assert SW.plan_shearwarp(cam, tr, DIMS, DIMS, W, H) is None


def test_empty_space_skipping_exact():
    """Slab skip must not change the image (bone TF leaves empty slabs)."""
    vol, lv, _, cam, tr, _ = _scene()
    # TF transparent below 0.6: much of the phantom is skippable
    tf = T.tf_from_keypoints(
        [0, 0.59, 0.6, 1.0],
        [[0, 0, 0, 0], [0, 0, 0, 0], [1, 0.9, 0.8, 0.5], [1, 1, 1, 1]],
    )
    win = jnp.asarray([0.5, 1.0, 1.0, 1.0], jnp.float32)
    clip = ClipPlane.disabled()
    plan = _plan(cam, tr, max_n=128)
    args = (vol, tf, lv, plan, win, clip.center, clip.direction)
    full = np.asarray(
        SW.shearwarp_intermediate(*args, stop_early=False, block_size=4)
    )
    skip = np.asarray(
        SW.shearwarp_intermediate(*args, stop_early=True, block_size=4)
    )
    np.testing.assert_allclose(skip, full, rtol=1e-6, atol=1e-7)


def test_warp_swap_path_matches_reference():
    """A 90-degree-rolled camera flips the screen/grid axis pairing
    (swap_warp=True) — both passes must still match the oracle."""
    import dataclasses as _dc

    cam = Camera.look_at([0.1, -2.3, 0.4], [0.0, 0.0, 0.0], fov_degrees=40.0)
    # roll 90 deg: swap right/up rows of the rotation
    rot = np.asarray(cam.rotation)
    rolled = np.stack([rot[1], -rot[0], rot[2]])
    cam = _dc.replace(cam, rotation=jnp.asarray(rolled, jnp.float32))
    tr = VolumeTransform.create()
    plan = SW.plan_shearwarp(cam, tr, DIMS, DIMS, W, H, max_n=128)
    assert plan is not None and plan.swap_warp, "roll should trigger swap"
    rng = np.random.default_rng(11)
    inter = jnp.asarray(rng.random((plan.n1, plan.n2, 4)), jnp.float32)
    got = np.asarray(SW.warp_to_screen(inter, plan, W, H))
    want = SW.warp_reference(inter, plan, W, H)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert got.max() > 0.05


def test_nonpow2_anisotropic_dims_match_reference():
    dims = (24, 20, 28)
    vol = jnp.asarray(synthetic.ct_like_phantom(dims, seed=4))
    ld = (12, 10, 14)
    x, y, z = np.meshgrid(*[np.linspace(0, 1, d) for d in ld], indexing="ij")
    lv = jnp.asarray(0.3 + 0.7 * x * y, jnp.float32)
    tf = T.tf_ct_bone()
    cam = Camera.look_at([0.4, -2.1, 0.6], [0.0, 0.0, 0.0], fov_degrees=35.0)
    tr = VolumeTransform.create()
    win = jnp.asarray([0.45, 0.8, 1.0, 1.0], jnp.float32)
    clip = ClipPlane.disabled()
    plan = SW.plan_shearwarp(cam, tr, dims, ld, W, H, max_n=128)
    assert plan is not None
    got = np.asarray(
        SW.shearwarp_intermediate(
            vol, tf, lv, plan, win, clip.center, clip.direction
        )
    )
    want = SW.shearwarp_reference(
        vol, tf, lv, plan, win, clip.center, clip.direction
    )
    # non-pow2 dims: plane depths are not exactly representable, the oracle's
    # trilinear picks up an O(1e-7) cross-slice blend the factorized path
    # (exact in-plane bilinear) does not — tolerance instead of exactness.
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("axis,sign", [(0, 1), (1, -1), (2, 1)])
def test_axis_aligned_cameras(axis, sign):
    """Near-axis-aligned views for all three dominant axes, both traversal
    directions. Slightly off-axis: an EXACTLY aligned camera puts sample
    points exactly on cube faces, where the fast path's f32 in-cube mask and
    the oracle's f64 one legitimately round the boundary differently."""
    vol, lv, tf, _, tr, win = _scene()
    pos = [0.5004, 0.4997, 0.5003]
    pos[axis] = 0.5 + sign * 2.5
    cam = Camera.look_at(pos, [0.5, 0.5, 0.5], fov_degrees=30.0)
    clip = ClipPlane.disabled()
    plan = SW.plan_shearwarp(cam, tr, DIMS, DIMS, W, H, max_n=128)
    assert plan is not None and plan.axis == axis
    got = np.asarray(
        SW.shearwarp_intermediate(
            vol, tf, lv, plan, win, clip.center, clip.direction
        )
    )
    want = SW.shearwarp_reference(
        vol, tf, lv, plan, win, clip.center, clip.direction
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_max_planes_matches_reference():
    """`max_planes` (the step_count quality knob): fractional plane
    positions must still match the plane-by-plane trilinear oracle, and
    the fused kernels must agree with the scan path."""
    vol, lv, tf, cam, tr, win = _scene()
    clip = ClipPlane.disabled()
    plan = _plan(cam, tr, max_n=128, max_planes=20)
    assert plan.k == 20 and plan.mfrac is not None
    got = np.asarray(SW.shearwarp_intermediate(
        vol, tf, lv, plan, win, clip.center, clip.direction,
    ))
    want = SW.shearwarp_reference(
        vol, tf, lv, plan, win, clip.center, clip.direction,
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    from tbraymarcherplugin_tpu.ops.shearwarp_pallas import (
        shearwarp_intermediate_fused,
    )
    fused = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(fused, got, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_max_planes_fused_diff_grads(rng):
    """The differentiable fused path handles fractional plane selection
    (gradients flow through both slices' one-hot weights)."""
    from tbraymarcherplugin_tpu.ops.shearwarp_grad import (
        shearwarp_intermediate_fused_diff,
    )

    vol, lv, tf, cam, tr, win = _scene()
    clip = ClipPlane.disabled()
    plan = _plan(cam, tr, max_n=128, max_planes=20)
    g = jnp.asarray(rng.random((plan.n1, plan.n2, 4), dtype=np.float32))

    def lf(v):
        return jnp.sum(shearwarp_intermediate_fused_diff(
            v, tf, lv, plan, win, clip.center, clip.direction,
            interpret=True,
        ) * g)

    def ld(v):
        return jnp.sum(SW.shearwarp_intermediate(
            v, tf, lv, plan, win, clip.center, clip.direction,
        ) * g)

    gf = np.asarray(jax.grad(lf)(vol))
    gd = np.asarray(jax.grad(ld)(vol))
    scale = max(np.abs(gd).max(), 1e-3)
    np.testing.assert_allclose(gf, gd, rtol=2e-4, atol=2e-5 * scale)
