"""Fused Pallas shear-warp composite vs the XLA scan path (exactness)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tbraymarcherplugin_tpu.ops import shearwarp as SW
from tbraymarcherplugin_tpu.ops import synthetic
from tbraymarcherplugin_tpu.ops import transfer as T
from tbraymarcherplugin_tpu.ops.shearwarp_pallas import (
    shearwarp_intermediate_fused,
)
from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

# Interpret-mode Pallas scales with n1*n2*K — sized for the fast tier's
# budget; every feature (ESS, ET, clip, jitter, depth, modes) still runs.
DIMS = (24, 24, 24)
W, H = 64, 48


def _scene(cam_pos=(0.1, -2.3, 0.4)):
    vol = jnp.asarray(synthetic.ct_like_phantom(DIMS, seed=0))
    x, y, z = np.meshgrid(*[np.linspace(0, 1, d) for d in DIMS],
                          indexing="ij")
    lv = jnp.asarray(0.2 + 0.8 * (0.5 + 0.5 * np.sin(4 * x) * np.cos(3 * y)),
                     jnp.float32)
    tf = T.tf_ct_bone()
    cam = Camera.look_at(list(cam_pos), [0.0, 0.0, 0.0], fov_degrees=40.0)
    tr = VolumeTransform.create()
    win = jnp.asarray([0.45, 0.7, 1.0, 1.0], jnp.float32)
    plan = SW.plan_shearwarp(cam, tr, DIMS, DIMS, W, H, max_n=64)
    assert plan is not None
    return vol, lv, tf, plan, win


@pytest.mark.parametrize("cam_pos", [(0.1, -2.3, 0.4), (2.1, 0.7, 0.9)])
def test_fused_matches_scan_path_f32(cam_pos):
    vol, lv, tf, plan, win = _scene(cam_pos)
    clip = ClipPlane.disabled()
    want = np.asarray(SW.shearwarp_intermediate(
        vol, tf, lv, plan, win, clip.center, clip.direction,
    ))
    got = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_clip_and_early_termination():
    vol, lv, tf, plan, _ = _scene()
    clip = ClipPlane.create([0.5, 0.5, 0.5], [0.3, 0.8, 0.52])
    # opaque scene: exercises the alpha snap + tile early-exit
    win = jnp.asarray([0.3, 1.5, 0.0, 0.0], jnp.float32)
    want = np.asarray(SW.shearwarp_intermediate(
        vol, tf, lv, plan, win, clip.center, clip.direction,
    ))
    got = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32,
    ))
    assert (want[..., 3] == 1.0).any()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_ess_skips_exactly():
    vol, lv, _, plan, _ = _scene()
    tf = T.tf_from_keypoints(
        [0, 0.59, 0.6, 1.0],
        [[0, 0, 0, 0], [0, 0, 0, 0], [1, 0.9, 0.8, 0.5], [1, 1, 1, 1]],
    )
    win = jnp.asarray([0.5, 1.0, 1.0, 1.0], jnp.float32)
    clip = ClipPlane.disabled()
    want = np.asarray(SW.shearwarp_intermediate(
        vol, tf, lv, plan, win, clip.center, clip.direction,
    ))
    got = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_bf16_close():
    vol, lv, tf, plan, win = _scene()
    clip = ClipPlane.disabled()
    want = np.asarray(SW.shearwarp_intermediate(
        vol, tf, lv, plan, win, clip.center, clip.direction,
    ))
    got = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.bfloat16,
    ))
    assert np.abs(got - want).mean() < 2e-3
    assert np.abs(got - want).max() < 0.06


def test_banded_row_lerp_matches_lerp_take(rng):
    from tbraymarcherplugin_tpu.ops.pallas_warp import banded_row_lerp
    from tbraymarcherplugin_tpu.ops.shearwarp import _lerp_take

    rows = jnp.asarray(rng.random((20, 300), dtype=np.float32))
    # monotone, ~1.2 source texels per output (the kernel's band contract),
    # endpoints past the array to cover the clamp-to-edge path
    base = np.linspace(-5, 310, 260)[None, :]
    wob = rng.random((20, 260), dtype=np.float32) * 3.0
    idx = jnp.asarray((base + wob).astype(np.float32))
    got = np.asarray(banded_row_lerp(rows, idx, interpret=True))
    want = np.asarray(_lerp_take(rows, idx))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_warp_fused_matches_warp_to_screen(rng):
    from tbraymarcherplugin_tpu.ops.pallas_warp import warp_to_screen_fused

    _, _, _, plan, _ = _scene()
    inter = jnp.asarray(rng.random((plan.n1, plan.n2, 4), dtype=np.float32))
    want = np.asarray(SW.warp_to_screen(inter, plan, W, H))
    got = np.asarray(warp_to_screen_fused(inter, plan, W, H, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got.max() > 0.05


def test_banded_row_lerp_vjp_matches_lerp_take(rng):
    """The banded scatter adjoint kernel vs XLA autodiff of _lerp_take."""
    import jax

    from tbraymarcherplugin_tpu.ops.pallas_warp import banded_row_lerp
    from tbraymarcherplugin_tpu.ops.shearwarp import _lerp_take

    rows = jnp.asarray(rng.random((20, 300), dtype=np.float32))
    base = np.linspace(-5, 310, 260)[None, :]
    wob = rng.random((20, 260), dtype=np.float32) * 3.0
    idx = jnp.asarray((base + wob).astype(np.float32))
    g = jnp.asarray(rng.random((20, 260), dtype=np.float32))

    gp = jax.grad(
        lambda r: jnp.sum(banded_row_lerp(r, idx, True) * g)
    )(rows)
    gx = jax.grad(lambda r: jnp.sum(_lerp_take(r, idx) * g))(rows)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-5, atol=1e-5)


def test_warp_fused_vjp_matches_xla_warp(rng):
    """End-to-end warp gradient: fused (banded adjoint) vs XLA warp."""
    import jax

    _, _, _, plan, _ = _scene()
    from tbraymarcherplugin_tpu.ops.pallas_warp import warp_to_screen_fused

    inter = jnp.asarray(rng.random((plan.n1, plan.n2, 4), dtype=np.float32))
    g = jnp.asarray(rng.random((H, W, 4), dtype=np.float32))
    gp = jax.grad(
        lambda x: jnp.sum(warp_to_screen_fused(x, plan, W, H, True) * g)
    )(inter)
    gx = jax.grad(
        lambda x: jnp.sum(SW.warp_to_screen(x, plan, W, H) * g)
    )(inter)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-5)


def test_warp_fused_non_multiple_of_8_sizes(rng):
    """Regression (ADVICE r3): when W (or H under swap_warp) % 8 != 0 an
    8-row kernel tile used to straddle the channel boundary and mix rows
    with divergent index ranges -> silent band clamp corruption."""
    from tbraymarcherplugin_tpu.ops.pallas_warp import warp_to_screen_fused
    from tbraymarcherplugin_tpu.scene import Camera, VolumeTransform

    # rolled camera (the advisor's repro had roll) + odd screen sizes
    cam = Camera.look_at(
        [0.3, -2.1, 0.6], [0.0, 0.0, 0.0], fov_degrees=40.0,
        up=[0.35, 0.2, 0.91],
    )
    tr = VolumeTransform.create()
    for Wo, Ho in ((93, 61), (100, 52)):
        plan = SW.plan_shearwarp(cam, tr, DIMS, DIMS, Wo, Ho, max_n=64)
        assert plan is not None
        inter = jnp.asarray(
            rng.random((plan.n1, plan.n2, 4), dtype=np.float32)
        )
        want = np.asarray(SW.warp_to_screen(inter, plan, Wo, Ho))
        got = np.asarray(
            warp_to_screen_fused(inter, plan, Wo, Ho, interpret=True)
        )
        # atol: the fused path computes its index fields natively in
        # (n2, W) orientation (round 5), so the f32 association differs
        # slightly from the oracle's (W, n2)-then-transpose order.
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-5)


def test_warp_band_guard():
    """The banded-warp contract guard measures per-tile index spread."""
    from tbraymarcherplugin_tpu.ops.pallas_warp import (
        BAND, warp_band_max_spread, assert_warp_band,
    )

    _, _, _, plan, _ = _scene()
    spread = warp_band_max_spread(plan, W, H)
    assert 0.0 < spread <= BAND - 130
    assert_warp_band(plan, W, H)  # must not raise for a capped plan


def test_debug_no_skip_is_exact():
    vol, lv, tf, plan, win = _scene()
    clip = ClipPlane.disabled()
    a = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32,
    ))
    b = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32, debug_no_skip=True,
    ))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_fused_jitter_matches_oracle(rng):
    """Per-pixel λ jitter: fused kernel vs the dense lerp-of-planes oracle."""
    vol, lv, tf, plan, win = _scene()
    clip = ClipPlane.disabled()
    jit = jnp.asarray(rng.random((plan.n1, plan.n2), dtype=np.float32))
    want = np.asarray(SW.shearwarp_jittered_oracle(
        vol, tf, lv, plan, win, clip.center, clip.direction, jitter=jit,
    ))
    got = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32, jitter=jit,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # zero jitter reduces exactly to the unjittered composite
    base = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32,
    ))
    z = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32, jitter=jnp.zeros((plan.n1, plan.n2)),
    ))
    np.testing.assert_allclose(z, base, rtol=1e-6, atol=1e-7)


def test_fused_depth_clamp_matches_oracle(rng):
    """Scene-depth occlusion clamp in the fused composite."""
    vol, lv, tf, plan, win = _scene()
    clip = ClipPlane.disabled()
    # a λ ceiling that cuts roughly mid-volume over half the image
    lmax = np.full((plan.n1, plan.n2), np.inf, np.float32)
    lam = np.asarray(plan.lam)
    lmax[:, : plan.n2 // 2] = lam[len(lam) // 2]
    lmax = jnp.asarray(lmax)
    want = np.asarray(SW.shearwarp_jittered_oracle(
        vol, tf, lv, plan, win, clip.center, clip.direction, depth_lam=lmax,
    ))
    got = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32, depth_lam=lmax,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # the clamp actually removes contribution on the clamped half
    full = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32,
    ))
    assert full[..., 3][:, : plan.n2 // 2].sum() > got[..., 3][:, : plan.n2 // 2].sum()


def test_depth_to_lambda_max_units():
    """depth/r inversion: a depth map equal to each grid point's plane-0
    camera distance gives λ_max == λ_0 == 1 (up to resampling)."""
    from tbraymarcherplugin_tpu.ops.shearwarp import depth_to_lambda_max

    _, _, _, plan, _ = _scene()
    depth = jnp.full((H, W), 1e6, jnp.float32)
    lmax = np.asarray(depth_to_lambda_max(plan, depth, W, H))
    assert np.all(lmax > np.abs(np.asarray(plan.lam)).max())
    near = jnp.full((H, W), 1e-3, jnp.float32)
    lmax2 = np.asarray(depth_to_lambda_max(plan, near, W, H))
    assert np.all(lmax2 < 1.0)


def test_fused_intensity_mode_matches_oracle():
    """First-hit windowed-intensity variant of the fused composite."""
    vol, lv, tf, plan, win = _scene()
    clip = ClipPlane.create([0.5, 0.5, 0.5], [0.3, 0.8, 0.52])
    want = np.asarray(SW.shearwarp_jittered_oracle(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        mode="intensity",
    ))
    got = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32, mode="intensity",
    ))
    assert (want[..., 3] > 0).any()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_unlit_nearest_mode_matches_oracle():
    """Octree-style variant: unlit composite + nearest (Load) sampling."""
    vol, lv, tf, plan, win = _scene()
    clip = ClipPlane.disabled()
    want = np.asarray(SW.shearwarp_jittered_oracle(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        mode="unlit", sample_nearest=True,
    ))
    got = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32, mode="unlit", sample_nearest=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # nearest sampling visibly differs from bilinear (blocky mip look)
    lin = np.asarray(shearwarp_intermediate_fused(
        vol, tf, lv, plan, win, clip.center, clip.direction,
        compute_dtype=jnp.float32, mode="unlit",
    ))
    assert np.abs(lin - got).max() > 1e-3
