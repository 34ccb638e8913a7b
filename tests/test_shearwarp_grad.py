"""Fused backward composite (custom VJP) vs XLA autodiff of the scan path.

The north-star check (BASELINE "fwd AND hand-derived bwd as fused Pallas
kernels"): every cotangent the dense differentiable path produces — volume,
light volume, TF table, window center/width — must match the hand-derived
reverse-sweep kernel's output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tbraymarcherplugin_tpu.ops import shearwarp as SW
from tbraymarcherplugin_tpu.ops import synthetic
from tbraymarcherplugin_tpu.ops import transfer as T
from tbraymarcherplugin_tpu.ops.shearwarp_grad import (
    shearwarp_intermediate_fused_diff,
)
from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

# Interpret-mode Pallas scales with n1*n2*K: this scene keeps every code
# path (windowing cutoffs, ET, clip, both sweeps, histograms) while fitting
# the fast tier's budget; the slow tier runs the larger-scene variants.
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
    plan = SW.plan_shearwarp(cam, tr, DIMS, DIMS, W, H, max_n=64)
    assert plan is not None
    return vol, lv, tf, plan


def _compare(plan, vol, lv, tf, win, clip, rng, rtol=2e-4, atol=2e-5):
    g = jnp.asarray(
        rng.random((plan.n1, plan.n2, 4), dtype=np.float32)
    )

    def loss_fused(v, t, w, l):
        out = shearwarp_intermediate_fused_diff(
            v, t, l, plan, w, clip.center, clip.direction, interpret=True,
        )
        return jnp.sum(out * g)

    def loss_dense(v, t, w, l):
        out = SW.shearwarp_intermediate(
            v, t, l, plan, w, clip.center, clip.direction,
        )
        return jnp.sum(out * g)

    lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(
        vol, tf, win, lv
    )
    ld, gd = jax.value_and_grad(loss_dense, argnums=(0, 1, 2, 3))(
        vol, tf, win, lv
    )
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-5)
    for name, a, b in zip(("dvol", "dtf", "dwin", "dlight"), gf, gd):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol * scale, err_msg=name
        )


def test_fused_diff_forward_matches_scan():
    vol, lv, tf, plan = _scene()
    clip = ClipPlane.disabled()
    win = jnp.asarray([0.45, 0.7, 1.0, 1.0], jnp.float32)
    want = np.asarray(SW.shearwarp_intermediate(
        vol, tf, lv, plan, win, clip.center, clip.direction,
    ))
    got = np.asarray(shearwarp_intermediate_fused_diff(
        vol, tf, lv, plan, win, clip.center, clip.direction, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("winv", [
    [0.45, 0.7, 1.0, 1.0],   # both cutoffs on
    pytest.param([0.5, 1.1, 0.0, 0.0], marks=pytest.mark.slow),  # cutoffs off
])
def test_fused_bwd_matches_xla(rng, winv):
    vol, lv, tf, plan = _scene()
    clip = ClipPlane.disabled()
    _compare(plan, vol, lv, tf, jnp.asarray(winv, jnp.float32), clip, rng)


def test_fused_bwd_early_termination(rng):
    """Opaque scene: exercises the ET snap + termination-depth gradients."""
    vol, lv, tf, plan = _scene()
    clip = ClipPlane.disabled()
    win = jnp.asarray([0.3, 1.5, 0.0, 0.0], jnp.float32)
    out = np.asarray(SW.shearwarp_intermediate(
        vol, tf, lv, plan, win, clip.center, clip.direction,
    ))
    assert (out[..., 3] == 1.0).any()  # the snap actually fires
    _compare(plan, vol, lv, tf, win, clip, rng)


@pytest.mark.slow
def test_fused_bwd_clip_plane(rng):
    vol, lv, tf, plan = _scene((2.1, 0.7, 0.9))
    clip = ClipPlane.create([0.5, 0.5, 0.5], [0.3, 0.8, 0.52])
    win = jnp.asarray([0.45, 0.7, 1.0, 1.0], jnp.float32)
    _compare(plan, vol, lv, tf, win, clip, rng)


@pytest.mark.slow
def test_fused_backward_matches_finite_differences(rng):
    """FD directly through the hand-derived kernel VJP (not just vs XLA
    autodiff): window center, a TF alpha texel, and a volume voxel. Run in
    the smooth regime (cutoffs off, no ET crossing) as all FD checks are."""
    vol, lv, tf, plan = _scene()
    clip = ClipPlane.disabled()
    win = jnp.asarray([0.5, 1.2, 0.0, 0.0], jnp.float32)
    g = jnp.asarray(rng.random((plan.n1, plan.n2, 4), dtype=np.float32))

    def loss(v, t, w):
        out = shearwarp_intermediate_fused_diff(
            v, t, lv, plan, w, clip.center, clip.direction,
            early_termination=1.5, interpret=True,
        )
        return jnp.sum(out * g)

    gv, gt, gw = jax.grad(loss, argnums=(0, 1, 2))(vol, tf, win)

    def fd(f, eps):
        return (f(eps) - f(-eps)) / (2 * eps)

    # window center — eps below the TF texel width
    eps = 5e-4
    fd_c = float(fd(lambda e: loss(
        vol, tf, win + jnp.asarray([e, 0, 0, 0], jnp.float32)
    ), eps))
    np.testing.assert_allclose(float(gw[0]), fd_c, rtol=2e-2)

    # a TF alpha texel with nonzero gradient
    t_idx = int(np.argmax(np.abs(np.asarray(gt)[:, 3])))
    e_t = np.zeros((256, 4), np.float32)
    e_t[t_idx, 3] = 1.0
    fd_t = float(fd(lambda e: loss(vol, tf + e * e_t, win), 1e-3))
    np.testing.assert_allclose(float(gt[t_idx, 3]), fd_t, rtol=2e-2)

    # a volume voxel with nonzero gradient
    gva = np.abs(np.asarray(gv))
    vi = np.unravel_index(int(np.argmax(gva)), gva.shape)
    e_v = np.zeros(vol.shape, np.float32)
    e_v[vi] = 1.0
    fd_v = float(fd(lambda e: loss(vol + e * jnp.asarray(e_v), tf, win),
                    2e-3))
    # a voxel perturbation moves many samples across TF kinks and the loss
    # is a large f32 sum — FD noise is a few percent here
    np.testing.assert_allclose(float(np.asarray(gv)[vi]), fd_v, rtol=6e-2)
