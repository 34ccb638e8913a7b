"""Pallas illumination-scan kernel vs the XLA `lax.scan` (exact equality).

The kernel (`ops/pallas_lighting.py`) must reproduce the carry recurrence of
`lighting._propagate_one_face` bit-for-bit: border-bilinear shift of the 2D
transmittance carry, multiply by (1 - opacity), emit every slice.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tbraymarcherplugin_tpu.ops import lighting as L
from tbraymarcherplugin_tpu.ops.pallas_lighting import (
    propagate_face_scan_pallas,
)


def _xla_scan(op_scan, off_px, off_py, alpha):
    def step(carry, s):
        prev = L.shift_2d_bilinear_border(carry, off_px, off_py, alpha)
        cur = prev * (1.0 - s)
        return cur, cur

    init = jnp.full(op_scan.shape[1:], alpha, jnp.float32)
    _, slices = jax.lax.scan(step, init, op_scan)
    return np.asarray(slices)


@pytest.mark.parametrize(
    "shape,off",
    [
        ((12, 16, 16), (0.37, -1.6)),
        ((8, 16, 24), (-0.5, 0.0)),
        ((5, 8, 8), (2.25, 1.75)),
        ((1, 16, 16), (0.5, 0.5)),
        ((9, 24, 40), (-3.1, 4.9)),
    ],
)
def test_matches_xla_scan(rng, shape, off):
    op = jnp.asarray(rng.random(shape, dtype=np.float32) * 0.6)
    alpha = 0.83
    got = np.asarray(
        propagate_face_scan_pallas(op, off[0], off[1], alpha, interpret=True)
    )
    want = _xla_scan(op, off[0], off[1], alpha)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_propagate_one_face_pallas_path(rng):
    """End-to-end `_propagate_one_face(scan_impl='pallas')` equality on both
    a +axis and a -axis face (flip path) at half-res light dims."""
    vol = jnp.asarray(rng.random((16, 16, 16), dtype=np.float32))
    tf = jnp.asarray(
        np.linspace(0, 1, 256)[:, None] * np.ones((1, 4)), jnp.float32
    )
    win = jnp.asarray([0.5, 1.0, 0.0, 0.0], jnp.float32)
    cc = jnp.asarray([0.0, 0.0, -1e6], jnp.float32)
    cd = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    for face in (0, 1, 2, 3, 4, 5):
        args = (
            vol, tf, win, cc, cd,
            jnp.asarray([0.02, -0.013], jnp.float32),
            jnp.asarray([0.01, -0.006, 0.02], jnp.float32),
            jnp.asarray(0.011, jnp.float32),
            jnp.asarray(0.9, jnp.float32),
            face,
            (8, 8, 8),
            False,
        )
        want = np.asarray(L._propagate_one_face(*args, scan_impl="xla"))
        got = np.asarray(L._propagate_one_face(*args, scan_impl="pallas"))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                                   err_msg=f"face {face}")


def test_custom_vjp_matches_xla_autodiff(rng):
    """The adjoint shift-scan must match autodiff through the XLA scan for
    d/d(opacity) and d/d(light_alpha); offsets are declared non-diff."""
    shape = (10, 16, 24)
    op = jnp.asarray(rng.random(shape, dtype=np.float32) * 0.6)
    offx, offy = 0.8, -1.3
    gcot = jnp.asarray(rng.random(shape, dtype=np.float32))

    from tbraymarcherplugin_tpu.ops.pallas_lighting import propagate_face_scan

    def loss_pallas(o, a):
        return jnp.sum(propagate_face_scan(o, offx, offy, a, interpret=True)
                       * gcot)

    def loss_xla_traced(o, a):
        def step(carry, s):
            prev = L.shift_2d_bilinear_border(carry, offx, offy, a)
            cur = prev * (1.0 - s)
            return cur, cur

        init = jnp.full(o.shape[1:], a, jnp.float32)
        _, slices = jax.lax.scan(step, init, o)
        return jnp.sum(slices * gcot)

    a0 = jnp.asarray(0.83)
    go_p, ga_p = jax.grad(loss_pallas, argnums=(0, 1))(op, a0)
    go_x, ga_x = jax.grad(loss_xla_traced, argnums=(0, 1))(op, a0)
    np.testing.assert_allclose(np.asarray(go_p), np.asarray(go_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_x),
                               rtol=1e-5, atol=1e-6)


def test_windowed_tf_alpha_matches_xla(rng):
    from tbraymarcherplugin_tpu.ops.pallas_tf import windowed_tf_alpha
    from tbraymarcherplugin_tpu.ops.sampling import (
        sample_windowed_transfer_function,
    )
    from tbraymarcherplugin_tpu.ops import transfer as T

    vals = jnp.asarray(rng.random((13, 9, 21), dtype=np.float32))
    tf = T.tf_ct_bone()
    for win in ([0.45, 0.7, 1.0, 1.0], [0.5, 1.2, 0.0, 0.0],
                [0.8, 0.3, 1.0, 0.0]):
        w = jnp.asarray(win, jnp.float32)
        got = np.asarray(
            windowed_tf_alpha(vals, tf, w, 0.73, interpret=True)
        )
        want = np.asarray(sample_windowed_transfer_function(
            vals, 0.73, tf, w
        ))[..., 3]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                                   err_msg=str(win))


def test_windowed_tf_rgba_fwd_and_vjp_match_xla(rng):
    """The differentiable TF unit: forward AND all gradients (value, TF
    texels, window center/width) must match XLA autodiff of
    sample_windowed_transfer_function."""
    from tbraymarcherplugin_tpu.ops.pallas_tf import windowed_tf_rgba
    from tbraymarcherplugin_tpu.ops.sampling import (
        sample_windowed_transfer_function,
    )
    from tbraymarcherplugin_tpu.ops import transfer as T

    vals = jnp.asarray(rng.random((7, 11, 13), dtype=np.float32))
    step = jnp.asarray(0.5 + rng.random((7, 11, 13), dtype=np.float32))
    tf = T.tf_from_keypoints(
        [0, 0.4, 1.0],
        [[0.1, 0.2, 0.8, 0.05], [0.9, 0.4, 0.2, 0.5], [1, 1, 0.9, 0.95]],
    )
    g = jnp.asarray(rng.random((7, 11, 13, 4), dtype=np.float32))

    for winv in ([0.45, 0.7, 1.0, 1.0], [0.5, 1.1, 0.0, 0.0]):
        win = jnp.asarray(winv, jnp.float32)

        got_f = np.asarray(windowed_tf_rgba(vals, tf, win, step, True))
        want_f = np.asarray(
            sample_windowed_transfer_function(vals, step, tf, win)
        )
        np.testing.assert_allclose(got_f, want_f, rtol=1e-6, atol=1e-6)

        def loss_p(v, t, w, s):
            return jnp.sum(windowed_tf_rgba(v, t, w, s, True) * g)

        def loss_x(v, t, w, s):
            return jnp.sum(
                sample_windowed_transfer_function(v, s, t, w) * g
            )

        gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(vals, tf, win, step)
        gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(vals, tf, win, step)
        np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                                   rtol=1e-4, atol=1e-5, err_msg="dvalues")
        np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                                   rtol=1e-4, atol=1e-5, err_msg="dTF")
        np.testing.assert_allclose(np.asarray(gp[2]), np.asarray(gx[2]),
                                   rtol=1e-4, atol=1e-4, err_msg="dwin")
        np.testing.assert_allclose(np.asarray(gp[3]), np.asarray(gx[3]),
                                   rtol=1e-4, atol=1e-5, err_msg="dstep")
        # broadcast step: the cotangent must reduce over broadcast axes
        s2 = jnp.asarray(0.9, jnp.float32)
        gp3 = jax.grad(loss_p, argnums=3)(vals, tf, win, s2)
        gx3 = jax.grad(loss_x, argnums=3)(vals, tf, win, s2)
        np.testing.assert_allclose(np.asarray(gp3), np.asarray(gx3),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg="dstep scalar")


def test_occluder_pallas_vjp_grads_match_xla(rng):
    """The differentiable occluder path (tf_impl='pallas_vjp') must give the
    same gradients as the XLA TF lookup."""
    vol = jnp.asarray(rng.random((12, 12, 12), dtype=np.float32))
    tf = jnp.asarray(
        np.linspace(0, 1, 256)[:, None] * np.ones((1, 4)), jnp.float32
    )
    win = jnp.asarray([0.5, 1.0, 0.0, 0.0], jnp.float32)
    cc = jnp.asarray([0.0, 0.0, -1e6], jnp.float32)
    cd = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    args = (
        jnp.asarray([0.02, -0.013], jnp.float32),
        jnp.asarray([0.01, -0.006, 0.02], jnp.float32),
        jnp.asarray(0.011, jnp.float32),
    )

    def loss(v, t, impl):
        lv = L._propagate_one_face(
            v, t, win, cc, cd, *args, jnp.asarray(0.9), 4, (8, 8, 8), False,
            scan_impl="pallas", tf_impl=impl,
        )
        return jnp.sum(lv * lv)

    gx = jax.grad(loss, argnums=(0, 1))(vol, tf, "xla")
    gp = jax.grad(loss, argnums=(0, 1))(vol, tf, "pallas_vjp")
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=1e-4, atol=1e-6)


def test_windowed_tf_alpha_vjp_matches_xla(rng):
    """Alpha-only differentiable TF unit (the occluder's VJP path)."""
    from tbraymarcherplugin_tpu.ops.pallas_tf import windowed_tf_alpha_vjp
    from tbraymarcherplugin_tpu.ops.sampling import (
        sample_windowed_transfer_function,
    )
    from tbraymarcherplugin_tpu.ops import transfer as T

    vals = jnp.asarray(rng.random((9, 13), dtype=np.float32))
    step = jnp.asarray(0.5 + rng.random((9, 13), dtype=np.float32))
    tf = T.tf_ct_bone()
    g = jnp.asarray(rng.random((9, 13), dtype=np.float32))
    win = jnp.asarray([0.45, 0.7, 1.0, 1.0], jnp.float32)

    got_f = np.asarray(windowed_tf_alpha_vjp(vals, tf, win, step, True))
    want_f = np.asarray(
        sample_windowed_transfer_function(vals, step, tf, win)
    )[..., 3]
    np.testing.assert_allclose(got_f, want_f, rtol=1e-6, atol=1e-6)

    def lp(v, t, w, s):
        return jnp.sum(windowed_tf_alpha_vjp(v, t, w, s, True) * g)

    def lx(v, t, w, s):
        return jnp.sum(
            sample_windowed_transfer_function(v, s, t, w)[..., 3] * g
        )

    gp = jax.grad(lp, argnums=(0, 1, 2, 3))(vals, tf, win, step)
    gx = jax.grad(lx, argnums=(0, 1, 2, 3))(vals, tf, win, step)
    for name, a, b in zip(("dval", "dtf", "dwin", "dstep"), gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
