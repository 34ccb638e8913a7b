"""Pallas TPU kernel for the illumination propagation scan (SURVEY §7 stage 4).

The reference propagates a directional light slice-by-slice with ~2×Z compute
dispatches per light (`LightingShaders.cpp:132-158`, `AddDirLightShader.usf:
68-128`). The XLA port (`lighting._propagate_one_face`) is one `lax.scan`,
but each of its Z iterations is tiny (a 2D shift + multiply on ~64K voxels)
while the carry round-trips HBM and the loop pays per-iteration dispatch —
scan overhead dominates the actual math.

This kernel runs the whole scan in ONE launch: the 2D transmittance carry
(`AddDirLightShader.usf:80-82`'s read buffer) lives in VMEM for the entire
propagation, opacity slices stream in and light slices stream out through
double-buffered async DMA, and the per-slice border-bilinear shift is four
dynamic `pltpu.roll`s + masks. Exactly matches the XLA scan (same carry
recurrence, same border semantics) — `tests/test_pallas_lighting.py` checks
equality against `lighting._propagate_one_face`'s scan on every face class.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _shift1d_border(x, off_int, frac, axis, border, n_real):
    """out[i] = x[i + off_int] (1-frac) + x[i + off_int + 1] frac, taps with
    true index outside [0, n_real) reading ``border``. Dynamic integer
    shift via pltpu.roll; masks use unwrapped indices."""
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)

    def tap(d):
        s = off_int + d
        rolled = pltpu.roll(x, -s, axis=axis)
        valid = ((idx + s) >= 0) & ((idx + s) < n_real)
        return jnp.where(valid, rolled, border)

    return tap(0) * (1.0 - frac) + tap(1) * frac


def _shift2d_border(x, offx, offy, border, h_real, w_real):
    ix = jnp.floor(offx)
    fx = offx - ix
    iy = jnp.floor(offy)
    fy = offy - iy
    out = _shift1d_border(x, ix.astype(jnp.int32), fx, 0, border, h_real)
    return _shift1d_border(out, iy.astype(jnp.int32), fy, 1, border, w_real)


def _scan_kernel(
    sc_ref,  # SMEM (1, 3): off_px, off_py, light_alpha
    op_hbm,  # ANY (K, Hp, Wp) occluder opacity, scan-ordered
    out_hbm,  # ANY (K, Hp, Wp) transmitted light slices
    carry,  # VMEM (Hp, Wp)
    inbuf,  # VMEM (2, Hp, Wp)
    outbuf,  # VMEM (2, Hp, Wp)
    insem,
    outsem,
    *,
    k_slices,
    h_real,
    w_real,
):
    offx = sc_ref[0, 0]
    offy = sc_ref[0, 1]
    alpha = sc_ref[0, 2]

    def copy_in(k, slot):
        return pltpu.make_async_copy(
            op_hbm.at[k], inbuf.at[slot], insem.at[slot]
        )

    def copy_out(k, slot):
        return pltpu.make_async_copy(
            outbuf.at[slot], out_hbm.at[k], outsem.at[slot]
        )

    carry[:] = jnp.full(carry.shape, alpha, jnp.float32)
    copy_in(0, 0).start()

    def body(k, _):
        slot = k % 2

        @pl.when(k + 1 < k_slices)
        def _():
            copy_in(k + 1, (k + 1) % 2).start()

        copy_in(k, slot).wait()
        prev = _shift2d_border(carry[:], offx, offy, alpha, h_real, w_real)
        cur = prev * (1.0 - inbuf[slot])

        @pl.when(k >= 2)
        def _():
            copy_out(k - 2, slot).wait()

        outbuf[slot] = cur
        copy_out(k, slot).start()
        carry[:] = cur
        return 0

    jax.lax.fori_loop(0, k_slices, body, 0)
    # Drain outstanding output DMAs (an un-waited DMA at kernel end faults).
    if k_slices >= 2:
        copy_out(k_slices - 2, (k_slices - 2) % 2).wait()
    copy_out(k_slices - 1, (k_slices - 1) % 2).wait()


@partial(jax.jit, static_argnames=("interpret",))
def propagate_face_scan_pallas(
    opacity_scan: jnp.ndarray,  # (K, H, W) scan-ordered occluder opacities
    off_px,
    off_py,
    light_alpha,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused propagation scan: drop-in for the `lax.scan` in
    `lighting._propagate_one_face` (slices stacked on the leading axis).

    ``cur_k = shift2d_border(cur_{k-1}, off, border=alpha) * (1 - op_k)``
    with ``cur_{-1} = alpha`` everywhere; returns all ``cur_k``.
    This raw entry has no VJP; use :func:`propagate_face_scan` for the
    differentiable wrapper (custom adjoint shift-scan).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    K, H, W = (int(d) for d in opacity_scan.shape)
    Hp, Wp = max(8, _ceil_to(H, 8)), max(128, _ceil_to(W, 128))
    op = jnp.pad(opacity_scan, ((0, 0), (0, Hp - H), (0, Wp - W)))
    sc = jnp.stack(
        [
            jnp.asarray(off_px, jnp.float32),
            jnp.asarray(off_py, jnp.float32),
            jnp.asarray(light_alpha, jnp.float32),
        ]
    ).reshape(1, 3)

    kernel = partial(
        _scan_kernel, k_slices=K, h_real=H, w_real=W
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, Hp, Wp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((Hp, Wp), jnp.float32),
            pltpu.VMEM((2, Hp, Wp), jnp.float32),
            pltpu.VMEM((2, Hp, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sc, op)
    return out[:, :H, :W]


# ---------------------------------------------------------------------------
# Custom VJP: the scan is a linear recurrence in (carry, border), so the
# adjoint is another shift-scan, run in reverse with the transposed shift.
#
#   c_k = S(c_{k-1}) * (1 - o_k),   S(x) = A x + alpha*b  (border-bilinear)
#
# With per-slice cotangents g_k and lam_k := dL/dc_k (total):
#   lam_k  = g_k + A^T[(1 - o_{k+1}) * lam_{k+1}]        (lam_{K-1} = g_{K-1})
#   dL/do_k     = -pre_k * lam_k,   pre_k = S(c_{k-1})   (recomputed exactly)
#   dL/dalpha   = <sum_k (1-o_k)*lam_k, B> + <(1-o_0)*lam_0, A@1>
# where B = S_{alpha=1}(0) is the border-contribution field and A^T is the
# shift by the NEGATED offset with ZERO border:
#   (A^T g)[j] = (1-f) g[j - i0] + f g[j - i0 - 1] = shift(g, -off, border=0).
# The offsets themselves are propagation geometry (host-planned) and are
# treated as non-differentiable (zero gradient).


def _propagate_scan_fwd(opacity_scan, off_px, off_py, light_alpha, interpret):
    y = _propagate_scan_prim(
        opacity_scan, off_px, off_py, light_alpha, interpret
    )
    return y, (opacity_scan, y, off_px, off_py, light_alpha)


def _propagate_scan_bwd(interpret, res, g):
    import jax.numpy as jnp

    from .lighting import shift_2d_bilinear_border

    op, y, off_px, off_py, alpha = res
    one_minus = 1.0 - op

    def shiftT(x):  # A^T: negated offset, zero border
        return shift_2d_bilinear_border(x, -off_px, -off_py, 0.0)

    def shiftS(x):  # S with the true border
        return shift_2d_bilinear_border(x, off_px, off_py, alpha)

    # reverse scan for lam_k, plus pre_k recomputation from saved outputs
    prev_c = jnp.concatenate(
        [jnp.full((1,) + op.shape[1:], 1.0, op.dtype) * alpha, y[:-1]], axis=0
    )

    def step(carry, inp):
        m_next = carry  # (1 - o_{k+1}) * lam_{k+1}
        g_k, om_k, c_prev = inp
        lam_k = g_k + shiftT(m_next)
        m_k = om_k * lam_k
        pre_k = shiftS(c_prev)
        do_k = -pre_k * lam_k
        return m_k, (do_k, m_k, lam_k)

    m_init = jnp.zeros(op.shape[1:], op.dtype)
    _, (do, m_all, lam_all) = jax.lax.scan(
        step, m_init, (g, one_minus, prev_c), reverse=True
    )

    border_field = shift_2d_bilinear_border(
        jnp.zeros(op.shape[1:], op.dtype), off_px, off_py, 1.0
    )
    a_ones = shift_2d_bilinear_border(
        jnp.ones(op.shape[1:], op.dtype), off_px, off_py, 0.0
    )
    dalpha = jnp.sum(jnp.sum(m_all, axis=0) * border_field)
    dalpha = dalpha + jnp.sum(m_all[0] * a_ones)
    zero = jnp.zeros_like(jnp.asarray(off_px, op.dtype))
    return (do, zero, zero, dalpha)


# Rebind: keep the raw kernel callable, wrap the public entry in custom_vjp.
_propagate_scan_prim = propagate_face_scan_pallas


@partial(jax.jit, static_argnames=("interpret",))
def propagate_face_scan(
    opacity_scan, off_px, off_py, light_alpha, interpret: bool | None = None
):
    """Differentiable fused propagation scan (custom VJP over the Pallas
    forward; adjoint reverse shift-scan in XLA). Offsets are
    non-differentiable geometry."""
    return _scan_vjp(opacity_scan, off_px, off_py, light_alpha, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _scan_vjp(opacity_scan, off_px, off_py, light_alpha, interpret):
    return _propagate_scan_prim(
        opacity_scan, off_px, off_py, light_alpha, interpret
    )


def _scan_vjp_fwd(opacity_scan, off_px, off_py, light_alpha, interpret):
    return _propagate_scan_fwd(
        opacity_scan, off_px, off_py, light_alpha, interpret
    )


_scan_vjp.defvjp(_scan_vjp_fwd, _propagate_scan_bwd)
