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


def _scan_bwd_kernel(
    sc_ref,  # SMEM (1, 3): off_px, off_py, light_alpha
    g_hbm,  # ANY (K, Hp, Wp) per-slice output cotangents
    op_hbm,  # ANY (K, Hp, Wp) occluder opacities
    y_hbm,  # ANY (K, Hp, Wp) forward outputs
    do_hbm,  # ANY out (K, Hp, Wp) d/d(opacity)
    ms_ref,  # VMEM out (2, Hp, Wp): [sum_k m_k, m_0]
    mcarry,  # VMEM (Hp, Wp) running m_k
    msum,  # VMEM (Hp, Wp)
    gbuf,  # VMEM (2, Hp, Wp)
    obuf,
    ybuf,
    dobuf,
    gsem,
    osem,
    ysem,
    dosem,
    *,
    k_slices,
    h_real,
    w_real,
):
    """Reverse shift-scan adjoint of `_scan_kernel`, fused like the forward.

    Round-5 trace: the XLA `lax.scan` adjoint cost ~15 ms/face at 256^3
    (256 while-loop iterations of tiny (256,256) slice work — pure loop
    overhead); this kernel is the same double-buffered VMEM-carry structure
    as the forward, one launch per face.
    """
    offx = sc_ref[0, 0]
    offy = sc_ref[0, 1]
    alpha = sc_ref[0, 2]

    def cin(hbm, buf, sem, k, slot):
        return pltpu.make_async_copy(hbm.at[k], buf.at[slot], sem.at[slot])

    def cout(k, slot):
        return pltpu.make_async_copy(dobuf.at[slot], do_hbm.at[k], dosem.at[slot])

    def sched_in(k, slot):
        # inputs for processing slice k: g[k], op[k], y[k-1] (k=0: border)
        cin(g_hbm, gbuf, gsem, k, slot).start()
        cin(op_hbm, obuf, osem, k, slot).start()

        @pl.when(k > 0)
        def _():
            cin(y_hbm, ybuf, ysem, k - 1, slot).start()

    def wait_in(k, slot):
        cin(g_hbm, gbuf, gsem, k, slot).wait()
        cin(op_hbm, obuf, osem, k, slot).wait()

        @pl.when(k > 0)
        def _():
            cin(y_hbm, ybuf, ysem, k - 1, slot).wait()

        @pl.when(k == 0)
        def _():
            ybuf[slot] = jnp.full(ybuf.shape[1:], alpha, jnp.float32)

    mcarry[:] = jnp.zeros(mcarry.shape, jnp.float32)
    msum[:] = jnp.zeros(msum.shape, jnp.float32)
    sched_in(k_slices - 1, (k_slices - 1) % 2)

    def body(ki, _):
        k = k_slices - 1 - ki
        slot = k % 2

        @pl.when(k - 1 >= 0)
        def _():
            sched_in(k - 1, (k - 1) % 2)

        wait_in(k, slot)
        lam = gbuf[slot] + _shift2d_border(
            mcarry[:], -offx, -offy, 0.0, h_real, w_real
        )
        m = (1.0 - obuf[slot]) * lam
        pre = _shift2d_border(ybuf[slot], offx, offy, alpha, h_real, w_real)

        @pl.when(ki >= 2)
        def _():
            cout(k + 2, slot).wait()

        dobuf[slot] = -pre * lam
        cout(k, slot).start()
        mcarry[:] = m
        msum[:] = msum[:] + m
        return 0

    jax.lax.fori_loop(0, k_slices, body, 0)
    if k_slices >= 2:
        cout(1, 1 % 2).wait()
    cout(0, 0).wait()
    ms_ref[0] = msum[:]
    ms_ref[1] = mcarry[:]


def _scan_bwd_pallas(g, op, y, off_px, off_py, light_alpha, interpret):
    K, H, W = (int(d) for d in op.shape)
    Hp, Wp = max(8, _ceil_to(H, 8)), max(128, _ceil_to(W, 128))

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W)))

    sc = jnp.stack([
        jnp.asarray(off_px, jnp.float32),
        jnp.asarray(off_py, jnp.float32),
        jnp.asarray(light_alpha, jnp.float32),
    ]).reshape(1, 3)
    kernel = partial(_scan_bwd_kernel, k_slices=K, h_real=H, w_real=W)
    do, ms = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K, Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((2, Hp, Wp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hp, Wp), jnp.float32),
            pltpu.VMEM((Hp, Wp), jnp.float32),
            pltpu.VMEM((2, Hp, Wp), jnp.float32),
            pltpu.VMEM((2, Hp, Wp), jnp.float32),
            pltpu.VMEM((2, Hp, Wp), jnp.float32),
            pltpu.VMEM((2, Hp, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(sc, pad(jnp.asarray(g, jnp.float32)), pad(op), pad(y))
    return do[:, :H, :W], ms[0, :H, :W], ms[1, :H, :W]


def _propagate_scan_fwd(opacity_scan, off_px, off_py, light_alpha, interpret):
    y = _propagate_scan_prim(
        opacity_scan, off_px, off_py, light_alpha, interpret
    )
    return y, (opacity_scan, y, off_px, off_py, light_alpha)


def _propagate_scan_bwd(interpret, res, g):
    import jax.numpy as jnp

    from .lighting import shift_2d_bilinear_border

    op, y, off_px, off_py, alpha = res
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # Fused reverse shift-scan kernel (round 5): the XLA `lax.scan` adjoint
    # here measured ~15 ms/face at 256^3, all while-loop overhead.
    do, m_sum, m0 = _scan_bwd_pallas(
        g, op, y, off_px, off_py, alpha, interpret
    )

    border_field = shift_2d_bilinear_border(
        jnp.zeros(op.shape[1:], op.dtype), off_px, off_py, 1.0
    )
    a_ones = shift_2d_bilinear_border(
        jnp.ones(op.shape[1:], op.dtype), off_px, off_py, 0.0
    )
    dalpha = jnp.sum(m_sum * border_field) + jnp.sum(m0 * a_ones)
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
