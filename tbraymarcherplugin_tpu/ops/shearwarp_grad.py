"""Hand-derived fused backward for the shear-warp composite (custom VJP).

Round 3 left the differentiable path on `jax.checkpoint`-blocked XLA autodiff
of `shearwarp_intermediate`; the traced breakdown (benchmarks/PERF_R3.md)
showed the checkpointed scan's *recompute* dominating the 2.67 s fwd+bwd
frame (`while.80` ~1.52 s). This module replaces that recompute with the
analytic VJP of front-to-back compositing, evaluated as one Pallas kernel:

Math (per pixel, planes k front-to-back, `a_k` the masked corrected alpha,
`P_k = g_rgb . (c_k * l_k)` the color cotangent inner product):

    rgb_out   = sum_k T_{k-1} a_k c_k l_k      with T_k = prod_{i<=k}(1-a_i)
    dL/da_k   = T_{k-1} * (P_k - U_k + g_alpha * V_k)
      U_k = sum_{j>k} [prod_{k<i<j}(1-a_i)] a_j P_j   (suffix, re-rooted at k)
      V_k = prod_{k<i<=K}(1-a_i)

U and V obey *division-free reverse recurrences* (U <- aP + (1-a)U,
V <- (1-a)V), so the backward is numerically stable even when a_k == 1.0
exactly (opaque TFs), where the textbook "un-compositing" identity
T_{k-1} = T_k/(1-a_k) blows up.

Kernel structure per (8, 128) pixel tile:
  sweep 1 (k ascending): recompute the alpha recurrence only (value -> TF
    alpha -> masks -> early-termination snap), storing T_{k-1} per plane in
    a VMEM scratch (`tsto`, Kp x 8 x 128 f32) — the forward's own ESS makes
    this exact because occupancy-skipped chunks provably produce zero alpha;
  sweep 2 (k descending): re-stream W/L, recompute the TF taps, and emit
    every cotangent in one pass: dW (value chain via TF slopes), dL, the
    dTF histogram (16x16 segment/offset decomposition: texel t = 16s + o
    factors the dense 256-row one-hot into two 16-row one-hots contracted
    on the MXU as (64,128)@(16,128)^T per row/tap — ~2.5x fewer VPU ops
    than the dense build, which measured 61% of this kernel), and
    d(center)/d(width) partials. Chunks behind the tile's termination
    depth or outside its geometric k-interval write zeros without being
    read.

Gradient semantics match XLA autodiff of `shearwarp_intermediate` (the
oracle in tests/test_shearwarp_grad.py): `where` masks and the 0.95
early-termination snap are treated as constants, exactly as lax does.

Reference: the function being differentiated is the TPU re-expression of
`WindowedRaymarchMaterials.usf:36-96` (BASELINE north star: "fwd AND
hand-derived bwd as fused Pallas kernels").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compositing import EARLY_TERMINATION_ALPHA
from .pallas_march import _pack_tf
from .shearwarp_pallas import (
    KB,
    _bounds_from_validity,
    _ceil_to,
    _clip_step_fields,
    _composite_kernel,
    _geo_chunk_validity,
    _pad_axis0,
    _plane_param_array,
    _scalar_row,
)


import os as _os
import sys as _sys

# Benchmark ablation knob (never set in library code). NOTE: read at trace
# time and NOT part of the jit cache key — set via env in a fresh process.
# Loud on purpose: with the histogram disabled, dTF gradients are ZERO.
_DISABLE_HIST = bool(int(_os.environ.get("TBR_DISABLE_HIST", "0")))
if _DISABLE_HIST:
    print(
        "WARNING: TBR_DISABLE_HIST is set — the shear-warp composite "
        "backward will emit ZERO dTF gradients (benchmark ablation only)",
        file=_sys.stderr,
    )


def _tf_taps(tfp, tf_pos):
    """Raw lerp taps for all 4 channels: (i0, i1, frac, [(c0, c1)] * 4)."""
    x = tf_pos * 256.0 - 0.5
    i0f = jnp.floor(x)
    frac = x - i0f
    i0 = jnp.clip(i0f, 0.0, 255.0).astype(jnp.int32)
    i1 = jnp.clip(i0f + 1.0, 0.0, 255.0).astype(jnp.int32)

    def chan(c, idx):
        li = idx & 127
        hi = idx >> 7
        r0 = jnp.take_along_axis(
            jnp.broadcast_to(tfp[2 * c:2 * c + 1, :], idx.shape), li, axis=1
        )
        r1 = jnp.take_along_axis(
            jnp.broadcast_to(tfp[2 * c + 1:2 * c + 2, :], idx.shape), li,
            axis=1
        )
        return jnp.where(hi == 0, r0, r1)

    taps = [(chan(c, i0), chan(c, i1)) for c in range(4)]
    return i0, i1, frac, taps


def _composite_bwd_kernel(
    bnd_ref,  # scalar-prefetch (n_tiles*2,) int32 geometric chunk lo/hi
    sc_ref,  # SMEM (1, 8): center,width,lowc,highc,e0,ET,D1,D2
    pa_ref,  # SMEM (5, Kp): a1,b1,a2,b2,lam
    tf_ref,  # VMEM (8, 128) packed TF
    e1_ref,  # VMEM (8, 128) clip-plane field tile
    sw_ref,  # VMEM (8, 128) step_world tile
    g_ref,  # VMEM (4, 8, 128) output-cotangent tile
    w_hbm,  # ANY (Kp, n1, n2)
    l_hbm,  # ANY (Kp, n1, n2)
    dw_hbm,  # ANY out (Kp, n1, n2) f32
    dl_hbm,  # ANY out (Kp, n1, n2) f32
    acc_ref,  # VMEM out (272, 128): rows 0-255 dTF, 256-263 dc, 264-271 dw
    wbuf,  # VMEM (2, KB, 8, 128) compute dtype
    lbuf,
    dwbuf,  # VMEM (KB, 8, 128) f32
    dlbuf,
    tsto,  # VMEM (Kp, 8, 128) f32: T_{k-1} per plane
    wsem,
    lsem,
    dwsem,
    dlsem,
    *,
    n_chunks,
    k_real,
    early_termination,
):
    i0_ = pl.program_id(0) * 8
    j0_ = pl.program_id(1) * 128
    tile = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    c_lo = bnd_ref[2 * tile]
    c_hi = bnd_ref[2 * tile + 1]
    center = sc_ref[0, 0]
    width = sc_ref[0, 1]
    low_c = sc_ref[0, 2]
    high_c = sc_ref[0, 3]
    e0 = sc_ref[0, 4]
    d1f = sc_ref[0, 6]
    d2f = sc_ref[0, 7]

    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)
    gi = row + i0_
    gj = col + j0_
    e1 = e1_ref[:]
    sw = sw_ref[:]
    tfp = tf_ref[:]

    @pl.when(tile == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def copy_in(buf, hbm, sem, c, slot):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(c * KB, KB), pl.ds(i0_, 8), pl.ds(j0_, 128)],
            buf.at[slot],
            sem.at[slot],
        )

    def copy_out(buf, hbm, sem, c):
        return pltpu.make_async_copy(
            buf, hbm.at[pl.ds(c * KB, KB), pl.ds(i0_, 8), pl.ds(j0_, 128)],
            sem,
        )

    def plane_mask(k):
        a1k = pa_ref[0, k]
        b1k = pa_ref[1, k]
        a2k = pa_ref[2, k]
        b2k = pa_ref[3, k]
        lamk = pa_ref[4, k]
        v1 = a1k + b1k * gi
        v2 = a2k + b2k * gj
        return (
            (v1 >= -0.5) & (v1 <= d1f - 0.5)
            & (v2 >= -0.5) & (v2 <= d2f - 0.5)
            & ((e0 + lamk * e1) > 0.0)
            & (k < k_real)
        )

    # ---- sweep 1 (ascending): alpha recurrence only; store T_{k-1} ----
    @pl.when(c_lo < c_hi)
    def _():
        copy_in(wbuf, w_hbm, wsem, c_lo, c_lo % 2).start()

    def s1_body(state):
        c, alpha, term_f = state
        slot = c % 2

        @pl.when(c + 1 < c_hi)
        def _():
            copy_in(wbuf, w_hbm, wsem, c + 1, (c + 1) % 2).start()

        copy_in(wbuf, w_hbm, wsem, c, slot).wait()

        def k_body(kk, st):
            alpha, term_f = st
            k = c * KB + kk
            tsto[k] = 1.0 - alpha
            term = term_f > 0.5
            m = plane_mask(k) & ~term
            value = wbuf[slot, kk].astype(jnp.float32)
            tf_pos = (value - center + width * 0.5) / width
            cut = ((tf_pos < 0.0) & (low_c > 0.0)) | (
                (tf_pos > 1.0) & (high_c > 0.0)
            )
            x = tf_pos * 256.0 - 0.5
            i0f = jnp.floor(x)
            frac = x - i0f
            ia = jnp.clip(i0f, 0.0, 255.0).astype(jnp.int32)
            ib = jnp.clip(i0f + 1.0, 0.0, 255.0).astype(jnp.int32)

            def chan_a(idx):
                li = idx & 127
                hi = idx >> 7
                r0 = jnp.take_along_axis(
                    jnp.broadcast_to(tfp[6:7, :], idx.shape), li, axis=1
                )
                r1 = jnp.take_along_axis(
                    jnp.broadcast_to(tfp[7:8, :], idx.shape), li, axis=1
                )
                return jnp.where(hi == 0, r0, r1)

            a0 = chan_a(ia)
            a1t = chan_a(ib)
            ca = jnp.clip(a0 + (a1t - a0) * frac, 0.0, 1.0)
            ca = 1.0 - jnp.exp(
                sw * jnp.log(jnp.maximum(1.0 - ca, 1e-10))
            )
            a = jnp.where(m & ~cut, ca, 0.0)
            w_ = (1.0 - alpha) * a
            alpha_new = alpha + w_
            crossed = (a > 0.0) & (alpha_new > early_termination)
            alpha = jnp.where(crossed, 1.0, alpha_new)
            term_f = jnp.maximum(term_f, crossed.astype(jnp.float32))
            return alpha, term_f

        alpha, term_f = jax.lax.fori_loop(0, KB, k_body, (alpha, term_f),
                                          unroll=KB)
        return c + 1, alpha, term_f

    def s1_cond(state):
        c, _, term_f = state
        return (c < c_hi) & (jnp.min(term_f) < 0.5)

    zero = jnp.zeros((8, 128), jnp.float32)
    c_end, _, term_f = jax.lax.while_loop(
        s1_cond, s1_body, (c_lo, zero, zero)
    )

    @pl.when(c_end < c_hi)  # drain the prefetched chunk on early exit
    def _():
        copy_in(wbuf, w_hbm, wsem, c_end, c_end % 2).wait()

    # ---- sweep 2 (descending): emit every cotangent ----
    g0 = g_ref[0]
    g1 = g_ref[1]
    g2 = g_ref[2]
    galpha = g_ref[3] * (1.0 - term_f)  # alpha_out snaps to 1 when crossed

    # zero-write chunks the compute loop will not touch: [0, c_lo) and
    # [c_end, n_chunks) — terminated / out-of-geometry planes have exactly
    # zero cotangents (T == 0 or every gate false).
    dwbuf[:] = jnp.zeros_like(dwbuf)
    dlbuf[:] = jnp.zeros_like(dlbuf)

    def zero_chunk(c, _):
        copy_out(dwbuf, dw_hbm, dwsem, c).start()
        copy_out(dlbuf, dl_hbm, dlsem, c).start()
        copy_out(dwbuf, dw_hbm, dwsem, c).wait()
        copy_out(dlbuf, dl_hbm, dlsem, c).wait()
        return 0

    jax.lax.fori_loop(c_end, n_chunks, zero_chunk, 0)
    jax.lax.fori_loop(0, c_lo, zero_chunk, 0)

    @pl.when(c_lo < c_end)
    def _():
        copy_in(wbuf, w_hbm, wsem, c_end - 1, (c_end - 1) % 2).start()
        copy_in(lbuf, l_hbm, lsem, c_end - 1, (c_end - 1) % 2).start()

    def s2_body(ci, carry):
        U, V, hist, accdc, accdw = carry
        c = c_end - 1 - ci
        slot = c % 2

        @pl.when(c - 1 >= c_lo)
        def _():
            copy_in(wbuf, w_hbm, wsem, c - 1, (c - 1) % 2).start()
            copy_in(lbuf, l_hbm, lsem, c - 1, (c - 1) % 2).start()

        copy_in(wbuf, w_hbm, wsem, c, slot).wait()
        copy_in(lbuf, l_hbm, lsem, c, slot).wait()

        def k_body(kk, st):
            U, V, hist, accdc, accdw = st
            kr = KB - 1 - kk
            k = c * KB + kr
            Tk = tsto[k]
            m = plane_mask(k)
            value = wbuf[slot, kr].astype(jnp.float32)
            light = lbuf[slot, kr].astype(jnp.float32)
            tf_pos = (value - center + width * 0.5) / width
            cut = ((tf_pos < 0.0) & (low_c > 0.0)) | (
                (tf_pos > 1.0) & (high_c > 0.0)
            )
            ia, ib, frac, taps = _tf_taps(tfp, tf_pos)
            (c0r, c1r), (c0g, c1g), (c0b, c1b), (a0, a1t) = taps
            cr = c0r + (c1r - c0r) * frac
            cg = c0g + (c1g - c0g) * frac
            cb = c0b + (c1b - c0b) * frac
            a_raw = a0 + (a1t - a0) * frac
            # XLA's clip uses the symmetric 0.5 subgradient at exact ties —
            # and ties are COMMON here (TF alpha plateaus at exactly 0/1
            # interpolate to exact boundary values), not measure-zero.
            clipmask = jnp.where(
                (a_raw > 0.0) & (a_raw < 1.0), 1.0,
                jnp.where((a_raw == 0.0) | (a_raw == 1.0), 0.5, 0.0),
            )
            a_clip = jnp.clip(a_raw, 0.0, 1.0)
            base = jnp.maximum(1.0 - a_clip, 1e-10)
            basemask = ((1.0 - a_clip) >= 1e-10).astype(jnp.float32)
            logb = jnp.log(base)
            corr = 1.0 - jnp.exp(sw * logb)
            dcorr = sw * jnp.exp((sw - 1.0) * logb) * basemask
            alive = Tk > 0.0
            gate = m & ~cut & alive
            gatef = jnp.where(gate, 1.0, 0.0)
            a_eff = gatef * corr
            gl = g0 * cr + g1 * cg + g2 * cb
            P = gl * light
            da = Tk * (P - U + galpha * V)
            w_ = Tk * a_eff
            ger = g0 * w_ * light
            geg = g1 * w_ * light
            geb = g2 * w_ * light
            ga = da * gatef * dcorr * clipmask
            gx = (
                ger * (c1r - c0r) + geg * (c1g - c0g) + geb * (c1b - c0b)
                + ga * (a1t - a0)
            )
            dwbuf[kr] = gx * (256.0 / width)
            dlbuf[kr] = w_ * gl
            accdc = accdc + gx * (-256.0 / width)
            accdw = accdw + gx * (256.0 * (0.5 - tf_pos) / width)

            # dTF histogram via the 16x16 segment/offset decomposition:
            # texel t = 16*s + o, so the dense 256-row one-hot factors into
            # two 16-row one-hots and H[c,s,o] = sum_q S[s,q] w_c[q] O[o,q]
            # (lane-lane contraction = transposed MXU matmul). Round 5
            # merges the TWO lerp taps into ONE pass over `ia`: tap ib is
            # ia+1 wherever the lerp is unclamped, so its contribution is a
            # second weight set H2 histogrammed at ia and shifted +1 texel
            # OUTSIDE the kernel (`_vjp_bwd` reassembly); at the clamp
            # edges (i0f < 0 or >= 255) both taps coincide, so the whole
            # weight goes into H1 and H2 gets zero. Halves the one-hot
            # builds and fuses the two (64,128) dots into one (128,128)
            # dot per row (PERF_R4 ablation: the dense hist was 61% of
            # this kernel; the two-tap 16x16 version still measured 92 of
            # 141 ms in round 5). Skipped when every weight in the
            # plane-tile is zero (terminated / masked / empty planes).
            # Every histogram weight is proportional to gate * T, so one
            # mul+max decides skippability (the earlier 4-reduction wmax
            # spent ~10 ms/frame on the guard itself, and removing the
            # guard entirely measured 116 -> 212 ms — ET leaves most
            # plane-tiles zero-weight, the skip is the win).
            wnz = jnp.max(gatef * Tk)

            def do_hist(h):
                # 4x64 split (texel t = 64*s + o): the build cost of the
                # factored one-hots scales as ~17*s + 256/s VPU rows per
                # sample row, minimized near s=4 (~132 vs ~288 at the
                # original 16x16) — the hist is build-bound, not MXU-bound
                # (bf16 dot inputs measured neutral).
                iota4 = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0)
                iota64 = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
                i0f_ = tf_pos * 256.0 - 0.5
                in_rng = (i0f_ >= 0.0) & (i0f_ < 255.0)
                wa = jnp.where(in_rng, 1.0 - frac, 1.0)
                wb = jnp.where(in_rng, frac, 0.0)
                s_idx = ia >> 6
                o_idx = ia & 63
                wts = (
                    ger * wa, geg * wa, geb * wa, ga * wa,
                    ger * wb, geg * wb, geb * wb, ga * wb,
                )

                def row_of(arr, r):
                    return pltpu.roll(arr, -r, axis=0)[0:1, :]

                def build_LO(r):
                    s_r = jnp.broadcast_to(row_of(s_idx, r), (4, 128))
                    o_r = jnp.broadcast_to(row_of(o_idx, r), (64, 128))
                    S = jnp.where(iota4 == s_r, 1.0, 0.0)
                    O = jnp.where(iota64 == o_r, 1.0, 0.0)
                    L = jnp.concatenate([
                        S * jnp.broadcast_to(row_of(w, r), (4, 128))
                        for w in wts
                    ], axis=0)  # (32, 128): [set(2) x chan(4) x seg(4)]
                    return L, O

                def hist_row2(i, acc):
                    # Two rows per MXU issue, block-diagonal: stack rows 2i
                    # and 2i+1 and discard the cross blocks the MXU
                    # computes free. Dot inputs stay f32 — bf16 inputs
                    # measured neutral for speed, so casting the gradient
                    # weights would only round them.
                    La, Oa = build_LO(2 * i)
                    Lb, Ob = build_LO(2 * i + 1)
                    L2 = jnp.concatenate([La, Lb], axis=0)  # (64, 128)
                    O2 = jnp.concatenate([Oa, Ob], axis=0)  # (128, 128)
                    part = jax.lax.dot_general(
                        L2, O2,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (64, 128): diagonal blocks are the two row-hists
                    return acc + part[0:32, 0:64] + part[32:64, 64:128]

                # NOTE: do NOT unroll this row loop — any unroll of a loop
                # nested inside the already-unrolled k body crashes Mosaic
                # (padding_cst assert; reproduced in round 5 at both 8 and
                # 4 iterations).
                return jax.lax.fori_loop(0, 4, hist_row2, h)

            if not _DISABLE_HIST:  # ablation knob (benchmarks only)
                hist = jax.lax.cond(wnz > 0.0, do_hist, lambda h: h, hist)

            U = a_eff * P + (1.0 - a_eff) * U
            V = (1.0 - a_eff) * V
            return U, V, hist, accdc, accdw

        carry = jax.lax.fori_loop(0, KB, k_body, (U, V, hist, accdc, accdw),
                                  unroll=KB)
        copy_out(dwbuf, dw_hbm, dwsem, c).start()
        copy_out(dlbuf, dl_hbm, dlsem, c).start()
        copy_out(dwbuf, dw_hbm, dwsem, c).wait()
        copy_out(dlbuf, dl_hbm, dlsem, c).wait()
        return carry

    init = (
        zero, jnp.ones((8, 128), jnp.float32),
        jnp.zeros((32, 64), jnp.float32), zero, zero,
    )
    _, _, hist, accdc, accdw = jax.lax.fori_loop(
        0, c_end - c_lo, s2_body, init
    )
    acc_ref[0:32, 0:64] = acc_ref[0:32, 0:64] + hist
    acc_ref[256:264, :] = acc_ref[256:264, :] + accdc
    acc_ref[264:272, :] = acc_ref[264:272, :] + accdw


# ---------------------------------------------------------------------------
# custom_vjp wrapper around the fused composite
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_composite(cfg, W, L, tf_table, windowing_vec4, step_world, e1,
                    e0, pa, occ, bounds_fwd, bounds_geo):
    """Differentiable fused shear-warp composite over pre-sheared fields.

    ``cfg = (n1, n2, K, Kp, early_termination, interpret)`` (static).
    Forward = `shearwarp_pallas._composite_kernel` (ESS + per-tile ET);
    backward = `_composite_bwd_kernel` (see module docstring). Cotangents
    flow to W, L, tf_table and windowing_vec4 only — the remaining inputs
    are plan geometry.
    """
    return _fwd_impl(cfg, W, L, tf_table, windowing_vec4, step_world, e1,
                     e0, pa, occ, bounds_fwd)


def _fwd_impl(cfg, W, L, tf_table, windowing_vec4, step_world, e1, e0, pa,
              occ, bounds_fwd):
    n1, n2, K, Kp, early_termination, interpret, D1, D2 = cfg[:8]
    chw = len(cfg) > 8 and cfg[8] == "chw"
    nch = Kp // KB
    sc = _scalar_row(windowing_vec4, e0, early_termination, D1, D2)
    tfp = _pack_tf(tf_table)
    kernel = partial(
        _composite_kernel,
        n_chunks=nch,
        k_real=K,
        early_termination=early_termination,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n1 // 8, n2 // 128),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j, occ, bnd: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j, occ, bnd: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 8, 128), lambda i, j, occ, bnd: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (4, 8, 128), lambda i, j, occ, bnd: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, KB, 8, 128), W.dtype),
            pltpu.VMEM((2, KB, 8, 128), L.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    jd = jnp.zeros((2, n1, n2), jnp.float32)  # no jitter/depth in the
    # differentiable path (plan geometry; forward-only features)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, n1, n2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(occ, bounds_fwd, sc, pa, tfp, e1, step_world, jd, W, L)
    if chw:
        return out  # raw (4, n1, n2); adjoint takes the cotangent as-is
    return jnp.transpose(out, (1, 2, 0))


def _vjp_fwd(cfg, W, L, tf_table, windowing_vec4, step_world, e1, e0, pa,
             occ, bounds_fwd, bounds_geo):
    out = _fwd_impl(cfg, W, L, tf_table, windowing_vec4, step_world, e1,
                    e0, pa, occ, bounds_fwd)
    res = (W, L, tf_table, windowing_vec4, step_world, e1, e0, pa,
           bounds_geo)
    return out, res


def _vjp_bwd(cfg, res, g):
    n1, n2, K, Kp, early_termination, interpret, D1, D2 = cfg[:8]
    chw = len(cfg) > 8 and cfg[8] == "chw"
    W, L, tf_table, windowing_vec4, step_world, e1, e0, pa, bounds_geo = res
    nch = Kp // KB
    sc = _scalar_row(windowing_vec4, e0, early_termination, D1, D2)
    tfp = _pack_tf(tf_table)
    gt = (g if chw else jnp.transpose(g, (2, 0, 1))).astype(jnp.float32)
    kernel = partial(
        _composite_bwd_kernel,
        n_chunks=nch,
        k_real=K,
        early_termination=early_termination,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n1 // 8, n2 // 128),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j, bnd: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j, bnd: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 8, 128), lambda i, j, bnd: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((272, 128), lambda i, j, bnd: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, KB, 8, 128), W.dtype),
            pltpu.VMEM((2, KB, 8, 128), L.dtype),
            pltpu.VMEM((KB, 8, 128), jnp.float32),
            pltpu.VMEM((KB, 8, 128), jnp.float32),
            pltpu.VMEM((Kp, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dW, dL, acc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Kp, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((Kp, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((272, 128), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bounds_geo, sc, pa, tfp, e1, step_world, gt, W, L)
    # Reassemble the (32,64) [set*16 + c*4 + s, o] layout back to (256,4):
    # set 0 is the floor-tap histogram at texel ia; set 1 is the frac-tap
    # weight histogrammed at ia in-kernel, which belongs one texel HIGHER
    # (ib = ia + 1 wherever the lerp is unclamped; clamp-edge weights were
    # folded entirely into set 0).
    def unpack(block):
        return jnp.transpose(
            block.reshape(4, 4, 64), (1, 2, 0)
        ).reshape(256, 4)

    h1 = unpack(acc[0:16, 0:64])
    h2 = unpack(acc[16:32, 0:64])
    dtf = (h1 + jnp.concatenate([jnp.zeros((1, 4), h2.dtype), h2[:-1]])
           ).astype(tf_table.dtype)
    dwin = jnp.stack([
        jnp.sum(acc[256:264, :]),
        jnp.sum(acc[264:272, :]),
        jnp.float32(0.0),
        jnp.float32(0.0),
    ]).astype(jnp.asarray(windowing_vec4).dtype)

    # Zero cotangents for the non-differentiated geometry inputs; integer
    # arrays (occ, chunk bounds) take float0 tangents per JAX convention.
    import numpy as _np

    f0 = jax.dtypes.float0
    return (
        dW.astype(W.dtype), dL.astype(L.dtype), dtf, dwin,
        jnp.zeros_like(step_world), jnp.zeros_like(e1),
        jnp.zeros_like(e0), jnp.zeros_like(pa),
        _np.zeros((nch,), f0),              # occ
        _np.zeros(bounds_geo.shape, f0),    # bounds_fwd
        _np.zeros(bounds_geo.shape, f0),    # bounds_geo
    )


fused_composite.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Differentiable end-to-end wrapper (pre-shear + composite)
# ---------------------------------------------------------------------------


def _onehot_rows(idx, depth):
    """(K,) int32 -> (K, depth) one-hot f32 selection matrix."""
    return (idx[:, None] == jnp.arange(depth)[None, :]).astype(jnp.float32)


@partial(
    jax.jit,
    static_argnames=("early_termination", "compute_dtype", "interpret",
                     "out_layout"),
)
def shearwarp_intermediate_fused_diff(
    volume: jnp.ndarray,
    tf_table: jnp.ndarray,
    light_volume: jnp.ndarray,
    plan,
    windowing_vec4: jnp.ndarray,
    clip_center,
    clip_direction,
    early_termination: float = EARLY_TERMINATION_ALPHA,
    compute_dtype=jnp.float32,
    interpret: bool | None = None,
    out_layout: str = "hwc",
) -> jnp.ndarray:
    """Differentiable fused shear-warp composite -> (n1, n2, 4).

    ``out_layout="chw"`` keeps the kernel's raw (4, n1, n2) layout (and its
    adjoint consumes the cotangent in the same layout) — pairs with
    `warp_to_screen_fused(channel_major=True)` to drop a full-image
    relayout from BOTH the forward and the backward.

    Same algorithm/output as `shearwarp_intermediate_fused`; gradients flow
    to volume, tf_table, windowing and light_volume through the custom-VJP
    Pallas pair. Plane selection uses one-hot matmuls (adjoint = transposed
    matmul on the MXU) instead of `jnp.take` (whose XLA adjoint is a
    scalarized scatter on this chip).
    """
    from . import shearwarp as SW

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n1, n2, K = plan.n1, plan.n2, plan.k
    assert n1 % 8 == 0 and n2 % 128 == 0, (n1, n2)
    Kp = _ceil_to(K, KB)
    nch = Kp // KB

    ax = (plan.axis,) + plan.axes12
    # Fold the slab transpose into the einsum subscripts: materializing
    # transpose(volume, ax) was a 64 MB relayout per field per frame
    # (plus its adjoint in the backward); the contraction handles the
    # layout inside the matmul lowering instead.
    sub = ["", "", ""]
    sub[plan.axis] = "d"
    sub[plan.axes12[0]] = "a"
    sub[plan.axes12[1]] = "b"
    spec = f"kd,{''.join(sub)}->kab"

    # Pad the plane SELECTION (K -> Kp zero rows) and the affine coeffs
    # (edge values) so the resample emits the chunk-padded streams
    # directly — padding W/L afterwards copied two full ~0.5 GB arrays
    # (~1.5 ms each, plus their adjoint slices). Pad planes are exactly
    # zero (selection is linear) and the kernels mask k < k_real anyway.
    Kpad = Kp - K

    def pad_sel(m):
        if not Kpad:
            return m
        return jnp.concatenate(
            [m, jnp.zeros((Kpad, m.shape[1]), m.dtype)]
        )

    def pad_coef(x):
        x = jnp.asarray(x, jnp.float32)
        if not Kpad:
            return x
        return jnp.concatenate([x, jnp.broadcast_to(x[-1:], (Kpad,))])

    Pv = _onehot_rows(plan.m_src, volume.shape[plan.axis])  # (K, D)
    if plan.mfrac is not None:
        Pv = (
            Pv * (1.0 - plan.mfrac[:, None])
            + _onehot_rows(plan.msrc_hi, volume.shape[plan.axis])
            * plan.mfrac[:, None]
        )
    vplanes = jnp.einsum(
        spec, pad_sel(Pv), volume, preferred_element_type=jnp.float32
    )
    LD = light_volume.shape[plan.axis]
    lm0_hi = jnp.minimum(plan.lm0 + 1, LD - 1)
    Sel = (
        _onehot_rows(plan.lm0, LD) * (1.0 - plan.lmt[:, None])
        + _onehot_rows(lm0_hi, LD) * plan.lmt[:, None]
    )
    lplanes = jnp.einsum(
        spec, pad_sel(Sel), light_volume, preferred_element_type=jnp.float32
    )

    W = SW._resample_block(
        vplanes, pad_coef(plan.a1), pad_coef(plan.b1), pad_coef(plan.a2),
        pad_coef(plan.b2), n1, n2, compute_dtype
    ).astype(compute_dtype)
    L = SW._resample_block(
        lplanes, pad_coef(plan.la1), pad_coef(plan.lb1), pad_coef(plan.la2),
        pad_coef(plan.lb2), n1, n2, compute_dtype
    ).astype(compute_dtype)

    # non-differentiable aux (ESS occupancy + chunk bounds + geometry) —
    # occupancy from the REAL K planes only (the zero pad planes would
    # otherwise pull every tail-chunk interval down to 0).
    from .transfer import windowed_tf_range_occupied

    vp = jax.lax.stop_gradient(vplanes)[:K]
    sl_mn = _pad_axis0(jnp.min(vp, axis=(1, 2)), Kp, value=jnp.inf)
    sl_mx = _pad_axis0(jnp.max(vp, axis=(1, 2)), Kp, value=-jnp.inf)
    occ = windowed_tf_range_occupied(
        jnp.min(sl_mn.reshape(nch, KB), axis=1),
        jnp.max(sl_mx.reshape(nch, KB), axis=1),
        jax.lax.stop_gradient(windowing_vec4),
        jax.lax.stop_gradient(tf_table),
    ).astype(jnp.int32)
    D1 = volume.shape[plan.axes12[0]]
    D2 = volume.shape[plan.axes12[1]]
    cvalid = _geo_chunk_validity(plan, D1, D2, Kp, KB)
    bounds_geo = _bounds_from_validity(cvalid)
    bounds_fwd = _bounds_from_validity(cvalid & (occ[None, None, :] != 0))
    step_world, e0, e1 = _clip_step_fields(plan, clip_center, clip_direction)
    pa = _plane_param_array(plan, Kp)

    cfg = (n1, n2, K, Kp, float(early_termination), bool(interpret),
           float(D1), float(D2), out_layout)
    return fused_composite(
        cfg, W, L, tf_table, jnp.asarray(windowing_vec4, jnp.float32),
        step_world, e1, e0, pa, occ, bounds_fwd, bounds_geo,
    )
