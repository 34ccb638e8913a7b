"""Elementwise windowed-TF-alpha Pallas kernel.

`occluder_opacity_volume` evaluates the windowed TF alpha for every light
voxel; XLA's ~90M elem/s scalarized table gathers made that the illumination
rebuild's dominant cost (~130 ms at 256^3). This kernel does the 256-texel
alpha lookup with packed lane shuffles (`pallas_march._sample_tf_packed`'s
channel-3 path) — a few vector ops per 1024 voxels.

Matches `sample_windowed_transfer_function(...)[..., 3]` exactly (same
cutoff semantics, same clamp, same step-size correction).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_march import _pack_tf


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _alpha_kernel(sc_ref, tf_ref, val_ref, step_ref, out_ref):
    center = sc_ref[0, 0]
    width = sc_ref[0, 1]
    low_c = sc_ref[0, 2]
    high_c = sc_ref[0, 3]
    step = step_ref[:]

    v = val_ref[:]
    tf_pos = (v - center + width * 0.5) / width
    cut = ((tf_pos < 0.0) & (low_c > 0.0)) | ((tf_pos > 1.0) & (high_c > 0.0))

    x = tf_pos * 256.0 - 0.5
    i0f = jnp.floor(x)
    frac = x - i0f
    i0 = jnp.clip(i0f, 0.0, 255.0).astype(jnp.int32)
    i1 = jnp.clip(i0f + 1.0, 0.0, 255.0).astype(jnp.int32)
    tfp = tf_ref[:]

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

    a0 = chan_a(i0)
    a1 = chan_a(i1)
    alpha = jnp.clip(a0 + (a1 - a0) * frac, 0.0, 1.0)
    alpha = 1.0 - jnp.exp(step * jnp.log(jnp.maximum(1.0 - alpha, 1e-10)))
    out_ref[:] = jnp.where(cut, 0.0, alpha)


@partial(jax.jit, static_argnames=("interpret",))
def windowed_tf_alpha(
    values: jnp.ndarray,
    tf_table: jnp.ndarray,
    windowing_vec4: jnp.ndarray,
    step_size,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Step-corrected windowed TF alpha per element (any shape).

    Drop-in for ``sample_windowed_transfer_function(values, step_size,
    tf_table, windowing_vec4)[..., 3]``; ``step_size`` is a scalar or any
    array broadcastable to ``values``. Forward-only (the differentiable
    variant is :func:`windowed_tf_alpha_vjp`).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = values.shape
    n = 1
    for d in shape:
        n *= int(d)
    # 512-row blocks: tiny (8,128) programs made per-program overhead the
    # dominant cost at 16M voxels (~16K grid steps).
    BR = 512
    rows = _ceil_to(max(n, 1), BR * 128) // 128
    flat = jnp.pad(values.reshape(-1), (0, rows * 128 - n)).reshape(rows, 128)
    step_b = jnp.broadcast_to(
        jnp.asarray(step_size, jnp.float32), shape
    ).reshape(-1)
    stepf = jnp.pad(step_b, (0, rows * 128 - n)).reshape(rows, 128)
    win = jnp.asarray(windowing_vec4, jnp.float32)
    sc = jnp.stack([win[0], win[1], win[2], win[3]]).reshape(1, 4)
    out = pl.pallas_call(
        _alpha_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        grid=(rows // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sc, _pack_tf(tf_table), flat, stepf)
    return out.reshape(-1)[:n].reshape(shape)


# ---------------------------------------------------------------------------
# Differentiable windowed-TF unit: Pallas forward AND backward.
#
# The XLA lowering of the TF table ops (~90M elem/s gather in the forward,
# gather + 256-bin scatter in the backward) made fwd+bwd frames ~14 s. Both
# directions are lane-shuffle/MXU work:
#   forward:  rgba lookup via packed shuffles (like the alpha kernel);
#   backward: d/dvalue + d/dcenter + d/dwidth are elementwise slope lookups;
#             d/dTF is a 256-bin weighted histogram computed per tile as a
#             one-hot (256x128) @ (128x4) matmul on the MXU, accumulated
#             across the (sequential) grid in a revisited output block.
# Exactness: tests compare both directions against XLA autodiff of
# `sample_windowed_transfer_function`.


def _rgba_fwd_kernel(sc_ref, tf_ref, val_ref, step_ref, out_ref):
    center = sc_ref[0, 0]
    width = sc_ref[0, 1]
    low_c = sc_ref[0, 2]
    high_c = sc_ref[0, 3]
    v = val_ref[:]
    sw = step_ref[:]
    tf_pos = (v - center + width * 0.5) / width
    cut = ((tf_pos < 0.0) & (low_c > 0.0)) | ((tf_pos > 1.0) & (high_c > 0.0))
    x = tf_pos * 256.0 - 0.5
    i0f = jnp.floor(x)
    frac = x - i0f
    i0 = jnp.clip(i0f, 0.0, 255.0).astype(jnp.int32)
    i1 = jnp.clip(i0f + 1.0, 0.0, 255.0).astype(jnp.int32)
    tfp = tf_ref[:]

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

    for c in range(3):
        c0 = chan(c, i0)
        c1 = chan(c, i1)
        out_ref[c] = jnp.where(cut, 0.0, c0 + (c1 - c0) * frac)
    a0 = chan(3, i0)
    a1 = chan(3, i1)
    alpha = jnp.clip(a0 + (a1 - a0) * frac, 0.0, 1.0)
    alpha = 1.0 - jnp.exp(sw * jnp.log(jnp.maximum(1.0 - alpha, 1e-10)))
    out_ref[3] = jnp.where(cut, 0.0, alpha)


def _rgba_bwd_kernel(sc_ref, tf_ref, val_ref, step_ref, g_ref,
                     dval_ref, dstep_ref, acc_ref):
    pid = pl.program_id(0)
    center = sc_ref[0, 0]
    width = sc_ref[0, 1]
    low_c = sc_ref[0, 2]
    high_c = sc_ref[0, 3]
    v = val_ref[:]
    sw = step_ref[:]
    tf_pos = (v - center + width * 0.5) / width
    cut = ((tf_pos < 0.0) & (low_c > 0.0)) | ((tf_pos > 1.0) & (high_c > 0.0))
    x = tf_pos * 256.0 - 0.5
    i0f = jnp.floor(x)
    frac = x - i0f
    i0 = jnp.clip(i0f, 0.0, 255.0).astype(jnp.int32)
    i1 = jnp.clip(i0f + 1.0, 0.0, 255.0).astype(jnp.int32)
    tfp = tf_ref[:]

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

    keep = jnp.where(cut, 0.0, 1.0)
    # alpha chain: clip + step correction
    a0 = chan(3, i0)
    a1 = chan(3, i1)
    a_raw = a0 + (a1 - a0) * frac
    # match XLA clip's 0.5 subgradient at exact boundary ties (TF alpha
    # plateaus at exactly 0/1 interpolate to exact boundary values)
    clipmask = jnp.where(
        (a_raw > 0.0) & (a_raw < 1.0), 1.0,
        jnp.where((a_raw == 0.0) | (a_raw == 1.0), 0.5, 0.0),
    )
    a_clip = jnp.clip(a_raw, 0.0, 1.0)
    base = jnp.maximum(1.0 - a_clip, 1e-10)
    basemask = ((1.0 - a_clip) >= 1e-10).astype(jnp.float32)
    # d(1 - base^sw)/d a_clip = sw * base^(sw-1) (when base wasn't clamped)
    dcorr = sw * jnp.exp((sw - 1.0) * jnp.log(base)) * basemask

    g_eff = []
    gx = jnp.zeros(v.shape, jnp.float32)
    for c in range(3):
        gc = g_ref[c] * keep
        g_eff.append(gc)
        diff = chan(c, i1) - chan(c, i0)
        gx = gx + gc * diff
    ga = g_ref[3] * keep * dcorr * clipmask
    g_eff.append(ga)
    gx = gx + ga * (a1 - a0)

    # d/dx where x = tf_pos*256 - 0.5 — zero in the clamp regions (i0==i1
    # there, so diff==0 already handles it).
    dval_ref[:] = gx * (256.0 / width)

    # d alpha / d step: alpha = 1 - base^sw -> -base^sw * log(base); the
    # base clamp only gates the a_clip chain, not the sw exponent.
    logb = jnp.log(base)
    dstep_ref[:] = g_ref[3] * keep * (-jnp.exp(sw * logb)) * logb

    # accumulated fields: rows 0-7 dcenter partials, 8-15 dwidth partials
    dc_field = gx * (-256.0 / width)
    dw_field = gx * (256.0 * (0.5 - tf_pos) / width)

    @pl.when(pid == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # fold the (BR, 128) partial fields down to 8 rows before accumulating
    nrows8 = v.shape[0] // 8
    acc_ref[256:264, :] = acc_ref[256:264, :] + jnp.sum(
        dc_field.reshape(nrows8, 8, 128), axis=0
    )
    acc_ref[264:272, :] = acc_ref[264:272, :] + jnp.sum(
        dw_field.reshape(nrows8, 8, 128), axis=0
    )

    # dTF histogram: per sublane row, one-hot (256, 128) @ weights (128, 4);
    # fori over the block's rows with a carried accumulator (the block is
    # BR rows — unrolling would blow compile time).
    texel = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
    n_rows = v.shape[0]

    def row_of(arr, r):
        # dynamic row extraction: Mosaic has no dynamic_slice on values,
        # but sublane roll with a dynamic shift lowers fine.
        return pltpu.roll(arr, -r, axis=0)[0:1, :]

    def hist_row(r, acc):
        i0r = jnp.broadcast_to(row_of(i0, r), (256, 128))
        i1r = jnp.broadcast_to(row_of(i1, r), (256, 128))
        fr = jnp.broadcast_to(row_of(frac, r), (256, 128))
        A = jnp.where(texel == i0r, 1.0 - fr, 0.0) + jnp.where(
            texel == i1r, fr, 0.0
        )
        gw = jnp.concatenate(
            [
                jnp.reshape(row_of(g_eff[c], r), (128, 1))
                for c in range(4)
            ],
            axis=1,
        )  # (128, 4)
        part = jax.lax.dot_general(
            A, gw, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (256, 4)
        return acc + part

    hist = jax.lax.fori_loop(
        0, n_rows, hist_row, jnp.zeros((256, 4), jnp.float32)
    )
    acc_ref[0:256, 0:4] = acc_ref[0:256, 0:4] + hist


def _alpha_bwd_kernel(sc_ref, tf_ref, val_ref, step_ref, g_ref,
                      dval_ref, dstep_ref, acc_ref):
    """Alpha-only backward: the occluder field consumes only the TF alpha
    channel, so its VJP skips the color taps and histograms one channel
    ((256,128)@(128,1) per row) — ~4x less MXU/VPU work than the rgba
    unit's backward for the same gradients."""
    pid = pl.program_id(0)
    center = sc_ref[0, 0]
    width = sc_ref[0, 1]
    low_c = sc_ref[0, 2]
    high_c = sc_ref[0, 3]
    v = val_ref[:]
    sw = step_ref[:]
    g = g_ref[:]
    tf_pos = (v - center + width * 0.5) / width
    cut = ((tf_pos < 0.0) & (low_c > 0.0)) | ((tf_pos > 1.0) & (high_c > 0.0))
    x = tf_pos * 256.0 - 0.5
    i0f = jnp.floor(x)
    frac = x - i0f
    i0 = jnp.clip(i0f, 0.0, 255.0).astype(jnp.int32)
    i1 = jnp.clip(i0f + 1.0, 0.0, 255.0).astype(jnp.int32)
    tfp = tf_ref[:]

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

    keep = jnp.where(cut, 0.0, 1.0)
    a0 = chan_a(i0)
    a1 = chan_a(i1)
    a_raw = a0 + (a1 - a0) * frac
    clipmask = jnp.where(
        (a_raw > 0.0) & (a_raw < 1.0), 1.0,
        jnp.where((a_raw == 0.0) | (a_raw == 1.0), 0.5, 0.0),
    )
    a_clip = jnp.clip(a_raw, 0.0, 1.0)
    base = jnp.maximum(1.0 - a_clip, 1e-10)
    basemask = ((1.0 - a_clip) >= 1e-10).astype(jnp.float32)
    logb = jnp.log(base)
    dcorr = sw * jnp.exp((sw - 1.0) * logb) * basemask
    ga = g * keep * dcorr * clipmask
    gx = ga * (a1 - a0)
    dval_ref[:] = gx * (256.0 / width)
    dstep_ref[:] = g * keep * (-jnp.exp(sw * logb)) * logb

    @pl.when(pid == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    nrows8 = v.shape[0] // 8
    acc_ref[256:264, :] = acc_ref[256:264, :] + jnp.sum(
        (gx * (-256.0 / width)).reshape(nrows8, 8, 128), axis=0
    )
    acc_ref[264:272, :] = acc_ref[264:272, :] + jnp.sum(
        (gx * (256.0 * (0.5 - tf_pos) / width)).reshape(nrows8, 8, 128),
        axis=0,
    )

    # dTF histogram via the 4x64 segment/offset decomposition with merged
    # lerp taps (same scheme as `shearwarp_grad._composite_bwd_kernel`,
    # round 5): texel t = 64*s + o factors the dense 256-row one-hot —
    # which measured ~30 ms/face at 256^3 — into a 4-row and a 64-row
    # one-hot (the split that minimizes VPU build rows); the frac tap is a
    # second weight set histogrammed at i0 and shifted +1 texel in the
    # wrapper, with clamp-edge weight folded into set 0.
    iota4 = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0)
    iota64 = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
    in_rng = (i0f >= 0.0) & (i0f < 255.0)
    wa = ga * jnp.where(in_rng, 1.0 - frac, 1.0)
    wb = ga * jnp.where(in_rng, frac, 0.0)
    s_idx = i0 >> 6
    o_idx = i0 & 63

    def row_of(arr, r):
        return pltpu.roll(arr, -r, axis=0)[0:1, :]

    def build_LO(r):
        s_r = jnp.broadcast_to(row_of(s_idx, r), (4, 128))
        o_r = jnp.broadcast_to(row_of(o_idx, r), (64, 128))
        S = jnp.where(iota4 == s_r, 1.0, 0.0)
        O = jnp.where(iota64 == o_r, 1.0, 0.0)
        L = jnp.concatenate([
            S * jnp.broadcast_to(row_of(wa, r), (4, 128)),
            S * jnp.broadcast_to(row_of(wb, r), (4, 128)),
        ], axis=0)  # (8, 128): [set(2) x seg(4)]
        return L, O

    def hist_row8(i, acc):
        # Four sample rows per MXU issue (block-diagonal; the off-diagonal
        # blocks the MXU computes are discarded). The per-iteration fixed
        # cost dominated this loop (hist = 14.4 of the kernel's 14.9 ms at
        # 256^3 with per-row dots), and Mosaic crashes on any unroll here
        # (signal 6, same failure class as the composite kernel's
        # nested-unroll assert) — batching rows is the remaining lever.
        parts = [build_LO(8 * i + j) for j in range(8)]
        L8 = jnp.concatenate([p[0] for p in parts], axis=0)  # (64, 128)
        O8 = jnp.concatenate([p[1] for p in parts], axis=0)  # (512, 128)
        part = jax.lax.dot_general(
            L8, O8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (64, 512): diagonal (8, 64) blocks are the eight row-hists
        for j in range(8):
            acc = acc + part[8 * j:8 * j + 8, 64 * j:64 * j + 64]
        return acc

    hist = jax.lax.fori_loop(
        0, v.shape[0] // 8, hist_row8, jnp.zeros((8, 64), jnp.float32)
    )
    acc_ref[0:8, 0:64] = acc_ref[0:8, 0:64] + hist


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def windowed_tf_alpha_vjp(values, tf_table, windowing_vec4, step,
                          interpret=None):
    """Differentiable alpha-only TF unit: forward is the `windowed_tf_alpha`
    kernel, backward is an alpha-only chain (`_alpha_bwd_kernel`). Drop-in
    for ``sample_windowed_transfer_function(...)[..., 3]`` — the occluder
    field's unit (`lighting.occluder_opacity_volume` tf_impl="pallas_vjp").
    """
    return windowed_tf_alpha(values, tf_table, windowing_vec4, step,
                             interpret=interpret)


def _alpha_vjp_fwd(values, tf_table, windowing_vec4, step, interpret):
    out = windowed_tf_alpha(values, tf_table, windowing_vec4, step,
                            interpret=interpret)
    return out, (values, tf_table, windowing_vec4, step)


def _alpha_vjp_bwd(interpret, res, g):
    values, tf_table, windowing_vec4, step = res
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = values.shape
    step_b = jnp.broadcast_to(jnp.asarray(step, jnp.float32), shape)
    flat, rows = _tiles(values)
    stepf, _ = _tiles(step_b)
    n = values.size
    gpad = jnp.pad(
        g.astype(jnp.float32).reshape(-1), (0, rows * 128 - n)
    ).reshape(rows, 128)

    BR = 64
    dval, dstep_f, acc = pl.pallas_call(
        _alpha_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((272, 128), jnp.float32),
        ),
        grid=(rows // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((272, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(_tf_scalars(windowing_vec4), _pack_tf(tf_table), flat, stepf, gpad)

    dvalues = dval.reshape(-1)[:n].reshape(shape)
    # (8,64) [set*4 + s, o] -> (256,) per set; the frac-tap set belongs
    # one texel higher (see kernel comment).
    h1 = acc[0:4, 0:64].reshape(256)
    h2 = acc[4:8, 0:64].reshape(256)
    da = h1 + jnp.concatenate([jnp.zeros((1,), h2.dtype), h2[:-1]])
    dtf = jnp.concatenate(
        [jnp.zeros((256, 3), jnp.float32), da[:, None]], axis=1
    ).astype(tf_table.dtype)
    win = jnp.asarray(windowing_vec4, jnp.float32)
    dwin = jnp.stack([
        jnp.sum(acc[256:264, :]), jnp.sum(acc[264:272, :]),
        jnp.float32(0.0), jnp.float32(0.0),
    ]).astype(win.dtype)
    step_arr = jnp.asarray(step, jnp.float32)
    dstep = dstep_f.reshape(-1)[:n].reshape(shape)
    if step_arr.ndim < dstep.ndim:
        dstep = jnp.sum(dstep, axis=tuple(range(dstep.ndim - step_arr.ndim)))
    sum_axes = tuple(
        i for i, (ds, ss) in enumerate(zip(dstep.shape, step_arr.shape))
        if ss == 1 and ds != 1
    )
    if sum_axes:
        dstep = jnp.sum(dstep, axis=sum_axes, keepdims=True)
    return dvalues, dtf, dwin, dstep


windowed_tf_alpha_vjp.defvjp(_alpha_vjp_fwd, _alpha_vjp_bwd)


def _tf_scalars(windowing_vec4):
    win = jnp.asarray(windowing_vec4, jnp.float32)
    return jnp.stack([win[0], win[1], win[2], win[3]]).reshape(1, 4)


def _tiles(x):
    n = x.size
    rows = _ceil_to(max(int(n), 1), 256 * 128) // 128
    return jnp.pad(x.reshape(-1), (0, rows * 128 - n)).reshape(rows, 128), rows


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def windowed_tf_rgba(values, tf_table, windowing_vec4, step, interpret=None):
    """Differentiable drop-in for ``sample_windowed_transfer_function``
    (field ``step`` broadcastable to ``values``): Pallas forward + backward.
    """
    return _rgba_fwd(values, tf_table, windowing_vec4, step, interpret)


def _rgba_fwd(values, tf_table, windowing_vec4, step, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = values.shape
    step_b = jnp.broadcast_to(jnp.asarray(step, jnp.float32), shape)
    flat, rows = _tiles(values)
    stepf, _ = _tiles(step_b)
    BR = 256  # batch rows per program (grid-step overhead amortization)
    out = pl.pallas_call(
        _rgba_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((4, rows, 128), jnp.float32),
        grid=(rows // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, BR, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(_tf_scalars(windowing_vec4), _pack_tf(tf_table), flat, stepf)
    n = values.size
    rgba = jnp.moveaxis(out.reshape(4, -1)[:, :n], 0, -1)
    return rgba.reshape(shape + (4,))


def _rgba_vjp_fwd(values, tf_table, windowing_vec4, step, interpret):
    out = _rgba_fwd(values, tf_table, windowing_vec4, step, interpret)
    return out, (values, tf_table, windowing_vec4, step)


def _rgba_vjp_bwd(interpret, res, g):
    values, tf_table, windowing_vec4, step = res
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    shape = values.shape
    step_b = jnp.broadcast_to(jnp.asarray(step, jnp.float32), shape)
    flat, rows = _tiles(values)
    stepf, _ = _tiles(step_b)
    n = values.size
    gflat = jnp.moveaxis(g.reshape(-1, 4), -1, 0)  # (4, n)
    gpad = jnp.pad(gflat, ((0, 0), (0, rows * 128 - n))).reshape(4, rows, 128)

    BR = 64
    dval, dstep_f, acc = pl.pallas_call(
        _rgba_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((272, 128), jnp.float32),
        ),
        grid=(rows // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, BR, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((272, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(_tf_scalars(windowing_vec4), _pack_tf(tf_table), flat, stepf, gpad)

    dvalues = dval.reshape(-1)[:n].reshape(shape)
    dtf = acc[0:256, 0:4]
    dcenter = jnp.sum(acc[256:264, :])
    dwidth = jnp.sum(acc[264:272, :])
    win = jnp.asarray(windowing_vec4, jnp.float32)
    dwin = jnp.stack([dcenter, dwidth, jnp.float32(0.0), jnp.float32(0.0)])
    # step may have been broadcast to values' shape: reduce the full-field
    # cotangent back over the broadcast axes.
    step_arr = jnp.asarray(step, jnp.float32)
    dstep = dstep_f.reshape(-1)[:n].reshape(shape)
    if step_arr.ndim < dstep.ndim:
        dstep = jnp.sum(
            dstep, axis=tuple(range(dstep.ndim - step_arr.ndim))
        )
    sum_axes = tuple(
        i for i, (ds, ss) in enumerate(zip(dstep.shape, step_arr.shape))
        if ss == 1 and ds != 1
    )
    if sum_axes:
        dstep = jnp.sum(dstep, axis=sum_axes, keepdims=True)
    return (dvalues, dtf.astype(tf_table.dtype), dwin.astype(win.dtype),
            dstep)


windowed_tf_rgba.defvjp(_rgba_vjp_fwd, _rgba_vjp_bwd)
