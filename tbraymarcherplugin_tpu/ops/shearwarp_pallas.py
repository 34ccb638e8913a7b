"""Fused Pallas composite kernel for the shear-warp renderer.

Round-3 on-chip measurement: XLA lowers EVERY gather on this TPU to ~90M
elem/s scalarized loads — including the 256-texel TF lookup (4 channels x
420M samples ≈ seconds/frame) that dominated the pure-XLA shear-warp
composite. This kernel removes the last gathers from the frame:

- the pre-sheared volume/light fields W, L (K, n1, n2) stream through VMEM
  in double-buffered k-chunks (pure DMA, no gathers);
- the windowed-TF lookup runs as lane shuffles on a packed (8, 128) TF tile
  (`pallas_march._sample_tf_packed` — ~24 vector ops per 1024 samples);
- front-to-back compositing is sequential per k with the carry held in
  registers, reproducing `shearwarp_intermediate`'s scan algebra exactly
  (same masks, same 0.95 early-termination snap);
- per-(8, 128) pixel tile the k-loop stops as soon as every pixel has
  terminated (a `while_loop` over chunks), and whole k-chunks whose value
  range cannot produce alpha are skipped via scalar-prefetched occupancy
  flags — the ESS/ET wins the XLA scan can only approximate.

Forward-only: the differentiable path stays on `shearwarp_intermediate`
(dense autodiff). Equality tests in `tests/test_shearwarp_pallas.py`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compositing import EARLY_TERMINATION_ALPHA
from .pallas_march import _pack_tf, _sample_tf_packed
from .sampling import VOLUME_DENSITY

KB = 16  # k-chunk length (planes per DMA)


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_axis0(x, n, value=0.0):
    return jnp.concatenate(
        [x, jnp.full((n - x.shape[0],) + x.shape[1:], value, x.dtype)], 0
    ) if x.shape[0] < n else x


def _plane_param_array(plan, Kp, extend=False):
    """(5, Kp[+1]) per-plane coefficients for the kernels: a1,b1,a2,b2,lam.
    Padding planes get out-of-range coords so the in-cube mask kills them.
    ``extend`` appends one affinely-extrapolated plane (all coefficients
    are affine in λ) for the jitter path's k+1 reads at the last plane."""
    rows = []
    for x, pv in (
        (plan.a1, -1e9), (plan.b1, 0.0), (plan.a2, -1e9), (plan.b2, 0.0),
        (plan.lam, 0.0),
    ):
        if extend:
            ex = 2.0 * x[-1:] - x[-2:-1] if x.shape[0] >= 2 else x[-1:]
            x = jnp.concatenate([x, ex])
        rows.append(_pad_axis0(x, Kp + (1 if extend else 0), value=pv))
    return jnp.stack(rows)


def _clip_step_fields(plan, clip_center, clip_direction):
    """Per-intermediate-pixel step length and affine clip fields:
    (step_world (n1, n2), e0 scalar, e1 (n1, n2))."""
    n1, n2 = plan.n1, plan.n2
    cc = jnp.asarray(clip_center, jnp.float32)
    cdn = jnp.asarray(clip_direction, jnp.float32)
    a1x, a2x, dx = plan.axes12[0], plan.axes12[1], plan.axis
    ii = jnp.arange(n1, dtype=jnp.float32)
    jj = jnp.arange(n2, dtype=jnp.float32)
    g1 = plan.o1 + (ii + 0.5) * plan.d1
    g2 = plan.o2 + (jj + 0.5) * plan.d2
    c1, c2, cd_ = plan.cam[a1x], plan.cam[a2x], plan.cam[dx]
    r = jnp.sqrt(
        (g1[:, None] - c1) ** 2 + (g2[None, :] - c2) ** 2
        + (plan.z0 - cd_) ** 2
    )
    step_world = VOLUME_DENSITY * r * plan.dlam
    e0 = jnp.sum((plan.cam - cc) * cdn)
    e1 = (
        (g1[:, None] - c1) * cdn[a1x]
        + (g2[None, :] - c2) * cdn[a2x]
        + (plan.z0 - cd_) * cdn[dx]
    )
    return step_world, e0, e1


def _geo_chunk_validity(plan, D1, D2, Kp, kb, jitter=False):
    """(t1, t2, nch) bool: does tile (i, j) intersect the cube's preimage
    anywhere inside chunk c? Pure geometry (no TF occupancy). With
    ``jitter`` each plane's validity is unioned with its successor (the
    jittered sample can sit anywhere between the two)."""
    nch = Kp // kb
    a1p = _pad_axis0(plan.a1, Kp, value=jnp.float32(-1e9))
    b1p = _pad_axis0(plan.b1, Kp, value=jnp.float32(0.0))
    a2p = _pad_axis0(plan.a2, Kp, value=jnp.float32(-1e9))
    b2p = _pad_axis0(plan.b2, Kp, value=jnp.float32(0.0))
    t1 = plan.n1 // 8
    t2 = plan.n2 // 128
    i_lo = (jnp.arange(t1, dtype=jnp.float32) * 8.0)[:, None]
    i_hi = i_lo + 7.0
    j_lo = (jnp.arange(t2, dtype=jnp.float32) * 128.0)[:, None]
    j_hi = j_lo + 127.0

    def axis_valid(ap, bp, lo, hi, dimf):
        va = ap[None, :] + bp[None, :] * lo
        vb = ap[None, :] + bp[None, :] * hi
        vmin = jnp.minimum(va, vb)
        vmax = jnp.maximum(va, vb)
        return (vmax >= -0.5) & (vmin <= dimf - 0.5)  # (tiles, Kp)

    v1ok = axis_valid(a1p, b1p, i_lo, i_hi, float(D1))
    v2ok = axis_valid(a2p, b2p, j_lo, j_hi, float(D2))
    kvalid = v1ok[:, None, :] & v2ok[None, :, :]  # (t1, t2, Kp)
    if jitter:
        kvalid = kvalid | jnp.concatenate(
            [kvalid[:, :, 1:], kvalid[:, :, -1:]], axis=2
        )
    return jnp.any(kvalid.reshape(t1, t2, nch, kb), axis=3)


def _bounds_from_validity(cvalid):
    """(t1, t2, nch) bool -> flattened per-tile (c_lo, c_hi) int32 pairs."""
    nch = cvalid.shape[2]
    anyv = jnp.any(cvalid, axis=2)
    first = jnp.argmax(cvalid, axis=2)
    last = nch - jnp.argmax(cvalid[:, :, ::-1], axis=2)
    c_lo = jnp.where(anyv, first, 0).astype(jnp.int32)
    c_hi = jnp.where(anyv, last, 0).astype(jnp.int32)
    return jnp.stack([c_lo, c_hi], axis=-1).reshape(-1)


def _scalar_row(windowing_vec4, e0, early_termination, D1, D2):
    win = jnp.asarray(windowing_vec4, jnp.float32)
    return jnp.stack([
        win[0], win[1], win[2], win[3], jnp.asarray(e0, jnp.float32),
        jnp.float32(early_termination), jnp.float32(D1), jnp.float32(D2),
    ]).reshape(1, 8)


def _composite_kernel(
    occ_ref,  # scalar-prefetch (nch,) int32: chunk occupancy flags
    bnd_ref,  # scalar-prefetch (n_tiles*2,) int32: per-tile chunk lo/hi
    sc_ref,  # SMEM (1, 8): center,width,lowc,highc,e0,ET,D1,D2
    pa_ref,  # SMEM (5, Kp[+1]): a1,b1,a2,b2,lam
    tf_ref,  # VMEM (8, 128) packed TF
    e1_ref,  # VMEM (8, 128) tile of the clip-plane field
    sw_ref,  # VMEM (8, 128) tile of step_world
    jd_ref,  # VMEM (2, 8, 128) tile: [0] jitter delta, [1] lambda_max
    w_hbm,  # ANY (Kp[+1], n1, n2)
    l_hbm,  # ANY (Kp[+1], n1, n2)
    out_ref,  # VMEM (4, 8, 128) tile output
    wbuf,  # VMEM (2, KB[+1], 8, 128) compute dtype
    lbuf,
    wsem,
    lsem,
    *,
    n_chunks,
    k_real,
    early_termination,
    jitter_on=False,
    depth_on=False,
    mode="lit",
):
    i0 = pl.program_id(0) * 8
    j0 = pl.program_id(1) * 128
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
    gi = row + i0
    gj = col + j0
    e1 = e1_ref[:]
    sw = sw_ref[:]
    tfp = tf_ref[:]
    delta = jd_ref[0] if jitter_on else None
    lmax = jd_ref[1] if depth_on else None
    CB = KB + 1 if jitter_on else KB  # jitter lerps plane k with k+1

    def copy(buf, hbm, sem, c, slot):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(c * KB, CB), pl.ds(i0, 8), pl.ds(j0, 128)],
            buf.at[slot],
            sem.at[slot],
        )

    def issue(c, slot):
        copy(wbuf, w_hbm, wsem, c, slot).start()
        if mode == "lit":  # unlit/intensity never read the light stream
            copy(lbuf, l_hbm, lsem, c, slot).start()

    def wait(c, slot):
        copy(wbuf, w_hbm, wsem, c, slot).wait()
        if mode == "lit":
            copy(lbuf, l_hbm, lsem, c, slot).wait()

    @pl.when(c_lo < c_hi)
    def _():
        issue(c_lo, c_lo % 2)

    def chunk_body(state):
        c, rr, rg, rb, alpha, term_f = state
        slot = c % 2

        @pl.when(c + 1 < c_hi)
        def _():
            issue(c + 1, (c + 1) % 2)

        wait(c, slot)

        def do_chunk(carry):
            rr, rg, rb, alpha, term_f = carry

            def k_body(kk, carry):
                rr, rg, rb, alpha, term_f = carry
                k = c * KB + kk
                term = term_f > 0.5
                a1k = pa_ref[0, k]
                b1k = pa_ref[1, k]
                a2k = pa_ref[2, k]
                b2k = pa_ref[3, k]
                lamk = pa_ref[4, k]
                v1 = a1k + b1k * gi
                v2 = a2k + b2k * gj
                lam_px = lamk
                if jitter_on:
                    # per-pixel λ phase jitter: sample at λ_k + δ·Δλ, the
                    # shear-warp form of the reference's entry jitter
                    # (`RaymarchMaterialCommon.usf:73-78`); value/coords are
                    # affine in λ, so everything lerps with plane k+1.
                    v1n = pa_ref[0, k + 1] + pa_ref[1, k + 1] * gi
                    v2n = pa_ref[2, k + 1] + pa_ref[3, k + 1] * gj
                    v1 = v1 + delta * (v1n - v1)
                    v2 = v2 + delta * (v2n - v2)
                    lam_px = lamk + delta * (pa_ref[4, k + 1] - lamk)
                m = (
                    (v1 >= -0.5) & (v1 <= d1f - 0.5)
                    & (v2 >= -0.5) & (v2 <= d2f - 0.5)
                    & ((e0 + lam_px * e1) > 0.0)
                    & (k < k_real)
                    & ~term
                )
                if depth_on:
                    # scene-depth occlusion clamp
                    # (`RaymarchMaterialCommon.usf:26-44`): the sample sits
                    # at camera distance r·λ; λ_max = depth/r per pixel.
                    m = m & (lam_px <= lmax)
                value = wbuf[slot, kk].astype(jnp.float32)
                if jitter_on:
                    vn = wbuf[slot, kk + 1].astype(jnp.float32)
                    value = value + delta * (vn - value)
                tf_pos = (value - center + width * 0.5) / width
                if mode == "intensity":
                    # first-hit windowed intensity
                    # (`PerformWindowedIntensityRaymarch`, usf:187-242):
                    # grayscale = clamped TF position of the first
                    # non-clipped in-cube sample; no TF table, no light.
                    val = jnp.clip(tf_pos, 0.0, 1.0)
                    rr = jnp.where(m, val, rr)
                    term_f = jnp.maximum(term_f, m.astype(jnp.float32))
                    return rr, rg, rb, alpha, term_f
                if mode == "lit":
                    light = lbuf[slot, kk].astype(jnp.float32)
                    if jitter_on:
                        ln = lbuf[slot, kk + 1].astype(jnp.float32)
                        light = light + delta * (ln - light)
                else:
                    light = 1.0
                cut = ((tf_pos < 0.0) & (low_c > 0.0)) | (
                    (tf_pos > 1.0) & (high_c > 0.0)
                )
                cr, cg, cb, ca = _sample_tf_packed(tfp, tf_pos)
                ca = jnp.clip(ca, 0.0, 1.0)
                ca = 1.0 - jnp.exp(
                    sw * jnp.log(jnp.maximum(1.0 - ca, 1e-10))
                )
                a = jnp.where(m & ~cut, ca, 0.0)
                w = (1.0 - alpha) * a
                rr = rr + w * cr * light
                rg = rg + w * cg * light
                rb = rb + w * cb * light
                alpha_new = alpha + w
                crossed = (a > 0.0) & (alpha_new > early_termination)
                alpha = jnp.where(crossed, 1.0, alpha_new)
                term_f = jnp.maximum(term_f, crossed.astype(jnp.float32))
                return rr, rg, rb, alpha, term_f

            return jax.lax.fori_loop(
                0, KB, k_body, (rr, rg, rb, alpha, term_f), unroll=KB
            )

        occupied = occ_ref[c] != 0
        rr, rg, rb, alpha, term_f = jax.lax.cond(
            occupied, do_chunk, lambda x: x, (rr, rg, rb, alpha, term_f)
        )
        return c + 1, rr, rg, rb, alpha, term_f

    def chunk_cond(state):
        c = state[0]
        term_f = state[5]
        return (c < c_hi) & (jnp.min(term_f) < 0.5)

    zero = jnp.zeros((8, 128), jnp.float32)
    init = (c_lo, zero, zero, zero, zero, zero)
    c_end, rr, rg, rb, alpha, term_f = jax.lax.while_loop(
        chunk_cond, chunk_body, init
    )

    # Drain the prefetched chunk when the loop exits early.
    @pl.when(c_end < c_hi)
    def _():
        wait(c_end, c_end % 2)

    if mode == "intensity":
        out_ref[0] = rr
        out_ref[1] = rr
        out_ref[2] = rr
        out_ref[3] = term_f  # alpha 1 on hit (usf:238)
    else:
        out_ref[0] = rr
        out_ref[1] = rg
        out_ref[2] = rb
        out_ref[3] = alpha


@partial(
    jax.jit,
    static_argnames=(
        "early_termination",
        "compute_dtype",
        "interpret",
        "debug_no_skip",
        "mode",
        "sample_nearest",
        "out_layout",
    ),
)
def shearwarp_intermediate_fused(
    volume: jnp.ndarray,
    tf_table: jnp.ndarray,
    light_volume: jnp.ndarray,
    plan,
    windowing_vec4: jnp.ndarray,
    clip_center,
    clip_direction,
    early_termination: float = EARLY_TERMINATION_ALPHA,
    compute_dtype=jnp.bfloat16,
    interpret: bool | None = None,
    debug_no_skip: bool = False,
    jitter: jnp.ndarray | None = None,
    depth_lam: jnp.ndarray | None = None,
    mode: str = "lit",
    sample_nearest: bool = False,
    out_layout: str = "hwc",
) -> jnp.ndarray:
    """Fused-fast shear-warp composite -> (n1, n2, 4).

    ``out_layout="chw"`` returns the kernel's raw (4, n1, n2) layout
    instead — `warp_to_screen_fused(channel_major=True)` consumes it
    directly, skipping one full-image relayout on each side (round-5
    trace: the hwc transpose + the warp's re-transpose were ~2-3 ms each
    at 1280^2x4).

    ``mode``: "lit" (default), "unlit" (octree-style composite without the
    light stream, `WindowedRaymarchMaterials.usf:99-183`) or "intensity"
    (first-hit windowed intensity, usf:187-242 — ``light_volume`` and
    ``tf_table`` unused). ``sample_nearest`` switches the pre-shear to
    one-hot nearest selection (`Texture3D.Load` truncation, octree mode).

    ``debug_no_skip=True`` disables chunk ESS and the per-tile k-interval
    bounds (ablation knob for measuring the skip benefit; early termination
    still applies unless ``early_termination`` >= 1).

    ``jitter``: optional (n1, n2) per-pixel λ phase in [0, 1) — the
    shear-warp form of the reference's temporal entry jitter
    (`RaymarchMaterialCommon.usf:73-78`); samples lerp between adjacent
    plane fields. ``depth_lam``: optional (n1, n2) per-pixel maximum λ
    (scene-depth occlusion clamp, `RaymarchMaterialCommon.usf:26-44`) —
    see :func:`.shearwarp.depth_to_lambda_max`.

    Same algorithm as :func:`.shearwarp.shearwarp_intermediate` (the
    equality oracle); forward-only. ``compute_dtype`` is the storage type of
    the pre-sheared fields (bf16 halves the stream, ~1e-3 value error).
    """
    from . import shearwarp as SW

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    jitter_on = jitter is not None
    depth_on = depth_lam is not None
    n1, n2, K = plan.n1, plan.n2, plan.k
    assert n1 % 8 == 0 and n2 % 128 == 0, (n1, n2)
    Kp = _ceil_to(K, KB)
    nch = Kp // KB
    Kbuf = Kp + 1 if jitter_on else Kp  # +1 plane for the k+1 lerp reads

    ax = (plan.axis,) + plan.axes12
    vol_t = jnp.transpose(volume, ax)

    # ---- XLA stage: pre-shear every plane with batched banded matmuls ----
    vplanes = SW._volume_planes(vol_t, plan, nearest=sample_nearest)
    W = SW._resample_block(
        vplanes, plan.a1, plan.b1, plan.a2, plan.b2, n1, n2, compute_dtype,
        nearest=sample_nearest,
    ).astype(compute_dtype)  # (K, n1, n2)
    # replicate-pad (clamp-to-edge along the traversal): the jittered last
    # plane lerps toward a copy of itself; non-jittered padding is masked.
    pad_spec = ((0, Kbuf - K), (0, 0), (0, 0))
    W = jnp.pad(W, pad_spec, mode="edge")
    if mode == "lit":
        light_t = jnp.transpose(light_volume, ax)
        l0 = jnp.take(light_t, plan.lm0, axis=0)
        l1 = jnp.take(
            light_t, jnp.minimum(plan.lm0 + 1, light_t.shape[0] - 1), axis=0
        )
        lplanes = (
            l0 * (1.0 - plan.lmt[:, None, None])
            + l1 * plan.lmt[:, None, None]
        )
        L = SW._resample_block(
            lplanes, plan.la1, plan.lb1, plan.la2, plan.lb2, n1, n2,
            compute_dtype,
        ).astype(compute_dtype)
        L = jnp.pad(L, pad_spec, mode="edge")
    else:
        L = W  # placeholder operand; the kernel never issues its DMAs

    # ---- chunk occupancy (ESS): interval query on per-chunk value range ---
    from .transfer import windowed_tf_range_occupied

    sl_mn = _pad_axis0(jnp.min(vplanes, axis=(1, 2)), Kp, value=jnp.inf)
    sl_mx = _pad_axis0(jnp.max(vplanes, axis=(1, 2)), Kp, value=-jnp.inf)
    mn_c = jnp.min(sl_mn.reshape(nch, KB), axis=1)
    mx_c = jnp.max(sl_mx.reshape(nch, KB), axis=1)
    if jitter_on:
        # jittered samples in chunk c lerp into plane (c+1)*KB
        nxt = jnp.minimum((jnp.arange(nch) + 1) * KB, Kp - 1)
        mn_c = jnp.minimum(mn_c, sl_mn[nxt])
        mx_c = jnp.maximum(mx_c, sl_mx[nxt])
    occ = windowed_tf_range_occupied(
        mn_c, mx_c, windowing_vec4, tf_table,
    ).astype(jnp.int32)
    if mode == "intensity":
        # no alpha concept: every in-cube sample is a hit — TF-range
        # occupancy skipping would be wrong, geometry bounds still apply
        occ = jnp.ones_like(occ)

    # ---- per-tile chunk bounds: a border tile only intersects the cube's
    # shrinking preimage for a k-interval; skip the rest of its loop ----
    D1 = volume.shape[plan.axes12[0]]
    D2 = volume.shape[plan.axes12[1]]
    cvalid = _geo_chunk_validity(plan, D1, D2, Kp, KB, jitter=jitter_on)
    cvalid = cvalid & (occ[None, None, :] != 0)
    if debug_no_skip:
        occ = jnp.ones_like(occ)
        cvalid = jnp.ones_like(cvalid)
    bounds = _bounds_from_validity(cvalid)

    # ---- scalar/param packing ----
    step_world, e0, e1 = _clip_step_fields(plan, clip_center, clip_direction)
    sc = _scalar_row(windowing_vec4, e0, early_termination, D1, D2)
    pa = _plane_param_array(plan, Kp, extend=jitter_on)
    tfp = _pack_tf(tf_table)
    jd = jnp.stack([
        jnp.zeros((n1, n2), jnp.float32) if jitter is None
        else jnp.asarray(jitter, jnp.float32),
        jnp.zeros((n1, n2), jnp.float32) if depth_lam is None
        else jnp.asarray(depth_lam, jnp.float32),
    ])

    kernel = partial(
        _composite_kernel,
        n_chunks=nch,
        k_real=K,
        early_termination=early_termination,
        jitter_on=jitter_on,
        depth_on=depth_on,
        mode=mode,
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
        out_specs=pl.BlockSpec((4, 8, 128), lambda i, j, occ, bnd: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, KB + 1 if jitter_on else KB, 8, 128),
                       compute_dtype),
            pltpu.VMEM((2, KB + 1 if jitter_on else KB, 8, 128),
                       compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, n1, n2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(occ, bounds, sc, pa, tfp, e1, step_world, jd, W, L)
    if out_layout == "chw":
        return out  # raw kernel layout (4, n1, n2); see docstring
    return jnp.transpose(out, (1, 2, 0))
