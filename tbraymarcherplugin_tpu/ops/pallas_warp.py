"""Pallas banded-gather kernel for the shear-warp screen resample.

The two-pass homography warp (`shearwarp.warp_to_screen`) is per-row
monotone 1D linear interpolation — but XLA lowers `take_along_axis` on this
TPU to ~90M elem/s scalarized gathers (~0.3 s/frame for the warp alone).
This kernel exploits the monotone structure: for each (8 rows x 128 cols)
output tile, 128 consecutive indices span at most ~`scale * 128` source
texels, so ONE dynamic-start banded DMA (8 x BAND) pulls everything needed
into VMEM and the gather becomes BAND/128 lane shuffles per tap.

Out-of-band indices clamp to the band edge — reachable only under extreme
minification (> BAND/128 source texels per output pixel), far below the
sampling density `plan_shearwarp` chooses; the clamp degrades those
already-subpixel regions instead of faulting.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 384  # source texels DMA'd per output tile (128-aligned start)


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _band_kernel(idx_ref, rows_hbm, out_ref, band, sem, *, n_src, strip):
    """Strip of ``strip`` output sub-tiles per program with double-buffered
    band DMAs: the one-tile-per-program version issued its band copy and
    synchronously waited on it (~4400 serial DMA latencies ≈ half the
    forward warp's 10.8 ms at 1080p, round-5 trace); here sub-tile t+1's
    band streams while sub-tile t computes."""
    i0 = pl.program_id(0) * 8

    def start_of(idx):
        # Lane-dim DMA slices must start 128-aligned (Mosaic tiling);
        # widen the band by one register instead.
        s = jnp.clip(
            jnp.floor(jnp.min(idx)).astype(jnp.int32), 0,
            max(n_src - BAND, 0)
        )
        return pl.multiple_of((s // 128) * 128, 128)

    def copy(idx_t, slot):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(i0, 8), pl.ds(start_of(idx_t), BAND)],
            band.at[slot],
            sem.at[slot],
        )

    idx_tiles = [idx_ref[:, t * 128:(t + 1) * 128] for t in range(strip)]
    copy(idx_tiles[0], 0).start()
    for t in range(strip):
        slot = t % 2
        if t + 1 < strip:
            copy(idx_tiles[t + 1], (t + 1) % 2).start()
        copy(idx_tiles[t], slot).wait()
        idx = idx_tiles[t]
        start = start_of(idx)
        # Exact _lerp_take semantics: l0 = floor(x) clipped so l0+1 stays
        # in band, fr in [0, 1] (fr == 1 at the band's last texel reads it
        # exactly via tap(1)).
        local = jnp.clip(
            idx - start.astype(jnp.float32), 0.0, float(BAND - 1)
        )
        l0 = jnp.clip(jnp.floor(local), 0.0, float(BAND - 2))
        fr = jnp.clip(local - l0, 0.0, 1.0)
        l0i = l0.astype(jnp.int32)

        def tap(dl, _l0i=l0i, _slot=slot):
            li = jnp.clip(_l0i + dl, 0, BAND - 1)
            lane = li & 127
            seg = li >> 7
            out = jnp.zeros((8, 128), jnp.float32)
            b = band[_slot]
            for s in range(BAND // 128):
                g = jnp.take_along_axis(
                    b[:, s * 128:(s + 1) * 128], lane, axis=1
                )
                out = jnp.where(seg == s, g, out)
            return out

        out_ref[:, t * 128:(t + 1) * 128] = tap(0) * (1.0 - fr) + tap(1) * fr


def _band_adjoint_kernel(idx_ref, g_ref, out_ref, *, n_src, np128):
    """Adjoint of the banded gather, segment/offset-factored.

    The dense per-row (BAND, 128) one-hot build measured ~11-12 ms per
    warp pass at 1080p (round-5 trace: the two adjoint kernels WERE the
    whole warp backward). Texel t = 128*s + o factors it into a (3, 128)
    segment one-hot and a (128, 128) offset one-hot; band starts are
    128-aligned, so the GLOBAL segment row is just start>>7 + s. The
    floor tap (weight 1-fr) accumulates into plane set 0, the fr tap at
    l0+1 into plane set 1 histogrammed at l0 and shifted +1 texel by the
    caller. Offsets live on LANES end-to-end, so neither the dot result
    nor the accumulation needs a relayout; the (1, 8, 2*np128, 128)
    output block is revisited across the q grid dimension (zeroed at
    q == 0)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]
    g = g_ref[:]
    start = jnp.clip(
        jnp.floor(jnp.min(idx)).astype(jnp.int32), 0, max(n_src - BAND, 0)
    )
    seg0 = start // 128
    start = pl.multiple_of(seg0 * 128, 128)
    local = jnp.clip(idx - start.astype(jnp.float32), 0.0, float(BAND - 1))
    l0 = jnp.clip(jnp.floor(local), 0.0, float(BAND - 2))
    fr = jnp.clip(local - l0, 0.0, 1.0)
    l0i = l0.astype(jnp.int32)
    # GLOBAL segment row (start is 128-aligned): the one-hot is built over
    # all np128 segments directly, so the accumulate below is a full-height
    # static store — no dynamic sublane-offset slicing.
    s_glob = seg0 + (l0i >> 7)
    o_idx = l0i & 127
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (np128, 128), 0)
    iota_o = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

    for r in range(8):
        s_r = jnp.broadcast_to(s_glob[r:r + 1, :], (np128, 128))
        o_r = jnp.broadcast_to(o_idx[r:r + 1, :], (128, 128))
        S = jnp.where(iota_s == s_r, 1.0, 0.0)
        O = jnp.where(iota_o == o_r, 1.0, 0.0)
        ga = jnp.broadcast_to((g[r:r + 1, :] * (1.0 - fr[r:r + 1, :])),
                              (np128, 128))
        gb = jnp.broadcast_to((g[r:r + 1, :] * fr[r:r + 1, :]),
                              (np128, 128))
        L = jnp.concatenate([S * ga, S * gb], axis=0)  # (2*np128, 128)
        part = jax.lax.dot_general(
            L, O, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2*np128, 128): [set*np128 + s, o]
        out_ref[0, r] = out_ref[0, r] + part


def _banded_row_lerp_adjoint(idx_p, g_p, Rp, Qp, Np, interpret, groups=1):
    """d_rows (Rp, Np) for padded inputs (see banded_row_lerp's padding)."""
    nbi = (Rp // groups) // 8 if groups > 1 else Rp // 8
    np128 = Np // 128
    out = pl.pallas_call(
        partial(_band_adjoint_kernel, n_src=Np, np128=np128),
        out_shape=jax.ShapeDtypeStruct((Rp // 8, 8, 2 * np128, 128),
                                       jnp.float32),
        grid=(Rp // 8, Qp // 128),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, j: (i % nbi, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 2 * np128, 128),
                               lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx_p, g_p)
    # [set 0] floor-tap texels; [set 1] fr-tap weights histogrammed at l0,
    # which belong one texel HIGHER (l0 <= BAND-2, so the shift never
    # leaves the band; Np-edge overflow rolls off the end harmlessly
    # because l0 is clipped below Np-1).
    h0 = out[:, :, :np128, :].reshape(Rp, Np)
    h1 = out[:, :, np128:, :].reshape(Rp, Np)
    return h0 + jnp.concatenate(
        [jnp.zeros((Rp, 1), h1.dtype), h1[:, :-1]], axis=1
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def banded_row_lerp(rows: jnp.ndarray, idx: jnp.ndarray,
                    interpret: bool | None = None,
                    groups: int = 1) -> jnp.ndarray:
    return _banded_row_lerp_fwd_impl(rows, idx, interpret, groups)


def _banded_row_lerp_vjp_fwd(rows, idx, interpret, groups):
    # rows itself is not needed for the adjoint — save a 0-row probe that
    # carries N and the dtype statically through the residuals.
    return _banded_row_lerp_fwd_impl(rows, idx, interpret, groups), (
        idx, rows[:0],
    )


def _banded_row_lerp_vjp_bwd(interpret, groups, res, g):
    """d_rows via the banded scatter kernel; idx is warp-plan geometry and
    carries no gradient (returns zeros — the callers never differentiate
    camera/homography parameters through the warp)."""
    idx, rows_probe = res
    N = int(rows_probe.shape[-1])
    rows_dtype = rows_probe.dtype
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Ri, Q = (int(d) for d in idx.shape)
    R = Ri * groups
    Rp, Qp, Np = _ceil_to(R, 8), _ceil_to(Q, 128), max(_ceil_to(N, 128), BAND)
    if groups > 1:
        assert Rp == R, (R, groups)  # callers pre-align groups to 8 rows
    idx_p = jnp.pad(
        jnp.clip(idx, 0.0, float(N - 1)),
        ((0, Rp - R if groups == 1 else 0), (0, Qp - Q)),
        mode="edge",
    )
    # padded q columns correspond to sliced-off outputs: zero cotangent
    g_p = jnp.pad(g.astype(jnp.float32), ((0, Rp - R), (0, Qp - Q)))
    d_rows = _banded_row_lerp_adjoint(idx_p, g_p, Rp, Qp, Np, interpret,
                                      groups)
    # fold the edge-padding of rows back: padded source texels [N, Np) were
    # edge copies read only via the band clamp; real reads never exceed
    # N - 1, so the pad region's cotangent is zero by construction.
    return d_rows[:R, :N].astype(rows_dtype), jnp.zeros_like(idx)


banded_row_lerp.defvjp(_banded_row_lerp_vjp_fwd, _banded_row_lerp_vjp_bwd)


@partial(jax.jit, static_argnames=("interpret", "groups"))
def _banded_row_lerp_fwd_impl(rows: jnp.ndarray, idx: jnp.ndarray,
                              interpret: bool | None = None,
                              groups: int = 1) -> jnp.ndarray:
    """out[r, q] = lerp(rows[r], idx[r % (R//groups), q]) with
    clamp-to-edge — the Pallas fast path for per-row monotone-band index
    arrays (see module docstring; exactness oracle: `shearwarp._lerp_take`).

    ``groups > 1``: ``rows`` holds that many stacked channels sharing ONE
    index array (shape (R // groups, Q)) — the warp's per-channel
    `jnp.tile` of a 39 MB index field was pure HBM traffic; the kernel
    re-reads the same idx block per channel via its BlockSpec instead."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R, N = (int(d) for d in rows.shape)
    Rq, Q = (int(d) for d in idx.shape)
    assert R == Rq * groups, (R, Rq, groups)
    Rp, Qp, Np = _ceil_to(R, 8), _ceil_to(Q, 128), max(_ceil_to(N, 128), BAND)
    if groups > 1:
        assert Rq % 8 == 0 and Rp == R, (Rq, R)
    rows_p = jnp.pad(rows, ((0, Rp - R), (0, Np - N)), mode="edge")
    # clamp-to-edge semantics of _lerp_take: clip indices to the REAL range.
    # Edge-mode padding keeps each tile's index band tight — zero padding
    # would drag a boundary tile's band start to 0 and clamp real indices.
    idx_p = jnp.pad(
        jnp.clip(idx, 0.0, float(N - 1)),
        ((0, Rp - R if groups == 1 else 0), (0, Qp - Q)),
        mode="edge",
    )
    nq = Qp // 128
    strip = next(t for t in (8, 7, 6, 5, 4, 3, 2, 1) if nq % t == 0)
    nbi = max(Rq // 8, 1) if groups > 1 else Rp // 8
    out = pl.pallas_call(
        partial(_band_kernel, n_src=Np, strip=strip),
        out_shape=jax.ShapeDtypeStruct((Rp, Qp), jnp.float32),
        grid=(Rp // 8, nq // strip),
        in_specs=[
            pl.BlockSpec((8, 128 * strip), lambda i, j: (i % nbi, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128 * strip), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 8, BAND), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(idx_p, rows_p)
    return out[:R, :Q]


def warp_band_max_spread(plan, width: int, height: int) -> float:
    """Host-side (numpy) mirror of the fused warp's two index fields: the
    largest per-(8, 128)-tile index spread either pass will see. The banded
    kernel is exact iff every tile's indices fit its one DMA band."""
    p1r = np.asarray(plan.p1row, np.float64)
    p2r = np.asarray(plan.p2row, np.float64)
    pdr = np.asarray(plan.pdrow, np.float64)
    if plan.swap_warp:
        perm = [1, 0, 2]
        p1r, p2r, pdr = p1r[perm], p2r[perm], pdr[perm]
        W, H = height, width
    else:
        W, H = width, height
    o1 = float(plan.o1); d1 = float(plan.d1)
    o2 = float(plan.o2); d2 = float(plan.d2)
    n1, n2 = plan.n1, plan.n2
    u = np.arange(W, dtype=np.float64)[:, None]

    jj = np.arange(n2, dtype=np.float64)
    p2_of_j = o2 + (jj + 0.5) * d2
    n2u = p2r[0] * u + p2r[2]
    dnu = pdr[0] * u + pdr[2]
    denv = p2r[1] - p2_of_j[None, :] * pdr[1]
    denv = np.where(np.abs(denv) < 1e-12, 1e-12, denv)
    v_star = (p2_of_j[None, :] * dnu - n2u) / denv
    den_s = pdr[0] * u + pdr[1] * v_star + pdr[2]
    den_s = np.where(np.abs(den_s) < 1e-12, 1e-12, den_s)
    p1_s = (p1r[0] * u + p1r[1] * v_star + p1r[2]) / den_s
    idx1 = np.clip((p1_s - o1) / d1 - 0.5, 0.0, n1 - 1).T  # (n2, W)

    v = np.arange(H, dtype=np.float64)[None, :]
    den = pdr[0] * u + pdr[1] * v + pdr[2]
    den = np.where(np.abs(den) < 1e-9, 1.0, den)
    p2uv = (p2r[0] * u + p2r[1] * v + p2r[2]) / den
    idx2 = np.clip((p2uv - o2) / d2 - 0.5, 0.0, n2 - 1)  # (W, H)

    def tile_spread(idx):
        R, Q = idx.shape
        Rp, Qp = _ceil_to(R, 8), _ceil_to(Q, 128)
        idx = np.pad(idx, ((0, Rp - R), (0, Qp - Q)), mode="edge")
        t = idx.reshape(Rp // 8, 8, Qp // 128, 128)
        return float((t.max(axis=(1, 3)) - t.min(axis=(1, 3))).max())

    return max(tile_spread(idx1), tile_spread(idx2))


def assert_warp_band(plan, width: int, height: int) -> None:
    """Loud guard for the banded-warp contract: the kernel's band start is
    down-aligned to 128, so a tile is exact iff its index spread fits in
    BAND - 128 - 2 texels. Out-of-band indices would silently clamp
    (quality loss); raise instead so callers fall back to the XLA warp."""
    spread = warp_band_max_spread(plan, width, height)
    if spread > BAND - 130:
        raise RuntimeError(
            f"banded warp contract violated: per-tile index spread "
            f"{spread:.1f} > {BAND - 130} (BAND={BAND}); use the XLA warp "
            f"(shearwarp.warp_to_screen) for this plan"
        )


@partial(jax.jit, static_argnames=("width", "height", "interpret",
                                   "channel_major"))
def warp_to_screen_fused(
    intermediate: jnp.ndarray,
    plan,
    width: int,
    height: int,
    interpret: bool | None = None,
    channel_major: bool = False,
) -> jnp.ndarray:
    """Drop-in fast version of :func:`.shearwarp.warp_to_screen`: identical
    two-pass definition, gathers via :func:`banded_row_lerp`.

    ``channel_major=True`` accepts the composite kernel's raw (4, n1, n2)
    layout (`shearwarp_intermediate_fused(out_layout="chw")`), skipping one
    full-image relayout on each side of the interface."""
    p1r, p2r, pdr = plan.p1row, plan.p2row, plan.pdrow
    if plan.swap_warp:
        perm = jnp.asarray([1, 0, 2])
        p1r, p2r, pdr = p1r[perm], p2r[perm], pdr[perm]
        W, H = height, width
    else:
        W, H = width, height

    o1, d1, o2, d2 = plan.o1, plan.d1, plan.o2, plan.d2
    n1, n2 = plan.n1, plan.n2
    u = jnp.arange(W, dtype=jnp.float32)
    v = jnp.arange(H, dtype=jnp.float32)

    # Index fields computed natively in (n2, W) orientation — computing
    # (W, n2) and transposing made XLA fuse a strided-transpose read into
    # the consumer fusion (~10 ms/frame at 1080p, round-5 trace).
    jj = jnp.arange(n2, dtype=jnp.float32)
    p2_of_j = o2 + (jj + 0.5) * d2
    n2u = p2r[0] * u[None, :] + p2r[2]
    dnu = pdr[0] * u[None, :] + pdr[2]
    denv = p2r[1] - p2_of_j[:, None] * pdr[1]
    denv = jnp.where(jnp.abs(denv) < 1e-12, 1e-12, denv)
    v_star = (p2_of_j[:, None] * dnu - n2u) / denv
    den_s = pdr[0] * u[None, :] + pdr[1] * v_star + pdr[2]
    den_s = jnp.where(jnp.abs(den_s) < 1e-12, 1e-12, den_s)
    p1_s = (p1r[0] * u[None, :] + p1r[1] * v_star + p1r[2]) / den_s
    idx1 = (p1_s - o1) / d1 - 0.5  # (n2, W)

    if channel_major:
        C = intermediate.shape[0]
        I_t = jnp.transpose(intermediate, (0, 2, 1))  # (C, n2, n1)
    else:
        C = intermediate.shape[-1]
        I_t = jnp.transpose(intermediate, (2, 1, 0))  # (C, n2, n1)
    # Pad each channel's row block to a multiple of 8 BEFORE flattening:
    # the band kernel computes one DMA start per 8-row tile, so a tile must
    # never straddle a channel boundary — the first rows of the next channel
    # have unrelated index ranges and would blow the band (silent clamp
    # corruption when n2 % 8 != 0; same for W in pass 2).
    n2p = _ceil_to(n2, 8)
    I_p = jnp.pad(I_t, ((0, 0), (0, n2p - n2), (0, 0)), mode="edge")
    idx1p = jnp.pad(idx1, ((0, n2p - n2), (0, 0)), mode="edge")
    rows1 = I_p.reshape(C * n2p, n1)
    M = banded_row_lerp(rows1, idx1p, interpret=interpret, groups=C)
    M = M.reshape(C, n2p, -1)[:, :n2]  # (C, n2, W)

    den = pdr[0] * u[:, None] + pdr[1] * v[None, :] + pdr[2]
    ok = jnp.abs(den) > 1e-9
    den = jnp.where(ok, den, 1.0)
    p1uv = (p1r[0] * u[:, None] + p1r[1] * v[None, :] + p1r[2]) / den
    p2uv = (p2r[0] * u[:, None] + p2r[1] * v[None, :] + p2r[2]) / den
    tplane = (plan.z0 - plan.cam[plan.axis]) / den
    j_uv = (p2uv - o2) / d2 - 0.5  # (W, H)
    M_t = jnp.transpose(M, (0, 2, 1))  # (C, W, n2)
    Wp = _ceil_to(W, 8)  # channel-aligned tiles (see pass-1 comment)
    M_p = jnp.pad(M_t, ((0, 0), (0, Wp - W), (0, 0)), mode="edge")
    idx2p = jnp.pad(j_uv, ((0, Wp - W), (0, 0)), mode="edge")
    rows2 = M_p.reshape(C * Wp, n2)
    S = banded_row_lerp(rows2, idx2p, interpret=interpret, groups=C)
    S = S.reshape(C, Wp, H)[:, :W]  # (C, W, H)

    i_uv = (p1uv - o1) / d1 - 0.5
    valid = (
        ok & (tplane > 0.0)
        & (i_uv > -1.0) & (i_uv < n1)
        & (j_uv > -1.0) & (j_uv < n2)
    )
    S = jnp.where(valid[None], S, 0.0)
    img = jnp.transpose(S, (2, 1, 0))
    if plan.swap_warp:
        img = jnp.transpose(img, (1, 0, 2))
    return img
