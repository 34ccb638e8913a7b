"""Shear-warp factorized volume renderer — the TPU fast path.

The reference renders by per-pixel ray marching with hardware trilinear
fetches (`WindowedRaymarcherMaterials.usf:36-96`). A TPU has no texture unit:
per-sample gathers are the whole performance problem (VERDICT r1/r2). This
module removes the gathers *structurally* instead of accelerating them: the
classic shear-warp factorization (Lacroute & Levoy, SIGGRAPH '94) re-expressed
TPU-first.

Factorization
-------------
The perspective viewing transform factors into

  1. a **per-slice 2D resampling** of each volume slice (along the dominant
     axis) onto a fixed "intermediate" ray grid — for a pinhole camera and an
     intermediate image plane *parallel to the slices*, the slice-k sample
     positions are affine in the grid indices with per-slice scalar
     coefficients, so the resample is **separable**: two banded (2-diagonal)
     interpolation matrices per slice, applied as batched matmuls. This is
     exactly bilinear in-slice sampling — and because sample planes sit on
     voxel centers, it equals trilinear sampling at those points.
  2. a **front-to-back composite scan** over slices: pure elementwise work
     (windowed TF, step-size opacity correction, illumination modulation,
     over-compositing with the 0.95 early-termination snap) — dense VPU math,
     no gathers, `jax.checkpoint`-blocked so plain autodiff gives a
     memory-bounded backward pass.
  3. a final **2D warp** of the composited intermediate image to screen
     pixels: a closed-form homography, evaluated as a two-pass (Catmull-Smith
     style) resample of per-row 1D `take_along_axis` lerps.

Semantics vs the reference march
--------------------------------
Samples land on slice-plane crossings instead of uniform `1/step_count`
increments along each ray; each sample uses the exact geometric inter-plane
step length in the reference's `CorrectForStepSize` law (which is defined for
any step, `RaymarcherCommon.usf:46-49`). Windowing + cutoffs, TF lookup, clip
plane, light modulation and early termination are the reference's formulas
verbatim (shared code with `ops/march.py`). The screen image is an image-space
resample of the intermediate rendering — the classic shear-warp approximation.
:func:`shearwarp_reference` is the exact oracle for this algorithm;
`tests/test_shearwarp.py` additionally golden-compares against the ray-space
march for quality.

Limitations (documented, enforced in :func:`plan_shearwarp`):
  - perspective camera must be *outside* the volume's slab along the dominant
    axis (callers fall back to the march paths otherwise);
  - no per-pixel entry jitter (slice positions are deterministic);
  - no scene-depth occlusion clamp.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .compositing import EARLY_TERMINATION_ALPHA
from .sampling import VOLUME_DENSITY, sample_windowed_transfer_function


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShearWarpPlan:
    """Host-built factorization geometry for one (camera, volume) pair.

    Array fields are per-plane coefficients ordered front-to-back; metadata
    fields are static so jit specializes on grid sizes / axis permutation.
    """

    # --- static metadata ---
    axis: int = dataclasses.field(metadata=dict(static=True))
    axes12: tuple = dataclasses.field(metadata=dict(static=True))
    n1: int = dataclasses.field(metadata=dict(static=True))
    n2: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))
    swap_warp: bool = dataclasses.field(metadata=dict(static=True))
    # --- per-plane arrays (K,) ---
    m_src: jax.Array  # volume slice index per traversal position (int32)
    lam: jax.Array  # λ per plane
    # fractional dominant-axis sampling (None when planes sit exactly on
    # voxel centers): plane value = (1-mfrac)·slice[m_src] + mfrac·slice[msrc_hi]
    msrc_hi: jax.Array | None
    mfrac: jax.Array | None
    a1: jax.Array  # sample voxel coord along axes12[0]: v1 = a1 + b1 * i
    b1: jax.Array
    a2: jax.Array
    b2: jax.Array
    la1: jax.Array  # light-volume voxel coords, same form
    lb1: jax.Array
    la2: jax.Array
    lb2: jax.Array
    lm0: jax.Array  # light slice lower index per plane (int32)
    lmt: jax.Array  # light dominant-axis lerp weight per plane
    # --- scalars (0-d arrays so the pytree stays jit-stable) ---
    cam: jax.Array  # (3,) camera position in UVW
    z0: jax.Array  # reference plane depth along `axis`
    o1: jax.Array  # intermediate grid origin/spacing on the z0 plane
    d1: jax.Array
    o2: jax.Array
    d2: jax.Array
    dlam: jax.Array  # λ spacing between consecutive planes
    # homography rows for the screen warp: x = (Pr @ (u, v, 1)) / (Pd @ ...)
    p1row: jax.Array  # (3,)
    p2row: jax.Array  # (3,)
    pdrow: jax.Array  # (3,)


def _camera_affine_dirs(camera, width: int, height: int) -> np.ndarray:
    """Affine coefficients A (3,3) with unnormalized world ray direction
    D(u, v) = A @ (u, v, 1) for pixel centers (u = col, v = row) — the numpy
    mirror of :func:`..ops.rays.camera_rays` before normalization."""
    aspect = height / width
    rot = np.asarray(camera.rotation, np.float64)
    right, up, forward = rot[0], rot[1], rot[2]
    t = float(camera.tan_half_fov)
    # px = ((u + 0.5) / width * 2 - 1) * t ; py = (1 - (v + 0.5)/height*2) * t*aspect
    du = 2.0 * t / width
    dv = -2.0 * t * aspect / height
    px0 = (0.5 / width * 2.0 - 1.0) * t
    py0 = (1.0 - 0.5 / height * 2.0) * t * aspect
    A = np.zeros((3, 3))
    A[:, 0] = du * right
    A[:, 1] = dv * up
    A[:, 2] = px0 * right + py0 * up + forward
    return A


def plan_shearwarp(
    camera,
    transform,
    vol_dims,
    light_dims,
    width: int,
    height: int,
    oversample: float = 1.0,
    max_n: int = 2048,
    align: int = 128,
    max_planes: int | None = None,
):
    """Build a :class:`ShearWarpPlan`, or return ``None`` when the geometry
    is outside the factorization's domain (camera inside the dominant slab,
    or degenerate view). Host-side numpy; call with concrete values.
    """
    vol_dims = tuple(int(d) for d in vol_dims)
    light_dims = tuple(int(d) for d in light_dims)
    rot = np.asarray(transform.rotation, np.float64)
    trans = np.asarray(transform.translation, np.float64)
    scale = np.asarray(transform.scale, np.float64)
    cam_local = (np.asarray(camera.position, np.float64) - trans) @ rot.T / scale
    c = cam_local + 0.5  # UVW

    # Dominant axis: strongest component of camera -> cube-center direction.
    view = np.array([0.5, 0.5, 0.5]) - c
    nv = np.linalg.norm(view)
    if nv < 1e-9:
        return None
    d_axis = int(np.argmax(np.abs(view)))
    a1_axis, a2_axis = [a for a in range(3) if a != d_axis]
    D = vol_dims[d_axis]

    # Plane depths ordered front-to-back from the camera. At full quality
    # planes sit on voxel centers (exact slice takes); with ``max_planes``
    # (the shear-warp analogue of the reference's `RaymarchingSteps` density
    # knob, `RaymarchVolume.h:186-189`) K uniformly-spaced planes sample
    # between slices via a two-slice lerp.
    if max_planes is None or max_planes >= D:
        idx = np.arange(D, dtype=np.float64)
    else:
        idx = np.linspace(0.0, D - 1.0, max(int(max_planes), 2))
    if c[d_axis] > 0.5:
        idx = idx[::-1]
    wp = (idx + 0.5) / D
    m0 = np.clip(np.floor(idx), 0, D - 1).astype(np.int32)
    mfr = idx - m0
    exact = bool(np.all(mfr == 0.0))
    K = len(idx)
    z0 = wp[0]
    denom = z0 - c[d_axis]
    if abs(denom) < 1e-6 or (0.0 < c[d_axis] < 1.0):
        return None  # camera inside the slab (or on the reference plane)
    lam = (wp - c[d_axis]) / denom  # (K,), lam[0] == 1, increasing magnitude
    dlam = float(lam[1] - lam[0]) if K > 1 else 1.0 / D / abs(denom)

    # Footprint on the z0 plane: union over planes of the preimage of [0,1].
    def preimage(c_a):
        lo = c_a + (0.0 - c_a) / lam
        hi = c_a + (1.0 - c_a) / lam
        lo, hi = np.minimum(lo, hi), np.maximum(lo, hi)
        return float(lo.min()), float(hi.max())

    g1lo, g1hi = preimage(c[a1_axis])
    g2lo, g2hi = preimage(c[a2_axis])
    eps = 1e-4
    g1lo, g1hi = g1lo - eps, g1hi + eps
    g2lo, g2hi = g2lo - eps, g2hi + eps

    # Screen -> plane homography (for resolution choice and the final warp).
    A = _camera_affine_dirs(camera, width, height)  # world dirs
    # to local: D_local = (A^T rows transformed) — inverse-rotate, inverse-scale
    Al = (A.T @ rot.T).T / scale[:, None]  # rows: local dir components
    kappa = z0 - c[d_axis]
    p1row = c[a1_axis] * Al[d_axis] + kappa * Al[a1_axis]
    p2row = c[a2_axis] * Al[d_axis] + kappa * Al[a2_axis]
    pdrow = Al[d_axis].copy()

    # Required grid spacing: the screen-projected plane-coordinate footprint
    # per pixel, sampled on a coarse grid over pixels that hit the footprint.
    us = np.linspace(0, width - 1, 65)
    vs = np.linspace(0, height - 1, 65)
    uu, vv = np.meshgrid(us, vs, indexing="xy")
    den = pdrow[0] * uu + pdrow[1] * vv + pdrow[2]
    ok = np.abs(den) > 1e-9
    den = np.where(ok, den, 1.0)
    p1 = (p1row[0] * uu + p1row[1] * vv + p1row[2]) / den
    p2 = (p2row[0] * uu + p2row[1] * vv + p2row[2]) / den
    # forward-facing: plane on the +t side of the ray
    tplane = kappa / den
    hit = (
        ok
        & (tplane > 0)
        & (p1 >= g1lo)
        & (p1 <= g1hi)
        & (p2 >= g2lo)
        & (p2 <= g2hi)
    )
    sx = (us[1] - us[0]) if len(us) > 1 else 1.0
    sy = (vs[1] - vs[0]) if len(vs) > 1 else 1.0

    def spacing(p):
        gu = np.abs(np.gradient(p, axis=1)) / sx
        gv = np.abs(np.gradient(p, axis=0)) / sy
        # Per-pixel requirement along the axis's fastest screen direction;
        # the 2-norm over-requires by up to sqrt(2). Median over footprint
        # pixels matches the typical pixel's sampling density (the 5th
        # percentile blew the grid up ~2.2x per axis -> HBM OOM at 1080p).
        g = np.maximum(gu, gv)
        g = g[hit]
        g = g[g > 1e-12]
        if g.size == 0:
            return None
        return float(np.median(g))

    s1 = spacing(p1)
    s2 = spacing(p2)

    def choose_n(extent, sp, dim):
        n = dim if sp is None else int(math.ceil(extent / sp * oversample))
        n = max(n, 16)
        n = min(n, max_n)
        return -(-n // align) * align

    n1 = choose_n(g1hi - g1lo, s1, vol_dims[a1_axis])
    n2 = choose_n(g2hi - g2lo, s2, vol_dims[a2_axis])
    # Total-sample budget: the composite materializes (block, n1, n2) f32
    # fields; cap the grid near the screen's own pixel count so HBM peak
    # stays bounded regardless of camera.
    max_pixels = max(int(0.8 * width * height), 256 * 256)
    if n1 * n2 > max_pixels:
        scale = math.sqrt(max_pixels / (n1 * n2))
        n1 = max(align, int(n1 * scale) // align * align)
        n2 = max(align, int(n2 * scale) // align * align)
    if align >= 128:
        # Quantize so a zooming camera reuses jit variants (grid sizes are
        # static: every new (n1, n2) is a fresh compile). Quantum is
        # lcm(256, align), not 256: for align = 128*ncols with ncols not a
        # power of two (multi-device column sharding, e.g. 384), a bare
        # 256-ceil would break the align divisibility contract.
        quantum = 256 * align // math.gcd(256, align)
        cap = max(align, max_n // align * align)
        n1 = max(align, min(-(-n1 // quantum) * quantum, cap))
        n2 = max(align, min(-(-n2 // quantum) * quantum, cap))
    d1 = (g1hi - g1lo) / n1
    d2 = (g2hi - g2lo) / n2

    # Per-plane affine voxel coordinates: grid point i sits at
    # g1 = g1lo + (i + 0.5) d1 on the z0 plane; at plane p the sample is
    # x1 = c1 (1 - λ) + λ g1, in voxel units v1 = x1 * D1 - 0.5.
    def coeffs(c_a, glo, dg, dim):
        a = (c_a * (1.0 - lam) + lam * (glo + 0.5 * dg)) * dim - 0.5
        b = lam * dg * dim
        return a, b

    D1, D2 = vol_dims[a1_axis], vol_dims[a2_axis]
    a1, b1 = coeffs(c[a1_axis], g1lo, d1, D1)
    a2, b2 = coeffs(c[a2_axis], g2lo, d2, D2)
    L1, L2 = light_dims[a1_axis], light_dims[a2_axis]
    la1, lb1 = coeffs(c[a1_axis], g1lo, d1, L1)
    la2, lb2 = coeffs(c[a2_axis], g2lo, d2, L2)
    LD = light_dims[d_axis]
    lv = wp * LD - 0.5
    lm0 = np.clip(np.floor(lv), 0, LD - 1).astype(np.int32)
    lmt = np.clip(lv - lm0, 0.0, 1.0)

    # Warp pass pairing: if the homography maps i mostly along screen-v,
    # swap u/v roles in the two-pass warp (avoids the rotation bottleneck).
    cu, cv = width / 2.0, height / 2.0
    den_c = pdrow[0] * cu + pdrow[1] * cv + pdrow[2]
    if abs(den_c) > 1e-9:
        J = np.zeros((2, 2))
        for r, prow in enumerate((p1row, p2row)):
            num_c = prow[0] * cu + prow[1] * cv + prow[2]
            J[r, 0] = (prow[0] * den_c - num_c * pdrow[0]) / den_c**2
            J[r, 1] = (prow[1] * den_c - num_c * pdrow[1]) / den_c**2
        swap_warp = bool(
            abs(J[0, 0] * J[1, 1]) < abs(J[0, 1] * J[1, 0])
        )
    else:
        swap_warp = False

    f32 = partial(jnp.asarray, dtype=jnp.float32)
    return ShearWarpPlan(
        axis=d_axis,
        axes12=(a1_axis, a2_axis),
        n1=int(n1),
        n2=int(n2),
        k=int(K),
        swap_warp=swap_warp,
        m_src=jnp.asarray(m0, jnp.int32),
        msrc_hi=None if exact else jnp.asarray(
            np.minimum(m0 + 1, D - 1), jnp.int32
        ),
        mfrac=None if exact else f32(mfr),
        lam=f32(lam),
        a1=f32(a1),
        b1=f32(b1),
        a2=f32(a2),
        b2=f32(b2),
        la1=f32(la1),
        lb1=f32(lb1),
        la2=f32(la2),
        lb2=f32(lb2),
        lm0=jnp.asarray(lm0, jnp.int32),
        lmt=f32(lmt),
        cam=f32(c),
        z0=f32(z0),
        o1=f32(g1lo),
        d1=f32(d1),
        o2=f32(g2lo),
        d2=f32(d2),
        dlam=f32(abs(dlam)),
        p1row=f32(p1row),
        p2row=f32(p2row),
        pdrow=f32(pdrow),
    )


def _volume_planes(vol_t, plan, nearest=False):
    """Front-to-back volume sample planes (K, D1, D2): exact slice takes,
    or a two-slice lerp when the plan uses fractional `max_planes`
    positions (mirrors the light volume's lm0/lmt sampling).
    ``nearest`` rounds to the closest slice instead (octree mode's
    `Texture3D.Load` semantics)."""
    if plan.mfrac is None:
        return jnp.take(vol_t, plan.m_src, axis=0)
    if nearest:
        sel = jnp.where(plan.mfrac < 0.5, plan.m_src, plan.msrc_hi)
        return jnp.take(vol_t, sel, axis=0)
    v0 = jnp.take(vol_t, plan.m_src, axis=0)
    v1 = jnp.take(vol_t, plan.msrc_hi, axis=0)
    t = plan.mfrac[:, None, None]
    return v0 * (1.0 - t) + v1 * t


def _plane_value_ranges(sl_mn, sl_mx, plan):
    """Conservative per-plane (min, max) from per-slice stats — plane
    values are convex combinations of (at most two) slices' texels."""
    pmn = jnp.take(sl_mn, plan.m_src)
    pmx = jnp.take(sl_mx, plan.m_src)
    if plan.mfrac is not None:
        pmn = jnp.minimum(pmn, jnp.take(sl_mn, plan.msrc_hi))
        pmx = jnp.maximum(pmx, jnp.take(sl_mx, plan.msrc_hi))
    return pmn, pmx


def _resample_matrices(a, b, dim, n, dtype, nearest=False):
    """Banded linear-interpolation matrices S (B, dim, n):
    S[p, m, i] = hat(clip(a[p] + b[p] * i, 0, dim-1) - m); with ``nearest``
    a one-hot selection of floor(v + 0.5) (`Texture3D.Load` truncation in
    texel units, octree mode)."""
    i = jnp.arange(n, dtype=jnp.float32)
    v = a[:, None] + b[:, None] * i[None, :]  # (B, n)
    vc = jnp.clip(v, 0.0, float(dim - 1))
    m = jnp.arange(dim, dtype=jnp.float32)
    if nearest:
        sel = jnp.floor(vc + 0.5)
        S = (sel[:, None, :] == m[None, :, None]).astype(jnp.float32)
    else:
        S = jnp.maximum(0.0, 1.0 - jnp.abs(vc[:, None, :] - m[None, :, None]))
    return S.astype(dtype)


def _resample_block(slices, a1, b1, a2, b2, n1, n2, dtype, nearest=False):
    """(B, D1, D2) slices -> (B, n1, n2) sheared samples via two batched
    banded matmuls (runs on the MXU; exactly separable bilinear — or
    one-hot nearest selection for octree mode)."""
    B, D1, D2 = slices.shape
    S1 = _resample_matrices(a1, b1, D1, n1, dtype, nearest)  # (B, D1, n1)
    S2 = _resample_matrices(a2, b2, D2, n2, dtype, nearest)  # (B, D2, n2)
    t = jnp.einsum(
        "bdn,bde->bne", S1, slices.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    out = jnp.einsum(
        "bne,bem->bnm", t.astype(dtype), S2,
        preferred_element_type=jnp.float32,
    )
    return out


@partial(
    jax.jit,
    static_argnames=(
        "block_size",
        "early_termination",
        "stop_early",
        "compute_dtype",
        "tf_unit",
    ),
)
def shearwarp_intermediate(
    volume: jnp.ndarray,
    tf_table: jnp.ndarray,
    light_volume: jnp.ndarray,
    plan: ShearWarpPlan,
    windowing_vec4: jnp.ndarray,
    clip_center: jnp.ndarray,
    clip_direction: jnp.ndarray,
    block_size: int = 8,
    early_termination: float = EARLY_TERMINATION_ALPHA,
    stop_early: bool = False,
    compute_dtype=jnp.float32,
    tf_unit: str = "xla",
) -> jnp.ndarray:
    """Composite the volume front-to-back onto the intermediate ray grid.

    Returns (n1, n2, 4) RGBA. Differentiable w.r.t. volume / TF / windowing /
    light volume when ``stop_early=False`` (the `lax.scan` path; blocks are
    `jax.checkpoint`-ed). ``stop_early=True`` uses a `lax.while_loop` that
    stops once every intermediate ray has terminated — forward-only.
    """
    n1, n2, K = plan.n1, plan.n2, plan.k
    B = block_size
    nblk = -(-K // B)
    Kp = nblk * B

    ax = (plan.axis,) + plan.axes12
    vol_t = jnp.transpose(volume, ax)  # (D, D1, D2)
    light_t = jnp.transpose(light_volume, ax)

    def pad_to(x, n):
        return jnp.concatenate([x, jnp.repeat(x[-1:], n - x.shape[0], 0)], 0) \
            if x.shape[0] < n else x

    vplanes_all = pad_to(_volume_planes(vol_t, plan), Kp)
    coeff = [pad_to(x, Kp) for x in (
        plan.a1, plan.b1, plan.a2, plan.b2,
        plan.la1, plan.lb1, plan.la2, plan.lb2, plan.lmt,
    )]
    lm0 = pad_to(plan.lm0, Kp)
    lm0_hi = jnp.minimum(lm0 + 1, light_t.shape[0] - 1)
    # Padding planes replicate the last plane but are masked out.
    plane_valid = (jnp.arange(Kp) < K)

    # Per-ray geometric step length: |g - c| * Δλ (constant over planes
    # because planes are uniformly spaced — dpos/dλ = g - c).
    ii = jnp.arange(n1, dtype=jnp.float32)
    jj = jnp.arange(n2, dtype=jnp.float32)
    g1 = plan.o1 + (ii + 0.5) * plan.d1  # (n1,)
    g2 = plan.o2 + (jj + 0.5) * plan.d2  # (n2,)
    c1, c2, cd = (plan.cam[a] for a in (*plan.axes12, plan.axis))
    r = jnp.sqrt(
        (g1[:, None] - c1) ** 2
        + (g2[None, :] - c2) ** 2
        + (plan.z0 - cd) ** 2
    )  # (n1, n2)
    step_world = VOLUME_DENSITY * r * plan.dlam

    # Clip-plane dot product is affine in λ: e0 + λ e1(i, j).
    cc = jnp.asarray(clip_center, jnp.float32)
    cdn = jnp.asarray(clip_direction, jnp.float32)
    a1x, a2x, dx = plan.axes12[0], plan.axes12[1], plan.axis
    e0 = jnp.sum((plan.cam - cc) * cdn)
    e1 = (
        (g1[:, None] - c1) * cdn[a1x]
        + (g2[None, :] - c2) * cdn[a2x]
        + (plan.z0 - cd) * cdn[dx]
    )  # (n1, n2)

    D1 = volume.shape[a1x]
    D2 = volume.shape[a2x]

    def block_values(b):
        """Sheared volume + light samples and masks for block b."""
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, b * B, B)
        a1b, b1b, a2b, b2b, la1b, lb1b, la2b, lb2b, lmtb = (
            sl(x) for x in coeff
        )
        vblk = sl(vplanes_all)  # (B, D1, D2)
        vals = _resample_block(
            vblk, a1b, b1b, a2b, b2b, n1, n2, compute_dtype
        )
        l0 = jnp.take(light_t, sl(lm0), axis=0)
        l1 = jnp.take(light_t, sl(lm0_hi), axis=0)
        t = lmtb[:, None, None]
        lblk = l0 * (1.0 - t) + l1 * t
        light = _resample_block(
            lblk, la1b, lb1b, la2b, lb2b, n1, n2, compute_dtype
        )
        # in-cube masks: sample voxel coord within [-0.5, dim - 0.5]
        v1 = a1b[:, None] + b1b[:, None] * ii[None, :]  # (B, n1)
        v2 = a2b[:, None] + b2b[:, None] * jj[None, :]  # (B, n2)
        in1 = (v1 >= -0.5) & (v1 <= D1 - 0.5)
        in2 = (v2 >= -0.5) & (v2 <= D2 - 0.5)
        lamb = sl(plan.lam)
        clipped = (e0 + lamb[:, None, None] * e1[None]) <= 0.0
        m = (
            in1[:, :, None]
            & in2[:, None, :]
            & ~clipped
            & sl(plane_valid)[:, None, None]
        )
        return vals, light, m

    def block_composite(carry, b):
        rgb_acc, alpha_acc, terminated = carry
        vals, light, m = block_values(b)
        if tf_unit == "pallas":
            # Differentiable Pallas TF unit (custom VJP): forward lookups
            # via lane shuffles, backward histogram on the MXU — the XLA
            # table gathers/scatters cost seconds/frame here.
            from .pallas_tf import windowed_tf_rgba

            rgba = windowed_tf_rgba(
                vals, tf_table, windowing_vec4,
                jnp.broadcast_to(step_world[None], vals.shape),
            )
        else:
            rgba = sample_windowed_transfer_function(
                vals, step_world[None], tf_table, windowing_vec4
            )
        a = jnp.where(m, rgba[..., 3], 0.0)
        rgb = jnp.where(
            m[..., None], rgba[..., :3] * light[..., None], 0.0
        )
        one_minus = 1.0 - a
        t_incl = jnp.cumprod(one_minus, axis=0)
        t_excl = jnp.concatenate(
            [jnp.ones_like(t_incl[:1]), t_incl[:-1]], axis=0
        )
        alpha_after = alpha_acc[None] + (1.0 - alpha_acc[None]) * (1.0 - t_incl)
        crossed = m & (alpha_after > early_termination)
        any_crossed = jnp.any(crossed, axis=0)
        kc = jnp.argmax(crossed, axis=0)
        step_ids = jnp.arange(B).reshape((B, 1, 1))
        contrib = jnp.where(any_crossed[None], step_ids <= kc[None], True)
        contrib = contrib & ~terminated[None]
        w = jnp.where(contrib, t_excl * a, 0.0)
        rgb_out = rgb_acc + (1.0 - alpha_acc)[..., None] * jnp.sum(
            w[..., None] * rgb, axis=0
        )
        alpha_noterm = alpha_acc + (1.0 - alpha_acc) * (1.0 - t_incl[-1])
        newly = any_crossed & ~terminated
        alpha_out = jnp.where(
            newly, 1.0, jnp.where(terminated, alpha_acc, alpha_noterm)
        )
        return (rgb_out, alpha_out, terminated | any_crossed), None

    init = (
        jnp.zeros((n1, n2, 3), jnp.float32),
        jnp.zeros((n1, n2), jnp.float32),
        jnp.zeros((n1, n2), bool),
    )
    if stop_early:
        # Empty-space skipping (forward-only, exact): a block whose slices'
        # value range can produce no windowed-TF alpha contributes nothing —
        # skip its resample matmuls + TF entirely. Shares the interval
        # argument with `octree.occupancy_grid` (samples are convex
        # combinations of the block's slice texels).
        from .transfer import windowed_tf_range_occupied

        sl_mn = jnp.min(vol_t, axis=(1, 2))  # (D,)
        sl_mx = jnp.max(vol_t, axis=(1, 2))
        pmn, pmx = _plane_value_ranges(sl_mn, sl_mx, plan)
        pl_mn = pad_to(pmn, Kp).reshape(nblk, B)
        pl_mx = pad_to(pmx, Kp).reshape(nblk, B)
        blk_occ = windowed_tf_range_occupied(
            jnp.min(pl_mn, axis=1), jnp.max(pl_mx, axis=1),
            windowing_vec4, tf_table,
        )  # (nblk,)

        def cond(state):
            b, carry = state
            return (b < nblk) & ~jnp.all(carry[2])

        def body(state):
            b, carry = state
            carry = jax.lax.cond(
                blk_occ[b],
                lambda c: block_composite(c, b)[0],
                lambda c: c,
                carry,
            )
            return (b + 1, carry)

        _, (rgb, alpha, _) = jax.lax.while_loop(cond, body, (0, init))
    else:
        (rgb, alpha, _), _ = jax.lax.scan(
            jax.checkpoint(block_composite), init, jnp.arange(nblk)
        )
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def _lerp_take(rows: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-row 1D linear interpolation: out[r, q] = lerp(rows[r], idx[r, q])
    with clamp-to-edge; out-of-range by more than one texel reads edge values
    (callers mask true out-of-image lookups)."""
    n = rows.shape[-1]
    ic = jnp.clip(idx, 0.0, float(n - 1))
    i0 = jnp.floor(ic)
    fr = ic - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    r0 = jnp.take_along_axis(rows, i0, axis=-1)
    r1 = jnp.take_along_axis(rows, i1, axis=-1)
    return r0 + (r1 - r0) * fr


@partial(jax.jit, static_argnames=("width", "height"))
def warp_to_screen(
    intermediate: jnp.ndarray,
    plan: ShearWarpPlan,
    width: int,
    height: int,
) -> jnp.ndarray:
    """Resample the (n1, n2, C) intermediate image to the (height, width, C)
    screen via the plan's homography, in two 1D passes (Catmull-Smith):

      pass 1:  M[j, u] = I[i*(u, j), j]   (lerp along i, per intermediate row)
      pass 2:  S[u, v] = M[j(u, v), u]    (lerp along j, per screen column)

    where i*(u, j) = i(u, v(u, j)) and v(u, j) inverts the j-homography in v
    for fixed u (closed form). Screen pixels whose ray does not cross the
    reference plane forward (or falls outside the grid) get RGBA 0.
    """
    p1r, p2r, pdr = plan.p1row, plan.p2row, plan.pdrow
    if plan.swap_warp:
        # Swap the roles of screen u and v in the passes: permute the
        # homography's u/v columns and transpose the result at the end.
        perm = jnp.asarray([1, 0, 2])
        p1r, p2r, pdr = p1r[perm], p2r[perm], pdr[perm]
        W, H = height, width
    else:
        W, H = width, height

    o1, d1, o2, d2 = plan.o1, plan.d1, plan.o2, plan.d2
    n1, n2 = plan.n1, plan.n2
    u = jnp.arange(W, dtype=jnp.float32)
    v = jnp.arange(H, dtype=jnp.float32)

    # j-homography: j(u, v) = (p2 - o2)/d2 - 0.5 with p2 = N2(u,v)/Dn(u,v).
    # Invert for v at fixed (u, target j):  j = (n2u + p2r[1] v)/(du + pdr[1] v)
    # where n2u = p2r[0] u + p2r[2], du = pdr[0] u + pdr[2], and j here is the
    # *plane coordinate* p2. Solve: v = (p2 * du - n2u) / (p2r[1] - p2 * pdr[1]).
    jj = jnp.arange(n2, dtype=jnp.float32)
    p2_of_j = o2 + (jj + 0.5) * d2  # (n2,)
    n2u = p2r[0] * u[:, None] + p2r[2]  # (W, 1)
    dnu = pdr[0] * u[:, None] + pdr[2]  # (W, 1)
    denv = p2r[1] - p2_of_j[None, :] * pdr[1]  # (W broadcast, n2)
    denv = jnp.where(jnp.abs(denv) < 1e-12, 1e-12, denv)
    v_star = (p2_of_j[None, :] * dnu - n2u) / denv  # (W, n2)
    # i*(u, j) from the i-homography at (u, v*):
    den_s = pdr[0] * u[:, None] + pdr[1] * v_star + pdr[2]
    den_s = jnp.where(jnp.abs(den_s) < 1e-12, 1e-12, den_s)
    p1_s = (p1r[0] * u[:, None] + p1r[1] * v_star + p1r[2]) / den_s
    i_star = (p1_s - o1) / d1 - 0.5  # (W, n2)

    # pass 1: for each intermediate column j, lerp along i.
    # I is (n1, n2, C); arrange rows as (n2, n1) per channel.
    C = intermediate.shape[-1]
    I_t = jnp.transpose(intermediate, (2, 1, 0))  # (C, n2, n1)
    idx1 = jnp.transpose(i_star, (1, 0))  # (n2, W)
    M = _lerp_take(I_t, jnp.broadcast_to(idx1[None], (C,) + idx1.shape))

    # pass 2: for each screen column u, lerp along j at j(u, v).
    den = pdr[0] * u[:, None] + pdr[1] * v[None, :] + pdr[2]  # (W, H)
    ok = jnp.abs(den) > 1e-9
    den = jnp.where(ok, den, 1.0)
    p1uv = (p1r[0] * u[:, None] + p1r[1] * v[None, :] + p1r[2]) / den
    p2uv = (p2r[0] * u[:, None] + p2r[1] * v[None, :] + p2r[2]) / den
    tplane = (plan.z0 - plan.cam[plan.axis]) / den
    j_uv = (p2uv - o2) / d2 - 0.5  # (W, H)
    M_t = jnp.transpose(M, (0, 2, 1))  # (C, W, n2)
    S = _lerp_take(M_t, jnp.broadcast_to(j_uv[None], (C,) + j_uv.shape))

    i_uv = (p1uv - o1) / d1 - 0.5
    valid = (
        ok
        & (tplane > 0.0)
        & (i_uv > -1.0)
        & (i_uv < n1)
        & (j_uv > -1.0)
        & (j_uv < n2)
    )
    S = jnp.where(valid[None], S, 0.0)
    img = jnp.transpose(S, (2, 1, 0))  # (H, W, C)
    if plan.swap_warp:
        img = jnp.transpose(img, (1, 0, 2))
    return img


@partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "block_size",
        "early_termination",
        "stop_early",
        "compute_dtype",
    ),
)
def shearwarp_lit(
    volume,
    tf_table,
    light_volume,
    plan: ShearWarpPlan,
    windowing_vec4,
    clip_center,
    clip_direction,
    width: int,
    height: int,
    block_size: int = 8,
    early_termination: float = EARLY_TERMINATION_ALPHA,
    stop_early: bool = False,
    compute_dtype=jnp.float32,
):
    """Full shear-warp lit render to an (height, width, 4) screen image."""
    inter = shearwarp_intermediate(
        volume,
        tf_table,
        light_volume,
        plan,
        windowing_vec4,
        clip_center,
        clip_direction,
        block_size=block_size,
        early_termination=early_termination,
        stop_early=stop_early,
        compute_dtype=compute_dtype,
    )
    return warp_to_screen(inter, plan, width, height)


def depth_to_lambda_max(plan: ShearWarpPlan, scene_depth, width: int,
                        height: int) -> jnp.ndarray:
    """(n1, n2) per-intermediate-pixel λ ceiling from an (H, W) scene-depth
    map (distances along the normalized local ray — the units
    `rays.setup_rays`'s ``scene_depth`` uses; `rays.scene_depth_from_plane`
    is a producer). The sample at plane k sits at camera distance r·λ_k,
    so the fused composite masks planes with λ > depth/r — the shear-warp
    form of the reference's depth-buffer clamp
    (`RaymarchMaterialCommon.usf:26-44`).

    The grid→screen map is the inverse homography (closed form): solve the
    2x2 linear system (p_row − g·pd_row)·(u, v, 1) = 0 per grid point,
    then bilinearly sample the depth map.
    """
    depth = jnp.asarray(scene_depth, jnp.float32)
    ii = jnp.arange(plan.n1, dtype=jnp.float32)
    jj = jnp.arange(plan.n2, dtype=jnp.float32)
    g1 = plan.o1 + (ii + 0.5) * plan.d1  # (n1,)
    g2 = plan.o2 + (jj + 0.5) * plan.d2  # (n2,)
    p1r, p2r, pdr = plan.p1row, plan.p2row, plan.pdrow
    a11 = (p1r[0] - g1 * pdr[0])[:, None]
    a12 = (p1r[1] - g1 * pdr[1])[:, None]
    b1 = -(p1r[2] - g1 * pdr[2])[:, None]
    a21 = (p2r[0] - g2 * pdr[0])[None, :]
    a22 = (p2r[1] - g2 * pdr[1])[None, :]
    b2 = -(p2r[2] - g2 * pdr[2])[None, :]
    det = a11 * a22 - a12 * a21
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    u = (b1 * a22 - a12 * b2) / det  # (n1, n2) screen column
    v = (a11 * b2 - b1 * a21) / det  # (n1, n2) screen row

    uc = jnp.clip(u, 0.0, width - 1.0)
    vc = jnp.clip(v, 0.0, height - 1.0)
    u0 = jnp.floor(uc)
    v0 = jnp.floor(vc)
    fu = uc - u0
    fv = vc - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, width - 1)
    v1 = jnp.minimum(v0 + 1, height - 1)
    flat = depth.reshape(-1)

    def at(vi, ui):
        return jnp.take(flat, vi * width + ui)

    d = (
        at(v0, u0) * (1 - fu) * (1 - fv) + at(v0, u1) * fu * (1 - fv)
        + at(v1, u0) * (1 - fu) * fv + at(v1, u1) * fu * fv
    )

    c1, c2, cd = (plan.cam[a] for a in (*plan.axes12, plan.axis))
    r = jnp.sqrt(
        (g1[:, None] - c1) ** 2 + (g2[None, :] - c2) ** 2
        + (plan.z0 - cd) ** 2
    )
    return jnp.where(jnp.isfinite(d), d / r, jnp.inf)


# ---------------------------------------------------------------------------
# Oracle: direct (gather-based) implementation of the same algorithm.
# ---------------------------------------------------------------------------

def shearwarp_reference(
    volume,
    tf_table,
    light_volume,
    plan: ShearWarpPlan,
    windowing_vec4,
    clip_center,
    clip_direction,
    early_termination: float = EARLY_TERMINATION_ALPHA,
):
    """Sequential plane-by-plane oracle for :func:`shearwarp_intermediate`:
    true trilinear samples at the plane positions, scalar over-compositing
    with the reference's early-termination snap. Slow; for tests."""
    from .sampling import trilinear_sample

    n1, n2 = plan.n1, plan.n2
    ii = np.arange(n1) + 0.5
    jj = np.arange(n2) + 0.5
    o1 = float(plan.o1); d1 = float(plan.d1)
    o2 = float(plan.o2); d2 = float(plan.d2)
    g1 = o1 + ii * d1
    g2 = o2 + jj * d2
    c = np.asarray(plan.cam, np.float64)
    z0 = float(plan.z0)
    a1x, a2x, dx = plan.axes12[0], plan.axes12[1], plan.axis
    g = np.zeros((n1, n2, 3))
    g[..., a1x] = g1[:, None]
    g[..., a2x] = g2[None, :]
    g[..., dx] = z0
    r = np.linalg.norm(g - c, axis=-1)
    step_world = VOLUME_DENSITY * r * float(plan.dlam)

    lam = np.asarray(plan.lam, np.float64)
    rgb = np.zeros((n1, n2, 3))
    alpha = np.zeros((n1, n2))
    terminated = np.zeros((n1, n2), bool)
    wv = np.asarray(windowing_vec4, np.float32)
    cc = np.asarray(clip_center, np.float64)
    cd = np.asarray(clip_direction, np.float64)
    for p in range(plan.k):
        pos = c + (g - c) * lam[p]
        in_cube = np.all((pos[..., [a1x, a2x]] >= 0.0)
                         & (pos[..., [a1x, a2x]] <= 1.0), axis=-1)
        clipped = np.sum((pos - cc) * cd, axis=-1) <= 0.0
        m = in_cube & ~clipped & ~terminated
        vals = np.asarray(
            trilinear_sample(jnp.asarray(volume), jnp.asarray(pos, jnp.float32))
        )
        rgba = np.asarray(
            sample_windowed_transfer_function(
                jnp.asarray(vals), jnp.asarray(step_world, jnp.float32),
                jnp.asarray(tf_table), jnp.asarray(wv),
            )
        )
        light = np.asarray(
            trilinear_sample(
                jnp.asarray(light_volume),
                jnp.asarray(np.clip(pos, 0.0, 1.0), jnp.float32),
            )
        )
        a = np.where(m, rgba[..., 3], 0.0)
        rgb = rgb + (1.0 - alpha)[..., None] * a[..., None] * (
            rgba[..., :3] * light[..., None]
        )
        alpha_new = alpha + (1.0 - alpha) * a
        hit = m & (alpha_new > early_termination)
        alpha = np.where(hit, 1.0, alpha_new)
        terminated |= hit
    return np.concatenate([rgb, alpha[..., None]], axis=-1)


def shearwarp_jittered_oracle(
    volume,
    tf_table,
    light_volume,
    plan: ShearWarpPlan,
    windowing_vec4,
    clip_center,
    clip_direction,
    jitter=None,
    depth_lam=None,
    early_termination: float = EARLY_TERMINATION_ALPHA,
    mode: str = "lit",
    sample_nearest: bool = False,
):
    """Dense mirror of the fused kernel's jitter/scene-depth/mode semantics.

    Jittered shear-warp is *defined* as the per-pixel λ-lerp of adjacent
    pre-sheared planes (value, light, in-plane coords and λ are all affine
    in λ); this oracle evaluates that definition directly with plain jnp
    ops, plane by plane, for equality tests against
    `shearwarp_pallas.shearwarp_intermediate_fused(jitter=..., depth_lam=...)`.
    """
    from .shearwarp_pallas import _clip_step_fields

    n1, n2, K = plan.n1, plan.n2, plan.k
    ax = (plan.axis,) + plan.axes12
    vol_t = jnp.transpose(volume, ax)
    vplanes = _volume_planes(vol_t, plan, nearest=sample_nearest)
    W = _resample_block(vplanes, plan.a1, plan.b1, plan.a2, plan.b2,
                        n1, n2, jnp.float32, nearest=sample_nearest)
    W = jnp.concatenate([W, W[-1:]], 0)
    if mode == "lit":
        light_t = jnp.transpose(light_volume, ax)
        l0 = jnp.take(light_t, plan.lm0, axis=0)
        l1 = jnp.take(
            light_t, jnp.minimum(plan.lm0 + 1, light_t.shape[0] - 1), axis=0
        )
        lplanes = (l0 * (1.0 - plan.lmt[:, None, None])
                   + l1 * plan.lmt[:, None, None])
        L = _resample_block(lplanes, plan.la1, plan.lb1, plan.la2, plan.lb2,
                            n1, n2, jnp.float32)
        L = jnp.concatenate([L, L[-1:]], 0)
    else:
        L = jnp.ones_like(W)

    def ext(x):
        return jnp.concatenate(
            [x, 2.0 * x[-1:] - x[-2:-1] if x.shape[0] >= 2 else x[-1:]]
        )

    a1, b1, a2, b2, lam = (
        ext(x) for x in (plan.a1, plan.b1, plan.a2, plan.b2, plan.lam)
    )
    step_world, e0, e1 = _clip_step_fields(plan, clip_center, clip_direction)
    delta = (jnp.zeros((n1, n2), jnp.float32) if jitter is None
             else jnp.asarray(jitter, jnp.float32))
    lmax = (jnp.full((n1, n2), jnp.inf) if depth_lam is None
            else jnp.asarray(depth_lam, jnp.float32))
    ii = jnp.arange(n1, dtype=jnp.float32)[:, None]
    jj = jnp.arange(n2, dtype=jnp.float32)[None, :]
    D1 = volume.shape[plan.axes12[0]]
    D2 = volume.shape[plan.axes12[1]]

    rgb = jnp.zeros((n1, n2, 3))
    alpha = jnp.zeros((n1, n2))
    term = jnp.zeros((n1, n2), bool)
    for k in range(K):
        v1k = a1[k] + b1[k] * ii
        v1n = a1[k + 1] + b1[k + 1] * ii
        v2k = a2[k] + b2[k] * jj
        v2n = a2[k + 1] + b2[k + 1] * jj
        v1 = v1k + delta * (v1n - v1k)
        v2 = v2k + delta * (v2n - v2k)
        lam_px = lam[k] + delta * (lam[k + 1] - lam[k])
        m = (
            (v1 >= -0.5) & (v1 <= D1 - 0.5)
            & (v2 >= -0.5) & (v2 <= D2 - 0.5)
            & ((e0 + lam_px * e1) > 0.0)
            & (lam_px <= lmax)
            & ~term
        )
        value = W[k] + delta * (W[k + 1] - W[k])
        if mode == "intensity":
            win = jnp.asarray(windowing_vec4, jnp.float32)
            tf_pos = (value - win[0] + win[1] * 0.5) / win[1]
            val = jnp.clip(tf_pos, 0.0, 1.0)
            rgb = jnp.where(m[..., None], val[..., None], rgb)
            alpha = jnp.where(m, 1.0, alpha)
            term = term | m
            continue
        light = L[k] + delta * (L[k + 1] - L[k])
        rgba = sample_windowed_transfer_function(
            value, step_world, tf_table, jnp.asarray(windowing_vec4,
                                                     jnp.float32)
        )
        a = jnp.where(m, rgba[..., 3], 0.0)
        w = (1.0 - alpha) * a
        rgb = rgb + w[..., None] * rgba[..., :3] * light[..., None]
        alpha_new = alpha + w
        crossed = (a > 0.0) & (alpha_new > early_termination)
        alpha = jnp.where(crossed, 1.0, alpha_new)
        term = term | crossed
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def warp_reference(intermediate, plan: ShearWarpPlan, width, height):
    """Per-pixel numpy oracle of :func:`warp_to_screen` (same two-pass
    definition, evaluated directly)."""
    inter = np.asarray(intermediate)
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
    n1, n2, C = inter.shape

    def lerp1(row, x):
        xc = np.clip(x, 0.0, len(row) - 1)
        i0 = int(np.floor(xc)); fr = xc - i0
        i1 = min(i0 + 1, len(row) - 1)
        return row[i0] * (1 - fr) + row[i1] * fr

    # pass 1
    M = np.zeros((n2, W, C))
    for j in range(n2):
        p2 = o2 + (j + 0.5) * d2
        for u in range(W):
            n2u = p2r[0] * u + p2r[2]
            du = pdr[0] * u + pdr[2]
            denv = p2r[1] - p2 * pdr[1]
            denv = denv if abs(denv) >= 1e-12 else 1e-12
            vs = (p2 * du - n2u) / denv
            dens = pdr[0] * u + pdr[1] * vs + pdr[2]
            dens = dens if abs(dens) >= 1e-12 else 1e-12
            p1 = (p1r[0] * u + p1r[1] * vs + p1r[2]) / dens
            i_star = (p1 - o1) / d1 - 0.5
            for ch in range(C):
                M[j, u, ch] = lerp1(inter[:, j, ch], i_star)
    # pass 2
    S = np.zeros((H, W, C))
    kappa = float(plan.z0) - float(np.asarray(plan.cam)[plan.axis])
    for vpix in range(H):
        for u in range(W):
            den = pdr[0] * u + pdr[1] * vpix + pdr[2]
            if abs(den) <= 1e-9:
                continue
            p1 = (p1r[0] * u + p1r[1] * vpix + p1r[2]) / den
            p2 = (p2r[0] * u + p2r[1] * vpix + p2r[2]) / den
            tplane = kappa / den
            iuv = (p1 - o1) / d1 - 0.5
            juv = (p2 - o2) / d2 - 0.5
            if not (tplane > 0 and -1 < iuv < n1 and -1 < juv < n2):
                continue
            for ch in range(C):
                S[vpix, u, ch] = lerp1(M[:, u, ch], juv)
    if plan.swap_warp:
        S = np.transpose(S, (1, 0, 2))
    return S
