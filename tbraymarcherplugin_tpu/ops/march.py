"""The forward ray march: front-to-back windowed emission-absorption rendering.

TPU-native re-design of the reference's material-shader march loops
(`Shaders/Private/WindowedRaymarchMaterials.usf`):

- :func:`march_lit`       <- `PerformWindowedLitRaymarch` (`:36-96`)
- :func:`march_intensity` <- `PerformWindowedIntensityRaymarch` (`:187-242`)

Design notes (TPU-first):

- The GPU's per-pixel ``for``/``break`` becomes a `lax.scan` over a *static*
  step bound (``ceil(step_count * sqrt(3))`` — the longest diagonal through the
  unit cube) with masked accumulation. Early termination and per-ray step
  counts are masks, which makes the forward exactly differentiable.
- Memory for the backward pass is bounded by rematerialization: the scan runs
  over chunks of ``checkpoint_every`` steps, each chunk wrapped in
  `jax.checkpoint`, so residuals are O(n_steps / checkpoint_every) instead of
  O(n_steps).
- All rays advance in lockstep; there is no data-dependent control flow, so
  the whole render jits into one XLA computation.

Reference-semantics notes:

- The reference's final fractional step passes ``VOLUME_DENSITY * FinalStep``
  as the opacity-correction step size (`WindowedRaymarchMaterials.usf:91`),
  where ``FinalStep`` is a fraction *of a step* — inconsistent with the main
  loop's ``VOLUME_DENSITY * StepSize``(=``VOLUME_DENSITY / StepCount``) by a
  factor of ``StepCount``. We reproduce this by default
  (``compat_final_step=True``) for parity, and offer the consistent behavior.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .compositing import EARLY_TERMINATION_ALPHA, accumulate
from .sampling import (
    VOLUME_DENSITY,
    is_clipped,
    sample_windowed_transfer_function,
    transfer_func_position,
    trilinear_sample,
)
from .rays import RayBatch

SQRT_3 = math.sqrt(3.0)

# Default ray-tile size for march_lit_tiled: bounds HBM intermediates while
# keeping each tile's gathers in the multi-million-element range.
DEFAULT_TILE_SIZE = 131072


def max_march_steps(step_count: int) -> int:
    """Static bound on per-ray steps: the cube diagonal is sqrt(3) thick."""
    return int(math.ceil(step_count * SQRT_3))


def _march_state(rays: RayBatch, step_count: int, jitter):
    """Initial per-ray state + static quantities shared by march variants."""
    step_size = 1.0 / step_count
    step_vec = rays.direction * step_size
    float_actual = step_count * rays.thickness
    n_full = jnp.floor(float_actual)
    final_frac = float_actual - n_full
    pos = rays.entry
    if jitter is not None:
        # Jitter against the march direction (`RaymarchMaterialCommon.usf:73-78`).
        pos = pos - step_vec * jitter[..., None]
    return pos, step_vec, n_full, final_frac, step_size


@partial(
    jax.jit,
    static_argnames=(
        "step_count",
        "early_termination",
        "checkpoint_every",
        "compat_final_step",
    ),
)
def march_lit(
    volume: jnp.ndarray,
    tf_table: jnp.ndarray,
    light_volume: jnp.ndarray,
    rays: RayBatch,
    windowing_vec4: jnp.ndarray,
    clip_center: jnp.ndarray,
    clip_direction: jnp.ndarray,
    jitter=None,
    step_count: int = 150,
    early_termination: float = EARLY_TERMINATION_ALPHA,
    checkpoint_every: int = 32,
    compat_final_step: bool = True,
) -> jnp.ndarray:
    """Lit front-to-back march (`PerformWindowedLitRaymarch`, usf:36-96).

    Args:
      volume: (X, Y, Z) normalized density volume.
      tf_table: (R, 4) transfer function.
      light_volume: (LX, LY, LZ) single-channel illumination volume (may be
        half resolution); rgb of every sample is modulated by it (usf:30).
      rays: UVW-space ray batch from :func:`..ops.rays.setup_rays`.
      windowing_vec4: (4,) = (center, width, low_cutoff, high_cutoff).
      clip_center / clip_direction: UVW-space clipping plane; positions with
        ``dot(P - center, dir) <= 0`` are skipped.
      jitter: optional (...,) per-ray jitter in [0, 1).
      step_count: steps across unit thickness (reference default 150,
        `RaymarchVolume.h:189`).

    Returns:
      (..., 4) RGBA light energy per ray.
    """
    pos0, step_vec, n_full, final_frac, step_size = _march_state(
        rays, step_count, jitter
    )
    step_world = VOLUME_DENSITY * step_size
    n_steps = max_march_steps(step_count)

    def one_step(i, pos, energy, terminated):
        in_range = i < n_full
        pos = jnp.where(in_range[..., None], pos + step_vec, pos)
        clipped = is_clipped(pos, clip_center, clip_direction)
        active = in_range & ~terminated & ~clipped
        rgba = sample_windowed_transfer_function(
            trilinear_sample(volume, pos), step_world, tf_table, windowing_vec4
        )
        light = trilinear_sample(light_volume, jnp.clip(pos, 0.0, 1.0))
        rgba = jnp.concatenate([rgba[..., :3] * light[..., None], rgba[..., 3:]], -1)
        new_energy = accumulate(energy, rgba)
        energy = jnp.where(active[..., None], new_energy, energy)
        # Early termination: alpha snaps to 1 (usf:75-79).
        hit_limit = active & (energy[..., 3] > early_termination)
        energy = energy.at[..., 3].set(jnp.where(hit_limit, 1.0, energy[..., 3]))
        terminated = terminated | hit_limit
        return pos, energy, terminated

    def chunk(carry, chunk_idx):
        # Inner scan keeps the HLO small; the jax.checkpoint wrapper makes the
        # backward pass recompute this chunk instead of storing per-step state.
        def inner(c, k):
            pos, energy, terminated = c
            i = chunk_idx * checkpoint_every + k
            return one_step(i, pos, energy, terminated), None

        carry, _ = jax.lax.scan(inner, carry, jnp.arange(checkpoint_every))
        return carry, None

    n_chunks = -(-n_steps // checkpoint_every)
    init = (
        pos0,
        jnp.zeros(rays.thickness.shape + (4,), jnp.float32),
        jnp.zeros(rays.thickness.shape, bool),
    )
    (pos, energy, terminated), _ = jax.lax.scan(
        jax.checkpoint(chunk), init, jnp.arange(n_chunks)
    )

    # Final fractional step (usf:84-93): only for rays that ran to completion.
    pos_f = pos + step_vec * final_frac[..., None]
    active_f = (
        ~terminated
        & (final_frac > 0.0)
        & ~is_clipped(pos_f, clip_center, clip_direction)
    )
    final_step_world = (
        VOLUME_DENSITY * final_frac
        if compat_final_step
        else VOLUME_DENSITY * step_size * final_frac
    )
    rgba_f = sample_windowed_transfer_function(
        trilinear_sample(volume, pos_f), final_step_world, tf_table, windowing_vec4
    )
    light_f = trilinear_sample(light_volume, jnp.clip(pos_f, 0.0, 1.0))
    rgba_f = jnp.concatenate([rgba_f[..., :3] * light_f[..., None], rgba_f[..., 3:]], -1)
    energy = jnp.where(active_f[..., None], accumulate(energy, rgba_f), energy)
    return energy


def _occ_lookup(occ_grid, occ_scale, pos):
    """Nearest-cell occupancy fetch: cell = floor(pos * scale), clamped."""
    gx, gy, gz = occ_grid.shape
    sc = jnp.asarray(occ_scale, jnp.float32)
    idx = jnp.floor(pos * sc).astype(jnp.int32)
    ix = jnp.clip(idx[..., 0], 0, gx - 1)
    iy = jnp.clip(idx[..., 1], 0, gy - 1)
    iz = jnp.clip(idx[..., 2], 0, gz - 1)
    return jnp.take(occ_grid.reshape(-1), (ix * gy + iy) * gz + iz, axis=0)


@partial(
    jax.jit,
    static_argnames=(
        "step_count",
        "early_termination",
        "block_size",
        "compat_final_step",
        "occ_scale",
        "skip_blocks",
        "grad_allreduce_axis",
    ),
)
def march_lit_blocked(
    volume: jnp.ndarray,
    tf_table: jnp.ndarray,
    light_volume: jnp.ndarray,
    rays: RayBatch,
    windowing_vec4: jnp.ndarray,
    clip_center: jnp.ndarray,
    clip_direction: jnp.ndarray,
    jitter=None,
    step_count: int = 150,
    early_termination: float = EARLY_TERMINATION_ALPHA,
    block_size: int = 32,
    compat_final_step: bool = True,
    occ_grid: jnp.ndarray | None = None,
    occ_scale: tuple | None = None,
    skip_blocks: bool = False,
    grad_allreduce_axis: str | None = None,
) -> jnp.ndarray:
    """Block-parallel lit march — the TPU-throughput path.

    Bit-compatible semantics with :func:`march_lit` (same reference march,
    `PerformWindowedLitRaymarch`, usf:36-96) but restructured for the TPU
    memory system: instead of ~``step_count * sqrt(3)`` sequential scan steps
    each issuing a small gather, the march runs in blocks of ``block_size``
    steps. Within a block every sample position is known up front
    (``pos0 + (i+1) * step_vec``), so

    - volume / light / TF fetches become ONE large batched gather per block
      (deep gather queues, full HBM utilization), and
    - front-to-back compositing — an associative "over" in (premultiplied
      color, transmittance) space — becomes an exclusive ``cumprod`` of
      ``(1 - alpha)`` plus a weighted sum, all vector ops.

    Early termination (alpha > threshold snaps to 1 and later samples are
    dropped, usf:75-79) is reproduced exactly by locating the first in-block
    crossing of the cumulative alpha and masking later contributions.

    The outer carry (rgb, alpha, terminated) runs over only
    ``ceil(n_steps / block_size)`` scan iterations, each wrapped in
    `jax.checkpoint` so backward memory stays O(n_blocks).

    Empty-space skipping (``skip_blocks=True``): each block is wrapped in a
    `lax.cond` that skips ALL its volume/light/TF gathers when (a) every ray
    in the batch has already terminated, or (b) ``occ_grid`` is given (from
    :func:`..octree.occupancy_grid`) and every in-range sample of the block
    lands in an unoccupied cell. Both predicates are exact for the forward
    image: skipped samples have windowed-TF alpha == 0 so they change nothing
    (the reference instead marches a min/max pyramid per ray,
    `GenerateOctreeShader.usf:28-107` — divergence-hostile on TPU).
    INFERENCE-PATH ONLY when differentiating w.r.t. the TF table or window:
    zero-alpha samples still carry nonzero d(image)/d(tf) at the texel level,
    and a skipped block contributes exact zeros for those cotangents.
    """
    if grad_allreduce_axis is not None:
        # Overlapped DP gradient all-reduce (`..parallel.overlap`): the march
        # backward runs before the illumination backward, so psum-ing its
        # parameter cotangents here lets the reduction ride ICI while the
        # rest of the backward still computes.
        from ..parallel.overlap import psum_cotangent

        volume = psum_cotangent(volume, grad_allreduce_axis)
        tf_table = psum_cotangent(tf_table, grad_allreduce_axis)
        windowing_vec4 = psum_cotangent(windowing_vec4, grad_allreduce_axis)

    pos0, step_vec, n_full, final_frac, step_size = _march_state(
        rays, step_count, jitter
    )
    step_world = VOLUME_DENSITY * step_size
    n_steps = max_march_steps(step_count)
    n_blocks = -(-n_steps // block_size)
    ray_shape = rays.thickness.shape
    bshape = (block_size,) + (1,) * len(ray_shape)

    def block(carry, b):
        ks = (b * block_size + jnp.arange(block_size)).astype(jnp.float32)
        ks = ks.reshape(bshape)
        # Sample position of step i is pos0 + (i+1) * step_vec (march_lit
        # advances before sampling); steps with i >= n_full never contribute.
        pos = pos0[None] + step_vec[None] * (ks + 1.0)[..., None]
        in_range = ks < n_full[None]

        def do(carry):
            rgb_acc, alpha_acc, terminated = carry
            clipped = is_clipped(pos, clip_center, clip_direction)
            m = in_range & ~clipped
            rgba = sample_windowed_transfer_function(
                trilinear_sample(volume, pos), step_world, tf_table, windowing_vec4
            )
            light = trilinear_sample(light_volume, jnp.clip(pos, 0.0, 1.0))
            a = jnp.where(m, rgba[..., 3], 0.0)
            rgb = jnp.where(m[..., None], rgba[..., :3] * light[..., None], 0.0)

            one_minus_a = 1.0 - a
            t_incl = jnp.cumprod(one_minus_a, axis=0)  # prod_{j<=k} (1-a_j)
            t_excl = jnp.concatenate(
                [jnp.ones_like(t_incl[:1]), t_incl[:-1]], axis=0
            )
            # Accumulated alpha after each step, given alpha_acc at block entry.
            alpha_after = alpha_acc[None] + (1.0 - alpha_acc[None]) * (1.0 - t_incl)
            crossed = m & (alpha_after > early_termination)
            any_crossed = jnp.any(crossed, axis=0)
            # First crossing step: its own sample still contributes (the
            # reference composites, then checks), later steps do not.
            kc = jnp.argmax(crossed, axis=0)
            step_ids = jnp.arange(block_size).reshape(bshape)
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
            return (rgb_out, alpha_out, terminated | any_crossed)

        if skip_blocks:
            run = ~jnp.all(carry[2])
            if occ_grid is not None:
                run = run & jnp.any(in_range & _occ_lookup(occ_grid, occ_scale, pos))
            carry = jax.lax.cond(run, do, lambda c: c, carry)
        else:
            carry = do(carry)
        return carry, None

    init = (
        jnp.zeros(ray_shape + (3,), jnp.float32),
        jnp.zeros(ray_shape, jnp.float32),
        jnp.zeros(ray_shape, bool),
    )
    (rgb, alpha, terminated), _ = jax.lax.scan(
        jax.checkpoint(block), init, jnp.arange(n_blocks)
    )
    energy = jnp.concatenate([rgb, alpha[..., None]], axis=-1)

    # Final fractional step (usf:84-93), identical to march_lit.
    pos_f = pos0 + step_vec * (n_full + final_frac)[..., None]
    active_f = (
        ~terminated
        & (final_frac > 0.0)
        & ~is_clipped(pos_f, clip_center, clip_direction)
    )
    final_step_world = (
        VOLUME_DENSITY * final_frac
        if compat_final_step
        else VOLUME_DENSITY * step_size * final_frac
    )
    rgba_f = sample_windowed_transfer_function(
        trilinear_sample(volume, pos_f), final_step_world, tf_table, windowing_vec4
    )
    light_f = trilinear_sample(light_volume, jnp.clip(pos_f, 0.0, 1.0))
    rgba_f = jnp.concatenate(
        [rgba_f[..., :3] * light_f[..., None], rgba_f[..., 3:]], -1
    )
    return jnp.where(active_f[..., None], accumulate(energy, rgba_f), energy)


@partial(
    jax.jit,
    static_argnames=(
        "step_count",
        "early_termination",
        "block_size",
        "tile_size",
        "compat_final_step",
        "occ_scale",
        "skip_blocks",
        "tile2d",
        "grad_allreduce_axis",
    ),
)
def march_lit_tiled(
    volume: jnp.ndarray,
    tf_table: jnp.ndarray,
    light_volume: jnp.ndarray,
    rays: RayBatch,
    windowing_vec4: jnp.ndarray,
    clip_center: jnp.ndarray,
    clip_direction: jnp.ndarray,
    jitter=None,
    step_count: int = 150,
    early_termination: float = EARLY_TERMINATION_ALPHA,
    block_size: int = 32,
    tile_size: int = DEFAULT_TILE_SIZE,
    compat_final_step: bool = True,
    occ_grid: jnp.ndarray | None = None,
    occ_scale: tuple | None = None,
    skip_blocks: bool = False,
    tile2d: tuple | None = None,
    grad_allreduce_axis: str | None = None,
) -> jnp.ndarray:
    """Ray-tiled block-parallel march: bounded memory at any image size.

    :func:`march_lit_blocked` materializes (block_size, n_rays) sample fields;
    at 1080p x block 32 that is tens of GB of intermediates. This wrapper
    flattens the rays, pads to a multiple of ``tile_size`` and runs the
    blocked march tile-by-tile with `lax.map` — peak memory is
    O(tile_size * block_size) while each tile still issues multi-million-
    element gathers that saturate HBM. Results are bit-identical to
    :func:`march_lit_blocked` per ray.

    ``skip_blocks``/``occ_grid``/``occ_scale`` enable per-tile empty-space
    skipping and saturated-tile skipping (see :func:`march_lit_blocked`);
    because `lax.map` runs tiles as a sequential scan, each tile's `lax.cond`
    predicates stay scalars and skipped blocks really skip their gathers.

    ``tile2d=(th, tw)`` (2D ray batches only) makes tiles spatially coherent
    th x tw image rectangles instead of scanline runs — essential for
    skipping, since a tile's block is skipped only when EVERY ray in it is in
    empty space. Per-ray results are unchanged (pure reordering).
    """
    if grad_allreduce_axis is not None:
        # Marked once at entry (not per tile): the cotangent here is the
        # accumulated sum over tiles, psum'd after the march backward but
        # before the illumination backward (`..parallel.overlap`).
        from ..parallel.overlap import psum_cotangent

        volume = psum_cotangent(volume, grad_allreduce_axis)
        tf_table = psum_cotangent(tf_table, grad_allreduce_axis)
        windowing_vec4 = psum_cotangent(windowing_vec4, grad_allreduce_axis)

    if tile2d is not None and len(rays.thickness.shape) == 2:
        return _march_lit_tiled2d(
            volume, tf_table, light_volume, rays, windowing_vec4,
            clip_center, clip_direction, jitter, step_count,
            early_termination, block_size, compat_final_step,
            occ_grid, occ_scale, skip_blocks, tile2d,
        )
    ray_shape = rays.thickness.shape
    n = int(np.prod(ray_shape)) if ray_shape else 1
    entry = rays.entry.reshape(n, 3)
    direction = rays.direction.reshape(n, 3)
    thickness = rays.thickness.reshape(n)
    jit_flat = None if jitter is None else jitter.reshape(n)

    n_tiles = -(-n // tile_size)
    pad = n_tiles * tile_size - n
    if pad:
        entry = jnp.pad(entry, ((0, pad), (0, 0)))
        direction = jnp.pad(
            direction, ((0, pad), (0, 0)), constant_values=1.0
        )
        thickness = jnp.pad(thickness, (0, pad))  # zero thickness: no-op rays
        if jit_flat is not None:
            jit_flat = jnp.pad(jit_flat, (0, pad))

    def tile_fn(args):
        if jit_flat is None:
            e, d, t = args
            j = None
        else:
            e, d, t, j = args
        return march_lit_blocked(
            volume,
            tf_table,
            light_volume,
            RayBatch(entry=e, direction=d, thickness=t),
            windowing_vec4,
            clip_center,
            clip_direction,
            jitter=j,
            step_count=step_count,
            early_termination=early_termination,
            block_size=block_size,
            compat_final_step=compat_final_step,
            occ_grid=occ_grid,
            occ_scale=occ_scale,
            skip_blocks=skip_blocks,
        )

    tiles = (
        entry.reshape(n_tiles, tile_size, 3),
        direction.reshape(n_tiles, tile_size, 3),
        thickness.reshape(n_tiles, tile_size),
    )
    if jit_flat is not None:
        tiles = tiles + (jit_flat.reshape(n_tiles, tile_size),)
    out = jax.lax.map(tile_fn, tiles)
    return out.reshape(n_tiles * tile_size, 4)[:n].reshape(ray_shape + (4,))


def _march_lit_tiled2d(
    volume, tf_table, light_volume, rays, windowing_vec4,
    clip_center, clip_direction, jitter, step_count,
    early_termination, block_size, compat_final_step,
    occ_grid, occ_scale, skip_blocks, tile2d,
):
    """march_lit_tiled with spatially-coherent th x tw image tiles."""
    th, tw = tile2d
    h, w = rays.thickness.shape
    hp, wp = -(-h // th) * th, -(-w // tw) * tw
    nth, ntw = hp // th, wp // tw

    def to_tiles(x, cval=0.0):
        trailing = x.shape[2:]
        x = jnp.pad(
            x,
            ((0, hp - h), (0, wp - w)) + ((0, 0),) * len(trailing),
            constant_values=cval,
        )
        x = x.reshape((nth, th, ntw, tw) + trailing)
        x = jnp.moveaxis(x, 2, 1)
        return x.reshape((nth * ntw, th * tw) + trailing)

    tiles = (
        to_tiles(rays.entry),
        to_tiles(rays.direction, 1.0),
        to_tiles(rays.thickness),  # zero thickness: padded no-op rays
    )
    if jitter is not None:
        tiles = tiles + (to_tiles(jitter),)

    def tile_fn(args):
        if jitter is None:
            e, d, t = args
            j = None
        else:
            e, d, t, j = args
        return march_lit_blocked(
            volume, tf_table, light_volume,
            RayBatch(entry=e, direction=d, thickness=t),
            windowing_vec4, clip_center, clip_direction,
            jitter=j, step_count=step_count,
            early_termination=early_termination, block_size=block_size,
            compat_final_step=compat_final_step,
            occ_grid=occ_grid, occ_scale=occ_scale, skip_blocks=skip_blocks,
        )

    out = jax.lax.map(tile_fn, tiles)  # (n_tiles, th*tw, 4)
    out = out.reshape(nth, ntw, th, tw, 4)
    out = jnp.moveaxis(out, 1, 2).reshape(hp, wp, 4)
    return out[:h, :w]


@partial(jax.jit, static_argnames=("step_count",))
def march_intensity(
    volume: jnp.ndarray,
    rays: RayBatch,
    windowing_vec4: jnp.ndarray,
    clip_center: jnp.ndarray,
    clip_direction: jnp.ndarray,
    jitter=None,
    step_count: int = 150,
) -> jnp.ndarray:
    """First-hit windowed-intensity view (`PerformWindowedIntensityRaymarch`,
    usf:187-242): returns the windowed intensity of the first non-clipped
    sample as grayscale (a CT-slab-style view), alpha 1 on hit, else 0.
    """
    pos0, step_vec, n_full, final_frac, _ = _march_state(rays, step_count, jitter)
    center, width = windowing_vec4[0], windowing_vec4[1]
    n_steps = max_march_steps(step_count)

    def body(carry, i):
        pos, value, hit = carry
        in_range = i < n_full
        pos = jnp.where(in_range[..., None], pos + step_vec, pos)
        # Intensity march clips against the saturated position (usf:213).
        clipped = is_clipped(jnp.clip(pos, 0.0, 1.0), clip_center, clip_direction)
        active = in_range & ~hit & ~clipped
        v = trilinear_sample(volume, jnp.clip(pos, 0.0, 1.0))
        tf_pos = jnp.clip(transfer_func_position(v, center, width), 0.0, 1.0)
        value = jnp.where(active, tf_pos, value)
        hit = hit | active
        return (pos, value, hit), None

    init = (
        pos0,
        jnp.zeros(rays.thickness.shape, jnp.float32),
        jnp.zeros(rays.thickness.shape, bool),
    )
    (pos, value, hit), _ = jax.lax.scan(body, init, jnp.arange(n_steps))

    # Final fractional step (usf:225-238) — unclamped position and clip test.
    pos_f = pos + step_vec * final_frac[..., None]
    active_f = ~hit & (final_frac > 0.0) & ~is_clipped(pos_f, clip_center, clip_direction)
    v_f = trilinear_sample(volume, pos_f)
    tf_pos_f = jnp.clip(transfer_func_position(v_f, center, width), 0.0, 1.0)
    value = jnp.where(active_f, tf_pos_f, value)
    hit = hit | active_f

    rgb = jnp.repeat(value[..., None], 3, axis=-1)
    alpha = hit.astype(jnp.float32)[..., None]
    return jnp.concatenate([rgb, alpha], axis=-1)
