"""Octree acceleration structure: min/max mip pyramid + octree rendering.

TPU-native equivalent of §2.3 of the reference:

- :func:`build_octree` <- `GenerateOctreeShader.usf:28-107` +
  `GenerateOctreeForVolume_RenderThread` (`OctreeShaders.cpp:28-54`): a 4-level
  max-value pyramid over a pow2-padded copy of the volume. On TPU this is a
  chain of `lax.reduce_window` max-pools — one fused XLA op per mip instead of
  a hand-rolled compute shader.
- :func:`march_octree` <- `PerformWindowedRaymarchOctree`
  (`WindowedRaymarchMaterials.usf:99-183`): march sampling a chosen mip with
  nearest-texel loads (`Load`, not filtered) and the pow2-padding Z rescale.

The mip pyramid doubles as the empty-space-skipping occupancy structure used
by the performance path (tiles whose max windowed opacity is zero are skipped).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .compositing import EARLY_TERMINATION_ALPHA, accumulate
from .march import _march_state, max_march_steps
from .sampling import VOLUME_DENSITY, is_clipped, sample_windowed_transfer_function
from .rays import RayBatch

LEAF_NODE_SIZE = 8  # `OctreeShaders.cpp:44` binds LeafNodeSize = 8
NUM_MIPS = 4  # `OctreeShaders.cpp:45` binds NumMips = 4


class Octree(NamedTuple):
    """Max-value mip pyramid over the pow2-padded volume.

    ``mips[0]`` has the padded shape; ``mips[i]`` halves each dim.
    ``data_dims`` keeps the unpadded volume dims for the Z-rescale at
    `WindowedRaymarchMaterials.usf:151`. ``min_mips`` is the matching
    min-value pyramid (not in the reference — it exists so empty-space
    skipping can bound each tile's *value range*, which is what makes the
    occupancy test exact for arbitrary, non-monotone transfer functions).
    """

    mips: tuple[jnp.ndarray, ...]
    data_dims: tuple[int, int, int]
    min_mips: tuple[jnp.ndarray, ...] = ()


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@partial(jax.jit, static_argnames=("num_mips", "op_name"))
def _build_mips(padded, num_mips: int, op_name: str = "max"):
    op = jax.lax.max if op_name == "max" else jax.lax.min
    init = -jnp.inf if op_name == "max" else jnp.inf
    mips = [padded]
    for _ in range(num_mips - 1):
        mips.append(
            jax.lax.reduce_window(
                mips[-1],
                init,
                op,
                window_dimensions=(2, 2, 2),
                window_strides=(2, 2, 2),
                padding="VALID",
            )
        )
    return tuple(mips)


def build_octree(volume: jnp.ndarray, max_value: float = 1.0,
                 num_mips: int = NUM_MIPS) -> Octree:
    """Build the max pyramid (reference `GenerateOctreeShader.usf:28-107`).

    Mip 0 is the volume scaled by ``max_value`` (`usf:45` multiplies by
    ``MinMaxValues.y``), zero-padded to pow2 dims; subsequent mips are 2×2×2
    max reductions. A min pyramid is built alongside (pad value 0, which can
    only widen boundary-tile ranges — conservative for occupancy).
    """
    dims = volume.shape
    padded_dims = tuple(_next_pow2(d) for d in dims)
    padded = jnp.zeros(padded_dims, volume.dtype)
    padded = padded.at[: dims[0], : dims[1], : dims[2]].set(volume * max_value)
    return Octree(
        mips=_build_mips(padded, num_mips, "max"),
        data_dims=tuple(dims),
        min_mips=_build_mips(padded, num_mips, "min"),
    )


def load_mip_nearest(mip: jnp.ndarray, voxel_pos: jnp.ndarray) -> jnp.ndarray:
    """Integer-truncation texel load (`Texture3D.Load` semantics) with clamp."""
    idx = voxel_pos.astype(jnp.int32)
    flat = mip.reshape(-1)
    sy = mip.shape[1] * mip.shape[2]
    sz = mip.shape[2]
    ix = jnp.clip(idx[..., 0], 0, mip.shape[0] - 1)
    iy = jnp.clip(idx[..., 1], 0, mip.shape[1] - 1)
    iz = jnp.clip(idx[..., 2], 0, mip.shape[2] - 1)
    return jnp.take(flat, ix * sy + iy * sz + iz, axis=0)


@partial(jax.jit, static_argnames=("step_count", "mip", "early_termination"))
def march_octree(
    octree: Octree,
    tf_table: jnp.ndarray,
    rays: RayBatch,
    windowing_vec4: jnp.ndarray,
    clip_center: jnp.ndarray,
    clip_direction: jnp.ndarray,
    jitter=None,
    step_count: int = 150,
    mip: int = 0,
    early_termination: float = EARLY_TERMINATION_ALPHA,
) -> jnp.ndarray:
    """Octree-mip march (`PerformWindowedRaymarchOctree`, usf:99-183).

    Samples the chosen mip with nearest loads (no light volume). UVW
    coordinates are scaled into mip texel space; the Z coordinate is rescaled
    by data-depth / padded-depth to cancel the pow2 padding (usf:149-151).
    """
    pos0, step_vec, n_full, final_frac, step_size = _march_state(
        rays, step_count, jitter
    )
    step_world = VOLUME_DENSITY * step_size
    mip_arr = octree.mips[mip]
    mip_dims = jnp.asarray(mip_arr.shape, jnp.float32)
    z_rescale = octree.data_dims[2] / octree.mips[0].shape[2]
    scale = mip_dims * jnp.asarray([1.0, 1.0, z_rescale], jnp.float32)

    def sample_at(pos, step_sz):
        voxel = pos * scale
        value = load_mip_nearest(mip_arr, voxel)
        return sample_windowed_transfer_function(
            value, step_sz, tf_table, windowing_vec4
        )

    def body(carry, i):
        pos, energy, terminated = carry
        in_range = i < n_full
        pos = jnp.where(in_range[..., None], pos + step_vec, pos)
        active = (
            in_range & ~terminated & ~is_clipped(pos, clip_center, clip_direction)
        )
        rgba = sample_at(pos, step_world)
        energy = jnp.where(active[..., None], accumulate(energy, rgba), energy)
        over = active & (energy[..., 3] > early_termination)
        energy = energy.at[..., 3].set(jnp.where(over, 1.0, energy[..., 3]))
        terminated = terminated | over
        return (pos, energy, terminated), None

    init = (
        pos0,
        jnp.zeros(rays.thickness.shape + (4,), jnp.float32),
        jnp.zeros(rays.thickness.shape, bool),
    )
    (pos, energy, terminated), _ = jax.lax.scan(
        body, init, jnp.arange(max_march_steps(step_count))
    )

    pos_f = pos + step_vec * final_frac[..., None]
    active_f = (
        ~terminated
        & (final_frac > 0.0)
        & ~is_clipped(pos_f, clip_center, clip_direction)
    )
    rgba_f = sample_at(pos_f, step_world)
    energy = jnp.where(active_f[..., None], accumulate(energy, rgba_f), energy)
    return energy


class OccupancyGrid(NamedTuple):
    """Conservative empty-space-skipping structure for the march.

    ``grid[c]`` is True iff SOME sample whose position falls in coarse cell
    ``c`` could have nonzero windowed-TF alpha. ``cell_scale`` maps a UVW
    position to a cell index: ``cell = floor(uvw * cell_scale)`` (then clamp).
    The guarantee is one-sided and exact: if ``grid[cell(pos)]`` is False,
    ``sample_windowed_transfer_function(trilinear_sample(volume, pos), ...)``
    has alpha exactly 0, so skipping the sample cannot change the image.
    """

    grid: jnp.ndarray  # (GX, GY, GZ) bool
    cell_scale: tuple[float, float, float]


def _dilate3(x: jnp.ndarray, op, init) -> jnp.ndarray:
    """3x3x3 neighborhood reduce with SAME padding (edge cells widened)."""
    return jax.lax.reduce_window(
        x, init, op,
        window_dimensions=(3, 3, 3),
        window_strides=(1, 1, 1),
        padding="SAME",
    )


def occupancy_grid(
    octree: Octree,
    windowing_vec4: jnp.ndarray,
    tf_table: jnp.ndarray,
    mip: int = NUM_MIPS - 1,
) -> OccupancyGrid:
    """Exact-conservative occupancy test per coarse cell (SURVEY §7.8).

    The reference renders from the max pyramid inside the march
    (`GenerateOctreeShader.usf:28-107` + `PerformWindowedRaymarchOctree`);
    per-step mip queries are divergence-hostile on TPU, so instead the march
    skips whole *step blocks* whose samples all land in unoccupied cells
    (see :func:`..march.march_lit_blocked`'s ``occ`` argument).

    Exactness for arbitrary (non-monotone) transfer functions comes from an
    interval argument, not probing:

    - each cell's voxel value range [mn, mx] comes from the min/max pyramids,
      dilated over the 3^3 cell neighborhood — a trilinear footprint reaches
      at most 1 voxel past the cell a sample position falls in, and a cell is
      >= 2 voxels wide at any mip >= 1;
    - trilinear interpolation is a convex combination, so every sampled value
      lies in [mn, mx];
    - windowing is affine in the value, so the TF-position interval is
      [(mn-c+w/2)/w, (mx-c+w/2)/w], cutoffs clip it, and the cell is occupied
      iff any TF texel with alpha > 0 is touched by linear interpolation over
      that interval (a prefix-sum query on the nonzero-alpha texels).

    The octree must be built with ``max_value=1.0`` (values in the same
    normalized domain the march samples). Requires ``octree.min_mips``.
    """
    if not octree.min_mips:
        raise ValueError("occupancy_grid needs an Octree built with min_mips")
    if mip < 1:
        raise ValueError("mip must be >= 1 so cells are wider than the "
                         "trilinear footprint after 3^3 dilation")
    mn = _dilate3(octree.min_mips[mip], jax.lax.min, jnp.inf)
    mx = _dilate3(octree.mips[mip], jax.lax.max, -jnp.inf)

    # Interval occupancy query (affine windowing + cutoffs + prefix-sum over
    # nonzero-alpha texels; `WindowedSampling.usf:26-31` semantics).
    from .transfer import windowed_tf_range_occupied

    occ = windowed_tf_range_occupied(mn, mx, windowing_vec4, tf_table)

    # Drop cells that only cover pow2 padding: out-of-range positions clamp
    # onto edge *data* voxels, so the march clamps cell indices to the data
    # cells and padding-only cells must not exist (their range is [0, 0],
    # which could wrongly read as empty for a clamped edge sample).
    cell = 1 << mip
    n_cells = tuple(-(-d // cell) for d in octree.data_dims)
    occ = occ[: n_cells[0], : n_cells[1], : n_cells[2]]
    scale = tuple(d / float(cell) for d in octree.data_dims)
    return OccupancyGrid(grid=occ, cell_scale=scale)
