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
    `WindowedRaymarchMaterials.usf:151`.
    """

    mips: tuple[jnp.ndarray, ...]
    data_dims: tuple[int, int, int]


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@partial(jax.jit, static_argnames=("num_mips",))
def _build_mips(padded, num_mips: int):
    mips = [padded]
    for _ in range(num_mips - 1):
        mips.append(
            jax.lax.reduce_window(
                mips[-1],
                -jnp.inf,
                jax.lax.max,
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
    max reductions.
    """
    dims = volume.shape
    padded_dims = tuple(_next_pow2(d) for d in dims)
    padded = jnp.zeros(padded_dims, volume.dtype)
    padded = padded.at[: dims[0], : dims[1], : dims[2]].set(volume * max_value)
    return Octree(mips=_build_mips(padded, num_mips), data_dims=tuple(dims))


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


def occupancy_tile_mask(
    octree: Octree,
    windowing_vec4: jnp.ndarray,
    tf_table: jnp.ndarray,
    mip: int = NUM_MIPS - 1,
) -> jnp.ndarray:
    """Boolean grid marking mip tiles with any nonzero windowed TF opacity.

    The TPU-idiomatic use of the pyramid (SURVEY §7.8): rather than per-step
    mip queries inside the march (divergence-hostile), the renderer gates
    whole ray *tiles* on whether they intersect any occupied region.
    """
    vals = octree.mips[mip]
    # A tile's max value bounds every contained voxel; windowing is monotone
    # in the value, so evaluate opacity at the max and at 0 (TF need not be
    # monotone — conservatively also check a dense midpoint sweep).
    probes = jnp.linspace(0.0, 1.0, 9, dtype=jnp.float32)
    probe_vals = vals[..., None] * probes
    alpha = sample_windowed_transfer_function(
        probe_vals, 1.0, tf_table, windowing_vec4
    )[..., 3]
    return jnp.any(alpha > 0.0, axis=-1)
