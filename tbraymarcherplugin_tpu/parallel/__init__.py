"""Parallelism: device meshes, ray-tile DP, volume slab sharding, multihost.

These are the components SURVEY §2.9 mandates (P1–P4); the reference has no
distributed story to mirror, so the designs follow the BASELINE north star:
`shard_map` over a named mesh with XLA collectives on ICI.
"""

from .mesh import make_mesh, replicated, sharded_along
from .ray_sharding import (
    make_sharded_train_step,
    pad_rays_for_mesh,
    render_lit_sharded,
)
from .overlap import psum_cotangent
from .shearwarp_sharding import (
    shearwarp_lit_sharded,
    shearwarp_lit_sharded_diff,
)
from .slab_sharding import (
    compute_illumination_sharded,
    compute_illumination_sharded_v2,
    march_lit_slab_ring,
    march_lit_slab_sharded,
)

__all__ = [
    "compute_illumination_sharded",
    "compute_illumination_sharded_v2",
    "make_mesh",
    "make_sharded_train_step",
    "march_lit_slab_ring",
    "march_lit_slab_sharded",
    "pad_rays_for_mesh",
    "psum_cotangent",
    "render_lit_sharded",
    "shearwarp_lit_sharded",
    "shearwarp_lit_sharded_diff",
    "replicated",
    "sharded_along",
]
