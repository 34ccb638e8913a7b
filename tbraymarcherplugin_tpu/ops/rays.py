"""Ray generation and ray/box setup for the volume march.

TPU-native equivalent of `PerformRaymarchCubeSetup`
(`Shaders/Private/RaymarchMaterialCommon.usf:23-69`) and the slab-method
`RayAABBIntersection` (`RaymarcherCommon.usf:66-95`). Where the reference gets
per-pixel camera vectors from the UE raster pipeline, we generate the full ray
grid from a pinhole :class:`~tbraymarcherplugin_tpu.scene.Camera`, transform
into volume-local UVW space, and batch-intersect against the unit cube — all
vectorized jnp, fused by XLA into the march.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene import Camera, VolumeTransform


class RayBatch(NamedTuple):
    """Rays ready for marching, all in UVW space of the volume.

    entry: (..., 3) UVW entry position into the unit cube.
    direction: (..., 3) unit march direction (UVW ~ local space; translation-free).
    thickness: (...,) distance from entry to exit in local units (>= 0).
    """

    entry: jnp.ndarray
    direction: jnp.ndarray
    thickness: jnp.ndarray


def ray_aabb_intersection(origin, direction, box_min=0.0, box_max=1.0):
    """Slab-method ray/AABB intersection (reference `RaymarcherCommon.usf:66-88`).

    Returns (t0, t1): entry/exit times along ``direction`` from ``origin``.
    If the ray misses, t1 <= max(t0, 0).
    """
    inv_dir = 1.0 / direction  # inf handling matches HLSL: IEEE inf propagates
    t_min = (box_min - origin) * inv_dir
    t_max = (box_max - origin) * inv_dir
    closest = jnp.minimum(t_min, t_max)
    furthest = jnp.maximum(t_min, t_max)
    t0 = jnp.max(closest, axis=-1)
    t1 = jnp.min(furthest, axis=-1)
    return t0, t1


def camera_rays(camera: Camera, width: int, height: int):
    """Generate world-space rays through every pixel center.

    Returns (origins (H, W, 3), directions (H, W, 3) normalized). Pixel (0, 0)
    is top-left; +x right, +y down in image space.
    """
    aspect = height / width
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    px, py = jnp.meshgrid(xs * camera.tan_half_fov, ys * camera.tan_half_fov * aspect)
    right, up, forward = camera.rotation[0], camera.rotation[1], camera.rotation[2]
    dirs = (
        px[..., None] * right + py[..., None] * up + forward
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(camera.position, dirs.shape)
    return origins, dirs


def setup_rays(
    camera: Camera,
    transform: VolumeTransform,
    width: int,
    height: int,
    scene_depth=None,
) -> RayBatch:
    """Full cube setup: world rays -> local UVW entry/direction/thickness.

    Mirrors `PerformRaymarchCubeSetup` (`RaymarchMaterialCommon.usf:23-69`):
    transform camera origin/direction into volume-local space, normalize the
    direction *in local space* (so non-uniform scale behaves like the
    reference), intersect the [0,1] UVW cube, clamp entry to be in front of
    the camera and exit to the scene depth.

    Args:
      scene_depth: optional (H, W) distance along each local ray at which
        opaque scene geometry starts (the `CalcSceneDepth` clamp,
        `RaymarchMaterialCommon.usf:26-44`, already converted to local units).
        None means no occluders.
    """
    origins_w, dirs_w = camera_rays(camera, width, height)
    origin_uvw = transform.world_to_uvw(origins_w)
    dirs_local = transform.inverse_transform_vector(dirs_w)
    dirs_local = dirs_local / jnp.linalg.norm(dirs_local, axis=-1, keepdims=True)

    t0, t1 = ray_aabb_intersection(origin_uvw, dirs_local)
    t0 = jnp.maximum(t0, 0.0)
    if scene_depth is not None:
        t1 = jnp.minimum(t1, scene_depth)
    thickness = jnp.maximum(t1 - t0, 0.0)
    entry = origin_uvw + t0[..., None] * dirs_local
    return RayBatch(entry=entry, direction=dirs_local, thickness=thickness)


def scene_depth_from_plane(
    camera: Camera,
    transform: VolumeTransform,
    width: int,
    height: int,
    plane_point,
    plane_normal,
) -> jnp.ndarray:
    """Per-pixel occluder depth for an opaque world-space plane, in the
    local-ray units :func:`setup_rays`'s ``scene_depth`` expects.

    The reference reads the engine depth buffer (`CalcSceneDepth`,
    `RaymarchMaterialCommon.usf:26-44`); there is no engine here, so this is
    the depth *producer* for analytic occluders (and the reference
    implementation for wiring externally-rendered depth maps: convert world
    distance to distance along the normalized local-space ray).

    Returns (H, W) distances along each local ray (+inf where the plane is
    behind the camera or parallel).
    """
    origins_w, dirs_w = camera_rays(camera, width, height)
    origin_l = transform.world_to_uvw(origins_w)
    dirs_l = transform.inverse_transform_vector(dirs_w)
    dirs_l = dirs_l / jnp.linalg.norm(dirs_l, axis=-1, keepdims=True)
    # Plane to local space: x_w = (x_l * s) @ R + t  =>  n_l = (n_w @ R^T) * s
    n_w = jnp.asarray(plane_normal, jnp.float32)
    n_l = (n_w @ transform.rotation.T) * transform.scale
    p_l = transform.world_to_uvw(jnp.asarray(plane_point, jnp.float32))
    denom = jnp.sum(dirs_l * n_l, axis=-1)
    tnum = jnp.sum((p_l - origin_l) * n_l, axis=-1)
    t = tnum / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    return jnp.where((jnp.abs(denom) < 1e-12) | (t <= 0.0), jnp.inf, t)


def pcg_hash_3d(x, y, z):
    """PCG-style 3D hash -> uint32, a stand-in for UE's `Rand3DPCG16`
    used by `JitterEntryPos` (`RaymarchMaterialCommon.usf:73-78`)."""
    v = (
        x.astype(jnp.uint32) * jnp.uint32(1664525)
        + y.astype(jnp.uint32) * jnp.uint32(1013904223)
        + z.astype(jnp.uint32) * jnp.uint32(69069)
    )
    v ^= v >> 16
    v *= jnp.uint32(2654435769)
    v ^= v >> 13
    v *= jnp.uint32(2654435769)
    v ^= v >> 16
    return v


def jitter_values(width: int, height: int, frame_index: int = 0):
    """Per-pixel temporal jitter in [0, 1): entry positions are moved *against*
    the march direction by ``jitter * step`` (`RaymarchMaterialCommon.usf:73-78`).
    """
    xx = jnp.arange(width, dtype=jnp.uint32)[None, :]
    yy = jnp.arange(height, dtype=jnp.uint32)[:, None]
    f = jnp.uint32(frame_index % 8)
    h = pcg_hash_3d(
        jnp.broadcast_to(xx, (height, width)),
        jnp.broadcast_to(yy, (height, width)),
        jnp.full((height, width), f, jnp.uint32),
    )
    return (h & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0
