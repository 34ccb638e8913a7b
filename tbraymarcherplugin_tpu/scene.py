"""Scene records: directional lights, clipping planes, volume transform, camera.

TPU-native equivalents of the reference's scene actors:

- :class:`DirLight`  <- `ARaymarchLight` (`Public/Actor/RaymarchLight.h:16-40`):
  a directional light is a direction vector + scalar intensity.
- :class:`ClipPlane` <- `ARaymarchClipPlane` (`Public/Actor/RaymarchClipPlane.h:16-30`):
  plane center + normal of the clipped-away half-space.
- :class:`VolumeTransform` <- the `VolumeTransform` part of
  `FRaymarchWorldParameters` (`Public/Rendering/RaymarchTypes.h:131-153`).
- :class:`Camera` <- the UE view environment used by `PerformRaymarchCubeSetup`
  (`Shaders/Private/RaymarchMaterialCommon.usf:23-69`); we use an explicit
  pinhole model since there is no engine to supply view matrices.

All records are pytree dataclasses so they can flow through jit/grad and be
sharded. Rotations are 3x3 matrices (row vectors multiply on the right),
positions are world-space mm.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _as_f32(x):
    return jnp.asarray(x, jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DirLight:
    """Directional light: world-space direction it shines *towards* + intensity.

    Matches `FDirLightParameters` (`RaymarchTypes.h:19-41`): e.g. direction
    (1,0,0) means the light source sits at -X shining toward +X
    (`LightingShaderUtils.cpp:174-177`).
    """

    direction: jax.Array  # (3,) need not be normalized
    intensity: jax.Array | float = 1.0

    def __post_init__(self):
        # Accept plain tuples/lists at the public API boundary.
        self.direction = _as_f32(self.direction)
        self.intensity = _as_f32(self.intensity)

    @staticmethod
    def create(direction, intensity=1.0) -> "DirLight":
        return DirLight(_as_f32(direction), _as_f32(intensity))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ClipPlane:
    """Clipping plane: world-space center + direction of the clipped half-space.

    Matches `FClippingPlaneParameters` (`RaymarchTypes.h:43-71`). Everything on
    the side the ``direction`` points *away from* is clipped
    (`RaymarcherCommon.usf:22-25`: clipped iff dot(P - center, dir) <= 0).
    """

    center: jax.Array  # (3,)
    direction: jax.Array  # (3,)

    def __post_init__(self):
        self.center = _as_f32(self.center)
        self.direction = _as_f32(self.direction)

    @staticmethod
    def create(center, direction) -> "ClipPlane":
        return ClipPlane(_as_f32(center), _as_f32(direction))

    @staticmethod
    def disabled() -> "ClipPlane":
        """A plane that clips nothing (center far below the volume, facing up)."""
        return ClipPlane(_as_f32([0.0, 0.0, -1e6]), _as_f32([0.0, 0.0, 1.0]))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VolumeTransform:
    """Rigid+scale transform placing the unit volume cube in world space.

    Local volume space is the centered unit cube [-0.5, 0.5]^3; UVW texture
    space is [0, 1]^3 (`RaymarcherCommon.usf:51-61`). World point =
    ``local @ rotation * scale + translation``... stored factored so we can
    invert exactly: ``world = (local * scale) @ R + t``.
    """

    rotation: jax.Array  # (3, 3) orthonormal, rows are local axes in world space
    translation: jax.Array  # (3,)
    scale: jax.Array  # (3,) world size of the cube per local axis

    @staticmethod
    def create(rotation=None, translation=(0.0, 0.0, 0.0), scale=(1.0, 1.0, 1.0)):
        if rotation is None:
            rotation = np.eye(3)
        return VolumeTransform(_as_f32(rotation), _as_f32(translation), _as_f32(scale))

    # --- point/vector transforms (UE FTransform semantics) ---

    def transform_position(self, p):
        return (p * self.scale) @ self.rotation + self.translation

    def inverse_transform_position(self, p):
        return ((p - self.translation) @ self.rotation.T) / self.scale

    def inverse_transform_vector(self, v):
        """Inverse-rotate and inverse-scale a vector (UE InverseTransformVector)."""
        return (v @ self.rotation.T) / self.scale

    def inverse_transform_vector_no_scale(self, v):
        """Inverse-rotate only (UE InverseTransformVectorNoScale)."""
        return v @ self.rotation.T

    # --- convenience spaces ---

    def world_to_uvw(self, p):
        """World position -> UVW in [0,1]^3 (outside values fall outside [0,1])."""
        return self.inverse_transform_position(p) + 0.5

    def uvw_to_world(self, uvw):
        return self.transform_position(uvw - 0.5)

    def local_light_direction(self, light: DirLight):
        """Light direction in volume-local space, normalized.

        Reference: `GetLocalLightParamsAndAxes` (`LightingShaderUtils.cpp:160-177`)
        uses InverseTransformVector (with scale) then normalizes.
        """
        d = self.inverse_transform_vector(light.direction)
        return d / jnp.linalg.norm(d)

    def local_clip_plane(self, plane: ClipPlane) -> ClipPlane:
        """Clip plane in UVW space.

        Reference: `GetLocalClippingParameters` (`LightingShaderUtils.cpp:205-220`):
        center via inverse transform + 0.5; direction via no-scale inverse rotate,
        multiplied by scale, then normalized.
        """
        center = self.inverse_transform_position(plane.center) + 0.5
        direction = self.inverse_transform_vector_no_scale(plane.direction) * self.scale
        direction = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-12)
        return ClipPlane(center, direction)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """Pinhole camera generating the per-pixel rays the UE raster pass provides.

    ``rotation`` rows are (right, up, forward) in world space; ``position`` is
    the camera origin. ``tan_half_fov`` controls the horizontal field of view;
    vertical FOV follows the aspect ratio of the image.
    """

    position: jax.Array  # (3,)
    rotation: jax.Array  # (3,3): rows = right, up, forward
    tan_half_fov: jax.Array | float = 0.5773502691896  # tan(30 deg) -> 60 deg hfov

    @staticmethod
    def create(position, rotation=None, fov_degrees=60.0) -> "Camera":
        if rotation is None:
            rotation = np.eye(3)
        return Camera(
            _as_f32(position),
            _as_f32(rotation),
            _as_f32(np.tan(np.radians(fov_degrees) / 2.0)),
        )

    @staticmethod
    def look_at(position, target, up=(0.0, 0.0, 1.0), fov_degrees=60.0) -> "Camera":
        """Build a camera at ``position`` looking at ``target``."""
        position = np.asarray(position, np.float64)
        forward = np.asarray(target, np.float64) - position
        forward = forward / np.linalg.norm(forward)
        up = np.asarray(up, np.float64)
        right = np.cross(forward, up)
        nrm = np.linalg.norm(right)
        if nrm < 1e-8:  # forward parallel to up: pick any perpendicular
            right = np.cross(forward, np.array([1.0, 0.0, 0.0]))
            nrm = np.linalg.norm(right)
        right = right / nrm
        true_up = np.cross(right, forward)
        rot = np.stack([right, true_up, forward])
        return Camera.create(position, rot, fov_degrees)


def orbit_camera(angle, radius, height=0.0, target=(0.0, 0.0, 0.0), fov_degrees=60.0):
    """Camera orbiting ``target`` in the XY plane — the perf-test camera motion
    (`PerformanceTest1.cpp` camera-orbit phase)."""
    angle = float(angle)
    pos = (
        float(target[0]) + radius * np.cos(angle),
        float(target[1]) + radius * np.sin(angle),
        float(target[2]) + height,
    )
    return Camera.look_at(pos, target, fov_degrees=fov_degrees)
