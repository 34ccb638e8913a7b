"""Volume sampling: trilinear interpolation, DICOM windowing, windowed TF steps.

TPU-native equivalent of the reference's windowed-sampling HLSL library
(`Shaders/Private/WindowedSampling.usf`) plus GPU-sampler semantics the engine
provided implicitly (clamp-addressed trilinear `Texture3D.SampleLevel`).

Layout convention: volumes are ``(X, Y, Z)`` float32 arrays; a UVW coordinate
``(u, v, w)`` in [0,1]^3 addresses axes 0/1/2 with texel centers at
``(i + 0.5) / dim`` — identical to D3D texture addressing so windowing/TF
semantics carry over exactly.

`VOLUME_DENSITY` is the reference's fixed global density multiplier applied to
step sizes (`RaymarcherCommon.usf:18`).
"""

from __future__ import annotations

import jax.numpy as jnp

from .transfer import sample_tf

# Fixed volume density: multiplies step sizes when computing opacity
# (`RaymarcherCommon.usf:15-18`). Bigger -> more opaque volumes.
VOLUME_DENSITY = 100.0

ONE_OVER_SQRT_3 = 0.57735026919


def trilinear_sample(volume: jnp.ndarray, uvw: jnp.ndarray) -> jnp.ndarray:
    """Clamp-addressed trilinear sampling of a (X, Y, Z) volume at UVW coords.

    Matches `Volume.SampleLevel(ClampSampler, UVW, 0)`: texel centers at
    (i+0.5)/dim, clamp-to-edge addressing.

    Args:
      volume: (X, Y, Z) float array.
      uvw: (..., 3) coordinates.

    Returns:
      (...,) interpolated values.
    """
    dims = jnp.asarray(volume.shape, jnp.float32)
    p = uvw * dims - 0.5
    i0 = jnp.floor(p)
    frac = p - i0
    i0 = i0.astype(jnp.int32)

    def ax_idx(a, off):
        return jnp.clip(i0[..., a] + off, 0, volume.shape[a] - 1)

    # Linearized gather of the 8 cell corners; per-axis clamping happens
    # before linearization so clamp-to-edge is exact (no wraparound).
    sy = volume.shape[1] * volume.shape[2]
    sz = volume.shape[2]
    flat = volume.reshape(-1)

    def corner(dx, dy, dz):
        lin = ax_idx(0, dx) * sy + ax_idx(1, dy) * sz + ax_idx(2, dz)
        return jnp.take(flat, lin, axis=0)

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c00 = corner(0, 0, 0) * (1 - fz) + corner(0, 0, 1) * fz
    c01 = corner(0, 1, 0) * (1 - fz) + corner(0, 1, 1) * fz
    c10 = corner(1, 0, 0) * (1 - fz) + corner(1, 0, 1) * fz
    c11 = corner(1, 1, 0) * (1 - fz) + corner(1, 1, 1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def transfer_func_position(value, center, width):
    """Windowing transform: data value -> TF coordinate
    (`WindowedSampling.usf:14-17`)."""
    return (value - center + width * 0.5) / width


def correct_for_step_size(intensity, step_size):
    """Beer–Lambert-style opacity correction ``1 - (1-a)^step``
    (`RaymarcherCommon.usf:46-49`).

    The pow base is clamped to >= 1e-10: at ``a == 1`` exactly, the VJP of
    ``pow(0, s)`` evaluates ``0^(s-1)``/``log(0)`` terms that turn masked-out
    lanes into NaN gradients (``jnp.where`` does not stop NaN cotangents).
    The clamp changes the forward value by < 1e-17, far below float32 ulp.
    """
    base = jnp.maximum(1.0 - intensity, 1e-10)
    return 1.0 - jnp.power(base, step_size)


def sample_windowed_transfer_function(
    value, step_size, tf_table, windowing_vec4
) -> jnp.ndarray:
    """Window a data value, look it up in the TF, correct alpha for step size.

    Matches `SampleWindowedTransferFunction` (`WindowedSampling.usf:20-37`):
    values whose TF position falls below 0 (with low cutoff enabled) or above 1
    (with high cutoff enabled) contribute nothing.

    Args:
      value: (...,) sampled data values.
      step_size: scalar or (...,) step length in density units (already
        multiplied by VOLUME_DENSITY by callers, like the reference).
      tf_table: (R, 4) transfer function.
      windowing_vec4: (4,) = (center, width, low_cutoff, high_cutoff).

    Returns:
      (..., 4) RGBA with step-corrected alpha.
    """
    center, width = windowing_vec4[0], windowing_vec4[1]
    low_c, high_c = windowing_vec4[2], windowing_vec4[3]
    tf_pos = transfer_func_position(value, center, width)
    cut = ((tf_pos < 0.0) & (low_c > 0.0)) | ((tf_pos > 1.0) & (high_c > 0.0))

    color = sample_tf(tf_table, tf_pos)
    alpha = jnp.clip(color[..., 3], 0.0, 1.0)
    alpha = correct_for_step_size(alpha, step_size)
    rgba = jnp.concatenate([color[..., :3], alpha[..., None]], axis=-1)
    return jnp.where(cut[..., None], 0.0, rgba)


def sample_windowed_volume_step(
    uvw, step_size, volume, tf_table, windowing_vec4
) -> jnp.ndarray:
    """Trilinear volume sample + windowed TF transform
    (`WindowedSampling.usf:40-44`)."""
    value = trilinear_sample(volume, uvw)
    return sample_windowed_transfer_function(value, step_size, tf_table, windowing_vec4)


def is_clipped(uvw, clip_center, clip_direction):
    """Half-space clip test (`RaymarcherCommon.usf:22-25`): clipped when
    ``dot(P - center, dir) <= 0``."""
    return jnp.sum((uvw - clip_center) * clip_direction, axis=-1) <= 0.0


def clip_soft_alpha_weight(uvw, clip_center, clip_direction, resolution):
    """Per-voxel soft clip weight used by light propagation
    (`AddDirLightShader.usf:87-105`): approximate the un-clipped fraction of
    the voxel cube by distance to the plane in voxel units.

    Args:
      uvw: (..., 3) sample positions.
      clip_center / clip_direction: UVW-space plane.
      resolution: (3,) light-volume dims used to convert to voxel space.

    Returns:
      (...,) weight in [0, 1].
    """
    res = jnp.asarray(resolution, jnp.float32)
    dist = jnp.sum((uvw - clip_center) * clip_direction, axis=-1)
    # Offset from the plane-projection point, in voxel units.
    offset = clip_direction * dist[..., None] * res
    voxel_distance = jnp.linalg.norm(offset, axis=-1)
    return jnp.clip(0.5 + ONE_OVER_SQRT_3 * voxel_distance * jnp.sign(dist), 0.0, 1.0)
