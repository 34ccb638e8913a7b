"""Slow, obvious numpy oracle for the renderer and the illumination volume.

The reference ships no unit tests (SURVEY §4); BASELINE demands "images and
pixel-gradients allclose vs CPU reference". This module is that reference: a
deliberately naive numpy transcription of the algorithm semantics
(`WindowedRaymarchMaterials.usf`, `AddDirLightShader.usf`) written with
explicit python step loops and no JAX — the independent oracle the jnp/Pallas
paths are validated against.

Keep this module boring. No vectorization tricks beyond per-ray numpy
broadcasting, no sharing of helpers with the production code.
"""

from __future__ import annotations

import math

import numpy as np

VOLUME_DENSITY = 100.0
ONE_OVER_SQRT_3 = 0.57735026919


def trilinear(volume: np.ndarray, uvw: np.ndarray) -> np.ndarray:
    """Clamp-addressed trilinear sample; uvw (..., 3), volume (X, Y, Z)."""
    dims = np.array(volume.shape, np.float32)
    p = uvw * dims - 0.5
    i0 = np.floor(p).astype(np.int64)
    f = (p - i0).astype(np.float32)
    out = np.zeros(uvw.shape[:-1], np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = np.clip(i0[..., 0] + dx, 0, volume.shape[0] - 1)
                iy = np.clip(i0[..., 1] + dy, 0, volume.shape[1] - 1)
                iz = np.clip(i0[..., 2] + dz, 0, volume.shape[2] - 1)
                w = (
                    (f[..., 0] if dx else 1 - f[..., 0])
                    * (f[..., 1] if dy else 1 - f[..., 1])
                    * (f[..., 2] if dz else 1 - f[..., 2])
                )
                out += volume[ix, iy, iz] * w
    return out


def sample_tf_1d(tf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Clamped linear TF texture lookup, texel centers at (i+0.5)/R."""
    res = tf.shape[0]
    x = pos * res - 0.5
    i0 = np.floor(x).astype(np.int64)
    f = (x - i0).astype(np.float32)
    a = tf[np.clip(i0, 0, res - 1)]
    b = tf[np.clip(i0 + 1, 0, res - 1)]
    return a + (b - a) * f[..., None]


def windowed_tf_sample(value, step_size, tf, windowing):
    """`SampleWindowedTransferFunction` (`WindowedSampling.usf:20-37`)."""
    center, width, low_c, high_c = [np.float32(w) for w in windowing]
    tf_pos = (value - center + width / 2.0) / width
    rgba = sample_tf_1d(tf, tf_pos)
    alpha = np.clip(rgba[..., 3], 0.0, 1.0)
    alpha = 1.0 - np.power(1.0 - alpha, step_size)
    rgba = rgba.copy()
    rgba[..., 3] = alpha
    cut = ((tf_pos < 0) & (low_c > 0)) | ((tf_pos > 1) & (high_c > 0))
    rgba[cut] = 0.0
    return rgba


def clipped(pos, clip_center, clip_direction):
    return np.sum((pos - clip_center) * clip_direction, axis=-1) <= 0.0


def render_lit(
    volume,
    tf,
    light_volume,
    entry,
    direction,
    thickness,
    windowing,
    clip_center,
    clip_direction,
    jitter=None,
    step_count=150,
    early_termination=0.95,
    compat_final_step=True,
):
    """Oracle for `PerformWindowedLitRaymarch` (usf:36-96). Shapes: rays (..., 3)."""
    entry = np.asarray(entry, np.float32)
    direction = np.asarray(direction, np.float32)
    thickness = np.asarray(thickness, np.float32)
    clip_center = np.asarray(clip_center, np.float32)
    clip_direction = np.asarray(clip_direction, np.float32)

    step_size = np.float32(1.0 / step_count)
    step_vec = direction * step_size
    float_actual = step_count * thickness
    max_steps = np.floor(float_actual)
    final_step = float_actual - max_steps
    step_world = np.float32(VOLUME_DENSITY) * step_size

    pos = entry.copy()
    if jitter is not None:
        pos = pos - step_vec * np.asarray(jitter, np.float32)[..., None]
    energy = np.zeros(thickness.shape + (4,), np.float32)
    terminated = np.zeros(thickness.shape, bool)

    n = int(math.ceil(step_count * math.sqrt(3.0)))
    for i in range(n):
        in_range = i < max_steps
        pos = np.where(in_range[..., None], pos + step_vec, pos)
        active = in_range & ~terminated & ~clipped(pos, clip_center, clip_direction)
        if not active.any():
            continue
        rgba = windowed_tf_sample(trilinear(volume, pos), step_world, tf, windowing)
        light = trilinear(light_volume, np.clip(pos, 0.0, 1.0))
        rgba[..., :3] *= light[..., None]
        trans = 1.0 - energy[..., 3]
        new_rgb = energy[..., :3] + rgba[..., :3] * rgba[..., 3:] * trans[..., None]
        new_a = energy[..., 3] + rgba[..., 3] * trans
        energy[..., :3] = np.where(active[..., None], new_rgb, energy[..., :3])
        energy[..., 3] = np.where(active, new_a, energy[..., 3])
        over = active & (energy[..., 3] > early_termination)
        energy[..., 3] = np.where(over, 1.0, energy[..., 3])
        terminated |= over

    pos_f = pos + step_vec * final_step[..., None]
    active_f = (
        ~terminated
        & (final_step > 0)
        & ~clipped(pos_f, clip_center, clip_direction)
    )
    fs_world = (
        np.float32(VOLUME_DENSITY) * final_step
        if compat_final_step
        else np.float32(VOLUME_DENSITY) * step_size * final_step
    )
    rgba = windowed_tf_sample(trilinear(volume, pos_f), fs_world, tf, windowing)
    light = trilinear(light_volume, np.clip(pos_f, 0.0, 1.0))
    rgba[..., :3] *= light[..., None]
    trans = 1.0 - energy[..., 3]
    new_rgb = energy[..., :3] + rgba[..., :3] * rgba[..., 3:] * trans[..., None]
    new_a = energy[..., 3] + rgba[..., 3] * trans
    energy[..., :3] = np.where(active_f[..., None], new_rgb, energy[..., :3])
    energy[..., 3] = np.where(active_f, new_a, energy[..., 3])
    return energy


def render_intensity(
    volume,
    entry,
    direction,
    thickness,
    windowing,
    clip_center,
    clip_direction,
    jitter=None,
    step_count=150,
):
    """Oracle for `PerformWindowedIntensityRaymarch` (usf:187-242)."""
    entry = np.asarray(entry, np.float32)
    direction = np.asarray(direction, np.float32)
    thickness = np.asarray(thickness, np.float32)
    center, width = np.float32(windowing[0]), np.float32(windowing[1])

    step_size = np.float32(1.0 / step_count)
    step_vec = direction * step_size
    float_actual = step_count * thickness
    max_steps = np.floor(float_actual)
    final_step = float_actual - max_steps

    pos = entry.copy()
    if jitter is not None:
        pos = pos - step_vec * np.asarray(jitter, np.float32)[..., None]
    value = np.zeros(thickness.shape, np.float32)
    hit = np.zeros(thickness.shape, bool)

    n = int(math.ceil(step_count * math.sqrt(3.0)))
    for i in range(n):
        in_range = i < max_steps
        pos = np.where(in_range[..., None], pos + step_vec, pos)
        sat = np.clip(pos, 0.0, 1.0)
        active = in_range & ~hit & ~clipped(sat, clip_center, clip_direction)
        v = trilinear(volume, sat)
        tf_pos = np.clip((v - center + width / 2.0) / width, 0.0, 1.0)
        value = np.where(active, tf_pos, value)
        hit |= active

    pos_f = pos + step_vec * final_step[..., None]
    active_f = ~hit & (final_step > 0) & ~clipped(pos_f, clip_center, clip_direction)
    v = trilinear(volume, pos_f)
    tf_pos = np.clip((v - center + width / 2.0) / width, 0.0, 1.0)
    value = np.where(active_f, tf_pos, value)
    hit |= active_f

    out = np.zeros(thickness.shape + (4,), np.float32)
    out[..., 0] = out[..., 1] = out[..., 2] = value
    out[..., 3] = hit.astype(np.float32)
    return out


# --- illumination-volume oracle -------------------------------------------


def bilinear_border(buf, px, py, border):
    """Bilinear sample of 2D buf at pixel-space (px, py) with border value."""
    i0x, i0y = int(np.floor(px)), int(np.floor(py))
    fx, fy = px - i0x, py - i0y
    out = 0.0
    for dx, wx in ((0, 1 - fx), (1, fx)):
        for dy, wy in ((0, 1 - fy), (1, fy)):
            x, y = i0x + dx, i0y + dy
            if 0 <= x < buf.shape[0] and 0 <= y < buf.shape[1]:
                out += wx * wy * buf[x, y]
            else:
                out += wx * wy * border
    return out


def propagate_light(
    volume,
    tf,
    windowing,
    clip_center,
    clip_direction,
    local_light_dir,
    intensity,
    light_dims,
    apply_write_threshold=True,
):
    """Oracle for one light's full illumination contribution.

    Literal transcription of `AddDirLightShader.usf:68-128` +
    `LightingShaders.cpp:35-166`: per-face slice loop with per-pixel python
    bilinear reads. O(voxels) python — use tiny volumes in tests.
    """
    d = np.asarray(local_light_dir, np.float64)
    d = d / np.linalg.norm(d)
    light_pos = -d

    normals = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float64,
    )
    w = normals @ light_pos
    w = np.where(w > 0, w * w, 0.0)
    order = np.argsort(-w, kind="stable")
    w0 = w[order[0]]
    if w0 > 0.99:
        w0 = 1.0
    weights = [w0, 1.0 - w0]
    faces = [int(order[0]), int(order[1])]

    clip_center = np.asarray(clip_center, np.float64)
    clip_direction = np.asarray(clip_direction, np.float64)
    res = np.array(light_dims, np.float64)
    total = np.zeros(light_dims, np.float32)

    for face, weight in zip(faces, weights):
        if weight == 0.0:
            continue
        axis = face // 2
        axes_map = {0: (1, 2, 0), 1: (0, 2, 1), 2: (0, 1, 2)}[axis]
        td = (
            light_dims[axes_map[0]],
            light_dims[axes_map[1]],
            light_dims[axes_map[2]],
        )
        light_alpha = float(intensity) * weight

        # UV offset to previous slice.
        sign = 1.0 if face % 2 == 0 else -1.0
        nlp = light_pos / (sign * light_pos[axis])
        uv_off = np.array([nlp[axes_map[0]], nlp[axes_map[1]]]) / td[2]
        # UVW offset + step size, with longest-voxel-side renormalization.
        raw = light_pos / (abs(light_pos[axis]) * td[2])
        step_size = np.linalg.norm(raw)
        uvw_off = raw / np.linalg.norm(raw) / min(light_dims)

        # Slice loop direction.
        if face % 2 == 0:
            slices = range(td[2] - 1, -1, -1)
        else:
            slices = range(td[2])

        buf = np.full((td[0], td[1]), light_alpha, np.float64)
        off_px = uv_off[0] * td[0]
        off_py = uv_off[1] * td[1]
        for j in slices:
            new_buf = np.zeros_like(buf)
            for px in range(td[0]):
                for py in range(td[1]):
                    coords = [0, 0, 0]
                    coords[axes_map[0]] = px
                    coords[axes_map[1]] = py
                    coords[axes_map[2]] = j
                    prev = bilinear_border(buf, px + off_px, py + off_py, light_alpha)
                    uvw = (np.array(coords, np.float64) + 0.5) / res + uvw_off
                    dist = np.dot(uvw - clip_center, clip_direction)
                    voxel_dist = np.linalg.norm(clip_direction * dist * res)
                    alpha_weight = np.clip(
                        0.5 + ONE_OVER_SQRT_3 * voxel_dist * np.sign(dist), 0, 1
                    )
                    cur = 0.0
                    if alpha_weight > 0.0 and np.all((uvw >= 0) & (uvw <= 1)):
                        cur = float(
                            windowed_tf_sample(
                                trilinear(volume, uvw.astype(np.float32)[None]),
                                step_size * VOLUME_DENSITY,
                                tf,
                                windowing,
                            )[0, 3]
                        )
                        cur *= alpha_weight
                    new_val = prev * (1.0 - cur)
                    new_buf[px, py] = new_val
                    if (not apply_write_threshold) or abs(new_val) > 1e-3:
                        total[coords[0], coords[1], coords[2]] += new_val
            buf = new_buf
    return total
