"""Transfer function tables: creation, curve baking, lookup.

The reference bakes `UCurveLinearColor` assets into 256x1 RGBA float16
textures (`ColorCurveToTexture`, `Private/Util/RaymarchUtils.cpp:143-174`) and
has a default grayscale ramp TF (`MakeDefaultTFTexture`, `:113-141`).

Here a transfer function is simply a ``(resolution, 4)`` float32 array — a
first-class differentiable parameter (the primary gradient surface of the
framework, per BASELINE). Lookup semantics match GPU bilinear sampling of a
256-wide texture at v-coordinate 0.5 with clamp addressing
(`WindowedSampling.usf:33`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TF_RESOLUTION = 256


def default_grayscale_tf(resolution: int = TF_RESOLUTION) -> jnp.ndarray:
    """Grayscale ramp with alpha 1 (reference `MakeDefaultTFTexture`)."""
    ramp = jnp.linspace(0.0, 1.0, resolution, dtype=jnp.float32)
    return jnp.stack([ramp, ramp, ramp, jnp.ones_like(ramp)], axis=-1)


def tf_from_keypoints(
    positions, colors, resolution: int = TF_RESOLUTION
) -> jnp.ndarray:
    """Bake a piecewise-linear color curve into a TF table.

    The TPU-native analogue of evaluating a `UCurveLinearColor` at
    ``i / (resolution - 1)`` for each texel (`RaymarchUtils.cpp:152-162`).

    Args:
      positions: (K,) sorted curve-key positions in [0, 1].
      colors: (K, 4) RGBA values at those positions.
      resolution: number of texels.
    """
    positions = np.asarray(positions, np.float32)
    colors = np.asarray(colors, np.float32)
    xs = np.linspace(0.0, 1.0, resolution, dtype=np.float32)
    out = np.stack(
        [np.interp(xs, positions, colors[:, c]) for c in range(4)], axis=-1
    )
    return jnp.asarray(out)


def sample_tf(tf_table: jnp.ndarray, tf_pos: jnp.ndarray) -> jnp.ndarray:
    """Linear-interpolated TF lookup with clamp addressing.

    Matches `TF.SampleLevel(sampler, float2(TFPos, 0.5), 0)` with a clamped
    bilinear sampler on a ``(R, 1)`` texture: texel centers at ``(i+0.5)/R``.

    Args:
      tf_table: (R, 4) RGBA table.
      tf_pos: (...,) sample positions (typically from windowing; may lie
        outside [0, 1], in which case clamp addressing applies).

    Returns:
      (..., 4) RGBA samples.
    """
    res = tf_table.shape[0]
    x = tf_pos * res - 0.5
    i0 = jnp.floor(x)
    frac = x - i0
    i0c = jnp.clip(i0.astype(jnp.int32), 0, res - 1)
    i1c = jnp.clip(i0.astype(jnp.int32) + 1, 0, res - 1)
    c0 = jnp.take(tf_table, i0c, axis=0)
    c1 = jnp.take(tf_table, i1c, axis=0)
    return c0 + (c1 - c0) * frac[..., None]


# A few stock medical-imaging-style TFs standing in for the reference's 22
# `TF_CT-*` color-curve assets (`Content/Curves/`). Keypoints are original
# designs, not extracted from the binary assets.
def tf_ct_bone(resolution: int = TF_RESOLUTION) -> jnp.ndarray:
    return tf_from_keypoints(
        [0.0, 0.35, 0.5, 0.75, 1.0],
        [
            [0.0, 0.0, 0.0, 0.0],
            [0.4, 0.2, 0.1, 0.0],
            [0.9, 0.8, 0.6, 0.3],
            [1.0, 0.95, 0.85, 0.8],
            [1.0, 1.0, 1.0, 1.0],
        ],
        resolution,
    )


def tf_ct_soft_tissue(resolution: int = TF_RESOLUTION) -> jnp.ndarray:
    return tf_from_keypoints(
        [0.0, 0.2, 0.45, 0.7, 1.0],
        [
            [0.0, 0.0, 0.0, 0.0],
            [0.6, 0.2, 0.15, 0.05],
            [0.8, 0.5, 0.35, 0.25],
            [0.95, 0.85, 0.7, 0.6],
            [1.0, 1.0, 0.95, 0.9],
        ],
        resolution,
    )


def tf_rainbow(resolution: int = TF_RESOLUTION) -> jnp.ndarray:
    return tf_from_keypoints(
        [0.0, 0.25, 0.5, 0.75, 1.0],
        [
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 1.0, 1.0, 0.25],
            [0.0, 1.0, 0.0, 0.5],
            [1.0, 1.0, 0.0, 0.75],
            [1.0, 0.0, 0.0, 1.0],
        ],
        resolution,
    )


def tf_preset(name: str) -> jnp.ndarray:
    """One of the reference's 22 CT curve presets (`Content/Curves/
    TF_CT-*.uasset`, normalized 3D Slicer presets) as a (256, 4) table."""
    from .tf_presets_data import preset_table

    return jnp.asarray(preset_table(name))


def _stock_presets():
    from .tf_presets_data import PRESET_NAMES

    def make(n):
        return lambda: tf_preset(n)

    return {
        n[3:].lower().replace("-", "_"): make(n) for n in PRESET_NAMES
    }


STOCK_TRANSFER_FUNCTIONS = {
    "grayscale": default_grayscale_tf,
    "rainbow": tf_rainbow,
    # Hand-built analytic approximations, kept under distinct names —
    # the baked reference curves below DELIBERATELY own the plain
    # "ct_bone"/"ct_soft_tissue" keys so the registry resolves to the
    # reference's actual `TF_CT-*` tables.
    "ct_bone_approx": tf_ct_bone,
    "ct_soft_tissue_approx": tf_ct_soft_tissue,
    # the reference's full curve library, e.g. "ct_bone", "ct_lung",
    # "ct_cardiac", "ct_mip", "ct_x_ray" (22 presets;
    # see ops/tf_presets_data.py)
    **_stock_presets(),
}


def windowed_tf_range_occupied(mn, mx, windowing_vec4, tf_table):
    """Exact-conservative interval occupancy: can ANY value in [mn, mx]
    produce windowed-TF alpha > 0?

    Interval argument (shared by `octree.occupancy_grid` and the shear-warp
    slab skip): trilinear samples are convex combinations so they stay in
    [mn, mx]; windowing is affine; cutoffs clip the TF-position interval;
    the answer is whether clamp-addressed lerp over the clipped interval
    touches any TF texel with alpha > 0 (a prefix-sum query).
    """
    center, width = windowing_vec4[0], windowing_vec4[1]
    low_c, high_c = windowing_vec4[2], windowing_vec4[3]
    plo = (mn - center + 0.5 * width) / width
    phi = (mx - center + 0.5 * width) / width
    plo, phi = jnp.minimum(plo, phi), jnp.maximum(plo, phi)
    plo_eff = jnp.where(low_c > 0.0, jnp.maximum(plo, 0.0), plo)
    phi_eff = jnp.where(high_c > 0.0, jnp.minimum(phi, 1.0), phi)
    fully_cut = plo_eff > phi_eff

    res = tf_table.shape[0]
    xlo = plo_eff * res - 0.5
    xhi = phi_eff * res - 0.5
    ilo = jnp.clip(jnp.floor(xlo), 0, res - 1).astype(jnp.int32)
    ihi = jnp.clip(jnp.floor(xhi) + 1.0, 0, res - 1).astype(jnp.int32)
    nz = (tf_table[:, 3] > 0.0).astype(jnp.int32)
    csum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(nz)])
    any_nz = (csum[ihi + 1] - csum[ilo]) > 0

    occ = any_nz & ~fully_cut
    # Degenerate window (width == 0) divides by zero: treat as occupied.
    return occ | ~jnp.isfinite(plo) | ~jnp.isfinite(phi)
