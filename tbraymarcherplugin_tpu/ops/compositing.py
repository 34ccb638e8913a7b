"""Front-to-back emission-absorption compositing.

TPU-native equivalent of `AccumulateLightEnergy`
(`Shaders/Private/RaymarchMaterialCommon.usf:82-88`): the standard "over"
operator accumulating pre-step-corrected RGBA samples front to back.
"""

from __future__ import annotations

import jax.numpy as jnp

# Accumulated alpha above this terminates a ray; its alpha snaps to 1.0
# (`WindowedRaymarchMaterials.usf:75-79`).
EARLY_TERMINATION_ALPHA = 0.95


def accumulate(energy: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
    """One front-to-back over-composite step.

    Args:
      energy: (..., 4) accumulated RGBA light energy.
      sample: (..., 4) current RGBA sample (alpha already step-corrected).
    """
    trans = 1.0 - energy[..., 3:4]
    rgb = energy[..., :3] + sample[..., :3] * sample[..., 3:4] * trans
    a = energy[..., 3:4] + sample[..., 3:4] * trans
    return jnp.concatenate([rgb, a], axis=-1)


def compose_segments(front: jnp.ndarray, back: jnp.ndarray) -> jnp.ndarray:
    """Compose two already-accumulated RGBA segments front-to-back.

    Unlike :func:`accumulate` (whose sample rgb is NOT premultiplied and gets
    weighted by its own alpha), an accumulated segment's rgb already carries
    all per-sample alpha factors, so the over operator is
    ``rgb = F.rgb + (1-F.a) * B.rgb``. This is the associative operator that
    makes per-slab segment rendering exact (`parallel/slab_sharding.py`).
    """
    trans = 1.0 - front[..., 3:4]
    rgb = front[..., :3] + back[..., :3] * trans
    a = front[..., 3:4] + back[..., 3:4] * trans
    return jnp.concatenate([rgb, a], axis=-1)


def accumulate_masked(energy, sample, active_mask) -> jnp.ndarray:
    """Composite only where ``active_mask`` holds (early-termination/clip mask).

    Masked accumulation replaces the GPU `break`: dead rays keep their energy
    unchanged, which makes the masked forward exactly differentiable.
    """
    new = accumulate(energy, sample)
    return jnp.where(active_mask[..., None], new, energy)
