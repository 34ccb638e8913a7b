"""Live Mandelbulb SDF sphere-tracing (FractalMarcher demo capability).

TPU-native re-design of the reference's live SDF march material functions
(`Source/FractalMarcher/Shaders/Private/SDFMarcher.usf`):

- :func:`mandelbulb_distance_estimate` <- `Mandelbulb_SDF` (usf:24-51)
- :func:`march_mandelbulb_distance`    <- `PerformMandelbulbRaymarchReturnDistance`
  (usf:61-112): distance-adaptive sphere trace, step-count shading.
- :func:`march_mandelbulb_normal`      <- `PerformMandelbulbRaymarchReturnNormal`
  (usf:117-188): same trace, shades with SDF-sample "normals".

The GPU per-pixel ``for``/``break``/early-return structure becomes a
`lax.fori_loop` over a static step bound with per-ray (hit, missed) masks, so
the whole image is one XLA computation.  Faithfully-reproduced quirks:

- step-count shading is ``1 - 10 * step / max_steps`` and may go negative for
  hits after max_steps/10 steps (usf:87-89);
- rays that exhaust all steps but end within ``low_eps`` count as hazy hits
  with value 0 / normal (0,0,0) (usf:103-108, 178-183);
- the "normal" is ``normalize(DE(p-dx), DE(p-dy), DE(p-dz))`` of raw one-sided
  SDF samples — not differences (usf:150-161).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def mandelbulb_distance_estimate(
    pos: jnp.ndarray, power=8.0, bailout: float = 2.0, iterations: int = 50
) -> jnp.ndarray:
    """Mandelbulb distance estimator at arbitrary points (usf:24-51).

    Args:
      pos: (..., 3) positions in fractal space.
      power: bulb power (z -> z^power + c).
      bailout: escape radius.
      iterations: max DE iterations.

    Returns:
      (...,) estimated distance ``0.5 * log(r) * r / dr``.
    """
    c = pos

    def body(_, state):
        z, dr, r, escaped = state
        r_new = jnp.linalg.norm(z, axis=-1)
        # Escape check happens on entry with the freshly-computed r (usf:35-38):
        # the loop breaks BEFORE updating z/dr, but r keeps the escape value.
        newly_escaped = r_new > bailout
        live = ~(escaped | newly_escaped)
        r = jnp.where(escaped, r, r_new)
        r_safe = jnp.maximum(r_new, 1e-9)
        theta = jnp.arccos(jnp.clip(z[..., 2] / r_safe, -1.0, 1.0)) * power
        phi = jnp.arctan2(z[..., 1], z[..., 0]) * power
        dr_new = jnp.power(r_safe, power - 1.0) * power * dr + 1.0
        zr = jnp.power(r_safe, power)
        z_new = zr[..., None] * jnp.stack(
            [
                jnp.sin(theta) * jnp.cos(phi),
                jnp.sin(phi) * jnp.sin(theta),
                jnp.cos(theta),
            ],
            axis=-1,
        ) + c
        z = jnp.where(live[..., None], z_new, z)
        dr = jnp.where(live, dr_new, dr)
        return z, dr, r, escaped | newly_escaped

    shape = pos.shape[:-1]
    state = (
        c,
        jnp.ones(shape, jnp.float32),
        jnp.linalg.norm(c, axis=-1),
        jnp.zeros(shape, bool),
    )
    z, dr, r, escaped = jax.lax.fori_loop(0, iterations, body, state)
    # r carries the value computed at the top of the final iteration —
    # |z_{N-1}| for interior points, the escape-time norm for escaped ones —
    # exactly the value the usf return statement sees after its break.
    r = jnp.maximum(r, 1e-9)
    return 0.5 * jnp.log(r) * r / dr


def _actual_position(uvw, volume_center, extent):
    """UVW [0,1] -> fractal space (usf:53-57)."""
    return jnp.asarray(volume_center, jnp.float32) + (uvw - 0.5) * extent


def _sphere_trace(entry, direction, volume_center, extent, power, max_steps,
                  iterations, bailout, high_eps):
    """Shared trace loop: returns (pos, dist, hit_step, hit, missed)."""
    # LocalCamVec is normalized then divided by Extent (usf:76): steps are in
    # UVW units, larger extents take smaller UVW steps.
    step_dir = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    step_dir = step_dir / extent
    shape = entry.shape[:-1]

    def body(k, state):
        pos, dist, hit_step, hit, missed = state
        live = ~(hit | missed)
        d = mandelbulb_distance_estimate(
            _actual_position(pos, volume_center, extent),
            power, bailout, iterations,
        )
        dist = jnp.where(live, d, dist)
        new_hit = live & (d < high_eps)
        hit_step = jnp.where(new_hit, k, hit_step)
        hit = hit | new_hit
        advance = live & ~new_hit
        pos = jnp.where(advance[..., None], pos + d[..., None] * step_dir, pos)
        out = jnp.any((pos < 0.0) | (pos > 1.0), axis=-1)
        missed = missed | (advance & out)
        return pos, dist, hit_step, hit, missed

    state = (
        entry,
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.int32),
        jnp.zeros(shape, bool),
        jnp.zeros(shape, bool),
    )
    return jax.lax.fori_loop(0, max_steps, body, state)


@partial(jax.jit, static_argnames=("max_steps", "iterations"))
def march_mandelbulb_distance(
    entry: jnp.ndarray,
    direction: jnp.ndarray,
    volume_center=(0.0, 0.0, 0.0),
    extent: float = 2.3,
    power=8.0,
    max_steps: int = 100,
    iterations: int = 50,
    bailout: float = 2.0,
    high_eps: float = 0.0005,
    low_eps: float = 0.0025,
) -> jnp.ndarray:
    """Sphere trace with step-count shading (usf:61-112).

    Args:
      entry: (..., 3) UVW entry positions (from ray/AABB setup).
      direction: (..., 3) march directions (UVW space, need not be unit).

    Returns:
      (..., 2): x = shade ``1 - 10*step/max_steps`` (0 for hazy/low-eps hits),
      y = hit mask (1 hit / 0 miss).
    """
    pos, dist, hit_step, hit, missed = _sphere_trace(
        entry, direction, volume_center, extent, power, max_steps,
        iterations, bailout, high_eps,
    )
    shade = 1.0 - 10.0 * hit_step.astype(jnp.float32) / float(max_steps)
    # Exhausted rays within low_eps are hazy hits with shade 0 (usf:103-108).
    hazy = ~hit & ~missed & (dist < low_eps)
    value = jnp.where(hit, shade, 0.0)
    alpha = (hit | hazy).astype(jnp.float32)
    return jnp.stack([value, alpha], axis=-1)


@partial(jax.jit, static_argnames=("max_steps", "iterations"))
def march_mandelbulb_normal(
    entry: jnp.ndarray,
    direction: jnp.ndarray,
    volume_center=(0.0, 0.0, 0.0),
    extent: float = 2.3,
    power=8.0,
    max_steps: int = 100,
    iterations: int = 50,
    bailout: float = 2.0,
    high_eps: float = 0.0005,
    low_eps: float = 0.0025,
    derivation_distance: float = 0.001,
) -> jnp.ndarray:
    """Sphere trace shading with SDF-sample "normals" (usf:117-188).

    Returns:
      (..., 4): rgb = normalized (DE(p-dx), DE(p-dy), DE(p-dz)) at the hit
      (usf:150-161), alpha = hit mask; hazy low-eps hits get rgb 0, alpha 1.
    """
    pos, dist, _hit_step, hit, missed = _sphere_trace(
        entry, direction, volume_center, extent, power, max_steps,
        iterations, bailout, high_eps,
    )
    dd = derivation_distance / extent  # usf:135
    offsets = jnp.eye(3, dtype=jnp.float32) * dd
    samples = [
        mandelbulb_distance_estimate(
            _actual_position(pos - offsets[a], volume_center, extent),
            power, bailout, iterations,
        )
        for a in range(3)
    ]
    normal = jnp.stack(samples, axis=-1)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
    )
    hazy = ~hit & ~missed & (dist < low_eps)
    rgb = jnp.where(hit[..., None], normal, 0.0)
    alpha = (hit | hazy).astype(jnp.float32)
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)
