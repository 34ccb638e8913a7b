"""Synthetic volume generators: test spheres and the Mandelbulb SDF.

The sphere matches BASELINE config 1 ("64^3 synthetic sphere volume"). The
Mandelbulb is the TPU-native equivalent of the FractalMarcher demo module's
SDF bake (`Source/FractalMarcher/Shaders/Private/CalculateMandelbulbSDF.usf:25-65`)
— here a single vectorized jnp pass over the voxel grid instead of a compute
dispatch, useful as a synthetic benchmark/test volume (SURVEY §2.8).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _uvw_grid(dims):
    grids = jnp.meshgrid(
        *[jnp.arange(d, dtype=jnp.float32) for d in dims], indexing="ij"
    )
    return (jnp.stack(grids, axis=-1) + 0.5) / jnp.asarray(dims, jnp.float32)


def sphere_volume(dims=(64, 64, 64), center=(0.5, 0.5, 0.5), radius=0.35,
                  softness=0.05):
    """Soft-edged density sphere in [0, 1], normalized values."""
    uvw = _uvw_grid(dims)
    d = jnp.linalg.norm(uvw - jnp.asarray(center, jnp.float32), axis=-1)
    return jnp.clip((radius - d) / softness + 0.5, 0.0, 1.0)


def shell_volume(dims=(64, 64, 64), center=(0.5, 0.5, 0.5), radius=0.35,
                 thickness=0.06):
    """Hollow-shell density — exercises interior early termination."""
    uvw = _uvw_grid(dims)
    d = jnp.linalg.norm(uvw - jnp.asarray(center, jnp.float32), axis=-1)
    return jnp.exp(-((d - radius) ** 2) / (2 * (thickness / 2) ** 2))


def noise_volume(dims=(32, 32, 32), seed=0):
    """Uniform random density — worst case for empty-space skipping."""
    key = jax.random.PRNGKey(seed)
    return jax.random.uniform(key, tuple(dims), jnp.float32)


@partial(jax.jit, static_argnames=("dims", "iterations"))
def mandelbulb_sdf(dims=(128, 128, 128), power=8.0, extent=1.15,
                   iterations: int = 50):
    """Mandelbulb signed-distance field, normalized to [0, 1].

    Mirrors the math of `Mandelbulb_SDF` (`CalculateMandelbulbSDF.usf:25-65`):
    the standard distance estimator ``0.5 * log(r) * r / dr`` after iterating
    ``z -> z^power + c`` in spherical coordinates, evaluated per voxel over a
    cube of half-extent ``extent`` and written as a normalized volume.
    """
    uvw = _uvw_grid(dims)
    c = (uvw - 0.5) * (2.0 * extent)

    def body(_, state):
        z, dr, r, escaped = state
        r = jnp.linalg.norm(z, axis=-1)
        r_safe = jnp.maximum(r, 1e-9)
        theta = jnp.arccos(jnp.clip(z[..., 2] / r_safe, -1.0, 1.0))
        phi = jnp.arctan2(z[..., 1], z[..., 0])
        dr_new = jnp.power(r_safe, power - 1.0) * power * dr + 1.0
        zr = jnp.power(r_safe, power)
        theta, phi = theta * power, phi * power
        z_new = zr[..., None] * jnp.stack(
            [
                jnp.sin(theta) * jnp.cos(phi),
                jnp.sin(theta) * jnp.sin(phi),
                jnp.cos(theta),
            ],
            axis=-1,
        ) + c
        newly_escaped = r > 2.0
        z = jnp.where((escaped | newly_escaped)[..., None], z, z_new)
        dr = jnp.where(escaped | newly_escaped, dr, dr_new)
        return z, dr, r, escaped | newly_escaped

    z0 = c
    dr0 = jnp.ones(dims, jnp.float32)
    r0 = jnp.linalg.norm(c, axis=-1)
    esc0 = jnp.zeros(dims, bool)
    z, dr, r, _ = jax.lax.fori_loop(0, iterations, body, (z0, dr0, r0, esc0))

    r = jnp.maximum(jnp.linalg.norm(z, axis=-1), 1e-9)
    sdf = 0.5 * jnp.log(r) * r / dr
    # Normalize to [0, 1] with the surface at 0.5 (inside < 0.5).
    return jnp.clip(sdf / (2.0 * extent) + 0.5, 0.0, 1.0)


def mandelbulb_density(dims=(128, 128, 128), power=8.0, surface=0.5,
                       sharpness=40.0):
    """Density volume from the Mandelbulb SDF (soft inside-indicator)."""
    sdf = mandelbulb_sdf(dims, power)
    return jax.nn.sigmoid((surface - sdf) * sharpness)


def ct_like_phantom(dims=(256, 256, 256), seed=0):
    """A CT-ish phantom: nested ellipsoids + speckle, for benchmarks without
    shipping patient data (stands in for the LUNA16 sample volume,
    `Readme.md:275-277`)."""
    uvw = np.stack(
        np.meshgrid(*[np.arange(d) + 0.5 for d in dims], indexing="ij"), -1
    ) / np.asarray(dims)
    p = uvw - 0.5
    rng = np.random.default_rng(seed)
    body = np.clip(1.0 - np.linalg.norm(p / np.array([0.45, 0.35, 0.45]), axis=-1), 0, 1)
    organ = np.exp(-np.linalg.norm((p - [0.08, 0.02, 0.0]) / 0.18, axis=-1) ** 2)
    bone = np.clip(
        1.0 - np.abs(np.linalg.norm(p / np.array([0.4, 0.3, 0.42]), axis=-1) - 0.9) * 12,
        0,
        1,
    )
    speckle = rng.normal(0.0, 0.015, dims).astype(np.float32)
    vol = 0.25 * (body > 0) + 0.3 * organ + 0.45 * bone + speckle
    return np.clip(vol, 0.0, 1.0).astype(np.float32)
