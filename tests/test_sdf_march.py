"""Oracle tests for the live Mandelbulb SDF sphere-trace (SDFMarcher.usf)."""

import math

import numpy as np
import pytest

from tbraymarcherplugin_tpu.ops.sdf_march import (
    march_mandelbulb_distance,
    march_mandelbulb_normal,
    mandelbulb_distance_estimate,
)

POWER, BAILOUT, ITERS = 8.0, 2.0, 50


def de_oracle(position, power=POWER, bailout=BAILOUT, iterations=ITERS):
    """Direct numpy transcription of `Mandelbulb_SDF` (SDFMarcher.usf:24-51)."""
    z = np.array(position, np.float32)
    c = z.copy()
    dr, r = np.float32(1.0), np.float32(0.0)
    for _ in range(iterations):
        r = np.float32(np.linalg.norm(z))
        if r > bailout:
            break
        rs = max(r, np.float32(1e-9))
        theta = math.acos(min(max(z[2] / rs, -1.0), 1.0))
        phi = math.atan2(z[1], z[0])
        dr = rs ** (power - 1.0) * power * dr + 1.0
        zr = rs ** power
        theta, phi = theta * power, phi * power
        z = zr * np.array(
            [
                math.sin(theta) * math.cos(phi),
                math.sin(phi) * math.sin(theta),
                math.cos(theta),
            ],
            np.float32,
        ) + c
    r = max(r, np.float32(1e-9))
    return 0.5 * math.log(r) * r / dr


def trace_oracle(entry, direction, volume_center, extent, max_steps,
                 high_eps, low_eps):
    """Transcription of `PerformMandelbulbRaymarchReturnDistance`
    (SDFMarcher.usf:61-112) for one ray."""
    pos = np.array(entry, np.float32)
    d = np.array(direction, np.float64)
    step_dir = (d / np.linalg.norm(d)) / extent
    dist = 0.0
    for k in range(max_steps):
        actual = np.asarray(volume_center) + (pos - 0.5) * extent
        dist = de_oracle(actual)
        if dist < high_eps:
            return np.array([1.0 - 10.0 * k / max_steps, 1.0], np.float32)
        pos = pos + dist * step_dir
        if np.any((pos < 0.0) | (pos > 1.0)):
            return np.array([0.0, 0.0], np.float32)
    if dist < low_eps:
        return np.array([0.0, 1.0], np.float32)
    return np.array([0.0, 0.0], np.float32)


def test_distance_estimate_matches_oracle(rng):
    pts = (rng.random((64, 3)).astype(np.float32) - 0.5) * 3.0
    got = np.asarray(mandelbulb_distance_estimate(pts, POWER, BAILOUT, ITERS))
    want = np.array([de_oracle(p) for p in pts])
    # Near the set boundary the DE is chaotic in float32: a one-iteration
    # difference in escape count (vectorized vs scalar rounding) changes the
    # estimate discontinuously. Compare only iteration-stable points — those
    # whose oracle value is insensitive to the iteration budget — which is
    # exactly the regime where both implementations are well-conditioned.
    want_m1 = np.array([de_oracle(p, iterations=ITERS - 1) for p in pts])
    stable = np.abs(want - want_m1) < 1e-4
    assert stable.sum() >= 48, "seeded points should be mostly boundary-free"
    np.testing.assert_allclose(got[stable], want[stable], rtol=2e-4, atol=2e-5)


def test_distance_march_matches_oracle(rng):
    # A small frustum of rays converging on the bulb from +y.
    n = 7
    u = np.linspace(0.25, 0.75, n, dtype=np.float32)
    entry = np.stack(np.meshgrid(u, np.ones(n, np.float32), u, indexing="ij"),
                     -1).reshape(-1, 3)
    target = np.array([0.5, 0.35, 0.5], np.float32)
    direction = target - entry + rng.normal(0, 0.02, entry.shape).astype(np.float32)
    kw = dict(volume_center=(0.0, 0.0, 0.0), extent=2.3, max_steps=40,
              high_eps=5e-4, low_eps=2.5e-3)
    got = np.asarray(
        march_mandelbulb_distance(
            entry, direction, kw["volume_center"], kw["extent"], POWER,
            kw["max_steps"], ITERS, BAILOUT, kw["high_eps"], kw["low_eps"],
        )
    )
    want = np.stack([trace_oracle(e, d, **kw) for e, d in zip(entry, direction)])
    np.testing.assert_array_equal(got[:, 1], want[:, 1])
    np.testing.assert_allclose(got[:, 0], want[:, 0], rtol=1e-4, atol=1e-4)
    assert want[:, 1].sum() > 0, "test scene should produce hits"
    assert (want[:, 1] == 0).any(), "test scene should produce misses"


def test_normal_march_shape_and_hits(rng):
    n = 5
    u = np.linspace(0.3, 0.7, n, dtype=np.float32)
    entry = np.stack(np.meshgrid(u, np.ones(n, np.float32), u, indexing="ij"),
                     -1).reshape(-1, 3)
    direction = np.tile(np.array([0.0, -1.0, 0.0], np.float32), (entry.shape[0], 1))
    out_n = np.asarray(march_mandelbulb_normal(entry, direction, max_steps=40))
    out_d = np.asarray(march_mandelbulb_distance(entry, direction, max_steps=40))
    assert out_n.shape == (entry.shape[0], 4)
    # Hit masks agree between the two variants (same trace).
    np.testing.assert_array_equal(out_n[:, 3], out_d[:, 1])
    # usf:150-163 — "normals" are normalized SDF samples at true (hi-eps) hits.
    hi_eps_hit = (out_d[:, 1] == 1.0) & (np.abs(out_n[:, :3]).sum(-1) > 0)
    if hi_eps_hit.any():
        norms = np.linalg.norm(out_n[hi_eps_hit, :3], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # Misses are fully zero.
    miss = out_d[:, 1] == 0.0
    np.testing.assert_array_equal(out_n[miss], 0.0)


def test_away_rays_miss():
    entry = np.array([[0.5, 0.98, 0.5]], np.float32)
    direction = np.array([[0.0, 1.0, 0.0]], np.float32)  # marching out
    out = np.asarray(march_mandelbulb_distance(entry, direction, max_steps=20))
    np.testing.assert_array_equal(out, [[0.0, 0.0]])
