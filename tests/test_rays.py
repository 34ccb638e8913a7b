"""Tests for ray generation and ray/AABB setup (`RaymarchMaterialCommon.usf`)."""

import numpy as np
import jax.numpy as jnp

from tbraymarcherplugin_tpu.ops import rays as R
from tbraymarcherplugin_tpu.scene import Camera, VolumeTransform


def test_aabb_outside_hit():
    t0, t1 = R.ray_aabb_intersection(
        jnp.array([-1.0, 0.5, 0.5]), jnp.array([1.0, 0.0, 0.0])
    )
    assert np.isclose(t0, 1.0) and np.isclose(t1, 2.0)


def test_aabb_inside():
    # Origin inside the box: entry time is negative, exit positive
    # (`RaymarcherCommon.usf:63-65` clamps entry to 0 at the call site).
    t0, t1 = R.ray_aabb_intersection(
        jnp.array([0.5, 0.5, 0.5]), jnp.array([0.0, 0.0, 1.0])
    )
    assert t0 < 0.0 and np.isclose(t1, 0.5)


def test_aabb_miss():
    t0, t1 = R.ray_aabb_intersection(
        jnp.array([-1.0, 5.0, 0.5]), jnp.array([1.0, 0.0, 0.0])
    )
    assert t1 <= max(float(t0), 0.0)


def test_aabb_diagonal():
    d = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    t0, t1 = R.ray_aabb_intersection(jnp.array([-1.0, -1.0, -1.0]), jnp.asarray(d))
    assert np.isclose(t1 - t0, np.sqrt(3), atol=1e-5)


def test_camera_rays_center_pixel():
    cam = Camera.look_at([0.0, -5.0, 0.0], [0.0, 0.0, 0.0])
    origins, dirs = R.camera_rays(cam, 64, 64)
    center = np.asarray(dirs[32, 32])
    # Center ray ~ forward (+Y here).
    assert center[1] > 0.99


def test_setup_rays_hits_centered_cube():
    cam = Camera.look_at([0.0, -3.0, 0.0], [0.0, 0.0, 0.0], fov_degrees=30.0)
    xf = VolumeTransform.create()
    batch = R.setup_rays(cam, xf, 33, 33)
    th = np.asarray(batch.thickness)
    # Central rays cross the unit cube (thickness ~1), corners may miss.
    assert th[16, 16] > 0.9
    assert np.all(th >= 0.0)
    entry = np.asarray(batch.entry)[16, 16]
    assert np.all(entry >= -1e-4) and np.all(entry <= 1.0 + 1e-4)


def test_setup_rays_scaled_volume():
    # Non-uniform scale: direction is normalized in local space, so thickness
    # through the slab stays consistent with the local-space metric.
    cam = Camera.look_at([0.0, -5.0, 0.0], [0.0, 0.0, 0.0], fov_degrees=20.0)
    xf = VolumeTransform.create(scale=(2.0, 1.0, 2.0))
    batch = R.setup_rays(cam, xf, 17, 17)
    assert np.asarray(batch.thickness)[8, 8] > 0.9


def test_scene_depth_clamps_thickness():
    cam = Camera.look_at([0.0, -3.0, 0.0], [0.0, 0.0, 0.0], fov_degrees=30.0)
    xf = VolumeTransform.create()
    full = R.setup_rays(cam, xf, 9, 9)
    depth = jnp.full((9, 9), 2.7)  # cuts through the middle of the cube
    clamped = R.setup_rays(cam, xf, 9, 9, scene_depth=depth)
    t_full = float(full.thickness[4, 4])
    t_cl = float(clamped.thickness[4, 4])
    assert t_cl < t_full and np.isclose(t_cl, 2.7 - 2.5, atol=1e-5)


def test_jitter_range_and_determinism():
    j1 = np.asarray(R.jitter_values(16, 8, frame_index=3))
    j2 = np.asarray(R.jitter_values(16, 8, frame_index=3))
    assert j1.shape == (8, 16)
    assert np.all((j1 >= 0.0) & (j1 < 1.0))
    assert np.array_equal(j1, j2)
    assert not np.array_equal(j1, np.asarray(R.jitter_values(16, 8, frame_index=4)))
