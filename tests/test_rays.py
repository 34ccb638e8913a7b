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


def test_scene_depth_from_plane_clamps_march():
    """End-to-end scene-depth occlusion (`RaymarchMaterialCommon.usf:26-44`):
    an opaque plane halfway through the cube clamps ray thickness and
    changes the render; rays in front of the plane are unaffected."""
    import jax.numpy as jnp

    from tbraymarcherplugin_tpu.ops import march as M
    from tbraymarcherplugin_tpu.ops import synthetic
    from tbraymarcherplugin_tpu.ops import transfer as T
    from tbraymarcherplugin_tpu.ops.rays import (
        scene_depth_from_plane, setup_rays,
    )
    from tbraymarcherplugin_tpu.scene import Camera, VolumeTransform

    dims = (16, 16, 16)
    vol = synthetic.ct_like_phantom(dims, seed=0)
    lv = jnp.ones(dims, jnp.float32)
    tf = T.tf_from_keypoints([0, 1], [[0, 0, 0, 0.01], [1, 1, 1, 0.12]])
    cam = Camera.look_at([0.0, -2.4, 0.0], [0.0, 0.0, 0.0], fov_degrees=30.0)
    tr = VolumeTransform.create()
    W, H = 24, 24
    # Opaque plane at y=0 (cube center), facing the camera.
    depth = scene_depth_from_plane(cam, tr, W, H, [0.0, 0.0, 0.0],
                                   [0.0, -1.0, 0.0])
    assert np.isfinite(np.asarray(depth)).all()
    rays_free = setup_rays(cam, tr, W, H)
    rays_occl = setup_rays(cam, tr, W, H, scene_depth=depth)
    th_f = np.asarray(rays_free.thickness)
    th_o = np.asarray(rays_occl.thickness)
    assert (th_o <= th_f + 1e-6).all()
    assert (th_o < th_f - 1e-3).any(), "the plane should clamp some rays"
    win = jnp.asarray([0.5, 1.0, 0.0, 0.0], jnp.float32)
    cc = jnp.asarray([0.0, 0.0, -1e6], jnp.float32)
    cd = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    img_f = np.asarray(M.march_lit(jnp.asarray(vol), tf, lv, rays_free, win,
                                   cc, cd, step_count=24))
    img_o = np.asarray(M.march_lit(jnp.asarray(vol), tf, lv, rays_occl, win,
                                   cc, cd, step_count=24))
    # occluded rays integrate only the front half: clearly less alpha
    assert img_o[..., 3].sum() < img_f[..., 3].sum() * 0.95
    assert np.abs(img_o - img_f).max() > 0.02
