"""Renderer orchestration tests: dirty-flag reactivity (SURVEY §3.5)."""

import numpy as np
import jax.numpy as jnp

from tbraymarcherplugin_tpu.ops import lighting as L
from tbraymarcherplugin_tpu.ops import synthetic
from tbraymarcherplugin_tpu.ops import transfer as T
from tbraymarcherplugin_tpu.renderer import Renderer, RendererConfig
from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, DirLight, VolumeTransform

RAMP_TF = T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]])


def make_renderer(**cfg):
    vol = synthetic.sphere_volume((16, 16, 16), radius=0.35)
    # Jitter is default-ON (reference parity); these tests compare renders
    # across instances/frames, so pin it off unless a test opts in.
    cfg.setdefault("jitter", False)
    config = RendererConfig(step_count=32, **cfg)
    r = Renderer(vol, tf_table=RAMP_TF, config=config)
    return r


def test_explicit_shearwarp_honored_with_default_jitter():
    """Explicit march_impl='shearwarp' must not silently fall back to the
    march on CPU just because jitter defaults on — it renders the
    shear-warp path unjittered (logged divergence) instead."""
    cam = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0], fov_degrees=30.0)
    r = make_renderer(jitter=True, march_impl="shearwarp")
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    img = np.asarray(r.render(cam, 16, 16))
    r2 = make_renderer(jitter=False, march_impl="shearwarp")
    r2.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    img2 = np.asarray(r2.render(cam, 16, 16))
    # same renderer, same (unjittered) output on CPU
    np.testing.assert_allclose(img, img2, atol=1e-6)


def test_jitter_defaults_on():
    # Reference parity: all three materials call JitterEntryPos
    # unconditionally (`WindowedRaymarchMaterials.usf:62,127,206`).
    assert RendererConfig().jitter is True
    cam = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0], fov_degrees=30.0)
    r = make_renderer(jitter=True)
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    img = np.asarray(r.render(cam, 12, 12))
    assert img.shape == (12, 12, 4)
    assert np.isfinite(img).all()


def test_render_modes_produce_images():
    cam = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0], fov_degrees=30.0)
    r = make_renderer()
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    for mode in ("lit", "intensity", "octree"):
        r.set_render_mode(mode)
        img = np.asarray(r.render(cam, 12, 12))
        assert img.shape == (12, 12, 4)
        assert np.isfinite(img).all()
        assert img[..., 3].max() > 0.0, mode


def test_lighting_cached_between_frames():
    cam = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0])
    r = make_renderer()
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    r.render(cam, 8, 8)
    lv1 = r.light_volume
    r.render(cam, 8, 8)
    # Unchanged scene: the illumination volume object is reused, not rebuilt.
    assert r.light_volume is lv1


def test_selective_update_matches_full_rebuild():
    cam = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0])
    r = make_renderer(apply_write_threshold=False)
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    r.add_light("fill", DirLight.create([1.0, 0.0, 0.0], 0.4))
    r.render(cam, 8, 8)
    # Move one light -> selective (incremental) update path.
    r.update_light("sun", DirLight.create([0.4, 0.0, -0.9], 0.8))
    r.ensure_lighting()
    incremental = np.asarray(r.light_volume)

    r2 = make_renderer(apply_write_threshold=False)
    r2.add_light("sun", DirLight.create([0.4, 0.0, -0.9], 0.8))
    r2.add_light("fill", DirLight.create([1.0, 0.0, 0.0], 0.4))
    r2.ensure_lighting()
    np.testing.assert_allclose(
        incremental, np.asarray(r2.light_volume), atol=1e-5
    )


def test_window_change_dirties_lights():
    cam = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0])
    r = make_renderer()
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    r.render(cam, 8, 8)
    lv1 = np.asarray(r.light_volume)
    r.set_window_width(0.5)
    r.render(cam, 8, 8)
    assert not np.allclose(lv1, np.asarray(r.light_volume))


def test_remove_light_subtracts():
    r = make_renderer(apply_write_threshold=False)
    r.add_light("a", DirLight.create([0.0, 0.0, -1.0], 1.0))
    r.add_light("b", DirLight.create([1.0, 0.0, 0.0], 0.5))
    r.ensure_lighting()
    r.remove_light("b")
    after = np.asarray(r.light_volume)

    solo = make_renderer(apply_write_threshold=False)
    solo.add_light("a", DirLight.create([0.0, 0.0, -1.0], 1.0))
    solo.ensure_lighting()
    np.testing.assert_allclose(after, np.asarray(solo.light_volume), atol=1e-5)


def test_half_resolution_config():
    r = make_renderer(light_volume_half_resolution=True)
    assert r.light_volume_dims() == (8, 8, 8)
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    r.ensure_lighting()
    assert r.light_volume.shape == (8, 8, 8)


def test_8bit_light_volume_quantization():
    r = make_renderer(light_volume_32bit=False)
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    r.ensure_lighting()
    lv = np.asarray(r.light_volume)
    np.testing.assert_allclose(lv, np.round(lv * 255) / 255, atol=1e-7)


def test_transform_change_triggers_recompute():
    r = make_renderer()
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    r.ensure_lighting()
    lv1 = np.asarray(r.light_volume)
    # Rotate the volume 90 deg about X: the local light direction changes.
    rot = np.array([[1.0, 0, 0], [0, 0, 1.0], [0, -1.0, 0]])
    r.set_transform(VolumeTransform.create(rotation=rot))
    assert r._lights_dirty
    r.ensure_lighting()
    assert not np.allclose(lv1, np.asarray(r.light_volume))


def test_clip_plane_affects_render_and_lights():
    cam = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0])
    r = make_renderer()
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    img1 = np.asarray(r.render(cam, 10, 10))
    r.set_clip_plane(ClipPlane.create([0.0, 0.0, 0.0], [0.0, 0.0, 1.0]))
    img2 = np.asarray(r.render(cam, 10, 10))
    assert not np.allclose(img1, img2)


def test_jitter_advances_frame_index():
    cam = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0])
    r = make_renderer(jitter=True)
    # Light traveling +Y lights the camera-facing side of the sphere, so rgb
    # varies with the jittered sample positions. (A light from behind leaves
    # the visible face fully self-shadowed — identically black rgb — and the
    # solid sphere saturates alpha to exactly 1, hiding the jitter.)
    r.add_light("sun", DirLight.create([0.0, 1.0, 0.0], 1.0))
    a = np.asarray(r.render(cam, 8, 8))
    b = np.asarray(r.render(cam, 8, 8))
    assert r._frame_index == 2
    # Temporal jitter: consecutive frames differ slightly.
    assert not np.array_equal(a, b)


def test_shearwarp_mode_close_to_blocked_march():
    cam = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0], fov_degrees=30.0)
    r = make_renderer(march_impl="shearwarp", empty_space_skipping=False)
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    img = np.asarray(r.render(cam, 48, 48))
    assert img.shape == (48, 48, 4) and np.isfinite(img).all()
    r2 = make_renderer(march_impl="blocked", empty_space_skipping=False)
    r2.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    ref = np.asarray(r2.render(cam, 48, 48))
    # different sample parameterization -> image-level tolerance
    assert np.abs(img - ref).mean() < 0.03
    # plan is cached across frames with the same camera
    plan1 = r._sw_plan
    r.render(cam, 48, 48)
    assert r._sw_plan is plan1


def test_shearwarp_fallback_mid_orbit():
    """march_impl='shearwarp' no longer raises when the camera enters the
    dominant slab — it degrades to the march for that frame and recovers
    the fast path when the camera leaves (VERDICT r3 weak #4)."""
    r = make_renderer(march_impl="shearwarp", empty_space_skipping=False)
    r.add_light("sun", DirLight.create([0.0, 0.0, -1.0], 1.0))
    outside = Camera.look_at([0.0, -2.5, 0.0], [0.0, 0.0, 0.0],
                             fov_degrees=30.0)
    img = np.asarray(r.render(outside, 16, 16))
    assert np.isfinite(img).all()
    assert r._sw_plan is not None  # fast path taken

    # camera inside the dominant slab: plan unavailable -> march fallback
    inside = Camera.look_at([0.5, -0.35, 0.52], [0.5, 0.5, 0.5],
                            fov_degrees=60.0)
    # look_at target offset so the dominant axis coordinate sits in (0, 1)
    inside = Camera.look_at([0.3, 0.45, 0.35], [0.31, 0.5, 0.37],
                            fov_degrees=60.0)
    img2 = np.asarray(r.render(inside, 16, 16))
    assert np.isfinite(img2).all()
    assert r._sw_plan is None  # fell back, no raise

    img3 = np.asarray(r.render(outside, 16, 16))
    assert r._sw_plan is not None  # fast path recovered
    assert np.isfinite(img3).all()
