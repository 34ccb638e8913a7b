"""Illumination-volume tests: jnp scan propagation vs the per-pixel oracle
(BASELINE config 3: Sundén–Ropinski propagation with selective updates)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tbraymarcherplugin_tpu.ops import cpu_reference as ref
from tbraymarcherplugin_tpu.ops import lighting as L
from tbraymarcherplugin_tpu.ops import synthetic
from tbraymarcherplugin_tpu.ops import transfer as T
from tbraymarcherplugin_tpu.scene import ClipPlane

NO_CLIP = ClipPlane.disabled()
WIN = (0.5, 1.0, 1.0, 1.0)


def test_major_axes_axis_aligned():
    axes = L.local_light_major_axes([0.0, 0.0, -1.0])  # light travels down -Z
    # Light position is +Z -> face 4 (+Z) dominates with weight 1.
    assert axes.faces[0] == 4
    assert axes.weights == (1.0, 0.0)


def test_major_axes_oblique():
    d = np.array([1.0, 0.4, 0.0])
    d = d / np.linalg.norm(d)
    axes = L.local_light_major_axes(d)  # light pos = -d -> faces -X, -Y
    assert axes.faces[0] == 1 and axes.faces[1] == 3
    cos2 = (d[0] ** 2) / 1.0
    assert np.isclose(axes.weights[0], cos2, atol=1e-6)
    assert np.isclose(sum(axes.weights), 1.0)


def test_major_axes_dominance_snap():
    # Nearly axis-aligned: dominant weight > 0.99 snaps to exactly 1
    # (`LightingShaderUtils.cpp:181-187`).
    d = np.array([0.01, 0.0, -1.0])
    axes = L.local_light_major_axes(d / np.linalg.norm(d))
    assert axes.weights == (1.0, 0.0)


def test_face_geometry_helpers():
    assert L.face_axis(0) == 0 and L.face_axis(5) == 2
    # Even faces (+X/+Y/+Z) walk downward (`LightingShaderUtils.cpp:66-70`).
    assert L.face_direction(0) == -1 and L.face_direction(1) == 1
    assert L.transposed_axes(0) == (1, 2, 0)
    assert L.transposed_axes(2) == (0, 2, 1)
    assert L.transposed_axes(4) == (0, 1, 2)


def test_shift_2d_bilinear_border_identity(rng):
    buf = jnp.asarray(rng.random((5, 7), dtype=np.float32))
    out = L.shift_2d_bilinear_border(buf, 0.0, 0.0, 9.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(buf), atol=1e-6)


def test_shift_2d_bilinear_border_matches_oracle(rng):
    buf = rng.random((6, 5), dtype=np.float32)
    for ox, oy in [(0.3, -0.7), (1.5, 0.0), (-2.2, 1.9), (4.0, -4.0)]:
        got = np.asarray(
            L.shift_2d_bilinear_border(jnp.asarray(buf), ox, oy, 0.25)
        )
        want = np.array(
            [
                [ref.bilinear_border(buf, x + ox, y + oy, 0.25)
                 for y in range(buf.shape[1])]
                for x in range(buf.shape[0])
            ]
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "light_dir",
    [
        [0.0, 0.0, -1.0],  # axis-aligned, downward
        [0.0, 1.0, 0.0],  # axis-aligned +Y
        [1.0, 0.0, 0.0],
        [0.6, 0.0, -0.8],  # oblique, two faces
        [0.45, -0.55, -0.66],  # fully oblique
    ],
)
def test_light_contribution_matches_oracle(light_dir):
    vol = np.asarray(synthetic.sphere_volume((8, 8, 8), radius=0.3))
    # Alpha-ramp TF so the sphere occludes but empty space does not (the
    # stock grayscale TF has alpha 1 everywhere, which extinguishes light in
    # one slice and makes propagation structure invisible).
    tf = np.asarray(T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]]))
    dims = (8, 8, 8)
    got = np.asarray(
        L.compute_light_contribution(
            jnp.asarray(vol), jnp.asarray(tf), jnp.asarray(WIN),
            NO_CLIP.center, NO_CLIP.direction,
            light_dir, 1.0, dims,
        )
    )
    want = ref.propagate_light(
        vol, tf, WIN, np.asarray(NO_CLIP.center), np.asarray(NO_CLIP.direction),
        light_dir, 1.0, dims,
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # The light must attenuate along its travel: entry side brighter.
    assert got.max() > 0.1


def test_light_contribution_with_clip_plane():
    vol = np.asarray(synthetic.sphere_volume((8, 8, 8), radius=0.35))
    tf = np.asarray(T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]]))
    clip = ClipPlane.create([0.5, 0.5, 0.5], [1.0, 0.0, 0.0])
    got = np.asarray(
        L.compute_light_contribution(
            jnp.asarray(vol), jnp.asarray(tf), jnp.asarray(WIN),
            clip.center, clip.direction,
            [0.0, 0.0, -1.0], 1.0, (8, 8, 8),
        )
    )
    want = ref.propagate_light(
        vol, tf, WIN, np.asarray(clip.center), np.asarray(clip.direction),
        [0.0, 0.0, -1.0], 1.0, (8, 8, 8),
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_half_resolution_light_volume():
    # Light volume at half the data resolution (`RaymarchTypes.h:111-113`).
    vol = np.asarray(synthetic.sphere_volume((16, 16, 16), radius=0.35))
    tf = np.asarray(T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]]))
    got = np.asarray(
        L.compute_light_contribution(
            jnp.asarray(vol), jnp.asarray(tf), jnp.asarray(WIN),
            NO_CLIP.center, NO_CLIP.direction,
            [0.0, 0.0, -1.0], 1.0, (8, 8, 8),
        )
    )
    want = ref.propagate_light(
        vol, tf, WIN, np.asarray(NO_CLIP.center), np.asarray(NO_CLIP.direction),
        [0.0, 0.0, -1.0], 1.0, (8, 8, 8),
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_attenuation_monotone_along_axis():
    vol = jnp.asarray(synthetic.sphere_volume((8, 8, 8), radius=0.45))
    tf = jnp.asarray(T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]]))
    lv = L.compute_light_contribution(
        vol, tf, jnp.asarray(WIN), NO_CLIP.center, NO_CLIP.direction,
        [0.0, 0.0, -1.0], 1.0, (8, 8, 8), apply_write_threshold=False,
    )
    col = np.asarray(lv)[4, 4, :]  # central column, light from +Z
    assert np.all(np.diff(col) >= -1e-6)  # brighter toward +Z (entry side)
    assert col[-1] > col[0]


def test_add_then_remove_cancels():
    vol = jnp.asarray(synthetic.sphere_volume((8, 8, 8)))
    tf = jnp.asarray(T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]]))
    lv0 = L.clear_light_volume((8, 8, 8))
    args = (vol, tf, jnp.asarray(WIN), NO_CLIP.center, NO_CLIP.direction)
    lv1 = L.add_dir_light(lv0, *args, [0.3, -0.2, -0.93], 1.0, added=True)
    lv2 = L.add_dir_light(lv1, *args, [0.3, -0.2, -0.93], 1.0, added=False)
    np.testing.assert_allclose(np.asarray(lv2), 0.0, atol=1e-6)


def test_change_light_equals_remove_plus_add():
    vol = jnp.asarray(synthetic.sphere_volume((8, 8, 8)))
    tf = jnp.asarray(T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]]))
    args = (vol, tf, jnp.asarray(WIN), NO_CLIP.center, NO_CLIP.direction)
    old = ([0.0, 0.0, -1.0], 1.0)
    new = ([0.5, 0.0, -0.866], 0.7)
    lv = L.add_dir_light(L.clear_light_volume((8, 8, 8)), *args, *old,
                         apply_write_threshold=False)
    changed = L.change_dir_light(lv, *args, *old, *new,
                                 apply_write_threshold=False)
    manual = L.add_dir_light(
        L.add_dir_light(lv, *args, *old, added=False, apply_write_threshold=False),
        *args, *new, apply_write_threshold=False,
    )
    np.testing.assert_allclose(np.asarray(changed), np.asarray(manual), atol=1e-5)


def test_reset_all_lights_sums_contributions():
    vol = jnp.asarray(synthetic.sphere_volume((8, 8, 8)))
    tf = jnp.asarray(T.tf_from_keypoints([0, 1], [[0, 0, 0, 0], [1, 1, 1, 1]]))
    args = (vol, tf, jnp.asarray(WIN), NO_CLIP.center, NO_CLIP.direction)
    lights = [([0.0, 0.0, -1.0], 0.8), ([1.0, 0.0, 0.0], 0.5)]
    lv = L.reset_all_lights(*args, lights, (8, 8, 8))
    manual = L.clear_light_volume((8, 8, 8))
    for d, i in lights:
        manual = L.add_dir_light(manual, *args, d, i)
    np.testing.assert_allclose(np.asarray(lv), np.asarray(manual), atol=1e-6)


def test_write_threshold():
    # With a fully opaque volume, deep voxels receive ~0 light; thresholding
    # forces them to exactly 0 (`AddDirLightShader.usf:123`).
    vol = jnp.ones((8, 8, 8), jnp.float32)
    tf = jnp.asarray(T.default_grayscale_tf())
    args = (vol, tf, jnp.asarray(WIN), NO_CLIP.center, NO_CLIP.direction)
    lv = L.add_dir_light(L.clear_light_volume((8, 8, 8)), *args,
                         [0.0, 0.0, -1.0], 1.0)
    arr = np.asarray(lv)
    deep = arr[:, :, 0]  # far side from the light
    assert np.all(deep == 0.0)
