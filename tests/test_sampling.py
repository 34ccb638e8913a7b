"""Tests for sampling/windowing/TF lookup vs the numpy oracle."""

import numpy as np
import jax.numpy as jnp

from tbraymarcherplugin_tpu.ops import cpu_reference as ref
from tbraymarcherplugin_tpu.ops import sampling as S
from tbraymarcherplugin_tpu.ops import transfer as T


def test_trilinear_matches_oracle(rng):
    vol = rng.random((7, 5, 9), dtype=np.float32)
    uvw = rng.random((50, 3)).astype(np.float32)
    got = np.asarray(S.trilinear_sample(jnp.asarray(vol), jnp.asarray(uvw)))
    want = ref.trilinear(vol, uvw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_trilinear_exact_at_texel_centers(rng):
    vol = rng.random((4, 4, 4), dtype=np.float32)
    idx = np.array([[1, 2, 3], [0, 0, 0], [3, 3, 3]], np.float32)
    uvw = (idx + 0.5) / 4.0
    got = np.asarray(S.trilinear_sample(jnp.asarray(vol), jnp.asarray(uvw)))
    want = vol[1, 2, 3], vol[0, 0, 0], vol[3, 3, 3]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_trilinear_clamp_outside(rng):
    vol = rng.random((4, 4, 4), dtype=np.float32)
    got = np.asarray(
        S.trilinear_sample(jnp.asarray(vol), jnp.array([[-0.5, 0.5, 0.5]]))
    )
    # Clamp-to-edge: fully outside equals the edge texel row interpolation.
    want = ref.trilinear(vol, np.array([[-0.5, 0.5, 0.5]], np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_tf_sample_matches_oracle(rng):
    tf = rng.random((256, 4), dtype=np.float32)
    pos = (rng.random(100).astype(np.float32) * 1.4) - 0.2  # includes out-of-range
    got = np.asarray(T.sample_tf(jnp.asarray(tf), jnp.asarray(pos)))
    want = ref.sample_tf_1d(tf, pos)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_windowing_position():
    # Window center 0.5 width 1 maps [0,1] -> [0,1] identically.
    assert np.isclose(float(S.transfer_func_position(0.25, 0.5, 1.0)), 0.25)
    # Narrow window: center 0.3 width 0.2 -> 0.2..0.4 maps to 0..1.
    assert np.isclose(float(S.transfer_func_position(0.2, 0.3, 0.2)), 0.0)
    assert np.isclose(float(S.transfer_func_position(0.4, 0.3, 0.2)), 1.0)


def test_step_size_opacity_correction():
    # 1 - (1-a)^s; s=1 identity.
    assert np.isclose(float(S.correct_for_step_size(0.3, 1.0)), 0.3)
    a2 = float(S.correct_for_step_size(0.3, 2.0))
    assert np.isclose(a2, 1 - 0.7**2)


def test_windowed_tf_cutoffs(rng):
    tf = np.ones((256, 4), np.float32) * 0.5
    win_both = jnp.array([0.5, 0.5, 1.0, 1.0])  # cut both sides
    win_none = jnp.array([0.5, 0.5, 0.0, 0.0])
    below = S.sample_windowed_transfer_function(
        jnp.asarray(0.1), 1.0, jnp.asarray(tf), win_both
    )
    above = S.sample_windowed_transfer_function(
        jnp.asarray(0.9), 1.0, jnp.asarray(tf), win_both
    )
    inside = S.sample_windowed_transfer_function(
        jnp.asarray(0.5), 1.0, jnp.asarray(tf), win_both
    )
    np.testing.assert_allclose(np.asarray(below), 0.0)
    np.testing.assert_allclose(np.asarray(above), 0.0)
    assert float(inside[3]) > 0.0
    # Cutoffs disabled: out-of-window values clamp into the TF instead.
    below_nc = S.sample_windowed_transfer_function(
        jnp.asarray(0.1), 1.0, jnp.asarray(tf), win_none
    )
    assert float(below_nc[3]) > 0.0


def test_windowed_tf_matches_oracle(rng):
    tf = rng.random((256, 4), dtype=np.float32)
    vals = rng.random(64).astype(np.float32)
    win = (0.4, 0.3, 1.0, 0.0)
    got = np.asarray(
        S.sample_windowed_transfer_function(
            jnp.asarray(vals), 0.66, jnp.asarray(tf), jnp.asarray(win)
        )
    )
    want = ref.windowed_tf_sample(vals, np.float32(0.66), tf, win)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_clip_test():
    center = jnp.array([0.5, 0.5, 0.5])
    direction = jnp.array([1.0, 0.0, 0.0])  # clips x <= 0.5
    assert bool(S.is_clipped(jnp.array([0.4, 0.5, 0.5]), center, direction))
    assert not bool(S.is_clipped(jnp.array([0.6, 0.5, 0.5]), center, direction))


def test_clip_soft_alpha_weight_halfway():
    # Voxel centered exactly on the plane: weight 0.5 (usf:104).
    w = S.clip_soft_alpha_weight(
        jnp.array([0.5, 0.5, 0.5]),
        jnp.array([0.5, 0.5, 0.5]),
        jnp.array([1.0, 0.0, 0.0]),
        (8, 8, 8),
    )
    assert np.isclose(float(w), 0.5)
    # Far on the kept side -> 1; far on the clipped side -> 0.
    w_keep = S.clip_soft_alpha_weight(
        jnp.array([0.9, 0.5, 0.5]),
        jnp.array([0.5, 0.5, 0.5]),
        jnp.array([1.0, 0.0, 0.0]),
        (8, 8, 8),
    )
    w_cut = S.clip_soft_alpha_weight(
        jnp.array([0.1, 0.5, 0.5]),
        jnp.array([0.5, 0.5, 0.5]),
        jnp.array([1.0, 0.0, 0.0]),
        (8, 8, 8),
    )
    assert float(w_keep) == 1.0 and float(w_cut) == 0.0


def test_default_tf_table():
    tf = np.asarray(T.default_grayscale_tf())
    assert tf.shape == (256, 4)
    np.testing.assert_allclose(tf[0], [0, 0, 0, 1])
    np.testing.assert_allclose(tf[-1], [1, 1, 1, 1])


def test_tf_from_keypoints():
    tf = np.asarray(
        T.tf_from_keypoints([0.0, 1.0], [[0, 0, 0, 0], [1, 1, 1, 1]], 256)
    )
    ramp = np.linspace(0, 1, 256)
    np.testing.assert_allclose(tf[:, 0], ramp, atol=1e-6)


def test_tf_preset_library_covers_reference_curves():
    """All 22 reference curve assets (Content/Curves/TF_CT-*) exist as
    stock presets with valid (256, 4) tables in [0, 1]."""
    import numpy as np

    from tbraymarcherplugin_tpu.ops.transfer import (
        STOCK_TRANSFER_FUNCTIONS, tf_preset,
    )
    from tbraymarcherplugin_tpu.ops.tf_presets_data import PRESET_NAMES

    assert len(PRESET_NAMES) == 22
    for n in PRESET_NAMES:
        t = np.asarray(tf_preset(n))
        assert t.shape == (256, 4)
        assert t.min() >= 0.0 and t.max() <= 1.0
        assert t[:, 3].max() > 0.0, n  # every preset has visible opacity
    # friendly keys resolve through the stock dict
    for key in ("ct_lung", "ct_mip", "ct_x_ray", "ct_cardiac"):
        t = np.asarray(STOCK_TRANSFER_FUNCTIONS[key]())
        assert t.shape == (256, 4)
    # the bone preset's alpha climbs with density (sanity of content)
    bone = np.asarray(tf_preset("TF_CT-Bone"))
    assert bone[200, 3] > bone[100, 3]
