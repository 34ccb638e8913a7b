"""Golden-image + determinism tests (SURVEY §5: the TPU-side replacement for
the reference's manual race discipline / visual verification).

Goldens are committed oracle outputs (tests/golden/, regenerate with
`python tests/gen_golden.py` after intentional semantics changes).
"""

import os

import numpy as np
import jax.numpy as jnp

from tbraymarcherplugin_tpu.models import LightPlan, RenderParams
from tbraymarcherplugin_tpu.models.pipeline import compute_illumination
from tbraymarcherplugin_tpu.ops import march as M
from tbraymarcherplugin_tpu.ops.rays import jitter_values
from tbraymarcherplugin_tpu.scene import ClipPlane

from gen_golden import golden_scene

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "lit_16.npz")


def _load():
    dims, volume, tf, rays, windowing, clip_center, clip_dir = golden_scene()
    data = np.load(GOLDEN)
    return dims, volume, tf, rays, windowing, clip_center, clip_dir, data


def test_golden_illumination():
    dims, volume, tf, rays, windowing, cc, cd, data = _load()
    params = RenderParams(
        volume=jnp.asarray(volume), tf_table=jnp.asarray(tf),
        window_center=jnp.asarray(windowing[0]),
        window_width=jnp.asarray(windowing[1]),
        light_intensities=jnp.asarray([1.0]),
    )
    plans = (LightPlan.create([0.3, 0.2, -0.93], dims),)
    lv = np.asarray(
        compute_illumination(
            params, plans, jnp.asarray(cc), jnp.asarray(cd), dims,
            low_cutoff=True, high_cutoff=False,
        )
    )
    np.testing.assert_allclose(lv, data["light_volume"], rtol=2e-4, atol=2e-5)


def test_golden_lit_render():
    dims, volume, tf, rays, windowing, cc, cd, data = _load()
    img = np.asarray(
        M.march_lit(
            jnp.asarray(volume), jnp.asarray(tf),
            jnp.asarray(data["light_volume"]), rays,
            jnp.asarray(windowing), jnp.asarray(cc), jnp.asarray(cd),
            step_count=24,
        )
    )
    np.testing.assert_allclose(img, data["image"], rtol=2e-4, atol=2e-5)


def test_determinism_same_seed_bit_identical():
    """Same inputs (incl. the temporal-jitter frame index) => bit-identical
    frames across independent dispatches."""
    dims, volume, tf, rays, windowing, cc, cd, data = _load()
    h, w = rays.thickness.shape
    jit = jitter_values(w, h, frame_index=7)
    args = (
        jnp.asarray(volume), jnp.asarray(tf),
        jnp.asarray(data["light_volume"]), rays,
        jnp.asarray(windowing), jnp.asarray(cc), jnp.asarray(cd),
    )
    a = np.asarray(M.march_lit(*args, jitter=jit, step_count=24))
    b = np.asarray(M.march_lit(*args, jitter=jit, step_count=24))
    assert np.array_equal(a, b), "same-seed frames differ bitwise"
    # And the jitter stream is a real function of the frame index.
    jit2 = jitter_values(w, h, frame_index=8)
    c = np.asarray(M.march_lit(*args, jitter=jit2, step_count=24))
    assert not np.array_equal(a, c), "frame index does not vary the jitter"
