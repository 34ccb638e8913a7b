"""Gradient correctness: autodiff vs finite differences (BASELINE config 4).

The windowing center/width and TF texels are the primary gradient surface
(SURVEY §2.1); the march's masked early termination and the light propagation
scan must both be exactly differentiable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tbraymarcherplugin_tpu.models import LightPlan, RenderParams, render_lit_scene
from tbraymarcherplugin_tpu.models.fitting import FitConfig, fit
from tbraymarcherplugin_tpu.ops import synthetic
from tbraymarcherplugin_tpu.ops import transfer as T
from tbraymarcherplugin_tpu.ops.rays import setup_rays
from tbraymarcherplugin_tpu.scene import Camera, ClipPlane, VolumeTransform

NO_CLIP = ClipPlane.disabled()

# FD checks recompile the full fwd+bwd per test (~15 min total): slow tier.
pytestmark = pytest.mark.slow


def _setup(img=8, dims=(12, 12, 12), step_count=24):
    """Scene for FD checks.

    The true rendering function is only piecewise differentiable: windowing
    cutoffs are step discontinuities and the early-termination alpha snap is
    a jump. FD checks therefore run with both disabled (standard practice for
    differentiable renderers); the discontinuous variants get separate
    finiteness tests.
    """
    volume = synthetic.sphere_volume(dims, radius=0.35)
    tf = T.tf_from_keypoints(
        [0, 0.5, 1.0],
        [[0.1, 0.2, 0.8, 0.0], [0.9, 0.4, 0.2, 0.5], [1.0, 1.0, 0.9, 1.0]],
    )
    cam = Camera.look_at([0.2, -2.4, 0.4], [0.0, 0.0, 0.0], fov_degrees=32.0)
    rays = setup_rays(cam, VolumeTransform.create(), img, img)
    params = RenderParams(
        volume=volume,
        tf_table=tf,
        window_center=jnp.asarray(0.45),
        window_width=jnp.asarray(0.9),
        light_intensities=jnp.asarray([1.0]),
    )
    plans = (LightPlan.create([0.3, 0.1, -0.95], dims),)
    kwargs = dict(
        clip_center=NO_CLIP.center,
        clip_direction=NO_CLIP.direction,
        light_plans=plans,
        light_dims=dims,
        step_count=step_count,
        low_cutoff=False,
        high_cutoff=False,
        early_termination=2.0,  # disabled: the snap is non-differentiable
    )
    return params, rays, kwargs


def _loss(params, rays, kwargs):
    img = render_lit_scene(params, rays, **kwargs)
    # Weighted pixel sum: a generic scalarization touching all channels.
    w = jnp.sin(jnp.arange(img.size, dtype=jnp.float32)).reshape(img.shape)
    return jnp.sum(img * w)


def _fd(f, x, eps):
    return (f(x + eps) - f(x - eps)) / (2 * eps)


@pytest.mark.parametrize("leaf", ["window_center", "window_width"])
def test_window_grads_match_finite_differences(leaf):
    params, rays, kwargs = _setup()

    def f(v):
        import dataclasses

        p = dataclasses.replace(params, **{leaf: jnp.asarray(v)})
        return _loss(p, rays, kwargs)

    x0 = float(getattr(params, leaf))
    auto = float(jax.grad(f)(jnp.asarray(x0)))
    # eps must sit below the TF texel width (1/256): the table is
    # piecewise-linear, so coarser eps averages across kinks.
    fd = float(_fd(f, jnp.asarray(x0), 1e-3))
    assert np.isfinite(auto)
    np.testing.assert_allclose(auto, fd, rtol=3e-2, atol=3e-3)


def test_tf_texel_grads_match_finite_differences():
    params, rays, kwargs = _setup()

    def f_at(idx, ch, v):
        import dataclasses

        tf = params.tf_table.at[idx, ch].set(v)
        return _loss(dataclasses.replace(params, tf_table=tf), rays, kwargs)

    grad_tf = jax.grad(
        lambda tf: _loss(
            RenderParams(
                volume=params.volume,
                tf_table=tf,
                window_center=params.window_center,
                window_width=params.window_width,
                light_intensities=params.light_intensities,
            ),
            rays,
            kwargs,
        )
    )(params.tf_table)
    # Probe a few texels (color and alpha channels) in the active range.
    probes = [(100, 3), (128, 0), (160, 3), (80, 1)]
    for idx, ch in probes:
        v0 = float(params.tf_table[idx, ch])
        fd = float(
            (f_at(idx, ch, v0 + 5e-3) - f_at(idx, ch, v0 - 5e-3)) / 1e-2
        )
        auto = float(grad_tf[idx, ch])
        np.testing.assert_allclose(auto, fd, rtol=5e-2, atol=5e-3)


def test_light_intensity_grad_matches_finite_differences():
    params, rays, kwargs = _setup()

    def f(v):
        import dataclasses

        p = dataclasses.replace(params, light_intensities=jnp.asarray([v]))
        return _loss(p, rays, kwargs)

    auto = float(jax.grad(f)(jnp.asarray(1.0)))
    fd = float(_fd(f, jnp.asarray(1.0), 1e-3))
    np.testing.assert_allclose(auto, fd, rtol=2e-2, atol=2e-3)


def test_volume_grads_nonzero_and_finite():
    params, rays, kwargs = _setup()
    g = jax.grad(
        lambda vol: _loss(
            RenderParams(
                volume=vol,
                tf_table=params.tf_table,
                window_center=params.window_center,
                window_width=params.window_width,
                light_intensities=params.light_intensities,
            ),
            rays,
            kwargs,
        )
    )(params.volume)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert (np.abs(g) > 0).sum() > 50  # march + lighting both feed back


def test_fit_recovers_window_center():
    # Render a target with one window center, start from another, fit it back.
    params, rays, kwargs = _setup(img=10, step_count=20)
    target = render_lit_scene(params, rays, **kwargs)

    import dataclasses

    start = dataclasses.replace(params, window_center=jnp.asarray(0.6))
    cfg = FitConfig(
        learning_rate=2e-2, steps=100, optimize_tf=False, optimize_window=True,
        step_count=20, tf_smoothness_weight=0.0,
    )
    fitted, losses = fit(
        start, rays, target,
        kwargs["clip_center"], kwargs["clip_direction"],
        kwargs["light_plans"], kwargs["light_dims"], cfg,
    )
    assert losses[-1] < losses[0] * 0.5
    assert abs(float(fitted.window_center) - 0.45) < abs(0.6 - 0.45)


def test_gradients_flow_through_early_termination():
    # An opaque volume triggers early termination; grads must stay finite.
    params, rays, kwargs = _setup(dims=(8, 8, 8), step_count=40)
    import dataclasses

    params = dataclasses.replace(params, volume=jnp.ones((8, 8, 8)) * 0.9)
    kwargs = dict(kwargs, light_dims=(8, 8, 8),
                  light_plans=(LightPlan.create([0.0, 0.0, -1.0], (8, 8, 8)),),
                  early_termination=0.95, low_cutoff=True, high_cutoff=True)
    g = jax.grad(lambda c: _loss(
        dataclasses.replace(params, window_center=c), rays, kwargs
    ))(jnp.asarray(0.45))
    assert np.isfinite(float(g))


@pytest.mark.slow
def test_fit_through_shearwarp_with_metrics():
    """Inverse rendering through the shear-warp fast path: recovers the
    window center and emits the per-step metrics dict (SURVEY §5)."""
    import dataclasses as _dc

    from tbraymarcherplugin_tpu.ops import shearwarp as SW
    from tbraymarcherplugin_tpu.scene import Camera, VolumeTransform

    params, rays, kwargs = _setup(img=32, dims=(16, 16, 16), step_count=16)
    cam = Camera.look_at([0.2, -2.4, 0.4], [0.0, 0.0, 0.0], fov_degrees=32.0)
    tr = VolumeTransform.create()
    plan = SW.plan_shearwarp(cam, tr, (16, 16, 16), (16, 16, 16), 32, 32,
                             max_n=64)
    assert plan is not None
    from tbraymarcherplugin_tpu.models import render_lit_scene

    true_params = params
    # Same forward configuration the fit's loss uses (pipeline defaults),
    # so the optimum is exactly the true parameters.
    target = render_lit_scene(
        true_params, rays, kwargs["clip_center"], kwargs["clip_direction"],
        kwargs["light_plans"], kwargs["light_dims"],
        step_count=16, march_impl="shearwarp", shearwarp_plan=plan,
    )
    init = _dc.replace(params, window_center=jnp.asarray(0.6))
    cfg = FitConfig(
        steps=120, learning_rate=2e-2, optimize_tf=False,
        optimize_window=True, step_count=16, tf_smoothness_weight=0.0,
        march_impl="shearwarp", shearwarp_plan=plan,
    )
    fitted, losses, metrics = fit(
        init, rays, target, kwargs["clip_center"], kwargs["clip_direction"],
        kwargs["light_plans"], kwargs["light_dims"], cfg,
        return_metrics=True,
    )
    assert losses[-1] < losses[0] * 0.35, (losses[0], losses[-1])
    assert abs(float(fitted.window_center) - 0.45) < abs(0.6 - 0.45)
    assert metrics and "grad_norm/window_center" in metrics[0]
    assert metrics[0]["rays_per_s"] > 0
