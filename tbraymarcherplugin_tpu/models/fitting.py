"""Differentiable fitting: optimize TF / windowing / volume from target renders.

BASELINE config 4: "optimize TF table + window params from target renders
(fwd+bwd, grad-check vs finite differences)". The reference has no training
loop — differentiability is the point of the TPU re-design; this module turns
the renderer into an inverse-rendering model family.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import numpy as np
import jax.numpy as jnp
import optax

from ..ops.rays import RayBatch
from .pipeline import LightPlan, RenderParams, render_lit_scene


@dataclasses.dataclass
class FitConfig:
    learning_rate: float = 3e-2
    steps: int = 200
    optimize_tf: bool = True
    optimize_window: bool = True
    optimize_volume: bool = False
    optimize_lights: bool = False
    step_count: int = 64  # march steps during fitting
    tf_smoothness_weight: float = 1e-3
    # Renderer for the differentiable forward: "blocked" (exact reference
    # parameterization) or "shearwarp" (factorized fast path; needs
    # shearwarp_plan from ops.shearwarp.plan_shearwarp).
    march_impl: str = "blocked"
    shearwarp_plan: object = None
    illumination_scan: str = "xla"
    # Occluder-field TF unit; None lets the pipeline pick a differentiable
    # default ("pallas_vjp" when illumination_scan="pallas").
    illumination_tf_impl: str | None = None


def image_loss(rendered: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L2 on RGBA."""
    return jnp.mean((rendered - target) ** 2)


def tf_smoothness(tf_table: jnp.ndarray) -> jnp.ndarray:
    """Total-variation regularizer keeping fitted TF tables physical."""
    return jnp.mean(jnp.square(tf_table[1:] - tf_table[:-1]))


def make_loss_fn(
    rays: RayBatch,
    target: jnp.ndarray,
    clip_center,
    clip_direction,
    light_plans: tuple,
    light_dims: tuple,
    config: FitConfig,
) -> Callable[[RenderParams], jnp.ndarray]:
    def loss_fn(params: RenderParams):
        img = render_lit_scene(
            params, rays, clip_center, clip_direction,
            light_plans, light_dims, step_count=config.step_count,
            march_impl=config.march_impl,
            shearwarp_plan=config.shearwarp_plan,
            illumination_scan_impl=config.illumination_scan,
            illumination_tf_impl=config.illumination_tf_impl,
        )
        loss = image_loss(img, target)
        if config.tf_smoothness_weight:
            loss = loss + config.tf_smoothness_weight * tf_smoothness(
                params.tf_table
            )
        return loss

    return loss_fn


def _param_mask(config: FitConfig) -> RenderParams:
    """1/0 mask pytree selecting which leaves train."""
    return RenderParams(
        volume=jnp.asarray(1.0 if config.optimize_volume else 0.0),
        tf_table=jnp.asarray(1.0 if config.optimize_tf else 0.0),
        window_center=jnp.asarray(1.0 if config.optimize_window else 0.0),
        window_width=jnp.asarray(1.0 if config.optimize_window else 0.0),
        light_intensities=jnp.asarray(1.0 if config.optimize_lights else 0.0),
    )


def fit(
    init_params: RenderParams,
    rays: RayBatch,
    target: jnp.ndarray,
    clip_center,
    clip_direction,
    light_plans: tuple,
    light_dims: tuple,
    config: Optional[FitConfig] = None,
    callback=None,
    return_metrics: bool = False,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1,
    resume: bool = False,
):
    """Gradient-descend the render parameters toward a target image.

    Returns ``(params, losses)`` — or ``(params, losses, metrics)`` with
    ``return_metrics=True``: a list of per-step dicts (loss, per-leaf grad
    norms, rays/s, ms/step) for observability (SURVEY §5 metrics/logging).
    A jitted update step; masked leaves stay frozen.

    ``checkpoint_dir`` enables crash recovery (SURVEY §5 failure-detection
    row): (params, opt_state) are saved every ``checkpoint_every`` steps via
    `utils.checkpoint.CheckpointManager`; with ``resume=True`` a killed fit
    restarts from the newest checkpoint and continues with bit-identical
    optimizer state (exercised by tests/test_recovery.py, which kills the
    process mid-fit and asserts the resumed losses equal an uninterrupted
    run's).
    """
    config = config or FitConfig()
    loss_fn = make_loss_fn(
        rays, target, clip_center, clip_direction, light_plans, light_dims, config
    )
    opt = optax.adam(config.learning_rate)
    mask = _param_mask(config)
    opt_state = opt.init(init_params)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorms = {
            "grad_norm/" + name: jnp.linalg.norm(jnp.ravel(leaf))
            for name, leaf in (
                ("volume", grads.volume),
                ("tf_table", grads.tf_table),
                ("window_center", grads.window_center),
                ("window_width", grads.window_width),
                ("light_intensities", grads.light_intensities),
            )
        }
        grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # Keep the TF physical: colors/alpha in [0, 1].
        params = dataclasses.replace(
            params,
            tf_table=jnp.clip(params.tf_table, 0.0, 1.0),
            window_width=jnp.maximum(params.window_width, 1e-3),
        )
        return params, opt_state, loss, gnorms

    import time as _time

    n_rays = int(np.prod(rays.thickness.shape))
    params = init_params
    losses = []
    metrics = []
    start_step = 0
    mgr = None
    if checkpoint_dir is not None:
        from ..utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir)
        if resume and mgr.latest_step() is not None:
            (params, opt_state), meta = mgr.restore((params, opt_state))
            start_step = int(meta["step"]) + 1
    for step in range(start_step, config.steps):
        t0 = _time.perf_counter()
        params, opt_state, loss, gnorms = train_step(params, opt_state)
        loss = float(jax.block_until_ready(loss))
        dt = _time.perf_counter() - t0
        losses.append(loss)
        if return_metrics:
            m = {k: float(v) for k, v in gnorms.items()}
            m.update(loss=loss, ms_per_step=dt * 1e3,
                     rays_per_s=n_rays / dt)
            metrics.append(m)
        if mgr is not None and step % checkpoint_every == 0:
            mgr.save(step, (params, opt_state))
        if callback is not None:
            callback(step, params, loss)
    if return_metrics:
        return params, losses, metrics
    return params, losses
