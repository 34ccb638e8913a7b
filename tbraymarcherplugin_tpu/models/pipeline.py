"""Fully-jittable end-to-end render pipeline: lighting + march in one function.

The interactive :class:`~tbraymarcherplugin_tpu.renderer.Renderer` keeps state
and updates lights incrementally. This module is the *functional* counterpart:
one pure function from parameters to pixels, with light-propagation geometry
(face choices and offsets, which depend on concrete light directions) planned
host-side and baked in as static data. This is what gets differentiated
(BASELINE config 4), sharded (config 5), and compile-checked by the driver.

Differentiable leaves: volume densities, TF table, window center/width, and
per-light intensities — exactly the gradient surface BASELINE names.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lighting as L
from ..ops import march as M
from ..ops.rays import RayBatch


@dataclasses.dataclass(frozen=True)
class LightPlan:
    """Static propagation geometry for one directional light.

    Built host-side from a concrete local-space light direction (the same
    split the reference makes: CPU axis math in `LightingShaderUtils.cpp`,
    GPU propagation in the shader). ``face_plans`` holds up to two
    :class:`~tbraymarcherplugin_tpu.ops.lighting.FacePropagationPlan`; their
    ``light_alpha`` fields here store the face *weight* only — the traced
    intensity multiplies in at run time, keeping d(image)/d(intensity) exact.
    """

    face_plans: tuple

    @staticmethod
    def create(local_dir, light_dims) -> "LightPlan":
        local_dir = np.asarray(local_dir, np.float64)
        local_dir = local_dir / np.linalg.norm(local_dir)
        axes = L.local_light_major_axes(local_dir)
        light_pos = -local_dir
        plans = tuple(
            L.plan_face_propagation(face, light_pos, tuple(light_dims), weight)
            for face, weight in zip(axes.faces, axes.weights)
            if weight > 0.0
        )
        return LightPlan(face_plans=plans)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderParams:
    """The differentiable parameter pytree."""

    volume: jax.Array  # (X, Y, Z)
    tf_table: jax.Array  # (R, 4)
    window_center: jax.Array  # scalar
    window_width: jax.Array  # scalar
    light_intensities: jax.Array  # (n_lights,)


def _windowing_vec4(params: RenderParams, low_cutoff, high_cutoff):
    return jnp.stack(
        [
            jnp.asarray(params.window_center, jnp.float32),
            jnp.asarray(params.window_width, jnp.float32),
            jnp.asarray(1.0 if low_cutoff else 0.0, jnp.float32),
            jnp.asarray(1.0 if high_cutoff else 0.0, jnp.float32),
        ]
    )


def compute_illumination(
    params: RenderParams,
    light_plans: Sequence[LightPlan],
    clip_center,
    clip_direction,
    light_dims,
    low_cutoff=True,
    high_cutoff=True,
    apply_write_threshold: bool = False,
    scan_impl: str = "xla",
    tf_impl: str | None = None,
    grad_allreduce_axis: str | None = None,
):
    """Build the illumination volume from all planned lights (traced).

    ``scan_impl="pallas"`` fuses each face's slice scan into one kernel
    launch with the carry in VMEM (TPU only; `ops/pallas_lighting.py`).
    ``grad_allreduce_axis`` marks the parameter leaves so their cotangents
    are psum'd here instead of by an outer bulk all-reduce
    (`..parallel.overlap`).
    """
    if grad_allreduce_axis is not None:
        from ..parallel.overlap import mark_tree

        params = mark_tree(params, grad_allreduce_axis)
    # This is the differentiable pipeline: when the fused Pallas scan is
    # selected, default the occluder TF unit to the custom-VJP kernel —
    # the forward-only `windowed_tf_alpha` has no VJP and would fail loudly
    # under jax.grad (ADVICE r3). Forward-only callers (the interactive
    # Renderer) go through `lighting.add_dir_light`, which keeps the cheaper
    # alpha-only kernel as its default.
    if tf_impl is None and scan_impl == "pallas":
        tf_impl = "pallas_vjp"
    win = _windowing_vec4(params, low_cutoff, high_cutoff)
    lv = jnp.zeros(tuple(light_dims), jnp.float32)
    for li, plan in enumerate(light_plans):
        intensity = params.light_intensities[li]
        for fp in plan.face_plans:
            contrib = L._propagate_one_face(
                params.volume,
                params.tf_table,
                win,
                clip_center,
                clip_direction,
                jnp.asarray(fp.uv_offset, jnp.float32),
                jnp.asarray(fp.uvw_offset, jnp.float32),
                jnp.asarray(fp.step_size, jnp.float32),
                intensity * fp.light_alpha,  # light_alpha holds the face weight
                fp.face,
                tuple(light_dims),
                apply_write_threshold,
                scan_impl=scan_impl,
                tf_impl=tf_impl,
            )
            lv = lv + contrib
    return lv


@partial(
    jax.jit,
    static_argnames=(
        "light_plans",
        "light_dims",
        "step_count",
        "low_cutoff",
        "high_cutoff",
        "checkpoint_every",
        "early_termination",
        "march_impl",
        "pallas_window",
        "shearwarp_dtype",
        "shearwarp_stop_early",
        "shearwarp_tf_unit",
        "illumination_scan_impl",
        "illumination_tf_impl",
        "grad_allreduce_axis",
    ),
)
def render_lit_scene(
    params: RenderParams,
    rays: RayBatch,
    clip_center,
    clip_direction,
    light_plans: tuple,
    light_dims: tuple,
    step_count: int = 150,
    low_cutoff: bool = True,
    high_cutoff: bool = True,
    checkpoint_every: int = 32,
    early_termination: float = 0.95,
    march_impl: str = "blocked",
    pallas_window: tuple | None = None,
    shearwarp_plan=None,
    shearwarp_dtype=jnp.float32,
    shearwarp_stop_early: bool = False,
    shearwarp_tf_unit: str = "xla",
    illumination_scan_impl: str = "xla",
    illumination_tf_impl: str | None = None,
    grad_allreduce_axis: str | None = None,
) -> jnp.ndarray:
    """Differentiable lit render: illumination + march, one XLA computation.

    This is the "train step" analogue of the whole reference pipeline
    (SURVEY §3.2 + §3.3 fused). ``march_impl`` selects the step-sequential
    scan march ("scan"), the TPU-throughput block-parallel march ("blocked",
    default), or the fused Pallas kernel ("pallas") — all with identical
    reference semantics. The pallas path is forward-only (no VJP yet),
    needs 2D (H, W) ray batches, and callers must hold the
    `pallas_march.fits_pallas_window` coverage precondition.
    """
    if grad_allreduce_axis is not None and march_impl not in (
        "blocked", "tiled2d", "shearwarp"
    ):
        raise ValueError(
            f"grad_allreduce_axis unsupported for march_impl={march_impl!r}"
        )
    win = _windowing_vec4(params, low_cutoff, high_cutoff)
    lv = compute_illumination(
        params, light_plans, clip_center, clip_direction, light_dims,
        low_cutoff, high_cutoff, scan_impl=illumination_scan_impl,
        tf_impl=illumination_tf_impl,
        grad_allreduce_axis=grad_allreduce_axis,
    )
    march_volume = params.volume
    march_tf = params.tf_table
    march_win = win
    if grad_allreduce_axis is not None and march_impl == "shearwarp":
        from ..parallel.overlap import psum_cotangent

        march_volume = psum_cotangent(march_volume, grad_allreduce_axis)
        march_tf = psum_cotangent(march_tf, grad_allreduce_axis)
        march_win = psum_cotangent(march_win, grad_allreduce_axis)
    if march_impl == "shearwarp":
        # Shear-warp factorized fast path (`ops/shearwarp.py`): slice-plane
        # sample parameterization instead of 1/step_count ray steps —
        # differentiable end-to-end; rays are only used for the static
        # screen size (the plan encodes the camera).
        from ..ops import shearwarp as SWM

        assert shearwarp_plan is not None, (
            "march_impl='shearwarp' needs shearwarp_plan "
            "(ops.shearwarp.plan_shearwarp)"
        )
        h, w = rays.thickness.shape
        if shearwarp_stop_early and jax.default_backend() != "cpu":
            # Forward-only fast path: fused Pallas composite (TF via lane
            # shuffles, per-tile early exit + chunk ESS) + banded-gather
            # warp — XLA lowers both ops' gathers to ~90M elem/s otherwise.
            from ..ops.pallas_warp import warp_to_screen_fused
            from ..ops.shearwarp_pallas import shearwarp_intermediate_fused

            inter = shearwarp_intermediate_fused(
                march_volume,
                march_tf,
                lv,
                shearwarp_plan,
                march_win,
                clip_center,
                clip_direction,
                early_termination=early_termination,
                compute_dtype=shearwarp_dtype,
                out_layout="chw",
            )
            return warp_to_screen_fused(inter, shearwarp_plan, w, h,
                                        channel_major=True)
        if shearwarp_tf_unit == "fused":
            # North-star differentiable path: fused Pallas composite with
            # the hand-derived reverse-sweep backward (`ops/shearwarp_grad`)
            # — no checkpointed recompute, cotangents for volume/light flow
            # through the transposed resample matmuls.
            from ..ops.shearwarp_grad import shearwarp_intermediate_fused_diff

            from ..ops.pallas_warp import warp_to_screen_fused

            inter = shearwarp_intermediate_fused_diff(
                march_volume,
                march_tf,
                lv,
                shearwarp_plan,
                march_win,
                clip_center,
                clip_direction,
                early_termination=early_termination,
                compute_dtype=shearwarp_dtype,
                out_layout="chw",
            )
            # banded warp with its custom scatter adjoint — the XLA warp's
            # take_along_axis backward (sort-based scatter) measured ~870 ms
            # of the 1.4 s fwd+bwd frame at 256^3/1080p
            return warp_to_screen_fused(inter, shearwarp_plan, w, h,
                                        channel_major=True)
        else:
            inter = SWM.shearwarp_intermediate(
                march_volume,
                march_tf,
                lv,
                shearwarp_plan,
                march_win,
                clip_center,
                clip_direction,
                early_termination=early_termination,
                stop_early=shearwarp_stop_early,
                compute_dtype=shearwarp_dtype,
                tf_unit=shearwarp_tf_unit,
            )
        return SWM.warp_to_screen(inter, shearwarp_plan, w, h)
    if march_impl == "pallas":
        from ..ops import pallas_march as PM

        window = pallas_window or PM.DEFAULT_WINDOW
        lwindow = PM.scale_light_window(
            window, tuple(params.volume.shape), light_dims
        )
        return PM.march_lit_pallas(
            PM.swizzle_volume(params.volume, min_window=window),
            params.tf_table,
            PM.swizzle_volume(lv, min_window=lwindow),
            rays,
            win,
            clip_center,
            clip_direction,
            step_count=step_count,
            early_termination=early_termination,
            window=window,
            light_window=lwindow,
        )
    if march_impl == "tiled2d":
        # Spatially-coherent 32x32 image tiles via lax.map: many small
        # programs instead of one giant flat-tile gather — the shape the
        # axon TPU runtime handles where the 128k flat tiles fault.
        return M.march_lit_tiled(
            params.volume,
            params.tf_table,
            lv,
            rays,
            win,
            clip_center,
            clip_direction,
            step_count=step_count,
            block_size=checkpoint_every,
            early_termination=early_termination,
            tile2d=(32, 32) if rays.thickness.ndim == 2 else None,
            grad_allreduce_axis=grad_allreduce_axis,
        )
    if march_impl == "blocked":
        n_rays = int(np.prod(rays.thickness.shape))
        if n_rays > M.DEFAULT_TILE_SIZE:
            return M.march_lit_tiled(
                params.volume,
                params.tf_table,
                lv,
                rays,
                win,
                clip_center,
                clip_direction,
                step_count=step_count,
                block_size=checkpoint_every,
                early_termination=early_termination,
                grad_allreduce_axis=grad_allreduce_axis,
            )
        return M.march_lit_blocked(
            params.volume,
            params.tf_table,
            lv,
            rays,
            win,
            clip_center,
            clip_direction,
            step_count=step_count,
            block_size=checkpoint_every,
            early_termination=early_termination,
            grad_allreduce_axis=grad_allreduce_axis,
        )
    return M.march_lit(
        params.volume,
        params.tf_table,
        lv,
        rays,
        win,
        clip_center,
        clip_direction,
        step_count=step_count,
        checkpoint_every=checkpoint_every,
        early_termination=early_termination,
    )
