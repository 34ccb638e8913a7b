"""P1: ray-tile data parallelism — shard rays across the mesh, replicate the
volume, all-reduce parameter gradients over ICI.

The reference's analogue is implicit per-pixel GPU threading inside the
material shader (SURVEY §2.9 P1). Here the image flattens into a ray batch
whose leading dim is sharded over the ``"rays"`` mesh axis with `shard_map`;
each device marches its tile against a replicated volume. For training,
parameter gradients are `psum`-reduced inside the mapped function, so XLA's
latency-hiding scheduler overlaps the all-reduce with the backward sweep
(BASELINE north star).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.pipeline import RenderParams, render_lit_scene
from ..ops.rays import RayBatch


def pad_rays_for_mesh(rays: RayBatch, n_shards: int) -> tuple[RayBatch, int]:
    """Flatten rays to (N, ...) and zero-pad N to a multiple of ``n_shards``.

    Padded rays have thickness 0 -> they march zero steps and render
    transparent black, so padding never changes pixel values.
    """
    entry = rays.entry.reshape(-1, 3)
    direction = rays.direction.reshape(-1, 3)
    thickness = rays.thickness.reshape(-1)
    n = thickness.shape[0]
    rem = (-n) % n_shards
    if rem:
        entry = jnp.pad(entry, ((0, rem), (0, 0)))
        direction = jnp.pad(
            direction, ((0, rem), (0, 0)), constant_values=1.0
        )  # nonzero dir avoids 0/0 in AABB math
        thickness = jnp.pad(thickness, (0, rem))
    return RayBatch(entry, direction, thickness), n


def unpad_image(flat: jnp.ndarray, n: int, shape) -> jnp.ndarray:
    return flat[:n].reshape(*shape, 4)


def render_lit_sharded(
    mesh: Mesh,
    params: RenderParams,
    rays: RayBatch,
    clip_center,
    clip_direction,
    light_plans,
    light_dims,
    step_count: int = 150,
    axis: str = "rays",
) -> jnp.ndarray:
    """Sharded forward render. ``rays`` may be (H, W)-shaped; returns (H, W, 4).

    The illumination volume is computed once per device (replicated — it is
    identical across ray tiles, and recomputing beats communicating it).
    """
    img_shape = rays.thickness.shape
    n_shards = mesh.shape[axis]
    flat, n = pad_rays_for_mesh(rays, n_shards)

    ray_spec = RayBatch(P(axis), P(axis), P(axis))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), ray_spec),
        out_specs=P(axis),
        check_vma=False,
    )
    def tile_render(p, tile_rays):
        return render_lit_scene(
            p, tile_rays, clip_center, clip_direction,
            tuple(light_plans), tuple(light_dims), step_count=step_count,
        )

    out = tile_render(params, flat)
    return unpad_image(out, n, img_shape)


def make_sharded_train_step(
    mesh: Mesh,
    loss_from_image: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    clip_center,
    clip_direction,
    light_plans,
    light_dims,
    step_count: int = 64,
    axis: str = "rays",
    optimizer=None,
    overlap_allreduce: bool = False,
):
    """Build a jitted DP train step: sharded fwd+bwd with psum'd param grads.

    Returns ``step(params, opt_state, rays_flat, target_flat) ->
    (params, opt_state, loss)`` where ``rays_flat``/``target_flat`` lead with
    a dim divisible by the mesh's ray axis.

    ``overlap_allreduce=True`` replaces the single end-of-backward bulk psum
    with per-stage psums at the parameter use sites (`.overlap`): the march's
    volume/TF/window cotangents all-reduce while the illumination backward is
    still computing. Gradients are identical
    (`tests/test_sharding.py::test_overlapped_allreduce_grads_match`);
    `benchmarks/OVERLAP.md` documents the HLO evidence.
    """
    import optax

    optimizer = optimizer or optax.adam(1e-2)
    ray_spec = RayBatch(P(axis), P(axis), P(axis))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), ray_spec, P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def grad_shard(p, tile_rays, tile_target):
        def local_loss(p_):
            img = render_lit_scene(
                p_, tile_rays, clip_center, clip_direction,
                tuple(light_plans), tuple(light_dims), step_count=step_count,
                grad_allreduce_axis=axis if overlap_allreduce else None,
            )
            # Sum (not mean) so psum over tiles equals the global sum.
            return loss_from_image(img, tile_target)

        loss, grads = jax.value_and_grad(local_loss)(p)
        if not overlap_allreduce:
            # Bulk all-reduce at the end of the backward.
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, axis), grads
            )
        loss = jax.lax.psum(loss, axis)
        return loss, grads

    @jax.jit
    def step(params, opt_state, rays_flat, target_flat):
        loss, grads = grad_shard(params, rays_flat, target_flat)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, optimizer
