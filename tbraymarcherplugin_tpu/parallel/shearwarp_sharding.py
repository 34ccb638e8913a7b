"""Multi-chip shear-warp: DP over the intermediate ray grid (P1 analogue).

The shear-warp composite (`..ops.shearwarp`) is independent per intermediate
ray, so the natural decomposition shards the intermediate grid's second axis
across the mesh: every device composites its own column slab against the
replicated volume (slab k: a per-device affine re-basing of the plan's
column coefficients — no communication during the march), one `all_gather`
(~n1*n2*16 bytes — tens of MB at 1080^2, trivial over ICI) assembles the
composited intermediate image, and each device warps + keeps its own screen
row block.

This gives the *fast* renderer the rays/s-scales-with-devices story the
BASELINE scaling target asks for; the blocked-march `render_lit_sharded`
remains the exact-parameterization DP path.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import shearwarp as SW
from ..ops.compositing import EARLY_TERMINATION_ALPHA


def _local_plan(plan: SW.ShearWarpPlan, dev: jnp.ndarray, n2_local: int):
    """Re-base the plan's column (j) coefficients to device ``dev``'s slab.

    Global column j = j_local + dev * n2_local, so the per-plane affine
    sample coordinates shift by ``b2 * dev * n2_local`` and the grid origin
    by ``dev * n2_local * d2`` — traced scalar arithmetic, no array slicing.
    """
    off = dev.astype(jnp.float32) * n2_local
    return dataclasses.replace(
        plan,
        n2=n2_local,
        a2=plan.a2 + plan.b2 * off,
        la2=plan.la2 + plan.lb2 * off,
        o2=plan.o2 + off * plan.d2,
    )


def shearwarp_lit_sharded(
    mesh: Mesh,
    volume,
    tf_table,
    light_volume,
    plan: SW.ShearWarpPlan,
    windowing_vec4,
    clip_center,
    clip_direction,
    width: int,
    height: int,
    axis: str = "rays",
    block_size: int = 16,
    early_termination: float = EARLY_TERMINATION_ALPHA,
    stop_early: bool = False,
    compute_dtype=jnp.float32,
):
    """Sharded shear-warp lit render -> (height, width, 4), rows sharded.

    Exactly equals the single-device :func:`..ops.shearwarp.shearwarp_lit`
    (each column slab's composite is independent; the warp runs on the
    gathered full intermediate image).
    """
    n_dev = mesh.shape[axis]
    if plan.n2 % n_dev:
        raise ValueError(
            f"intermediate width {plan.n2} not divisible by {n_dev} devices"
        )
    n2_local = plan.n2 // n_dev
    h_pad = -(-height // n_dev) * n_dev

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    def go(volume, tf_table, light_volume, win, cc, cd):
        dev = jax.lax.axis_index(axis)
        lp = _local_plan(plan, dev, n2_local)
        inter_local = SW.shearwarp_intermediate(
            volume, tf_table, light_volume, lp, win, cc, cd,
            block_size=block_size, early_termination=early_termination,
            stop_early=stop_early, compute_dtype=compute_dtype,
        )  # (n1, n2_local, 4)
        inter = jax.lax.all_gather(
            inter_local, axis, axis=1, tiled=True
        )  # (n1, n2, 4)
        img = SW.warp_to_screen(inter, plan, width, height)
        img = jnp.pad(img, ((0, h_pad - height), (0, 0), (0, 0)))
        rows = h_pad // n_dev
        return jax.lax.dynamic_slice_in_dim(img, dev * rows, rows, axis=0)

    out = go(
        volume, tf_table, light_volume,
        jnp.asarray(windowing_vec4, jnp.float32),
        jnp.asarray(clip_center, jnp.float32),
        jnp.asarray(clip_direction, jnp.float32),
    )
    return out[:height]


def shearwarp_lit_sharded_diff(
    mesh: Mesh,
    volume,
    tf_table,
    light_volume,
    plan: SW.ShearWarpPlan,
    windowing_vec4,
    clip_center,
    clip_direction,
    width: int,
    height: int,
    target=None,
    axis: str = "rays",
    early_termination: float = EARLY_TERMINATION_ALPHA,
    compute_dtype=jnp.float32,
):
    """DIFFERENTIABLE sharded shear-warp: the flagship training forward
    over a mesh, with its hand-derived backward.

    Each device runs the fused custom-VJP composite
    (`..ops.shearwarp_grad`) on its column slab, the intermediate image is
    `all_gather`ed, and the banded warp (scatter-adjoint custom VJP)
    produces the frame. Differentiation happens INSIDE the shard_map (the
    `make_sharded_train_step` pattern: custom-VJP residuals do not
    transpose through a shard_map boundary), with one explicit `psum` of
    the per-device cotangents over ICI.

    With ``target=None``: returns the (height, width, 4) frame (forward
    only). With a ``target`` image: returns ``(loss, (dvolume, dtf,
    dwin))`` for the summed L2 loss — equal to single-device gradients of
    the same loss (tests/test_sharding.py).
    """
    from ..ops.pallas_warp import warp_to_screen_fused
    from ..ops.shearwarp_grad import shearwarp_intermediate_fused_diff

    # The Pallas kernels' `interpret=None` default keys off
    # `jax.default_backend()`, which lies when the computation targets a
    # virtual CPU mesh while a TPU plugin holds the default platform (the
    # dryrun fallback in __graft_entry__). Resolve from the devices the
    # mesh actually runs on.
    interpret = all(d.platform == "cpu" for d in mesh.devices.flat)

    n_dev = mesh.shape[axis]
    if plan.n2 % n_dev:
        raise ValueError(
            f"intermediate width {plan.n2} not divisible by {n_dev} devices"
        )
    n2_local = plan.n2 // n_dev
    if n2_local % 128:
        raise ValueError(
            f"per-device slab width {n2_local} must be a multiple of 128"
        )
    h_pad = -(-height // n_dev) * n_dev
    rows = h_pad // n_dev

    def local_render(volume, tf_table, light_volume, win, cc, cd, dev):
        lp = _local_plan(plan, dev, n2_local)
        inter_local = shearwarp_intermediate_fused_diff(
            volume, tf_table, light_volume, lp, win, cc, cd,
            early_termination=early_termination,
            compute_dtype=compute_dtype, interpret=interpret,
        )  # (n1, n2_local, 4)
        inter = jax.lax.all_gather(
            inter_local, axis, axis=1, tiled=True
        )  # (n1, n2, 4)
        img = warp_to_screen_fused(inter, plan, width, height,
                                   interpret=interpret)
        return jnp.pad(img, ((0, h_pad - height), (0, 0), (0, 0)))

    if target is None:
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P()),
            out_specs=P(axis),
            check_vma=False,
        )
        def go_fwd(volume, tf_table, light_volume, win, cc, cd):
            dev = jax.lax.axis_index(axis)
            img = local_render(volume, tf_table, light_volume, win, cc, cd,
                               dev)
            return jax.lax.dynamic_slice_in_dim(
                img, dev * rows, rows, axis=0
            )

        out = go_fwd(
            volume, tf_table, light_volume,
            jnp.asarray(windowing_vec4, jnp.float32),
            jnp.asarray(clip_center, jnp.float32),
            jnp.asarray(clip_direction, jnp.float32),
        )
        return out[:height]

    target_pad = jnp.pad(
        jnp.asarray(target, jnp.float32),
        ((0, h_pad - height), (0, 0), (0, 0)),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), (P(), P(), P())),
        check_vma=False,
    )
    def go_grad(volume, tf_table, light_volume, win, cc, cd, tgt):
        dev = jax.lax.axis_index(axis)

        def local_loss(v, t, w):
            img = local_render(v, t, light_volume, w, cc, cd, dev)
            own = jax.lax.dynamic_slice_in_dim(img, dev * rows, rows, axis=0)
            tgt_own = jax.lax.dynamic_slice_in_dim(
                tgt, dev * rows, rows, axis=0
            )
            return jnp.sum((own - tgt_own) ** 2)

        loss, grads = jax.value_and_grad(local_loss, argnums=(0, 1, 2))(
            volume, tf_table, win
        )
        # one DP gradient exchange over ICI; loss rows partition the image
        loss = jax.lax.psum(loss, axis)
        grads = tuple(jax.lax.psum(g, axis) for g in grads)
        return loss, grads

    return go_grad(
        volume, tf_table, light_volume,
        jnp.asarray(windowing_vec4, jnp.float32),
        jnp.asarray(clip_center, jnp.float32),
        jnp.asarray(clip_direction, jnp.float32),
        target_pad,
    )
