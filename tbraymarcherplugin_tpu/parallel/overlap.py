"""Backward-overlapped gradient all-reduce (BASELINE config 5).

`make_sharded_train_step` originally all-reduced every parameter gradient
*after* the whole backward pass — one bulk `psum` on the critical path.
:func:`psum_cotangent` moves each reduction to the point in the backward
where that cotangent is *finished*: it is an identity in the forward and a
`psum` of the cotangent in the backward, placed at a parameter's point of
use.

Placement strategy (see `models/pipeline.py` / `ops/march.py`):

- the march marks ``volume`` / ``tf_table`` / ``windowing_vec4`` at its
  entry. The march backward runs FIRST (it is the last forward stage), so
  its parameter cotangents — the big ones — start all-reducing while the
  illumination backward is still computing. XLA emits these as separate
  all-reduce ops that its latency-hiding scheduler can run asynchronously
  over ICI.
- the illumination stage marks the parameter leaves at its entry; its
  cotangents finish last and reduce at the tail (no overlap available —
  there is nothing left to overlap with).

Every use of a leaf must be marked (or none): the sum of per-use psum'd
cotangents equals the psum of the total, but mixing marked and unmarked uses
under an outer psum would double-reduce. `make_sharded_train_step`
therefore skips the outer psum entirely when overlap is enabled;
`tests/test_sharding.py::test_overlapped_allreduce_grads_match` pins
equality of the two modes.
"""

from __future__ import annotations

from functools import partial

import jax


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_cotangent(x, axis_name: str):
    """Identity whose backward all-reduces the cotangent over ``axis_name``.

    Only meaningful inside `shard_map`/`pmap` with that named axis.
    """
    return x


def _fwd(x, axis_name):
    return x, None


def _bwd(axis_name, _, g):
    return (jax.lax.psum(g, axis_name),)


psum_cotangent.defvjp(_fwd, _bwd)


def mark_tree(tree, axis_name: str | None):
    """Apply :func:`psum_cotangent` to every leaf (no-op when axis is None)."""
    if axis_name is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: psum_cotangent(x, axis_name), tree
    )
