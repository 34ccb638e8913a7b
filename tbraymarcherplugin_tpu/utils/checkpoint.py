"""Checkpoint/resume for optimization state and scene parameters.

The reference's analogue is UE asset persistence + writing current TF /
windowing back into the asset (`SaveCurrentParamsToVolumeAsset`,
`RaymarchVolume.cpp:579-594`, noted broken in UE5). Here: a dependency-free
``.npz`` checkpoint manager that round-trips any pytree of arrays — covering
the fit loop's (params, opt_state, step) and multi-host fail-fast restarts
(SURVEY §5). Deliberately not orbax: these checkpoints are small (a TF table,
window scalars, one volume) and synchronous single-host saves keep the format
inspectable with plain numpy.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_pytree(path: str, tree: Any, metadata: dict | None = None) -> None:
    """Save a pytree of arrays to ``<path>.npz`` (structure pickled by index)."""
    flat, _ = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(flat)}
    if metadata:
        arrays["metadata_json"] = np.frombuffer(
            json.dumps(metadata).encode(), dtype=np.uint8
        )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def restore_pytree(path: str, like: Any) -> tuple[Any, dict]:
    """Restore a pytree saved by :func:`save_pytree` into ``like``'s structure."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    flat, treedef = _flatten_with_paths(like)
    with np.load(path, allow_pickle=False) as z:
        leaves = [z[f"leaf_{i}"] for i in range(len(flat))]
        meta = (
            json.loads(bytes(z["metadata_json"].tobytes()).decode())
            if "metadata_json" in z.files
            else {}
        )
    import jax.numpy as jnp

    restored = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(v) for v in leaves]
    )
    return restored, meta


class CheckpointManager:
    """Rotating checkpoints: ``save(step, tree)`` keeps the newest K."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = directory
        self.max_to_keep = max_to_keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:08d}.npz")

    def all_steps(self) -> list[int]:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("ckpt_") and name.endswith(".npz"):
                steps.append(int(name[5:-4]))
        return sorted(steps)

    def latest_step(self) -> int | None:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step: int, tree: Any, metadata: dict | None = None) -> None:
        meta = dict(metadata or {})
        meta["step"] = step
        save_pytree(self._path(step), tree, meta)
        for old in self.all_steps()[: -self.max_to_keep]:
            os.remove(self._path(old))

    def restore(self, like: Any, step: int | None = None) -> tuple[Any, dict]:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return restore_pytree(self._path(step), like)
