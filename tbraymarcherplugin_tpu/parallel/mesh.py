"""Device mesh construction helpers.

The reference is single-GPU (SURVEY §1: UE game/render-thread pipeline, no
multi-device story); the TPU framework introduces the mesh as a first-class
concept (SURVEY §2.9). Axis names used across the framework:

- ``"rays"``  — data parallelism over ray tiles (P1).
- ``"slab"``  — volume slab sharding along one volume axis (P2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: dict[str, int] | None = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a named mesh.

    ``make_mesh({"rays": 4, "slab": 2})`` lays 8 devices out as a 4x2 grid.
    With no arguments, all local devices go on a single ``"rays"`` axis.
    """
    if devices is None:
        devices = jax.devices()
    if axis_sizes is None:
        axis_sizes = {"rays": len(devices)}
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh {dict(axis_sizes)} needs {int(np.prod(shape))} devices, "
            f"have {len(devices)}"
        )
    dev_array = mesh_utils.create_device_mesh(shape, devices=list(devices))
    return Mesh(dev_array, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_along(mesh: Mesh, axis_name: str, dim: int = 0) -> NamedSharding:
    spec = [None] * (dim + 1)
    spec[dim] = axis_name
    return NamedSharding(mesh, P(*spec))
