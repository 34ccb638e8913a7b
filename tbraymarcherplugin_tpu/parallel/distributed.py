"""Multi-host initialization and collectives policy (P3).

The reference has no distributed backend (single GPU via UE RHI, SURVEY §5);
this is the standard JAX multi-host recipe: `jax.distributed.initialize` per
host, XLA collectives (`psum` / `all_gather` / `ppermute`) over ICI within a
slice and DCN across hosts — no NCCL/MPI layer to manage. Failure policy is
JAX's fail-fast: a lost host aborts the job and training resumes from the
latest checkpoint (see `utils.checkpoint`).
"""

from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger("tbraymarcher.distributed")


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize JAX's distributed runtime (idempotent, env-var driven).

    On TPU pods the arguments are auto-detected from the environment; on CPU
    test rigs pass them explicitly (or set JAX_COORDINATOR_ADDRESS etc.).
    """
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = coordinator_address or os.environ[
            "JAX_COORDINATOR_ADDRESS"
        ]
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
        log.info(
            "distributed initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(),
            jax.process_count(),
            jax.local_device_count(),
            jax.device_count(),
        )
    except Exception as exc:  # single-host runs: not an error
        log.debug("distributed init skipped: %s", exc)


def is_primary() -> bool:
    return jax.process_index() == 0
