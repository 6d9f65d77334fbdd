"""Multi-host initialization: the jax.distributed entry point.

The reference is single-process (SURVEY §2.4: no distributed backend of any
kind). The TPU-native scale-out path is: each host process calls
:func:`initialize_distributed` once at startup, after which ``jax.devices()``
spans the whole slice and every mesh built from it (``chain_mesh``, the
``replicas``/``particles`` PT/SMC meshes) shards across hosts transparently —
collectives ride ICI within a slice and DCN across slices, inserted by XLA
from the same ``shard_map`` programs that the virtual-CPU tests exercise.

On Cloud TPU the coordinator address / process count / process id are
auto-detected from the TPU metadata; elsewhere they come from the standard
environment variables (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
``JAX_PROCESS_ID``) or explicit arguments.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the jax.distributed runtime (idempotent).

    Returns True when a multi-process runtime is active after the call.
    Single-process runs (no coordinator configured, no TPU metadata) are a
    no-op returning False, so library code can call this unconditionally.
    """
    # NB: do not call jax.process_count() here — it would initialize the
    # backend, after which jax.distributed.initialize refuses to run.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1  # already initialized by the launcher

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_n = os.environ.get("JAX_NUM_PROCESSES")
    env_i = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_n) if env_n else None
    )
    process_id = process_id if process_id is not None else (
        int(env_i) if env_i else None
    )

    try:
        if coordinator_address:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            # Cloud TPU: args are auto-detected from the metadata server;
            # raises on non-TPU single-host setups, which we treat as no-op
            jax.distributed.initialize()
    except Exception as e:  # single-host fallback
        logger.info("jax.distributed not initialized (single-host run): %s", e)
        return False

    logger.info(
        "jax.distributed: process %d/%d, %d local + %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return jax.process_count() > 1


def global_chain_mesh(axis_name: str = "chains"):
    """1-D mesh over every device in the (possibly multi-host) runtime.

    With ``initialize_distributed`` active this spans hosts; chains stay
    embarrassingly parallel between collective points, so weak-scaling
    efficiency is bounded only by the tiny scalar psums
    (bark_tpu/parallel/sharding.py).
    """
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    devices = mesh_utils.create_device_mesh((jax.device_count(),))
    return Mesh(devices, (axis_name,))
