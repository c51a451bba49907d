"""Multi-host launch helper.

The reference launches single-node SLURM tasks (``completion/run_train.sh``);
the TPU-native equivalent is one process per host with
``jax.distributed.initialize`` rendezvous and per-host dataset shards. This
module centralizes that so the CLIs work unchanged on a single chip, a
single host with N chips, or a multi-host slice.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)


def maybe_initialize_distributed() -> None:
    """Initialize multi-host JAX when a coordinator is configured.

    Set ``JAX_COORDINATOR_ADDRESS`` (+ optional ``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID``) in the per-host environment; on Cloud TPU VMs with
    metadata available, ``jax.distributed.initialize()`` auto-discovers.
    No-op when unset (single-host).
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        logger.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )


def host_shard() -> tuple:
    """(num_shards, shard_id) for per-host dataset sharding."""
    return jax.process_count(), jax.process_index()


def is_primary() -> bool:
    """True on the process that should log/checkpoint."""
    return jax.process_index() == 0
