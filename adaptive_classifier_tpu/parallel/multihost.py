"""Multi-host (DCN) initialization helpers.

The reference has no distributed runtime at all (SURVEY.md §2.3); the
TPU-native design only needs multi-host when the prototype/example index
outgrows a single pod slice.  This wraps ``jax.distributed`` initialization
and global-mesh construction; on a single host everything is a no-op.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

    Returns True if a multi-process runtime was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        logger.debug("single-host run; jax.distributed not initialized")
        return False
    # explicit args win over env vars — `or` would treat process_id=0 as
    # missing and read a (possibly stale) env value instead
    if num_processes is None:
        env_np = os.environ.get("JAX_NUM_PROCESSES")
        if env_np is None:
            raise ValueError(
                "coordinator address set but num_processes unknown: pass "
                "num_processes= or set JAX_NUM_PROCESSES (silently "
                "defaulting to 1 would give the coordinator a wrong world "
                "size and hang the other hosts)"
            )
        num_processes = int(env_np)
    if process_id is None:
        env_pid = os.environ.get("JAX_PROCESS_ID")
        if env_pid is None:
            raise ValueError(
                "coordinator address set but process_id unknown: pass "
                "process_id= or set JAX_PROCESS_ID"
            )
        process_id = int(env_pid)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}"
    )
    return True


def global_mesh(dp: Optional[int] = None, tp: Optional[int] = None):
    """("dp", "tp") mesh over ALL devices across hosts.

    Keep "tp" within a host's ICI domain so index-shard collectives ride ICI,
    not DCN (mesh axes are laid out with tp as the fastest-varying axis over
    ``jax.devices()``, which enumerates local devices contiguously).
    """
    from .mesh import make_mesh

    return make_mesh(n_devices=len(jax.devices()), dp=dp, tp=tp)
