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
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
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
