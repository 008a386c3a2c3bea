"""Sharded checkpointing — orbax save/restore for multi-chip state.

The reference's checkpoint system is host-side JSON + safetensors
(SURVEY.md §3.4) and is preserved for API/interop (persistence.py).  At
scale, the device state (the ``[C, E, D]`` example buffer sharded over ICI,
head + optimizer state) should checkpoint without gathering to one host:
orbax writes each shard from its owner and restores onto any mesh by
resharding — checkpoint/resume for the sharded index.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_sharded(path, state: Any) -> None:
    """Save a pytree of (possibly sharded) jax arrays."""
    ckptr = _checkpointer()
    ckptr.save(Path(path).resolve(), state)
    ckptr.wait_until_finished()


def restore_sharded(path, template: Any) -> Any:
    """Restore onto the placements described by ``template``.

    ``template`` may be the same pytree of concrete arrays (their shardings
    are reused) or a pytree of ``jax.ShapeDtypeStruct`` with ``sharding``
    set — restoring onto a different mesh reshards transparently.
    """
    import orbax.checkpoint as ocp

    def as_abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    abstract = jax.tree.map(as_abstract, template)
    ckptr = _checkpointer()
    return ckptr.restore(Path(path).resolve(), abstract)
