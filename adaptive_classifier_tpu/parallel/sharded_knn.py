"""ICI-sharded exact kNN: per-shard top-k, all-gather, global merge.

The scaling design from BASELINE.json: when class/prototype counts exceed
one chip's HBM, the prototype matrix shards over the "tp" axis; each chip
computes distances and a local top-k against its shard, and only the tiny
``[B, k]`` candidate lists cross ICI (all-gather) before a global merge —
instead of gathering the full ``[B, C]`` similarity matrix.

This is the explicit ``shard_map`` formulation (the NamedSharding path in
parallel/sharded.py lets GSPMD derive an equivalent program); scoring
semantics are identical to the single-chip path (ops/knn.py): similarity
``exp(−d²)``, softmax over the selected k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import knn


def make_sharded_topk(mesh: Mesh, k: int):
    """Build a jitted sharded top-k search over tp-sharded prototypes.

    Returns ``search(queries [B,D], protos [C,D], valid [C]) →
    (scores, idx, raw)`` with ``protos``/``valid`` sharded over "tp" and
    results replicated; ``raw`` is the pre-softmax exp(−d²) similarity of
    each selected neighbor (the scale ``min_similarity`` thresholds).
    """
    ntp = mesh.shape["tp"]

    def local_search(q, p_local, valid_local):
        # q: [B, D] replicated; p_local: [C/ntp, D]; valid_local: [C/ntp]
        C_local = p_local.shape[0]
        sims = knn.masked_sims_ref(q, p_local, valid_local)      # [B, C/ntp]
        # finite -1e9 sentinels (not -inf) keep the softmax NaN-free when a
        # shard — or every shard — has no valid prototypes (same convention
        # as the single-chip ops/knn.py:158-166)
        neg = jnp.where(valid_local[None, :], sims, -1e9)
        kk = min(k, C_local)
        vals, idx = jax.lax.top_k(neg, kk)                       # [B, kk]
        shard = jax.lax.axis_index("tp")
        gidx = idx + shard * C_local
        # only [B, kk] scores + ids cross ICI
        all_vals = jax.lax.all_gather(vals, "tp")                # [ntp, B, kk]
        all_idx = jax.lax.all_gather(gidx, "tp")
        B = q.shape[0]
        cand_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(B, ntp * kk)
        cand_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(B, ntp * kk)
        top_vals, top_pos = jax.lax.top_k(cand_vals, k)          # [B, k]
        top_idx = jnp.take_along_axis(cand_idx, top_pos, axis=1)
        # softmax over the selected k (memory.py:127-134 semantics)
        in_range = top_vals > -1e8
        scores = jax.nn.softmax(jnp.where(in_range, top_vals, -1e9), axis=-1)
        scores = jnp.where(in_range, scores, 0.0)
        raw = jnp.where(in_range, top_vals, 0.0)
        top_idx = jnp.where(in_range, top_idx, -1)
        return scores, top_idx, raw

    shmapped = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(), P("tp", None), P("tp")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shmapped)


def shard_prototypes(mesh: Mesh, protos: jax.Array, valid: jax.Array):
    return (
        jax.device_put(protos, NamedSharding(mesh, P("tp", None))),
        jax.device_put(valid, NamedSharding(mesh, P("tp"))),
    )
