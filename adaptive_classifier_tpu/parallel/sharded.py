"""Sharded predict / train steps over a ("dp", "tp") mesh.

Implements the multi-chip execution paths (SURVEY.md §2.3's TPU-native plan):

- ``sharded_predict``: batch dp-sharded through the encoder; distances
  against tp-sharded prototypes; fusion + top-k.  Written with
  ``NamedSharding`` constraints — XLA inserts the all-gather for the
  class-dimension reduction (per-shard partial top-k then merge is what GSPMD
  lowers this to on TPU).
- ``sharded_train_step``: ONE full training step — encoder forward on the
  dp-sharded token batch, masked-CE loss against the tp-sharded head, AdamW
  update, and a prototype/memory update folded in — the "full training step"
  the multi-chip dry-run validates.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..memory import MemoryState, add_batch, prune, recompute_prototypes
from ..models import head as head_lib
from ..models.encoder import EncoderConfig, embed_texts_device
from ..ops import knn, fusion
from .. import training


def make_sharded_predict(mesh: Mesh, enc_cfg: EncoderConfig, k: int,
                         compute_dtype=jnp.bfloat16):
    """Jitted embed → kNN → head → fusion with dp/tp shardings."""

    batch_spec = NamedSharding(mesh, P("dp", None))
    out_spec = NamedSharding(mesh, P("dp", None))

    @functools.partial(
        jax.jit,
        in_shardings=(None, None, batch_spec, batch_spec, None, None, None, None),
        out_shardings=(out_spec, out_spec),
    )
    def predict(enc_params, head_params, input_ids, attention_mask,
                protos, proto_valid, active, weights):
        emb = embed_texts_device(enc_params, input_ids, attention_mask,
                                 enc_cfg, compute_dtype)
        emb = jax.lax.with_sharding_constraint(emb, NamedSharding(mesh, P("dp", None)))
        sims = knn.masked_sims_ref(emb, protos, proto_valid)
        logits = head_lib.head_forward(head_params, emb, train=False)
        pw, hw = weights
        return fusion.fuse_full(sims, logits, proto_valid, active, pw, hw, k, True)

    return predict


class ShardedTrainState(NamedTuple):
    head_params: Any
    opt: training.AdamW
    memory: MemoryState


def make_sharded_train_step(mesh: Mesh, enc_cfg: EncoderConfig,
                            compute_dtype=jnp.bfloat16, lr: float = 1e-3,
                            max_examples: Optional[int] = None):
    """One full training step, dp×tp sharded:

    tokens → encoder (dp) → embeddings → [memory append + capacity prune +
    prototype recompute (tp)] → head CE loss (class dim tp-sharded, dropout
    on like the single-chip path) → AdamW update.

    ``labels == -1`` marks padding rows (the dp batch must be divisible by
    the mesh, so tails are padded): they are excluded from the loss via
    ``training._ce_loss``'s valid mask and from the memory append via
    ``add_batch``'s convention — the same −1 semantics everywhere.
    """
    batch_spec = NamedSharding(mesh, P("dp", None))
    label_spec = NamedSharding(mesh, P("dp"))

    @functools.partial(
        jax.jit,
        in_shardings=(None, None, batch_spec, batch_spec, label_spec, None, None),
    )
    def train_step(enc_params, state: ShardedTrainState, input_ids,
                   attention_mask, labels, active, rng):
        emb = embed_texts_device(enc_params, input_ids, attention_mask,
                                 enc_cfg, compute_dtype)
        labels = labels.astype(jnp.int32)
        vmask = (labels >= 0).astype(jnp.float32)

        # memory append via the canonical batched transition: within-batch
        # rank ordering means duplicate labels land in distinct slots and
        # −1 rows drop (same semantics as single-chip appends,
        # memory.add_batch); capacity prune keeps the closest-to-mean rows
        # so long-running loops never clip appends onto the last row
        mem = add_batch(state.memory, emb, labels)
        cap = max_examples if max_examples is not None else \
            max(state.memory.emb.shape[1] - 1, 1)
        mem, _ = prune(mem, cap)

        def loss_fn(p):
            # the canonical masked CE (training._ce_loss): dropout ON with
            # the caller's rng and padded rows excluded — identical
            # semantics to the single-chip head-training loss
            return training._ce_loss(p, emb, labels, vmask, active, rng)

        loss, grads = jax.value_and_grad(loss_fn)(state.head_params)
        grads = training.clip_global_norm(grads, 1.0)
        new_params, new_opt = training.adamw_update(state.head_params, grads,
                                                    state.opt, lr)
        return ShardedTrainState(new_params, new_opt, mem), loss

    return train_step


def shard_state(mesh: Mesh, memory: MemoryState, head_params) -> Tuple[MemoryState, Any]:
    """Place an existing state onto the mesh with the standard layout."""
    from .mesh import head_shardings, memory_shardings

    mspec = memory_shardings(mesh)
    memory = MemoryState(
        emb=jax.device_put(memory.emb, mspec["emb"]),
        count=jax.device_put(memory.count, mspec["count"]),
        proto=jax.device_put(memory.proto, mspec["proto"]),
        pweight=jax.device_put(memory.pweight, mspec["pweight"]),
    )
    hspec = head_shardings(mesh, head_params)
    head_params = jax.tree.map(
        lambda x, s: jax.device_put(x, s), head_params, hspec,
        is_leaf=lambda x: isinstance(x, jax.Array),
    )
    return memory, head_params
