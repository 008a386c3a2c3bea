"""Sharding tests on the virtual 8-device CPU mesh: sharded results must
match single-device results exactly (collectives only change placement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptive_classifier_tpu import training
from adaptive_classifier_tpu.memory import init_state, recompute_prototypes
from adaptive_classifier_tpu.models import head as head_lib
from adaptive_classifier_tpu.models.encoder import EncoderConfig, init_params
from adaptive_classifier_tpu.ops import knn
from adaptive_classifier_tpu.parallel.mesh import make_mesh, memory_shardings
from adaptive_classifier_tpu.parallel.sharded import (
    ShardedTrainState, make_sharded_predict, make_sharded_train_step, shard_state,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def setup():
    cfg = EncoderConfig(vocab_size=512, hidden_size=64, num_layers=2,
                        num_heads=2, intermediate_size=128,
                        max_position_embeddings=64)
    enc_params = init_params(0, cfg)
    C_cap, E_cap, n_classes = 16, 16, 4
    memory = init_state(C_cap, E_cap, cfg.hidden_size)
    head_params = head_lib.init_head(
        jax.random.PRNGKey(42), cfg.hidden_size, C_cap, n_classes,
        hidden_dims=[cfg.hidden_size, cfg.hidden_size // 2],
    )
    r = np.random.default_rng(0)
    B, S = 8, 16
    input_ids = jnp.asarray(r.integers(0, 500, (B, S)), jnp.int32)
    attention_mask = jnp.ones((B, S), jnp.int32)
    labels = jnp.asarray(np.arange(B) % n_classes, jnp.int32)
    active = jnp.arange(C_cap) < n_classes
    return cfg, enc_params, memory, head_params, input_ids, attention_mask, labels, active


def test_mesh_shapes(mesh):
    assert mesh.axis_names == ("dp", "tp")
    assert int(np.prod(mesh.devices.shape)) == 8


def test_sharded_knn_matches_single_device(mesh):
    r = np.random.default_rng(1)
    q = jnp.asarray(r.standard_normal((8, 32)), jnp.float32)
    p = jnp.asarray(r.standard_normal((16, 32)), jnp.float32)
    valid = jnp.asarray(np.arange(16) < 10)
    expect = np.asarray(knn.masked_sims_ref(q, p, valid))
    specs = memory_shardings(mesh)
    p_sh = jax.device_put(p, specs["proto"])
    valid_sh = jax.device_put(valid, specs["count"])
    got = np.asarray(jax.jit(knn.masked_sims_ref)(q, p_sh, valid_sh))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_sharded_train_step_matches_unsharded(mesh, setup):
    cfg, enc_params, memory, head_params, ids, mask, labels, active = setup

    # sharded run
    mem_sh, head_sh = shard_state(mesh, memory, head_params)
    step = make_sharded_train_step(mesh, cfg, compute_dtype=jnp.float32)
    state = ShardedTrainState(head_sh, training.adamw_init(head_sh), mem_sh)
    state_sh, loss_sh = step(enc_params, state, ids, mask, labels, active,
                             jax.random.PRNGKey(0))

    # single-device run of the same step
    step1 = make_sharded_train_step(make_mesh(1), cfg, compute_dtype=jnp.float32)
    state1 = ShardedTrainState(head_params, training.adamw_init(head_params), memory)
    state_1, loss_1 = step1(enc_params, state1, ids, mask, labels, active,
                            jax.random.PRNGKey(0))

    assert abs(float(loss_sh) - float(loss_1)) < 1e-5
    for a, b in zip(jax.tree.leaves(state_sh.head_params),
                    jax.tree.leaves(state_1.head_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(state_sh.memory.proto),
                               np.asarray(state_1.memory.proto), atol=1e-5)


def test_sharded_predict_matches_unsharded(mesh, setup):
    cfg, enc_params, memory, head_params, ids, mask, labels, active = setup
    C_cap = memory.class_capacity
    r = np.random.default_rng(2)
    protos = jnp.asarray(r.standard_normal((C_cap, cfg.hidden_size)), jnp.float32)
    valid = jnp.asarray(np.arange(C_cap) < 4)
    pw = jnp.full((C_cap,), 0.7)
    hw = jnp.full((C_cap,), 0.3)

    pred_sh = make_sharded_predict(mesh, cfg, k=3, compute_dtype=jnp.float32)
    s_sh, i_sh = pred_sh(enc_params, head_params, ids, mask, protos, valid,
                         active, (pw, hw))
    pred_1 = make_sharded_predict(make_mesh(1), cfg, k=3, compute_dtype=jnp.float32)
    s_1, i_1 = pred_1(enc_params, head_params, ids, mask, protos, valid,
                      active, (pw, hw))
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_1))


def test_dryrun_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_topk_matches_single_device(mesh):
    """Explicit shard_map kNN (per-shard top-k + all-gather merge) returns
    exactly the single-chip scores/neighbors."""
    from adaptive_classifier_tpu.parallel.sharded_knn import (
        make_sharded_topk, shard_prototypes,
    )

    r = np.random.default_rng(5)
    B, C, D, k = 8, 32, 16, 5
    q = r.standard_normal((B, D)).astype(np.float32)
    p = r.standard_normal((C, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    valid = np.arange(C) < 27

    sims = knn.masked_sims_ref(jnp.asarray(q), jnp.asarray(p), jnp.asarray(valid))
    exp_scores, exp_idx = knn.topk_scores(sims, jnp.asarray(valid), k)

    search = make_sharded_topk(mesh, k)
    p_sh, v_sh = shard_prototypes(mesh, jnp.asarray(p), jnp.asarray(valid))
    got_scores, got_idx, got_raw = search(jnp.asarray(q), p_sh, v_sh)

    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(exp_idx))
    np.testing.assert_allclose(np.asarray(got_scores), np.asarray(exp_scores),
                               rtol=1e-5, atol=1e-6)
    # raw channel carries pre-softmax exp(-d^2) similarities in (0, 1]
    raw = np.asarray(got_raw)
    assert ((raw > 0) & (raw <= 1.0 + 1e-6)).all()


def test_sharded_topk_fewer_valid_than_k(mesh):
    from adaptive_classifier_tpu.parallel.sharded_knn import (
        make_sharded_topk, shard_prototypes,
    )

    r = np.random.default_rng(6)
    B, C, D, k = 4, 16, 8, 6
    q = r.standard_normal((B, D)).astype(np.float32)
    p = r.standard_normal((C, D)).astype(np.float32)
    valid = np.arange(C) < 3  # fewer valid than k
    search = make_sharded_topk(mesh, k)
    p_sh, v_sh = shard_prototypes(mesh, jnp.asarray(p), jnp.asarray(valid))
    scores, idx, _ = search(jnp.asarray(q), p_sh, v_sh)
    scores, idx = np.asarray(scores), np.asarray(idx)
    assert (idx[:, 3:] == -1).all()
    assert np.allclose(scores.sum(axis=1), 1.0, atol=1e-5)


def test_sharded_checkpoint_roundtrip(mesh, setup, tmp_path):
    """Orbax save from a sharded mesh, restore onto single device — values
    identical (checkpoint/resume for the sharded index)."""
    pytest.importorskip("orbax.checkpoint")
    from adaptive_classifier_tpu.parallel.checkpoint import (
        restore_sharded, save_sharded,
    )

    cfg, enc_params, memory, head_params, *_ = setup
    mem_sh, head_sh = shard_state(mesh, memory, head_params)
    state = {"memory": {"emb": mem_sh.emb, "count": mem_sh.count,
                        "proto": mem_sh.proto},
             "head": head_sh}
    path = tmp_path / "ckpt"
    save_sharded(path, state)

    # restore onto default (single-device) placements
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state,
        is_leaf=lambda x: isinstance(x, jax.Array),
    )
    restored = restore_sharded(path, template)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_facade_matches_plain(mesh):
    """ShardedAdaptiveClassifier == plain AdaptiveClassifier, bit-for-bit
    (sharding only changes placement)."""
    from adaptive_classifier_tpu import AdaptiveClassifier
    from adaptive_classifier_tpu.parallel.facade import ShardedAdaptiveClassifier
    from tests.conftest import synthetic_embed

    cfg = {
        "train_size_buckets": [64], "class_capacity_buckets": [8],
        "example_capacity_buckets": [32], "embedding_cache_size": 0,
    }
    plain = AdaptiveClassifier("prajjwal1/bert-tiny", config=dict(cfg))
    plain._get_embeddings = lambda t: synthetic_embed(t, dim=128)
    shard = ShardedAdaptiveClassifier("prajjwal1/bert-tiny", mesh=mesh, config=dict(cfg))
    shard._get_embeddings = lambda t: synthetic_embed(t, dim=128)

    texts = [f"u:{i}" for i in range(6)] + [f"v:{i}" for i in range(6)]
    labels = ["u"] * 6 + ["v"] * 6
    plain.add_examples(texts, labels)
    shard.add_examples(texts, labels)

    # memory state is actually sharded over tp
    emb_sharding = shard.memory.state.emb.sharding
    assert "tp" in str(emb_sharding.spec) or not emb_sharding.is_fully_replicated

    for q in ["u:9", "v:9"]:
        p1 = plain.predict(q, k=2)
        p2 = shard.predict(q, k=2)
        assert p1[0][0] == p2[0][0]
        assert abs(p1[0][1] - p2[0][1]) < 1e-4, (q, p1, p2)

    # incremental class addition stays sharded and correct
    shard.add_examples([f"w:{i}" for i in range(6)], ["w"] * 6)
    plain.add_examples([f"w:{i}" for i in range(6)], ["w"] * 6)
    assert shard.predict("w:9", k=3)[0][0] == "w"
    assert not shard.memory.state.emb.sharding.is_fully_replicated


def test_facade_finetune_keeps_sharding(mesh):
    """finetune_encoder on the sharded facade: memory re-embeds through the
    sharded state setter, so placement survives the weight swap."""
    from adaptive_classifier_tpu.parallel.facade import ShardedAdaptiveClassifier

    clf = ShardedAdaptiveClassifier("prajjwal1/bert-tiny", mesh=mesh, config={
        "train_size_buckets": [64], "class_capacity_buckets": [8],
        "example_capacity_buckets": [32], "embedding_cache_size": 0,
    })
    clf.add_examples(["billing problem one", "billing problem two",
                      "login failure one", "login failure two"],
                     ["billing", "billing", "login", "login"])
    rep = clf.finetune_encoder(steps=10, chunk_steps=10, batch=4)
    assert np.isfinite(rep["final_loss"])
    assert not clf.memory.state.emb.sharding.is_fully_replicated
    preds = clf.predict("cannot pay my bill", k=2)
    assert len(preds) == 2


def test_sharded_ridge_solve_matches_single_device(mesh):
    """training.ridge_solve under tp-sharded class capacity and dp-sharded
    rows == the single-device solution (the production head's solver; round-4
    weak #6 — the shipped zoo config had zero multi-chip coverage)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    r = np.random.default_rng(11)
    N_cap, D, C_cap = 64, 48, 16
    emb = jnp.asarray(r.standard_normal((N_cap, D)), jnp.float32)
    labels = jnp.asarray(r.integers(0, 5, (N_cap,)), jnp.int32)
    valid = jnp.arange(N_cap) < 40
    expect = np.asarray(training.ridge_solve(emb, labels, valid, C_cap, 1.0))

    emb_sh = jax.device_put(emb, NamedSharding(mesh, P("dp", None)))
    lbl_sh = jax.device_put(labels, NamedSharding(mesh, P("dp")))
    val_sh = jax.device_put(valid, NamedSharding(mesh, P("dp")))
    got = np.asarray(training.ridge_solve(emb_sh, lbl_sh, val_sh, C_cap, 1.0))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)

    # primal branch (rows > dims) under the same shardings
    emb2 = jnp.asarray(r.standard_normal((N_cap, 8)), jnp.float32)
    expect2 = np.asarray(training.ridge_solve(emb2, labels, valid, C_cap, 1.0))
    emb2_sh = jax.device_put(emb2, NamedSharding(mesh, P("dp", None)))
    got2 = np.asarray(training.ridge_solve(emb2_sh, lbl_sh, val_sh, C_cap, 1.0))
    np.testing.assert_allclose(got2, expect2, rtol=1e-4, atol=1e-5)


#: the shipped zoo configuration (build_classifier_zoo), small buckets
_PROD_CFG = {
    "lexical_dim": 8192, "head_type": "ridge", "fusion_weights": "auto",
    "train_size_buckets": [64, 256], "class_capacity_buckets": [8],
    "example_capacity_buckets": [32], "embedding_cache_size": 0,
}


def test_sharded_facade_production_config_matches_plain(mesh):
    """ShardedAdaptiveClassifier on the PRODUCTION config — ridge head +
    composed [dense, lexical] embedding + fold-fitted fusion + prototype
    recalibration through the incremental path — must match the plain
    classifier exactly (round-4 weak #6: whether ridge_solve runs correctly
    under tp-sharded class columns and the 8k-dim composed embedding
    shards/gathers correctly was unverified)."""
    from adaptive_classifier_tpu import AdaptiveClassifier
    from adaptive_classifier_tpu.parallel.facade import ShardedAdaptiveClassifier

    texts = [f"the billing page crashed again case {i}" for i in range(6)] \
        + [f"great service and quick delivery order {i}" for i in range(6)]
    labels = ["complaint"] * 6 + ["praise"] * 6

    plain = AdaptiveClassifier("prajjwal1/bert-tiny", config=dict(_PROD_CFG))
    shard = ShardedAdaptiveClassifier("prajjwal1/bert-tiny", mesh=mesh,
                                      config=dict(_PROD_CFG))
    plain.add_examples(texts, labels)
    shard.add_examples(texts, labels)
    assert shard.embedding_dim == 128 + 8192
    assert not shard.memory.state.emb.sharding.is_fully_replicated
    assert shard._fusion_alpha == plain._fusion_alpha

    queries = ["the billing page crashed again case 9",
               "great service and quick delivery order 9"]
    for q in queries:
        p1, p2 = plain.predict(q, k=2), shard.predict(q, k=2)
        assert [l for l, _ in p1] == [l for l, _ in p2]
        for (_, a), (_, b) in zip(p1, p2):
            assert abs(a - b) < 1e-4

    # incremental new-class add fires prototype recalibration; the fitted
    # penalty (applied BEFORE top-k selection) must match and predictions
    # stay equal under sharding
    new = [f"please cancel my subscription now ref {i}" for i in range(4)]
    plain.add_examples(new, ["cancel"] * 4)
    shard.add_examples(new, ["cancel"] * 4)
    if plain._proto_bias is not None:
        assert shard._proto_bias is not None
        np.testing.assert_allclose(shard._proto_bias, plain._proto_bias,
                                   rtol=1e-4, atol=1e-5)
    for q in queries + ["please cancel my subscription now ref 9"]:
        p1 = plain.predict_batch([q], k=1)[0]
        p2 = shard.predict_batch([q], k=1)[0]
        assert p1[0][0] == p2[0][0]
        assert abs(p1[0][1] - p2[0][1]) < 1e-4


def test_multihost_noop_on_single_host(monkeypatch):
    """Without a coordinator address, distributed init is a no-op."""
    from adaptive_classifier_tpu.parallel import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert multihost.initialize_distributed() is False
    m = multihost.global_mesh()
    assert int(np.prod(m.devices.shape)) == len(jax.devices())


def test_facade_shard_knn_path_at_large_C(mesh):
    """ShardedPrototypeMemory routes get_nearest_prototypes through the
    explicit shard_map search above shard_knn_min_classes, with results
    matching the base (GSPMD) implementation."""
    from adaptive_classifier_tpu import ModelConfig
    from adaptive_classifier_tpu.config import Example
    from adaptive_classifier_tpu.parallel.facade import ShardedPrototypeMemory

    D = 32
    cfg = ModelConfig({
        "class_capacity_buckets": [1024],
        "example_capacity_buckets": [4],
        "max_examples_per_class": 4,
    })
    mem = ShardedPrototypeMemory(D, config=cfg, mesh=mesh)
    r = np.random.default_rng(3)
    for i in range(12):
        v = r.standard_normal(D).astype(np.float32)
        v /= np.linalg.norm(v)
        mem.add_example(Example(f"t{i}", f"label_{i:02d}", v), f"label_{i:02d}")
    assert mem.state.class_capacity == 1024
    assert mem._use_shard_knn()
    q = r.standard_normal(D).astype(np.float32)
    got = mem.get_nearest_prototypes(q, k=5)
    # base implementation (GSPMD path) on the same state
    base = ShardedPrototypeMemory.__mro__[1].get_nearest_prototypes(mem, q, k=5)
    assert [l for l, _ in got] == [l for l, _ in base]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in base],
                               rtol=1e-5, atol=1e-6)
    # min_similarity thresholds the raw exp(-d^2) channel
    assert mem.get_nearest_prototypes(q, k=5, min_similarity=1.5) == []
