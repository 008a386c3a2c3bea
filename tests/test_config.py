"""Config / Example tests (reference analog: models.py:100-196, 9-28)."""

import numpy as np

from adaptive_classifier_tpu import Example, ModelConfig


def test_defaults_match_reference():
    cfg = ModelConfig()
    assert cfg.max_length == 512
    assert cfg.batch_size == 32
    assert cfg.learning_rate == 0.001
    assert cfg.max_examples_per_class == 1000
    assert cfg.prototype_update_frequency == 100
    assert cfg.ewc_lambda == 100.0
    assert cfg.num_representative_examples == 5
    assert cfg.epochs == 10
    assert cfg.early_stopping_patience == 3
    assert cfg.prototype_weight == 0.7
    assert cfg.neural_weight == 0.3
    assert cfg.enable_strategic_mode is False
    assert cfg.cost_function_type == "separable"
    assert cfg.strategic_lambda == 0.1
    assert cfg.strategic_training_frequency == 10
    assert cfg.strategic_blend_regular_weight == 0.6
    assert cfg.strategic_robust_proto_weight == 0.8


def test_override_and_update():
    cfg = ModelConfig({"learning_rate": 0.01, "max_length": 128})
    assert cfg.learning_rate == 0.01
    assert cfg.max_length == 128
    cfg.update(epochs=5)
    assert cfg.epochs == 5
    cfg.update(not_a_real_key=1)  # warns, doesn't raise
    assert not hasattr(cfg, "not_a_real_key")


def test_to_dict_reference_keys():
    d = ModelConfig().to_dict()
    for key in ModelConfig._REFERENCE_KEYS:
        assert key in d
    # reference-format dict round-trips
    cfg2 = ModelConfig(d)
    assert cfg2.prototype_weight == 0.7


def test_full_dict_roundtrip():
    cfg = ModelConfig({"compute_dtype": "float32"})
    d = cfg.to_full_dict()
    assert d["compute_dtype"] == "float32"
    assert ModelConfig(d).compute_dtype == "float32"


def test_capacity_buckets():
    cfg = ModelConfig()
    assert cfg.class_capacity(1) == 8
    assert cfg.class_capacity(8) == 8
    assert cfg.class_capacity(9) == 16
    assert cfg.class_capacity(300) == 512  # rounds in steps of last bucket
    assert cfg.example_capacity(1) == 32
    # example capacity is capped at max_examples_per_class + slack
    assert cfg.example_capacity(10**6) == cfg.max_examples_per_class + cfg.example_capacity_slack


def test_example_roundtrip():
    ex = Example("hello", "greeting", np.ones(4, np.float32))
    d = ex.to_dict()
    ex2 = Example.from_dict(d)
    assert ex2.text == "hello" and ex2.label == "greeting"
    np.testing.assert_allclose(ex2.embedding, ex.embedding)
    # embedding-less example
    ex3 = Example.from_dict({"text": "a", "label": "b", "embedding": None})
    assert ex3.embedding is None
