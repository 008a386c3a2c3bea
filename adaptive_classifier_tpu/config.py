"""Configuration and example containers.

TPU-native re-design of the reference's ``ModelConfig`` / ``Example``
(reference: src/adaptive_classifier/models.py:9-28,100-196).  The reference
stores free-form dicts; we keep the same public keys/defaults for checkpoint
compatibility and add TPU-specific keys (capacity buckets, dtypes, sharding)
that the reference has no analog for.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_capacity(n: int, buckets: List[int]) -> int:
    """Smallest bucket >= n (last bucket is rounded up in steps of itself)."""
    for b in buckets:
        if n <= b:
            return b
    step = buckets[-1]
    return _round_up(n, step)


@dataclass
class Example:
    """A single training example (reference: models.py:9-28).

    ``embedding`` is a host numpy array (float32) — device state is owned by
    the classifier's padded buffers, not by individual examples.
    """

    text: str
    label: str
    embedding: Optional[np.ndarray] = None

    def to_dict(self) -> Dict[str, Any]:
        return {
            "text": self.text,
            "label": self.label,
            "embedding": self.embedding.tolist() if self.embedding is not None else None,
        }

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "Example":
        emb = data.get("embedding")
        return cls(
            text=data["text"],
            label=data["label"],
            embedding=np.asarray(emb, dtype=np.float32) if emb is not None else None,
        )


class ModelConfig:
    """Configuration for the adaptive classifier.

    Public keys and defaults match the reference (models.py:100-196) so
    checkpoints interoperate; TPU-specific keys are additive.
    """

    #: reference-compatible keys, serialized by :meth:`to_dict`
    _REFERENCE_KEYS = (
        "max_length", "batch_size", "learning_rate", "warmup_steps",
        "max_examples_per_class", "prototype_update_frequency",
        "similarity_threshold", "ewc_lambda", "num_representative_examples",
        "epochs", "early_stopping_patience", "min_examples_per_class",
        "prototype_weight", "neural_weight", "min_confidence",
        "device_map", "quantization", "gradient_checkpointing",
        "enable_strategic_mode", "cost_function_type", "strategic_lambda",
        "cost_coefficients", "strategic_training_frequency",
        "strategic_blend_regular_weight", "strategic_blend_strategic_weight",
        "strategic_robust_proto_weight", "strategic_robust_head_weight",
        "strategic_prediction_proto_weight", "strategic_prediction_head_weight",
    )

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        self.config = dict(config or {})
        g = self.config.get

        # Model settings
        self.max_length = g("max_length", 512)
        self.batch_size = g("batch_size", 32)
        self.learning_rate = g("learning_rate", 0.001)
        self.warmup_steps = g("warmup_steps", 0)

        # Memory settings
        self.max_examples_per_class = g("max_examples_per_class", 1000)
        self.prototype_update_frequency = g("prototype_update_frequency", 100)
        self.similarity_threshold = g("similarity_threshold", 0.6)

        # EWC settings
        self.ewc_lambda = g("ewc_lambda", 100.0)
        #: λ for the incremental new-class path (reference hard-codes 5.0,
        #: classifier.py:279-303; tunable here because our penalty is live)
        self.incremental_ewc_lambda = g("incremental_ewc_lambda", 5.0)
        #: Learning-without-Forgetting distillation weight for the
        #: incremental new-class path: anchors old-class logits to the
        #: frozen pre-add head on replay rows.  Essential after a LOAD,
        #: where only ~5 representative rows/class survive the checkpoint
        #: (reference classifier.py:559-566) and CE alone collapses the
        #: head onto the new class (training._distill_loss).  0 disables.
        self.incremental_distill_lambda = g("incremental_distill_lambda", 1.0)
        self.incremental_distill_temperature = g(
            "incremental_distill_temperature", 2.0)
        #: when the replay store is LOSSY (training_history exceeds stored
        #: rows — the post-load signature), freeze the head trunk and old
        #: output rows during incremental new-class training: old-class
        #: logits stay bit-identical, which is the only thing that provably
        #: prevents catastrophic forgetting on ~5 replay rows/class
        self.incremental_freeze_on_lossy_replay = g(
            "incremental_freeze_on_lossy_replay", True)
        self.num_representative_examples = g("num_representative_examples", 5)

        # Training settings
        self.epochs = g("epochs", 10)
        self.early_stopping_patience = g("early_stopping_patience", 3)
        self.min_examples_per_class = g("min_examples_per_class", 3)

        # Prediction settings
        self.prototype_weight = g("prototype_weight", 0.7)
        self.neural_weight = g("neural_weight", 0.3)
        self.min_confidence = g("min_confidence", 0.1)

        # Device settings
        self.device_map = g("device_map", "auto")
        self.quantization = g("quantization", None)
        self.gradient_checkpointing = g("gradient_checkpointing", False)

        # Strategic classification settings
        self.enable_strategic_mode = g("enable_strategic_mode", False)
        self.cost_function_type = g("cost_function_type", "separable")
        self.strategic_lambda = g("strategic_lambda", 0.1)
        self.cost_coefficients = g("cost_coefficients", {})
        self.strategic_training_frequency = g("strategic_training_frequency", 10)

        # Strategic prediction blending weights
        self.strategic_blend_regular_weight = g("strategic_blend_regular_weight", 0.6)
        self.strategic_blend_strategic_weight = g("strategic_blend_strategic_weight", 0.4)
        self.strategic_robust_proto_weight = g("strategic_robust_proto_weight", 0.8)
        self.strategic_robust_head_weight = g("strategic_robust_head_weight", 0.2)
        self.strategic_prediction_proto_weight = g("strategic_prediction_proto_weight", 0.5)
        self.strategic_prediction_head_weight = g("strategic_prediction_head_weight", 0.5)

        # ------------------------------------------------------------------
        # TPU-native settings (no reference analog)
        # ------------------------------------------------------------------
        #: compute dtype for the encoder forward ("bfloat16" rides the MXU)
        self.compute_dtype = g("compute_dtype", "bfloat16")
        #: class-capacity buckets: device buffers are padded to these sizes so
        #: runtime class addition does not trigger a recompile per class
        self.class_capacity_buckets = g("class_capacity_buckets", [8, 16, 32, 64, 128, 256])
        #: example-capacity buckets (per class), capped at max_examples_per_class+slack
        self.example_capacity_buckets = g("example_capacity_buckets", [32, 128, 512, 1024, 2048])
        #: extra headroom in the example buffer so batch appends can land
        #: before the prune step runs (reference prunes per-add: memory.py:64-65)
        self.example_capacity_slack = g("example_capacity_slack", 256)
        #: training-set size buckets for the jitted head-training scan
        self.train_size_buckets = g("train_size_buckets", [64, 256, 1024, 4096, 16384])
        #: use the Pallas fused kNN kernel when the padded class count is at
        #: least this large; below it XLA's plain lowering is already optimal
        self.pallas_knn_min_classes = g("pallas_knn_min_classes", 512)
        #: use the two-stage fused top-k kernel (never materializes the
        #: [B, C] similarity matrix) when the class count is at least this
        #: large; measured 2× at C=262144 on v5e (ops/knn_topk.py)
        self.fused_topk_min_classes = g("fused_topk_min_classes", 16384)
        #: number of candidates for the strategic best-response sweep
        self.strategic_num_candidates = g("strategic_num_candidates", 50)
        #: strategic-aware closed-form refit rounds for head_type="ridge".
        #: The reference's strategic defense is SGD on the head
        #: (classifier.py:1602-1647), but a ridge head is REPLACED by the
        #: closed-form solution on every retrain — SGD perturbations are
        #: wiped (round-4 finding: production gaming robustness 0.065 →
        #: 0.065, zero gain).  Instead each ridge refit itself iterates:
        #: solve → compute the batched best response of every training row
        #: against the solved head → re-solve on the original rows PLUS the
        #: best-response points (same labels) — the defense is part of the
        #: solution, so no later refit can wipe it.  0 disables (plain
        #: ridge even in strategic mode).
        self.strategic_ridge_rounds = g("strategic_ridge_rounds", 3)
        #: LS weight of the action-space (extreme-sweep) rows in the
        #: strategic ridge solve, relative to 1.0 for real training rows.
        #: Full weight costs clean head accuracy (measured: 1.5pp on
        #: production sentiment); 0.5 keeps the flatness constraint while
        #: letting real rows dominate the fit.
        self.strategic_ridge_ext_weight = g("strategic_ridge_ext_weight", 0.5)
        #: augment head training with a character-typo'd copy of every
        #: stored text (label-preserving, deterministic per text).  Hardens
        #: the head — in particular the lexical gram weights — against
        #: character-level attacks: a typo'd charged word still shares most
        #: char grams with its clean form, and the augmented fit teaches
        #: the head to score those shared grams instead of the exact
        #: surface form.  Head-only: prototypes/memory keep exact reference
        #: semantics.  Off by default (reference parity).
        self.head_typo_augment = g("head_typo_augment", False)
        #: LS weight of the typo'd-copy rows relative to 1.0 for real rows
        #: (ridge heads only — the MLP path has no per-row weights).  Full
        #: weight trades clean accuracy for robustness (measured −2.5pp
        #: clean / −3pp drop on sentiment); fractional weights buy most of
        #: the robustness at a fraction of the clean cost.
        self.head_typo_weight = g("head_typo_weight", 0.5)
        #: hashed TF-IDF lexical channel width (lexical.py; beyond-reference,
        #: 0 = off = exact reference semantics).  When on, embeddings are
        #: [encoder, w·lexical]/√(1+w²) and embedding_dim grows by this.
        #: Must be a multiple of 128 (TPU lane width); 8192 preserves the
        #: full sparse TF-IDF model's accuracy (2048 loses ~12pp to hash
        #: collisions, measured on the authored eval sets)
        self.lexical_dim = g("lexical_dim", 0)
        #: lexical channel weight: float, or "auto" = nearest-prototype
        #: sweep on the first add_examples batch (task-dependent: measured
        #: category wants 4.0, topic 0.5; the sweep includes 0 = off)
        self.lexical_weight = g("lexical_weight", "auto")
        #: lexical gram kind: "word" (uni+bigrams), "char" (3-5-grams,
        #: typo-robust — a misspelled word keeps most of its grams),
        #: "wordchar" (both), or "auto" = train-fold ridge-probe sweep on
        #: the first batch alongside the weight (lexical.resolve_config)
        self.lexical_grams = g("lexical_grams", "auto")
        #: post-incremental prototype recalibration (deviation #7): after the
        #: incremental new-class path, fit a per-class similarity penalty on
        #: the just-added classes by an exact selection-aware sweep over the
        #: replay store (training.fit_new_class_penalty), applied BEFORE
        #: top-k neighbor selection.  Fixes the reference's issue-#53 regime
        #: — old-class accuracy dropping >10% when classes are added — which
        #: EWC provably cannot (the failure is fresh prototypes attracting
        #: borderline queries, docs/architecture.md deviation #6), and which
        #: a post-selection softmax bias provably cannot either (inert at
        #: the predict_batch(k=1) rule).  Zero penalty (or disabling this)
        #: is exact reference scoring.
        self.prototype_recalibration = g("prototype_recalibration", True)
        #: classification head family: "mlp" (reference parity — the
        #: SGD-trained Sequential of models.py:30-98) or "ridge" — a
        #: closed-form multi-class ridge regression fitted exactly on the
        #: replay store (training.ridge_solve; λ=ridge_lambda, no
        #: intercept).  The ridge head IS the train-fold probe the lexical
        #: channel selects with, promoted to production: measured round 3,
        #: the probe beat the full MLP+prototype fusion by 4pp on sentiment
        #: (0.79 vs 0.75) on identical features.
        self.head_type = g("head_type", "mlp")
        #: L2 strength for head_type="ridge": float (1.0 = probe parity
        #: default) or "auto" — resolved once at the first head fit by a
        #: 2-fold train-CV sweep (training.select_ridge_lambda; λ is
        #: feature-scale-dependent — measured, 32768-dim composed features
        #: want 0.3 while 8192 is fine at 1.0), then frozen & persisted
        self.ridge_lambda = g("ridge_lambda", 1.0)
        #: prototype/head fusion weighting: "history" (reference parity —
        #: per-label 0.7/0.3 by training count, classifier.py:449-467) or
        #: "auto" — a scalar prototype share fitted per task on an
        #: alternating per-class 2-fold split of the training rows by the
        #: PRODUCTION decision rules (training.fit_fusion_alpha).  The grid
        #: includes 0.0 (head only — with head_type="ridge" exactly the
        #: probe's rule) and 1.0 (prototypes only); ties prefer 0.7.
        self.fusion_weights = g("fusion_weights", "history")
        #: host-side LRU for text→embedding (0 disables); the encoder is
        #: frozen so cached rows never go stale
        self.embedding_cache_size = g("embedding_cache_size", 4096)
        #: device batch per encoder dispatch on the embed path — larger
        #: chunks amortize per-dispatch host↔device latency on batch streams
        self.embed_chunk_size = g("embed_chunk_size", 256)

    def update(self, **kwargs):
        for key, value in kwargs.items():
            if hasattr(self, key):
                setattr(self, key, value)
            else:
                logger.warning(f"Unknown configuration parameter: {key}")

    def to_dict(self) -> Dict[str, Any]:
        """Reference-compatible serialization (models.py:164-196)."""
        return {k: getattr(self, k) for k in self._REFERENCE_KEYS}

    def to_full_dict(self) -> Dict[str, Any]:
        """Serialization including TPU-native keys."""
        d = self.to_dict()
        d.update({
            "compute_dtype": self.compute_dtype,
            "class_capacity_buckets": self.class_capacity_buckets,
            "example_capacity_buckets": self.example_capacity_buckets,
            "example_capacity_slack": self.example_capacity_slack,
            "train_size_buckets": self.train_size_buckets,
            "pallas_knn_min_classes": self.pallas_knn_min_classes,
            "fused_topk_min_classes": self.fused_topk_min_classes,
            "strategic_num_candidates": self.strategic_num_candidates,
            "strategic_ridge_rounds": self.strategic_ridge_rounds,
            "strategic_ridge_ext_weight": self.strategic_ridge_ext_weight,
            "head_typo_augment": self.head_typo_augment,
            "head_typo_weight": self.head_typo_weight,
            "embedding_cache_size": self.embedding_cache_size,
            "incremental_ewc_lambda": self.incremental_ewc_lambda,
            "incremental_distill_lambda": self.incremental_distill_lambda,
            "incremental_distill_temperature":
                self.incremental_distill_temperature,
            "incremental_freeze_on_lossy_replay":
                self.incremental_freeze_on_lossy_replay,
            "prototype_recalibration": self.prototype_recalibration,
            "lexical_dim": self.lexical_dim,
            "lexical_weight": self.lexical_weight,
            "lexical_grams": self.lexical_grams,
            "head_type": self.head_type,
            "ridge_lambda": self.ridge_lambda,
            "fusion_weights": self.fusion_weights,
        })
        return d

    # -- capacity helpers ------------------------------------------------
    def class_capacity(self, num_classes: int) -> int:
        return bucket_capacity(max(num_classes, 1), self.class_capacity_buckets)

    def example_capacity(self, max_count: int) -> int:
        # ≥1 row of headroom above max_examples_per_class is load-bearing:
        # appends land in the slack region and prune trims back down — with
        # zero headroom add_batch would clip onto row E-1, silently
        # overwriting a stored example and desyncing text↔embedding pairs
        cap_limit = self.max_examples_per_class + max(self.example_capacity_slack, 1)
        return min(bucket_capacity(max(max_count, 1), self.example_capacity_buckets), cap_limit)

    def train_capacity(self, n: int) -> int:
        return bucket_capacity(max(n, 1), self.train_size_buckets)
