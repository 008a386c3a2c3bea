"""Multi-label classification extension.

TPU-native re-design of the reference multi-label extension (reference:
src/adaptive_classifier/multilabel.py:1-425): sigmoid head, adaptive
thresholds by label count, per-label frequency-based thresholds, minimum/
maximum prediction counts with below-threshold backfill, and multi-hot BCE
training that groups labels by text.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .classifier import AdaptiveClassifier
from .models import head as head_lib
from . import training

logger = logging.getLogger(__name__)


class MultiLabelAdaptiveClassifier(AdaptiveClassifier):
    """Multi-label variant: sigmoid activations + threshold machinery
    (reference multilabel.py:71-425)."""

    def __init__(
        self,
        model_name: str,
        device: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        seed: int = 42,
        default_threshold: float = 0.5,
        min_predictions: int = 1,
        max_predictions: Optional[int] = None,
    ):
        super().__init__(model_name, device, config, seed)
        self.default_threshold = default_threshold
        self.min_predictions = min_predictions
        self.max_predictions = max_predictions
        self.label_thresholds: Dict[str, float] = {}
        self.head_params = None

    def _get_adaptive_threshold(self, num_labels: int) -> float:
        """Threshold table from multilabel.py:113-130."""
        if num_labels <= 2:
            return self.default_threshold
        elif num_labels <= 5:
            return self.default_threshold * 0.8
        elif num_labels <= 10:
            return self.default_threshold * 0.6
        elif num_labels <= 20:
            return self.default_threshold * 0.4
        else:
            return self.default_threshold * 0.2

    def _head_sigmoid(self, emb: jax.Array) -> np.ndarray:
        logits = head_lib.head_forward(self.head_params, emb, train=False)
        return np.asarray(jax.nn.sigmoid(logits))

    def predict_multilabel(
        self,
        text: str,
        threshold: Optional[float] = None,
        max_labels: Optional[int] = None,
    ) -> List[Tuple[str, float]]:
        """Reference multilabel.py:132-229."""
        if not text:
            raise ValueError("Empty input text")
        num_labels = len(self.label_to_id)
        if num_labels == 0:
            return []
        if threshold is None:
            threshold = self._get_adaptive_threshold(num_labels)
        max_labels = max_labels or self.max_predictions

        emb = self._embed_device([text])
        if self.head_params is not None:
            probs = self._head_sigmoid(emb)[0]
            predictions = []
            for i in range(num_labels):
                label = self.id_to_label[i]
                label_threshold = self.label_thresholds.get(label, threshold)
                if probs[i] >= label_threshold:
                    predictions.append((label, float(probs[i])))
            predictions.sort(key=lambda x: x[1], reverse=True)
            if max_labels and len(predictions) > max_labels:
                predictions = predictions[:max_labels]
        else:
            k = min(num_labels, max_labels) if max_labels else num_labels
            proto_preds = self.memory.get_nearest_prototypes(np.asarray(emb)[0], k=k)
            predictions = [(l, s) for l, s in proto_preds if s >= threshold]

        # below-threshold backfill to satisfy min_predictions (multilabel.py:203-227)
        if len(predictions) < self.min_predictions and self.head_params is not None:
            probs = self._head_sigmoid(emb)[0]
            order = np.argsort(-probs[:num_labels])[: min(self.min_predictions, num_labels)]
            extra = []
            have = {l for l, _ in predictions}
            for i in order:
                label = self.id_to_label[int(i)]
                if label not in have:
                    extra.append((label, float(probs[int(i)])))
            predictions.extend(extra[: self.min_predictions - len(predictions)])
            predictions.sort(key=lambda x: x[1], reverse=True)

        return predictions

    def predict(self, text: str, k: int = 5) -> List[Tuple[str, float]]:
        """Multi-label first, fall back to base prediction (multilabel.py:231-243)."""
        preds = self.predict_multilabel(text, max_labels=k)
        if preds:
            return preds[:k]
        return super().predict(text, k)

    def add_examples(self, texts: List[str], labels: List[List[str]]):
        """Flatten (text, label) pairs then update thresholds
        (multilabel.py:245-278)."""
        if not texts or not labels:
            raise ValueError("Empty input lists")
        if len(texts) != len(labels):
            raise ValueError("Mismatched text and label lists")
        flattened_texts: List[str] = []
        flattened_labels: List[str] = []
        for text, text_labels in zip(texts, labels):
            for label in text_labels or ():
                flattened_texts.append(text)
                flattened_labels.append(label)
        if flattened_texts:
            super().add_examples(flattened_texts, flattened_labels)
        self._update_label_thresholds()

    def finetune_encoder(
        self,
        steps: int = 200,
        lr: float = 3e-5,
        batch: int = 32,
        temperature: float = 0.1,
        view_mask_prob: float = 0.08,
        chunk_steps: int = 50,
        augment=None,
    ):
        """Multi-label encoder fine-tuning (finetune.supcon_chunk_multihot).

        The single-label SupCon would treat a text stored under labels
        {a, b} (add_examples flattens it into two rows) as its own
        negative; here positives are pairs sharing ≥1 label, over UNIQUE
        texts with multi-hot label rows."""
        import random as _random

        from . import finetune as _ft

        self._finetune_guard(steps)
        text_labels: Dict[str, set] = {}
        for lbl, ts in self.memory.texts.items():
            for t in ts:
                text_labels.setdefault(t, set()).add(lbl)
        if not text_labels:
            raise ValueError("no stored examples to fine-tune on")
        texts = list(text_labels)
        L = max(len(self.label_to_id), 1)
        rows = np.zeros((len(texts), L), np.float32)
        for i, t in enumerate(texts):
            for lbl in text_labels[t]:
                rows[i, self.label_to_id[lbl]] = 1.0

        if augment == "typo":
            # corrupted copies keep their source row's multi-hot labels
            texts, idx = _ft.typo_augment(
                texts, list(range(len(texts))), _random.Random(self.seed))
            rows = rows[np.asarray(idx)]
        elif augment is not None:
            raise ValueError(f"unknown augment {augment!r} (use 'typo')")

        return self._finetune_run(_ft.supcon_chunk_multihot, texts, rows,
                                  steps, lr, batch, temperature,
                                  view_mask_prob, chunk_steps)

    def _update_label_thresholds(self):
        """Frequency-based per-label thresholds (multilabel.py:280-307)."""
        counts = {l: len(t) for l, t in self.memory.texts.items() if t}
        total = sum(counts.values())
        if not total:
            return
        for label, count in counts.items():
            freq = count / total
            if freq < 0.05:
                self.label_thresholds[label] = self.default_threshold * 0.3
            elif freq < 0.1:
                self.label_thresholds[label] = self.default_threshold * 0.5
            elif freq > 0.3:
                self.label_thresholds[label] = self.default_threshold * 1.2
            else:
                self.label_thresholds[label] = self.default_threshold
        logger.debug(f"Updated label thresholds: {self.label_thresholds}")

    def _train_adaptive_head(self, epochs: Optional[int] = None):
        """Multi-hot BCE training grouping labels by text (multilabel.py:309-413)."""
        counts = {l: len(t) for l, t in self.memory.texts.items() if t}
        if not counts:
            return
        if self.head_params is None:
            self._initialize_adaptive_head()

        # group stored (text → labels), embedding from first occurrence
        text_to_labels: Dict[str, set] = defaultdict(set)
        text_to_loc: Dict[str, Tuple[int, int]] = {}
        for label, slot in self.memory.label_to_index.items():
            for pos, text in enumerate(self.memory.texts.get(label, ())):
                text_to_labels[text].add(label)
                text_to_loc.setdefault(text, (slot, pos))

        uniq = list(text_to_labels.keys())
        n = len(uniq)
        if n == 0:
            return
        C = self._class_capacity
        n_cap = self.config.train_capacity(n)
        slots = np.zeros((n_cap,), np.int32)
        poss = np.zeros((n_cap,), np.int32)
        multihot = np.zeros((n_cap, C), np.float32)
        for i, text in enumerate(uniq):
            slots[i], poss[i] = text_to_loc[text]
            for label in text_to_labels[text]:
                multihot[i, self.label_to_id[label]] = 1.0
        emb = self.memory.state.emb[jnp.asarray(slots), jnp.asarray(poss)]
        valid = jnp.arange(n_cap) < n

        result = training.fit_head(
            self.head_params, emb, jnp.asarray(multihot), valid, self._active_mask(),
            jax.random.fold_in(jax.random.PRNGKey(self.seed), self.train_steps),
            lr=self.config.learning_rate,
            loss_type="bce",
            max_epochs=epochs or self.config.epochs,
            patience=self.config.early_stopping_patience,
            use_scheduler=False,
        )
        self.head_params = result.params
        self.train_steps += 1

    def get_label_statistics(self) -> Dict[str, Any]:
        """Reference multilabel.py:415-425."""
        stats = super().get_example_statistics()
        stats["label_thresholds"] = dict(self.label_thresholds)
        stats["adaptive_threshold"] = self._get_adaptive_threshold(len(self.label_to_id))
        stats["default_threshold"] = self.default_threshold
        stats["min_predictions"] = self.min_predictions
        stats["max_predictions"] = self.max_predictions
        return stats
