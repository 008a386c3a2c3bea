"""adaptive-classifier-tpu — TPU-native adaptive text classification.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
``adaptive-classifier`` library (reference:
src/adaptive_classifier/__init__.py): continual-learning text classification
with a frozen transformer encoder, an HBM-resident prototype memory searched
by fused Pallas kNN kernels, an EWC-protected adaptive head trained as a
single jitted device program, multi-label and game-theoretic strategic modes,
and reference-compatible checkpoints.
"""

from .classifier import AdaptiveClassifier
from .config import Example, ModelConfig
from .ewc import EWC
from .memory import PrototypeMemory
from .models.head import AdaptiveHead, MultiLabelAdaptiveHead
from .multilabel import MultiLabelAdaptiveClassifier
from .calibration import TemperatureScaler, expected_calibration_error
from .serving import BatchingClassifierServer, MultiTenantServer

__version__ = "0.1.0"

__all__ = [
    "AdaptiveClassifier",
    "MultiLabelAdaptiveClassifier",
    "MultiLabelAdaptiveHead",
    "Example",
    "AdaptiveHead",
    "ModelConfig",
    "PrototypeMemory",
    "EWC",
    "BatchingClassifierServer",
    "MultiTenantServer",
    "TemperatureScaler",
    "expected_calibration_error",
]


def __getattr__(name):
    # lazy: the sharded facade pulls in the parallel stack
    if name == "ShardedAdaptiveClassifier":
        from .parallel.facade import ShardedAdaptiveClassifier

        return ShardedAdaptiveClassifier
    raise AttributeError(name)
