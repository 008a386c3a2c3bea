"""Device ops: fused kNN kernels, flash attention, fusion, k-means."""

from . import flash_attention, fusion, kmeans, knn

__all__ = ["knn", "fusion", "kmeans", "flash_attention"]
