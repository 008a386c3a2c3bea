"""Device ops: fused kNN kernels, fusion, k-means."""

from . import fusion, kmeans, knn

__all__ = ["knn", "fusion", "kmeans"]
