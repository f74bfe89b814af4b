from .kmeans import kmeans_centers
from .metrics import MetricsLogger

__all__ = ["kmeans_centers", "MetricsLogger"]
