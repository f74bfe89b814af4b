from .kmeans import kmeans_centers
from .metrics import MetricsLogger
from .shapes import ShapeChecker, check_shape

__all__ = ["kmeans_centers", "MetricsLogger", "ShapeChecker", "check_shape"]
