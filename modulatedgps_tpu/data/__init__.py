from .datasets import (
    load_toy_multimodal_data,
    load_toy_data_categorical,
    load_toy_data_assoc,
    load_toy_2d_data,
    load_toy_2d_data_categorical,
    load_john_doe_runs,
    load_john_doe,
)
from .loader import minibatch_iterator

__all__ = [
    "load_toy_multimodal_data",
    "load_toy_data_categorical",
    "load_toy_data_assoc",
    "load_toy_2d_data",
    "load_toy_2d_data_categorical",
    "load_john_doe_runs",
    "load_john_doe",
    "minibatch_iterator",
]
