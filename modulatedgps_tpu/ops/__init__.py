from . import (kernels, linalg, conditionals, kl, sampling, quadrature,
               mean_functions)

__all__ = ["kernels", "linalg", "conditionals", "kl", "sampling",
           "quadrature", "mean_functions"]
