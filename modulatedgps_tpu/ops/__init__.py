from . import kernels, linalg, conditionals, kl, sampling, quadrature

__all__ = ["kernels", "linalg", "conditionals", "kl", "sampling", "quadrature"]
