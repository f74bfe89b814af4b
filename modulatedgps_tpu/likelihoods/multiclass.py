"""MultiClass likelihood with RobustMax inverse link.

Parity target: gpflow.likelihoods.{MultiClass, RobustMax} as constructed at
reference demos/demo_tf2_modified_multiclass.py:43-44 and
demos/demo_john_doe_multi_class.py:46-47.  The expected log-likelihood is

    E[log p(y|f)] = p * log(1-eps) + (1-p) * log(eps/(K-1))

with p = P(f_y is the argmax), computed by 1-D Gauss-Hermite quadrature over
the selected latent crossed with normal CDFs of the others.  All class
products are vectorized over the K axis (VPU) — no per-class Python loops.

Shapes: Fmu/Fvar [..., N, K]; Y [N, 1] integer labels.  Returns [..., N, 1]
(the shape the reference's BroadcastingLikelihood produces, so the
downstream ``* W`` + sum-over-K step is weight-sum-normalized identically).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.quadrature import gauss_hermite_points
from ..params import static_field
from .base import Likelihood

__all__ = ["MultiClass", "RobustMax"]


class RobustMax(Likelihood):
    """P(y=c|f) = 1-eps if f_c = max(f) else eps/(K-1)."""

    num_classes: int = static_field(default=2)
    epsilon: float = static_field(default=1e-3)

    def prob_is_largest(self, Y, Fmu, Fvar, num_points: int = 20):
        """P(f_c > f_j  ∀ j≠c) for c = Y, under independent N(Fmu, Fvar).

        Quadrature form (gpflow RobustMax.prob_is_largest parity):
        ∫ N(x; mu_c, var_c) Π_{j≠c} Φ((x-mu_j)/σ_j) dx.
        """
        dtype = Fmu.dtype
        K = self.num_classes
        gh_x, gh_w = gauss_hermite_points(num_points, dtype)

        labels = (Y[..., 0] if Y.shape[-1] == 1 else Y).astype(jnp.int32)
        oh_on = jax.nn.one_hot(labels, K, dtype=dtype)           # [N, K]
        oh_off = 1.0 - oh_on

        mu_sel = jnp.sum(oh_on * Fmu, axis=-1)                   # [..., N]
        var_sel = jnp.sum(oh_on * Fvar, axis=-1)

        # GH grid on the selected latent: [..., N, P]
        X = mu_sel[..., None] + gh_x * jnp.sqrt(
            jnp.clip(2.0 * var_sel, 1e-10, None))[..., None]

        # CDFs of every latent at every grid point: [..., N, K, P]
        dist = (X[..., None, :] - Fmu[..., None]) / jnp.sqrt(
            jnp.clip(Fvar, 1e-10, None))[..., None]
        cdfs = 0.5 * (1.0 + jax.lax.erf(dist / jnp.sqrt(jnp.asarray(2.0, dtype))))
        cdfs = cdfs * (1 - 2e-4) + 1e-4
        # Blank the selected latent's own CDF out of the product.
        cdfs = cdfs * oh_off[..., None] + oh_on[..., None]

        w = gh_w / jnp.sqrt(jnp.asarray(np.pi, dtype))
        return jnp.sum(jnp.prod(cdfs, axis=-2) * w, axis=-1)     # [..., N]

    @property
    def eps_k1(self):
        return self.epsilon / (self.num_classes - 1.0)


class MultiClass(Likelihood):
    num_classes: int = static_field(default=2)
    invlink: RobustMax = static_field(default=None)
    num_gauss_hermite_points: int = static_field(default=20)

    @classmethod
    def create(cls, num_classes: int, invlink: RobustMax | None = None,
               num_gauss_hermite_points: int = 20) -> "MultiClass":
        if invlink is None:
            invlink = RobustMax(num_classes=num_classes)
        return cls(num_classes=num_classes, invlink=invlink,
                   num_gauss_hermite_points=num_gauss_hermite_points)

    def log_prob(self, F, Y):
        labels = Y[..., 0].astype(jnp.int32)
        hits = jnp.argmax(F, axis=-1) == labels
        yes = jnp.asarray(1.0 - self.invlink.epsilon, F.dtype)
        no = jnp.asarray(self.invlink.eps_k1, F.dtype)
        return jnp.log(jnp.where(hits, yes, no))[..., None]

    def variational_expectations(self, Fmu, Fvar, Y):
        p = self.invlink.prob_is_largest(Y, Fmu, Fvar,
                                         self.num_gauss_hermite_points)
        # float(...): weak-typed constants — np.float64 scalars would promote
        # f32 operands to f64 under jax_enable_x64 (see likelihoods/gaussian.py).
        ve = (p * float(np.log(1.0 - self.invlink.epsilon))
              + (1.0 - p) * float(np.log(self.invlink.eps_k1)))
        return ve[..., None]                                      # [..., N, 1]

    def predict_mean_and_var(self, Fmu, Fvar):
        """Expected class probabilities under RobustMax: for each class c,
        (1-eps) P(f_c max) + eps/(K-1) (1 - P(f_c max))."""
        K = self.num_classes
        ps = []
        for c in range(K):   # static K (2..4 in demos); unrolled at trace time
            Yc = jnp.full(Fmu.shape[:-1] + (1,), c, dtype=jnp.int32)
            p = self.invlink.prob_is_largest(Yc, Fmu, Fvar,
                                             self.num_gauss_hermite_points)
            ps.append(p * (1.0 - self.invlink.epsilon)
                      + (1.0 - p) * self.invlink.eps_k1)
        mean = jnp.stack(ps, axis=-1)
        return mean, mean - jnp.square(mean)

    def predict_log_density(self, Fmu, Fvar, Y):
        p = self.invlink.prob_is_largest(Y, Fmu, Fvar,
                                         self.num_gauss_hermite_points)
        den = p * (1.0 - self.invlink.epsilon) + (1.0 - p) * self.invlink.eps_k1
        return jnp.log(den)
