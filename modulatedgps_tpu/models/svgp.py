"""Sparse variational GP layer (inducing points, whitened posterior).

Rebuilds the surface of gpflow.models.SVGP + the reference's modified
posterior (reference MixtureGPs/models.py:126-160): Kmn is built directly as
kernel.K(Z, Xnew) and Kmm = K(Z,Z) + jitter*I.  State is an explicit pytree:
Z [M, D], q_mu [M, K], q_sqrt [K, M, M] lower-triangular (init: K stacked
identities, gpflow SVGP.__init__ parity — reference demos/demo_tf2.py:43-46).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_float, default_jitter
from ..ops.conditionals import base_conditional, expand_independent_outputs
from ..ops.kl import gauss_kl
from ..params import Module, Parameter, static_field
from ..ops.kernels import Kernel

__all__ = ["SVGP"]


class SVGP(Module):
    kernel: Kernel
    Z: Parameter          # inducing inputs [M, D]
    q_mu: Parameter       # variational means [M, K]
    q_sqrt: Parameter     # variational sqrt-cov, tril [K, M, M] or diag [M, K]
    mean_function: object = None   # None = Zero (gpflow default; the
    # reference passes SVGP.mean_function through its posterior,
    # reference MixtureGPs/models.py:156-158)
    whiten: bool = static_field(default=True)
    num_latent: int = static_field(default=1)

    @classmethod
    def create(cls, kernel: Kernel, inducing_points, num_latent_gps: int = 1,
               whiten: bool = True, q_diag: bool = False,
               mean_function=None, dtype=None) -> "SVGP":
        dtype = dtype or default_float()
        Z = jnp.asarray(inducing_points, dtype)
        M = Z.shape[0]
        K = num_latent_gps
        q_mu = jnp.zeros((M, K), dtype)
        if q_diag:
            q_sqrt = Parameter(jnp.ones((M, K), dtype), transform="positive")
        else:
            q_sqrt = Parameter(
                jnp.broadcast_to(jnp.eye(M, dtype=dtype), (K, M, M)).copy(),
                transform="tril")
        return cls(kernel=kernel, Z=Parameter(Z), q_mu=Parameter(q_mu),
                   q_sqrt=q_sqrt, mean_function=mean_function,
                   whiten=whiten, num_latent=K)

    @property
    def num_inducing(self) -> int:
        return self.Z.shape[0]

    def kuu(self, jitter: float | None = None) -> jax.Array:
        """K(Z,Z) + jitter*I — reference MixtureGPs/models.py:135."""
        Z = self.Z.value
        jit = default_jitter(Z.dtype) if jitter is None else jitter
        return self.kernel.K(Z) + jnp.asarray(jit, Z.dtype) * jnp.eye(
            Z.shape[0], dtype=Z.dtype)

    def predict_f(self, Xnew: jax.Array, *, full_cov: bool = False,
                  full_output_cov: bool = False):
        """Marginal posterior q(f(Xnew)).

        Xnew may carry leading batch dims [..., N, D]; the conditional is
        vmapped over them.  (The reference tiles X to [S, N, D] and redoes
        the whole conditional S times — reference MixtureGPs/models.py:35-36;
        callers here should instead predict once on [N, D] and broadcast,
        see models/smgp.py.)  ``full_output_cov`` applies the reference
        posterior's _post_process_mean_and_cov expansion (reference
        MixtureGPs/models.py:130,144): independent latents -> (block-)
        diagonal output covariance.
        """
        from ..utils.shapes import ShapeChecker
        chk = ShapeChecker()
        chk.check(self.Z.value, "M D", "Z")
        chk.check(Xnew, "... N D", "Xnew")
        if Xnew.ndim > 2:
            fn = lambda x: self.predict_f(x, full_cov=full_cov,
                                          full_output_cov=full_output_cov)
            for _ in range(Xnew.ndim - 2):
                fn = jax.vmap(fn)
            return fn(Xnew)
        Kmm = self.kuu()
        Kmn = self.kernel.K(self.Z.value, Xnew)        # fused convention, models.py:139
        Knn = self.kernel(Xnew, full_cov=full_cov)
        fmean, fvar = base_conditional(
            Kmn, Kmm, Knn, self.q_mu.value, q_sqrt=self.q_sqrt.value,
            full_cov=full_cov, white=self.whiten,
            # Parameter's "tril" transform already zeroed the upper
            # triangle; skip the defensive re-tril (a full [K, M, M]
            # pass each way at large M).
            assume_tril=self.q_sqrt.transform == "tril")
        if self.mean_function is not None:
            fmean = fmean + self.mean_function(Xnew)
        return fmean, expand_independent_outputs(fvar, full_cov,
                                                 full_output_cov)

    def predict_f_samples(self, key: jax.Array, Xnew: jax.Array,
                          num_samples: int = 1, *,
                          full_cov: bool = True) -> jax.Array:
        """Draws from the posterior q(f(Xnew)), shape [S, N, K].

        gpflow ``predict_f_samples`` parity: the default ``full_cov=True``
        draws from the JOINT posterior over Xnew (correlated, smooth
        function traces — what the reference's plot_kernel_samples shows
        via gpflow, reference utils/plotting_utils.py:11).  ``full_cov=
        False`` samples the marginals only (cheaper; white-noise-like
        traces when plotted as functions).
        """
        if not full_cov:
            mean, var = self.predict_f(Xnew, full_cov=False)
            z = jax.random.normal(key, (num_samples,) + mean.shape,
                                  dtype=mean.dtype)
            return mean + z * jnp.sqrt(jnp.maximum(var, 0.0)
                                       + default_jitter(mean.dtype))
        from ..ops.linalg import add_jitter, cholesky
        mean, var = self.predict_f(Xnew, full_cov=True)   # [N,K], [K,N,N]
        L = cholesky(add_jitter(var, default_jitter(mean.dtype)))
        z = jax.random.normal(
            key, (num_samples,) + var.shape[:-1] + (1,), dtype=mean.dtype)
        f = mean.T[None] + jnp.matmul(L[None], z)[..., 0]  # [S, K, N]
        return jnp.swapaxes(f, -1, -2)                     # [S, N, K]

    def prior_kl(self) -> jax.Array:
        """KL[q(u)||p(u)] — gpflow prior_kl parity (reference models.py:79)."""
        Kmm = None if self.whiten else self.kuu()
        return gauss_kl(self.q_mu.value, self.q_sqrt.value, Kmm,
                        assume_tril=self.q_sqrt.transform == "tril")
