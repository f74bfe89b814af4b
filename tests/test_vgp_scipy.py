"""VGP model + Scipy (L-BFGS) optimizer.

Covers the surface the reference exercises only through its from_online
sanity demos (reference demos/from_online/demo_SVGP_bernoulli.py: VGP +
Bernoulli + gpflow.optimizers.Scipy; demo_multiclass_lik.py: set_trainable
freezing under Scipy).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from modulatedgps_tpu.models import VGP
from modulatedgps_tpu.ops.kernels import SquaredExponential
from modulatedgps_tpu.likelihoods import Bernoulli, Gaussian
from modulatedgps_tpu.params import Module, Parameter, set_trainable
from modulatedgps_tpu.training import run_scipy


def _toy_regression(n=20, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(-3, 3, (n, 1)), axis=0)
    Y = np.sin(X) + 0.1 * rng.standard_normal((n, 1))
    return X, Y


def _exact_gpr_lml(kernel, noise_var, X, Y):
    """Exact GP-regression log marginal likelihood (the ELBO's supremum
    for a conjugate Gaussian likelihood)."""
    n = X.shape[0]
    K = np.asarray(kernel.K(jnp.asarray(X))) + noise_var * np.eye(n)
    L = np.linalg.cholesky(K)
    a = np.linalg.solve(L, Y)
    return float(-0.5 * np.sum(a ** 2) - np.sum(np.log(np.diag(L)))
                 - 0.5 * n * np.log(2 * np.pi))


class TestVGP:
    def test_init_kl_zero_and_elbo_finite(self):
        X, Y = _toy_regression()
        m = VGP.create(SquaredExponential.create(1.0, 1.0),
                       Gaussian.create(0.1), X, Y)
        assert float(m.prior_kl()) == pytest.approx(0.0, abs=1e-10)
        assert np.isfinite(float(m.elbo()))

    def test_elbo_reaches_exact_gpr_marginal(self):
        """With a conjugate Gaussian likelihood the optimal q(f) is exact,
        so the converged ELBO must equal the GPR log marginal likelihood
        with the same (frozen) hyperparameters."""
        X, Y = _toy_regression()
        kern = SquaredExponential.create(1.0, 1.0)
        kern = kern.replace(variance=set_trainable(kern.variance, False),
                            lengthscales=set_trainable(kern.lengthscales, False))
        lik = Gaussian.create(0.1)
        lik = lik.replace(variance=set_trainable(lik.variance, False))
        m = VGP.create(kern, lik, X, Y)
        m, res = run_scipy(m, maxiter=800)
        lml = _exact_gpr_lml(kern, 0.1, X, Y)
        assert float(m.elbo()) == pytest.approx(lml, abs=2e-4)
        # Converged ELBO can never exceed the marginal likelihood.
        assert float(m.elbo()) <= lml + 1e-6

    def test_predict_f_training_points_match_q_moments(self):
        X, Y = _toy_regression()
        m = VGP.create(SquaredExponential.create(1.0, 1.0),
                       Gaussian.create(0.1), X, Y)
        key = jax.random.PRNGKey(1)
        m = m.replace(
            q_mu=Parameter(jax.random.normal(key, m.q_mu.shape,
                                             m.q_mu.dtype) * 0.3),
            q_sqrt=m.q_sqrt)
        fm1, fv1 = m.q_moments()
        fm2, fv2 = m.predict_f(jnp.asarray(X, m.X.dtype))
        # predict_f routes through the jittered conditional (Kmm has jitter,
        # Kmn does not) while q_moments is solve-free; on an ill-conditioned
        # SE Gram matrix the two agree only to ~sqrt(jitter) scale.
        np.testing.assert_allclose(np.asarray(fm1), np.asarray(fm2),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(fv1), np.asarray(fv2),
                                   atol=1e-3)

    def test_vgp_bernoulli_classifies_reference_dataset(self):
        """The 7-point dataset of reference
        demos/from_online/demo_SVGP_bernoulli.py:36-40."""
        X = np.array([2.0, 4, 7, 9, 17, 19, 21])[:, None]
        Y = np.array([1.0, 1, 1, 1, 0, 0, 0])[:, None]
        m = VGP.create(SquaredExponential.create(1.0, 1.0), Bernoulli(), X, Y)
        elbo0 = float(m.elbo())
        m, _ = run_scipy(m, maxiter=500)
        assert float(m.elbo()) > elbo0
        p, _ = m.predict_y(jnp.asarray(X, m.X.dtype))
        p = np.asarray(p).ravel()
        assert np.all(p[:4] > 0.5) and np.all(p[4:] < 0.5)


class TestRunScipy:
    def test_frozen_parameters_untouched(self):
        X, Y = _toy_regression()
        kern = SquaredExponential.create(2.0, 0.7)
        kern = kern.replace(lengthscales=set_trainable(kern.lengthscales, False))
        m = VGP.create(kern, Gaussian.create(0.1), X, Y)
        raw_before = np.asarray(m.kernel.lengthscales.raw)
        m_opt, _ = run_scipy(m, maxiter=50)
        np.testing.assert_array_equal(
            np.asarray(m_opt.kernel.lengthscales.raw), raw_before)
        # Trainable leaves did move.
        assert not np.allclose(np.asarray(m_opt.q_mu.raw),
                               np.asarray(m.q_mu.raw))

    def test_custom_loss_and_convergence(self):
        """L-BFGS on an anisotropic quadratic in Parameter space."""
        class Quad(Module):
            w: Parameter

        target = jnp.asarray([1.5, -2.0, 0.25])
        model = Quad(w=Parameter(jnp.zeros(3)))
        loss = lambda m: jnp.sum(jnp.square(m.w.value - target)
                                 * jnp.asarray([1.0, 10.0, 100.0]))
        model, res = run_scipy(model, loss, maxiter=200)
        np.testing.assert_allclose(np.asarray(model.w.value),
                                   np.asarray(target), atol=1e-6)
        assert res.success
