"""Likelihood math vs closed forms and Monte-Carlo oracles."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import norm

from modulatedgps_tpu.likelihoods import Gaussian, Bernoulli, MultiClass, RobustMax


def test_gaussian_var_exp_closed_form(rng):
    """-0.5 log2π - 0.5 log σ² - 0.5((Y-μ)² + Var)/σ² (reference
    MixtureGPs/likelihoods.py:39-41), per-expert σ²."""
    K = 3
    lik = Gaussian.create(variance=0.5, D=K)
    Fmu = rng.normal(size=(7, K))
    Fvar = np.abs(rng.normal(size=(7, K)))
    Y = rng.normal(size=(7, 1))
    got = np.asarray(lik.variational_expectations(
        jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
    var = 0.5
    want = (-0.5 * np.log(2 * np.pi) - 0.5 * np.log(var)
            - 0.5 * ((Y - Fmu) ** 2 + Fvar) / var)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    assert got.shape == (7, K)


def test_gaussian_var_exp_equals_mc(rng):
    """Quadrature-free sanity: E_{f~N(mu,v)}[log N(y; f, s)] via MC."""
    lik = Gaussian.create(variance=0.3)
    mu, v, y = 0.4, 0.7, -0.2
    got = np.asarray(lik.variational_expectations(
        jnp.asarray([[mu]]), jnp.asarray([[v]]), jnp.asarray([[y]]))).item()
    f = np.random.default_rng(1).normal(mu, np.sqrt(v), 400000)
    mc = np.mean(norm.logpdf(y, loc=f, scale=np.sqrt(0.3)))
    np.testing.assert_allclose(got, mc, atol=2e-2)


def test_gaussian_predict_mean_var(rng):
    K = 2
    lik = Gaussian.create(variance=0.25, D=K)
    Fmu = rng.normal(size=(5, K))
    Fvar = np.abs(rng.normal(size=(5, K)))
    m, v = lik.predict_mean_and_var(jnp.asarray(Fmu), jnp.asarray(Fvar))
    np.testing.assert_allclose(np.asarray(m), Fmu)
    np.testing.assert_allclose(np.asarray(v), Fvar + 0.25, rtol=1e-10)


def test_gaussian_per_expert_variance_broadcast(rng):
    """D=K variances must broadcast over the expert axis independently."""
    lik = Gaussian.create(variance=1.0, D=3)
    raw = lik.variance.raw
    lik = lik.replace(variance=lik.variance.replace_raw(
        raw + jnp.asarray([[0.0, 1.0, 2.0]])))
    var = np.asarray(lik.variance.value)[0]
    assert var[0] != var[1] != var[2]
    Fmu = jnp.zeros((4, 3))
    Fvar = jnp.ones((4, 3))
    _, v = lik.predict_mean_and_var(Fmu, Fvar)
    np.testing.assert_allclose(np.asarray(v),
                               np.broadcast_to(1.0 + var[None, :], (4, 3)),
                               rtol=1e-10)


def test_bernoulli_predict_closed_form(rng):
    lik = Bernoulli()
    Fmu = rng.normal(size=(6, 1))
    Fvar = np.abs(rng.normal(size=(6, 1)))
    p, v = lik.predict_mean_and_var(jnp.asarray(Fmu), jnp.asarray(Fvar))
    jitter = 1e-3
    want = norm.cdf(Fmu / np.sqrt(1 + Fvar)) * (1 - 2 * jitter) + jitter
    np.testing.assert_allclose(np.asarray(p), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v), want - want ** 2, rtol=1e-6)


def test_bernoulli_var_exp_vs_mc(rng):
    lik = Bernoulli()
    mu, var = 0.3, 0.8
    got = np.asarray(lik.variational_expectations(
        jnp.asarray([[mu]]), jnp.asarray([[var]]), jnp.asarray([[1.0]]))).item()
    f = np.random.default_rng(2).normal(mu, np.sqrt(var), 400000)
    jitter = 1e-3
    p = norm.cdf(f) * (1 - 2 * jitter) + jitter
    mc = np.mean(np.log(p))
    np.testing.assert_allclose(got, mc, atol=5e-3)


def test_robustmax_prob_is_largest_vs_mc(rng):
    """Quadrature P(f_c max) vs brute-force Monte Carlo."""
    K = 3
    inv = RobustMax(num_classes=K)
    Fmu = np.array([[0.5, -0.2, 0.1], [1.5, 1.4, -2.0]])
    Fvar = np.array([[0.3, 0.5, 0.2], [1.0, 0.1, 0.4]])
    Y = np.array([[0], [1]])
    got = np.asarray(inv.prob_is_largest(jnp.asarray(Y), jnp.asarray(Fmu),
                                         jnp.asarray(Fvar)))
    g = np.random.default_rng(3)
    S = 400000
    for n in range(2):
        f = g.normal(Fmu[n], np.sqrt(Fvar[n]), size=(S, K))
        mc = np.mean(np.argmax(f, axis=1) == Y[n, 0])
        np.testing.assert_allclose(got[n], mc, atol=5e-3)


def test_multiclass_var_exp_formula(rng):
    K = 2
    lik = MultiClass.create(K)
    Fmu = rng.normal(size=(5, K))
    Fvar = np.abs(rng.normal(size=(5, K)))
    Y = rng.integers(0, K, size=(5, 1))
    ve = np.asarray(lik.variational_expectations(
        jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
    assert ve.shape == (5, 1)
    p = np.asarray(lik.invlink.prob_is_largest(
        jnp.asarray(Y), jnp.asarray(Fmu), jnp.asarray(Fvar)))
    eps = 1e-3
    want = p * np.log(1 - eps) + (1 - p) * np.log(eps / (K - 1))
    np.testing.assert_allclose(ve[:, 0], want, rtol=1e-8)


def test_multiclass_predict_probs_sum_near_one(rng):
    K = 3
    lik = MultiClass.create(K)
    Fmu = rng.normal(size=(8, K))
    Fvar = np.abs(rng.normal(size=(8, K))) + 0.1
    p, v = lik.predict_mean_and_var(jnp.asarray(Fmu), jnp.asarray(Fvar))
    p = np.asarray(p)
    assert p.shape == (8, K)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=2e-3)
    assert np.all(np.asarray(v) >= 0)


def test_multiclass_batched_leading_dims(rng):
    """[S, N, K] inputs with [N, 1] labels must broadcast (the shape contract
    the reference gets via BroadcastingLikelihood)."""
    K = 2
    lik = MultiClass.create(K)
    Fmu = rng.normal(size=(4, 6, K))
    Fvar = np.abs(rng.normal(size=(4, 6, K)))
    Y = rng.integers(0, K, size=(6, 1))
    ve = np.asarray(lik.variational_expectations(
        jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
    assert ve.shape == (4, 6, 1)
    ve0 = np.asarray(lik.variational_expectations(
        jnp.asarray(Fmu[2]), jnp.asarray(Fvar[2]), jnp.asarray(Y)))
    np.testing.assert_allclose(ve[2], ve0, rtol=1e-12)
