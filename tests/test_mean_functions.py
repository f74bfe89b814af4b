"""Mean functions (ops/mean_functions.py) through SVGP / VGP / the
precomputed posterior (reference passes mean_function through its modified
posterior, MixtureGPs/models.py:156-158; gpflow default is Zero)."""
import numpy as np
import jax
import jax.numpy as jnp

from modulatedgps_tpu.models import SVGP, VGP, precompute_posterior
from modulatedgps_tpu.ops.kernels import SquaredExponential
from modulatedgps_tpu.ops.mean_functions import Constant, Linear, Zero
from modulatedgps_tpu.likelihoods import Gaussian
from modulatedgps_tpu.params import Parameter


def test_zero_and_constant_and_linear_values(rng):
    X = jnp.asarray(rng.normal(size=(7, 2)))
    np.testing.assert_array_equal(np.asarray(Zero()(X)), np.zeros((7, 1)))
    c = Constant.create([1.5, -2.0], output_dim=2)
    np.testing.assert_allclose(np.asarray(c(X)),
                               np.tile([1.5, -2.0], (7, 1)))
    A = rng.normal(size=(2, 3))
    lin = Linear.create(A, b=[0.1, 0.2, 0.3])
    np.testing.assert_allclose(np.asarray(lin(X)),
                               np.asarray(X) @ A + [0.1, 0.2, 0.3],
                               atol=1e-12)


def test_svgp_prior_mean_is_mean_function(rng):
    """At init (q_mu = 0, whitened) the posterior mean IS the mean fn."""
    Z = rng.normal(size=(10, 2))
    mf = Linear.create(rng.normal(size=(2, 3)), b=0.5)
    svgp = SVGP.create(SquaredExponential.create(), Z, num_latent_gps=3,
                       mean_function=mf)
    X = jnp.asarray(rng.normal(size=(20, 2)))
    fmean, _ = svgp.predict_f(X)
    np.testing.assert_allclose(np.asarray(fmean), np.asarray(mf(X)),
                               atol=1e-9)


def test_precomputed_posterior_carries_mean_function(rng):
    Z = rng.normal(size=(10, 2))
    mf = Constant.create(2.5)
    svgp = SVGP.create(SquaredExponential.create(), Z, mean_function=mf)
    svgp = svgp.replace(q_mu=Parameter(
        jax.random.normal(jax.random.PRNGKey(0), svgp.q_mu.shape,
                          svgp.q_mu.dtype)))
    X = jnp.asarray(rng.normal(size=(15, 2)))
    post = precompute_posterior(svgp)
    m1, v1 = svgp.predict_f(X)
    m2, v2 = post.predict_f(X)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-8)


def test_vgp_mean_function_shifts_posterior(rng):
    X = np.sort(rng.uniform(-2, 2, (15, 1)), axis=0)
    Y = 3.0 + 0.1 * rng.standard_normal((15, 1))
    mf = Constant.create(3.0)
    m = VGP.create(SquaredExponential.create(), Gaussian.create(0.1),
                   X, Y, mean_function=mf)
    # At init q(f) = prior: training-point mean equals the mean function.
    fm, _ = m.q_moments()
    np.testing.assert_allclose(np.asarray(fm), 3.0, atol=1e-9)
    assert np.isfinite(float(m.elbo()))
    # mean function parameters are trainable leaves
    from modulatedgps_tpu.params import trainable_mask
    leaves = jax.tree_util.tree_leaves(trainable_mask(m))
    assert any(leaves)
