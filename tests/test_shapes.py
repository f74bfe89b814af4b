"""Runtime shape contracts (utils/shapes.py — the check_shapes analog,
reference MixtureGPs/models.py:4,128)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from modulatedgps_tpu.utils.shapes import ShapeChecker, check_shape
from modulatedgps_tpu.utils.shapes import ShapeError


def test_binds_and_detects_conflicts():
    chk = ShapeChecker()
    chk.check(jnp.zeros((5, 2)), "N D", "X")
    chk.check(jnp.zeros((5, 1)), "N 1", "Y")
    with pytest.raises(ShapeError, match="conflicts"):
        chk.check(jnp.zeros((4, 1)), "N 1", "Y2")


def test_rank_pin_and_wildcards():
    check_shape(jnp.zeros((3, 4, 5)), "... N D")
    check_shape(jnp.zeros((4, 5)), ". .")
    with pytest.raises(ShapeError, match="rank"):
        check_shape(jnp.zeros((4,)), "N D")
    with pytest.raises(ShapeError, match="pinned"):
        check_shape(jnp.zeros((4, 2)), "N 1")


def test_model_boundaries_raise_loudly(rng):
    from modulatedgps_tpu.models import SVGP, SMGP
    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian

    Z = rng.normal(size=(8, 2))
    svgp = SVGP.create(SquaredExponential.create(), Z, num_latent_gps=3)
    with pytest.raises(ShapeError):   # wrong feature dim
        svgp.predict_f(jnp.zeros((10, 3)))

    model = SMGP(likelihood=Gaussian.create(0.5, D=3),
                 pred_layer=svgp,
                 assign_layer=SVGP.create(SquaredExponential.create(), Z,
                                          num_latent_gps=3),
                 K=3, num_samples=4, num_data=100)
    key = jax.random.PRNGKey(0)
    with pytest.raises(ShapeError):   # Y rows != X rows
        model.elbo(key, jnp.zeros((10, 2)), jnp.zeros((9, 1)))
    with pytest.raises(ShapeError):   # Y passed as (N,)
        model.elbo(key, jnp.zeros((10, 2)), jnp.zeros((10,)))


def test_checks_are_free_under_jit(rng):
    """Contracts run at trace time only — the jitted fn stays shape-checked
    but pays nothing per call."""
    from modulatedgps_tpu.models import SVGP
    from modulatedgps_tpu.ops.kernels import SquaredExponential

    svgp = SVGP.create(SquaredExponential.create(), rng.normal(size=(8, 2)))
    f = jax.jit(lambda m, X: m.predict_f(X)[0])
    out = f(svgp, jnp.zeros((10, 2)))
    assert out.shape == (10, 1)
    with pytest.raises(ShapeError):
        f(svgp, jnp.zeros((10, 5)))
