"""Mesh sharding tests on the 8-virtual-CPU-device mesh (SURVEY.md §4:
"multi-device tests runnable without a pod").

Key property: the psum'd data-parallel ELBO matches the single-device ELBO
(bit-level in fp64 up to reduction order), and sharded training steps stay
finite and improve the ELBO.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from modulatedgps_tpu.ops.kernels import SquaredExponential
from modulatedgps_tpu.likelihoods import Gaussian
from modulatedgps_tpu.models import SVGP, SMGP
from modulatedgps_tpu.parallel import (
    make_mesh, shard_batch, replicate_state, expert_shard_state,
    make_parallel_train_step, data_parallel_elbo)


def _model(rng, K=8, M=16, N=64, D=2):
    X = rng.uniform(-3, 3, size=(N, D))
    Y = rng.normal(size=(N, 1))
    lik = Gaussian.create(variance=0.5, D=K)
    mk = lambda v, l, seed: SVGP.create(
        SquaredExponential.create(v, l),
        rng.normal(size=(M, D)), num_latent_gps=K)
    model = SMGP(likelihood=lik, pred_layer=mk(0.5, 0.5, 0),
                 assign_layer=mk(0.1, 1.0, 1), K=K, num_samples=5, num_data=N)
    return model, jnp.asarray(X), jnp.asarray(Y)


def test_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.shape == {"data": 8, "expert": 1}
    m2 = make_mesh(num_data=4, num_expert=2)
    assert m2.shape == {"data": 4, "expert": 2}
    with pytest.raises(ValueError):
        make_mesh(num_data=3, num_expert=2)


def test_data_parallel_elbo_matches_single_device(rng):
    model, X, Y = _model(rng)
    mesh = make_mesh(num_data=8)
    key = jax.random.PRNGKey(0)
    # single-device value via the same noise path
    z, g = model.draw_noise(key, X.shape[0], model.num_samples, X.dtype)
    single = float(jnp.mean(model.E_log_p_Y_from_noise(X, Y, z, g))
                   - (model.pred_layer.prior_kl()
                      + model.assign_layer.prior_kl()) / model.num_data)
    Xs, Ys = shard_batch(mesh, X, Y)
    model_r = replicate_state(mesh, model)
    sharded = float(data_parallel_elbo(model_r, key, Xs, Ys, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-12)
    # and it matches model.elbo with the same key (same noise derivation)
    np.testing.assert_allclose(float(model.elbo(key, X, Y)), single, rtol=1e-12)


def test_gspmd_training_step_replicated(rng):
    model, X, Y = _model(rng)
    mesh = make_mesh(num_data=8)
    init_fn, step_fn = make_parallel_train_step(
        optax.adam(1e-2), mesh, K=model.K, donate=False)
    state = init_fn(model, jax.random.PRNGKey(0))
    Xs, Ys = shard_batch(mesh, X, Y)
    losses = []
    for _ in range(10):
        state, loss = step_fn(state, Xs, Ys)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_gspmd_step_matches_single_device_step(rng):
    """One sharded GSPMD step == one unsharded step (same key), fp64."""
    from modulatedgps_tpu.training import make_train_step
    model, X, Y = _model(rng)
    opt = optax.adam(1e-2)
    init_u, step_u = make_train_step(opt)
    su = init_u(model, jax.random.PRNGKey(3))
    su, loss_u = jax.jit(step_u)(su, X, Y)

    mesh = make_mesh(num_data=8)
    init_s, step_s = make_parallel_train_step(opt, mesh, K=model.K, donate=False)
    ss = init_s(model, jax.random.PRNGKey(3))
    Xs, Ys = shard_batch(mesh, X, Y)
    ss, loss_s = step_s(ss, Xs, Ys)

    np.testing.assert_allclose(float(loss_u), float(loss_s), rtol=1e-10)
    for lu, ls in zip(jax.tree_util.tree_leaves(su.model),
                      jax.tree_util.tree_leaves(ss.model)):
        np.testing.assert_allclose(np.asarray(lu), np.asarray(ls),
                                   rtol=1e-8, atol=1e-10)


def test_expert_sharding_placement(rng):
    model, X, Y = _model(rng, K=8)
    mesh = make_mesh(num_data=2, num_expert=4)
    state = expert_shard_state(mesh, model, K=8)
    qmu_shard = state.pred_layer.q_mu.raw.sharding
    assert qmu_shard.spec == jax.sharding.PartitionSpec(None, "expert")
    qsqrt_shard = state.pred_layer.q_sqrt.raw.sharding
    assert qsqrt_shard.spec == jax.sharding.PartitionSpec("expert", None, None)
    # kernel hypers stay replicated
    assert state.pred_layer.kernel.variance.raw.sharding.spec == \
        jax.sharding.PartitionSpec()


def test_expert_sharding_degrades_to_replication(rng):
    """K=3 doesn't divide expert=4 -> graceful replication (SURVEY §7.3)."""
    model, X, Y = _model(rng, K=3)
    mesh = make_mesh(num_data=2, num_expert=4)
    state = expert_shard_state(mesh, model, K=3)
    assert state.pred_layer.q_mu.raw.sharding.spec == \
        jax.sharding.PartitionSpec()


def test_expert_sharded_training_runs(rng):
    model, X, Y = _model(rng, K=8)
    mesh = make_mesh(num_data=2, num_expert=4)
    init_fn, step_fn = make_parallel_train_step(
        optax.adam(1e-2), mesh, K=8, shard_experts=True, donate=False)
    state = init_fn(model, jax.random.PRNGKey(0))
    Xs, Ys = shard_batch(mesh, X, Y)
    state, l0 = step_fn(state, Xs, Ys)
    state, l1 = step_fn(state, Xs, Ys)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    # placement preserved across steps
    assert state.model.pred_layer.q_mu.raw.sharding.spec == \
        jax.sharding.PartitionSpec(None, "expert")


def test_data_parallel_hlo_has_exactly_one_collective(rng):
    """Structural shardability audit (SCALING_r03.json): the compiled
    8-device production train step (fast solves) must contain exactly one
    collective — the gradient all-reduce — and in particular NO all-gather
    of the [M, N_global] Kmn panel (the r2 weak-scaling regression came
    from XLA having no partitioned sharding rule for triangular_solve's
    RHS, which replicated the solves on every device)."""
    import re
    from modulatedgps_tpu.ops import linalg
    model, X, Y = _model(rng, K=8, M=32, N=128)
    mesh = make_mesh(num_data=len(jax.devices()), num_expert=1)
    linalg.set_fast_solves(True)
    try:
        init_fn, step_fn = make_parallel_train_step(
            optax.adam(1e-2), mesh, K=8, donate=False)
        state = init_fn(model, jax.random.PRNGKey(0))
        Xs, Ys = shard_batch(mesh, X, Y)
        hlo = step_fn.lower(state, Xs, Ys).compile().as_text()
    finally:
        linalg.set_fast_solves(False)
    counts = {}
    for op in ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter"):
        counts[op] = len(re.findall(op + r"\(", hlo))
    assert counts["all-gather"] == 0, counts
    assert counts["all-to-all"] == 0, counts
    assert counts["all-reduce"] == 1, counts
