"""Mesh-sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4: the JAX analogue
of the reference's "no real cluster" CI approach).

Installing a global mesh must not change any result: the pool axes (GP restarts,
acquisition seed candidates, multi-start L-BFGS runs) are embarrassingly parallel, so
sharded and unsharded execution differ only by floating-point reduction order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import mk_dataset
from trieste_tpu.acquisition.function.continuous_thompson_sampling import (
    ParallelContinuousThompsonSampling,
)
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.bayesian_optimizer import BayesianOptimizer
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.models.gp.training import fit_gpr
from trieste_tpu.objectives import SimpleQuadratic, mk_observer
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.parallel import (
    create_mesh,
    current_pool_sharding,
    get_global_mesh,
    global_mesh,
    pool_sharding,
    round_to_mesh,
)


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return create_mesh(8)


def _training_data(key, n=20, d=2):
    X = jax.random.uniform(key, (n, d))
    Y = jnp.sum(jnp.square(X - 0.4), axis=-1, keepdims=True)
    return mk_dataset(X, Y)


def test_mesh_context_and_rounding(mesh):
    assert get_global_mesh() is None
    assert round_to_mesh(5) == 5
    with global_mesh(mesh):
        assert get_global_mesh() is mesh
        assert round_to_mesh(5) == 8
        assert round_to_mesh(8) == 8
        assert round_to_mesh(9) == 16
        assert current_pool_sharding() is not None
    assert get_global_mesh() is None
    assert current_pool_sharding() is None


def test_fit_gpr_sharded_matches_unsharded(mesh, key):
    ds = _training_data(key)
    from trieste_tpu.models.gp.builders import default_gpr_params
    from trieste_tpu.space import Box

    space = Box(jnp.zeros(2), jnp.ones(2))
    params = default_gpr_params(ds, space)
    kwargs = dict(num_starts=16, max_iters=60)
    base = fit_gpr(key, params, ds.query_points, ds.observations, ds.mask, **kwargs)
    sharded = fit_gpr(
        key, params, ds.query_points, ds.observations, ds.mask,
        pool_sharding=pool_sharding(mesh), **kwargs,
    )
    np.testing.assert_allclose(base.loss, sharded.loss, rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(base.params), jax.tree_util.tree_leaves(sharded.params)
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


def test_continuous_optimizer_sharded_matches_unsharded(mesh, key):
    from trieste_tpu.space import Box

    space = Box(jnp.zeros(3), jnp.ones(3))

    def acq(x):  # smooth multi-modal surface, maximum inside the box
        x = jnp.asarray(x)[..., 0, :]
        return (
            -jnp.sum(jnp.square(x - 0.3), axis=-1, keepdims=True)
            + 0.1 * jnp.sum(jnp.cos(8 * x), axis=-1, keepdims=True)
        )

    opt = generate_continuous_optimizer(num_initial_samples=128, num_optimization_runs=8)
    base = opt(space, acq, key=key)
    with global_mesh(mesh):
        sharded = opt(space, acq, key=key)
    np.testing.assert_allclose(base, sharded, rtol=1e-6, atol=1e-8)


def test_bo_loop_sharded_matches_unsharded(mesh):
    problem = SimpleQuadratic
    observer = mk_observer(problem.objective)
    space = problem.search_space

    def run():
        k_init, k_opt = jax.random.split(jax.random.PRNGKey(7))
        X = space.sample(k_init, 5)
        ds = observer(X)
        model = build_gpr(ds, space, likelihood_variance=1e-5, num_kernel_samples=8)
        rule = EfficientGlobalOptimization(
            optimizer=generate_continuous_optimizer(
                num_initial_samples=128, num_optimization_runs=8
            )
        )
        result = BayesianOptimizer(observer, space).optimize(
            2, ds, model, rule, track_state=False, key=k_opt
        )
        return result.final_result.unwrap().datasets[OBJECTIVE]

    base = run()
    with global_mesh(mesh):
        sharded = run()
    np.testing.assert_allclose(
        base.trimmed_query_points, sharded.trimmed_query_points, rtol=1e-4, atol=1e-6
    )


def test_pcts_sharded_matches_unsharded(mesh, key):
    problem = SimpleQuadratic
    space = problem.search_space
    k_init, k_acq = jax.random.split(key)
    X = space.sample(k_init, 6)
    ds = mk_dataset(X, problem.objective(X))

    def acquire():
        model = build_gpr(ds, space, likelihood_variance=1e-5)
        rule = EfficientGlobalOptimization(
            ParallelContinuousThompsonSampling(),
            optimizer=generate_continuous_optimizer(
                num_initial_samples=64, num_optimization_runs=8
            ),
            num_query_points=4,
        )
        return rule.acquire_single(space, model, ds, key=k_acq)

    base = acquire()
    with global_mesh(mesh):
        sharded = acquire()
    assert base.shape == (4, 2)
    np.testing.assert_allclose(base, sharded, rtol=1e-4, atol=1e-6)


def test_optimizer_rounds_pools_to_mesh(mesh, key):
    """Pool sizes indivisible by the mesh are rounded up, not rejected."""
    from trieste_tpu.space import Box

    space = Box(jnp.zeros(2), jnp.ones(2))

    def acq(x):
        x = jnp.asarray(x)[..., 0, :]
        return -jnp.sum(jnp.square(x - 0.6), axis=-1, keepdims=True)

    opt = generate_continuous_optimizer(num_initial_samples=100, num_optimization_runs=5)
    with global_mesh(mesh):
        point = opt(space, acq, key=key)
    np.testing.assert_allclose(point, jnp.full((1, 2), 0.6), atol=1e-3)


def test_mc_sample_axis_sharded_matches_unsharded(mesh, key):
    """qEI-style MC sampling at a single batch shards the sample axis S; results must
    match unsharded execution exactly (same base draws, psum mean)."""
    from trieste_tpu.acquisition.function.function import (
        BatchMonteCarloExpectedImprovement,
    )
    from trieste_tpu.observer import OBJECTIVE

    problem = SimpleQuadratic
    space = problem.search_space
    k_init, k_eval = jax.random.split(key)
    X = space.sample(k_init, 6)
    ds = mk_dataset(X, problem.objective(X))
    model = build_gpr(ds, space, likelihood_variance=1e-5)
    builder = BatchMonteCarloExpectedImprovement(sample_size=256)
    xs = space.sample(k_eval, 4)[:, None, :]  # [4, 1, D]

    fn = builder.prepare_acquisition_function(model, ds)
    base = fn(xs)
    with global_mesh(mesh):
        fn_sharded = builder.prepare_acquisition_function(model, ds)
        sharded = fn_sharded(xs)
    np.testing.assert_allclose(base, sharded, rtol=1e-5, atol=1e-8)


def test_hmc_chains_sharded_matches_unsharded(mesh, key):
    """HMC hyperparameter chains are lockstep-vmapped; sharding the chain axis over the
    mesh must not change the retained samples (chain count divides the mesh)."""
    from trieste_tpu.models.gp import build_gpr_mcmc
    from trieste_tpu.space import Box

    ds = _training_data(key, n=10)
    space = Box(jnp.zeros(2), jnp.ones(2))

    def run():
        model = build_gpr_mcmc(
            ds, space, num_chains=8, num_samples_per_chain=5, num_warmup=10,
            optimize_key=jax.random.PRNGKey(3),
        )
        model.optimize(ds)
        return model.params_stack

    base = run()
    with global_mesh(mesh):
        sharded = run()
    for a, b in zip(jax.tree_util.tree_leaves(base), jax.tree_util.tree_leaves(sharded)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_fit_gpr_compiles_with_sharded_pool(mesh, key):
    """Loud sharding-regression detector: the compiled HLO of a mesh-sharded fit must
    carry 8-device sharding annotations (a throughput assertion is meaningless on a
    2-core CI host emulating 8 devices — see scripts/measure_scaling.py for the
    measured curve)."""
    ds = _training_data(key)
    from trieste_tpu.models.gp.builders import default_gpr_params
    from trieste_tpu.space import Box

    space = Box(jnp.zeros(2), jnp.ones(2))
    params = default_gpr_params(ds, space)
    lowered = jax.jit(
        lambda k, p, X, Y, m: fit_gpr(
            k, p, X, Y, m, num_starts=16, max_iters=10,
            pool_sharding=pool_sharding(mesh),
        )
    ).lower(key, params, ds.query_points, ds.observations, ds.mask)
    text = lowered.compile().as_text()
    assert "devices=[8" in text or "sharding" in text, "no sharding in compiled HLO"
