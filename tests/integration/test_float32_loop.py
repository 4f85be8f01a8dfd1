"""Pure-float32 full-loop dtype discipline (reference
``tests/integration/test_bayesian_optimization.py:643-659``): the TPU compute path is
f32, so a complete GPR+EI loop must run end-to-end in f32 with no hidden f64 promotion.
The suite otherwise forces x64 (``tests/conftest.py``), so this test flips it off
locally and runs under strict dtype promotion — the JAX analogue of the reference's
``tf.cast`` trap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import SimpleQuadratic, mk_observer
from trieste_tpu.observer import OBJECTIVE


def _assert_all_f32(tree, what):
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, f"{what}: found {leaf.dtype} leaf"


def test_full_gpr_ei_loop_runs_in_pure_float32():
    with jax.enable_x64(False):
        problem = SimpleQuadratic
        space = problem.search_space
        observer = mk_observer(problem.objective)
        k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
        initial_data = observer(space.sample(k_init, 5))
        _assert_all_f32(initial_data, "initial data")

        model = build_gpr(
            initial_data, space, likelihood_variance=1e-5, trainable_likelihood=False
        )
        _assert_all_f32(model.params, "initial params")

        rule = EfficientGlobalOptimization(
            optimizer=generate_continuous_optimizer(
                num_initial_samples=256, num_optimization_runs=6
            )
        )
        # 6 steps = the reference's SimpleQuadratic fast envelope
        # (test_bayesian_optimization.py:325-330,629-633: every rule, <=6 steps,
        # rtol 0.05); the MAP-priors model (builders.py) explores ~1 lengthscale per
        # step and needs all 6 on this seed
        result = tt.BayesianOptimizer(observer, space).optimize(
            6, initial_data, model, rule, key=k_opt, track_state=False
        )
        assert result.is_ok, f"f32 loop errored: {result.final_result}"

        record = result.final_result.unwrap()
        _assert_all_f32(record.datasets[OBJECTIVE], "final dataset")
        _assert_all_f32(record.models[OBJECTIVE].params, "final params")
        _assert_all_f32(record.models[OBJECTIVE].posterior_cache, "posterior cache")

        # the loop must also make progress in f32
        best = float(jnp.min(record.datasets[OBJECTIVE].trimmed_observations))
        rel = abs(best - float(problem.minimum[0])) / abs(float(problem.minimum[0]))
        assert rel < 0.05, f"f32 loop did not converge: best {best}"


def test_float32_predictions_have_no_f64_leaks():
    """Model predictions and acquisition values stay f32 under strict promotion."""
    with jax.enable_x64(False):
        problem = SimpleQuadratic
        space = problem.search_space
        observer = mk_observer(problem.objective)
        ds = observer(space.sample(jax.random.PRNGKey(1), 6))
        model = build_gpr(ds, space, likelihood_variance=1e-5)
        model.optimize(ds)
        x = space.sample(jax.random.PRNGKey(2), 32)
        mean, var = model.predict(x)
        assert mean.dtype == var.dtype == jnp.float32
        from trieste_tpu.acquisition.function.function import ExpectedImprovement

        ei = ExpectedImprovement().prepare_acquisition_function(model, ds)
        vals = ei(x[:, None, :])
        assert vals.dtype == jnp.float32


def test_float32_svgp_minibatch_and_vgp_likelihoods():
    """The round-4 additions (Adam minibatch SVGP, pluggable VGP likelihoods) also hold
    f32 end-to-end — no silent f64 promotion in the optax scan or the quadrature."""
    with jax.enable_x64(False):
        from trieste_tpu.data import Dataset
        from trieste_tpu.models.gp import PoissonLikelihood, build_svgp
        from trieste_tpu.models.gp.vgp import VariationalGaussianProcess, VGPParams
        from trieste_tpu.ops.kernels import stationary
        from trieste_tpu.space import Box

        key = jax.random.PRNGKey(0)
        X = jax.random.uniform(key, (256, 1), dtype=jnp.float32)
        Y = jnp.sin(5 * X) + 0.1 * jax.random.normal(
            jax.random.PRNGKey(1), X.shape, jnp.float32
        )
        ds = Dataset.from_arrays(X, Y)
        svgp = build_svgp(
            ds, Box([0.0], [1.0]), num_inducing_points=16, kernel_priors=False,
            minibatch_size=64, minibatch_iters=50, optimize_key=jax.random.PRNGKey(2),
        )
        result = svgp.optimize(ds)
        _assert_all_f32(result.params, "minibatch SVGP params")
        mean, var = svgp.predict(X[:8])
        assert mean.dtype == var.dtype == jnp.float32

        Xp = jnp.linspace(-1, 1, 16, dtype=jnp.float32)[:, None]
        Yp = jnp.ones((16, 1), jnp.float32)
        dsp = Dataset.from_arrays(Xp, Yp)
        params = VGPParams(
            kernel=stationary("matern52", 1.0, [0.5], dtype=jnp.float32),
            mean_constant=jnp.asarray(0.0, jnp.float32),
            q_mu=jnp.zeros((dsp.capacity, 1), jnp.float32),
            q_sqrt=jnp.eye(dsp.capacity, dtype=jnp.float32),
            likelihood=PoissonLikelihood(),
        )
        vgp = VariationalGaussianProcess(params, dsp, num_alternations=2)
        vgp.optimize(dsp)
        _assert_all_f32(vgp.params, "VGP params")
        rate, rate_var = vgp.predict_y(Xp[:4])
        assert rate.dtype == rate_var.dtype == jnp.float32
