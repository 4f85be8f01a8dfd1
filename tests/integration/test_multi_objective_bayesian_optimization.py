"""End-to-end multi-objective BO on VLMOP2 (reference
``tests/integration/test_multi_objective_bayesian_optimization.py``): the observed
Pareto front's log hypervolume difference to the ideal front must fall below a
per-rule threshold.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from trieste_tpu.acquisition.function.multi_objective import (
    HIPPO,
    BatchMonteCarloExpectedHypervolumeImprovement,
    ExpectedHypervolumeImprovement,
)
from trieste_tpu.acquisition.multi_objective.pareto import Pareto, get_reference_point
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.models.interfaces import TrainableModelStack
from trieste_tpu.data import Dataset
from trieste_tpu.objectives import VLMOP2, mk_observer
from trieste_tpu.observer import OBJECTIVE

FAST_OPT = generate_continuous_optimizer(num_initial_samples=256, num_optimization_runs=6)


def _stacked_model(data: Dataset, search_space):
    gprs = []
    for idx in range(2):
        single = Dataset.from_arrays(
            data.trimmed_query_points, data.trimmed_observations[:, idx : idx + 1]
        )
        gprs.append((build_gpr(single, search_space, likelihood_variance=1e-5), 1))
    return TrainableModelStack(*gprs)


def _run_vlmop2(rule, num_steps: int, seed: int = 0) -> float:
    problem = VLMOP2
    space = problem.search_space
    observer = mk_observer(problem.objective)
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(seed))
    initial_data = observer(space.sample(k_init, 10))
    model = _stacked_model(initial_data, space)
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model, rule, key=k_opt, track_state=False
    )
    dataset = result.final_result.unwrap().datasets[OBJECTIVE]

    ideal_pf = problem.gen_pareto_optimal_points(100, jax.random.PRNGKey(1))
    ref_point = get_reference_point(ideal_pf)
    obs_hv = Pareto(dataset.trimmed_observations).hypervolume_indicator(ref_point)
    ideal_hv = Pareto(ideal_pf).hypervolume_indicator(ref_point)
    return float(jnp.log(jnp.maximum(ideal_hv - obs_hv, 1e-12)))


def test_ehvi_finds_pareto_front_of_vlmop2_fast():
    """Fast default-suite variant: reduced optimizer budget and step count (this seed
    reaches −3.15 at 12 steps; −3.73 on the slow 20-step reference envelope, also
    verified on the real chip — ENVELOPES_TPU_r05.json)."""
    rule = EfficientGlobalOptimization(
        ExpectedHypervolumeImprovement().using(OBJECTIVE), optimizer=FAST_OPT
    )
    log_hv_diff = _run_vlmop2(rule, num_steps=12)
    assert log_hv_diff < -2.8, f"log hv diff {log_hv_diff}"


@pytest.mark.slow
@pytest.mark.parametrize(
    "rule_factory, num_steps, threshold",
    [
        pytest.param(
            lambda: EfficientGlobalOptimization(
                ExpectedHypervolumeImprovement().using(OBJECTIVE)
            ),
            20,
            -3.65,
            id="EHVI",
        ),
        pytest.param(
            lambda: EfficientGlobalOptimization(
                BatchMonteCarloExpectedHypervolumeImprovement(sample_size=500).using(
                    OBJECTIVE
                ),
                num_query_points=2,
                optimizer=generate_continuous_optimizer(num_initial_samples=500),
            ),
            15,
            -3.44,
            id="qEHVI/2",
        ),
        pytest.param(
            lambda: EfficientGlobalOptimization(
                HIPPO().using(OBJECTIVE),
                num_query_points=4,
                optimizer=generate_continuous_optimizer(num_initial_samples=500),
            ),
            10,
            -3.2095,
            id="HIPPO/4",
        ),
    ],
)
def test_mo_rules_find_pareto_front_of_vlmop2(rule_factory, num_steps, threshold):
    """Reference thresholds (``test_multi_objective_bayesian_optimization.py:55-186``)."""
    log_hv_diff = _run_vlmop2(rule_factory(), num_steps=num_steps)
    assert log_hv_diff < threshold, f"log hv diff {log_hv_diff} vs {threshold}"


def test_ehvi_with_fixed_true_scale_hyperparameters():
    """Acquisition-quality diagnostic, decoupled from model fitting: with kernel
    hyperparameters FIXED at sensible true-scale values (no optimize step), EHVI alone
    must reach the fast envelope. If this passes while the fitted-model variant fails,
    the blame is on hyperparameter training, not on the acquisition (VERDICT r2 #8)."""
    from trieste_tpu.models.gp.gpr import GaussianProcessRegression
    from trieste_tpu.models.gp.posterior import GPRParams
    from trieste_tpu.models.interfaces import ModelStack
    from trieste_tpu.ops.kernels import stationary

    problem = VLMOP2
    space = problem.search_space

    class _FixedGPR(GaussianProcessRegression):
        def optimize(self, dataset):  # hyperparameters stay fixed
            self.update(dataset)
            return None

    class _FixedStack(ModelStack):
        def update(self, dataset):
            pass  # per-output update happens in optimize below

        def optimize(self, dataset):
            for idx, m in enumerate(self._models):
                single = Dataset.from_arrays(
                    dataset.trimmed_query_points,
                    dataset.trimmed_observations[:, idx : idx + 1],
                )
                m.optimize(single)

    def mk_fixed(data):
        models = []
        dtype = data.query_points.dtype
        extent = space.upper - space.lower
        for idx in range(2):
            single = Dataset.from_arrays(
                data.trimmed_query_points, data.trimmed_observations[:, idx : idx + 1]
            )
            params = GPRParams(
                kernel=stationary(
                    "matern52", variance=0.2, lengthscales=0.3 * extent, dtype=dtype
                ),
                noise_variance=jnp.asarray(1e-6, dtype),
                mean_constant=jnp.mean(single.trimmed_observations).astype(dtype),
            )
            models.append((_FixedGPR(params, single), 1))
        return _FixedStack(*models)

    observer = mk_observer(problem.objective)
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 10))
    model = mk_fixed(initial_data)
    rule = EfficientGlobalOptimization(
        ExpectedHypervolumeImprovement().using(OBJECTIVE), optimizer=FAST_OPT
    )
    result = tt.BayesianOptimizer(observer, space).optimize(
        15, initial_data, model, rule, key=k_opt, track_state=False
    )
    dataset = result.final_result.unwrap().datasets[OBJECTIVE]
    ideal_pf = problem.gen_pareto_optimal_points(100, jax.random.PRNGKey(1))
    ref_point = get_reference_point(ideal_pf)
    obs_hv = Pareto(dataset.trimmed_observations).hypervolume_indicator(ref_point)
    ideal_hv = Pareto(ideal_pf).hypervolume_indicator(ref_point)
    log_hv_diff = float(jnp.log(jnp.maximum(ideal_hv - obs_hv, 1e-12)))
    assert log_hv_diff < -3.0, f"log hv diff {log_hv_diff}"
