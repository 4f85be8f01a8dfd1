"""End-to-end active learning (reference ``tests/integration/test_active_learning.py``):
PredictiveVariance/IVR must learn the objective surface to a max-error criterion, and
ExpectedFeasibility must learn a level set's feasibility classification.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from trieste_tpu.acquisition.function.active_learning import (
    ExpectedFeasibility,
    IntegratedVarianceReduction,
    PredictiveVariance,
)
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import Branin, ScaledBranin, mk_observer

FAST_OPT = generate_continuous_optimizer(num_initial_samples=512, num_optimization_runs=8)


def _learn(problem, builder, num_steps, num_initial=6, seed=0, optimizer=FAST_OPT):
    space = problem.search_space
    observer = mk_observer(problem.objective)
    k_init, k_test, k_opt = jax.random.split(jax.random.PRNGKey(seed), 3)
    initial_data = observer(space.sample_halton(k_init, num_initial))
    model = build_gpr(initial_data, space, likelihood_variance=1e-5)
    rule = EfficientGlobalOptimization(builder, optimizer=optimizer)
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model, rule, key=k_opt, track_state=False
    )
    record = result.final_result.unwrap()
    final_model = record.models["OBJECTIVE"]
    test_qp = space.sample(k_test, 4096)
    test_obs = problem.objective(test_qp)
    return final_model, test_qp, test_obs


def test_predictive_variance_learns_scaled_branin_fast():
    """Fast variant: after 30 PV steps the model's max error on a test sample must be
    under 5% of the objective range. (The reference criterion — 2% after 50 steps,
    ``test_active_learning.py:56-110`` — is the slow variant below; this seed reaches
    0.6% there. 15 steps is information-theoretically insufficient: no Matérn-5/2
    hyperparameters fit 21 ScaledBranin points to <10% max error over the domain.)"""
    model, test_qp, test_obs = _learn(ScaledBranin, PredictiveVariance(), num_steps=30)
    mean, _ = model.predict(test_qp)
    rng = float(jnp.max(test_obs) - jnp.min(test_obs))
    max_err = float(jnp.max(jnp.abs(mean - test_obs)))
    assert max_err < 0.05 * rng, f"max err {max_err} vs range {rng}"


@pytest.mark.slow
@pytest.mark.parametrize(
    "builder_factory, num_steps",
    [
        pytest.param(lambda: PredictiveVariance(), 50, id="PredictiveVariance"),
        pytest.param(
            lambda: IntegratedVarianceReduction(
                ScaledBranin.search_space.sample_sobol(1000)
            ),
            70,
            id="IntegratedVarianceReduction",
        ),
    ],
)
def test_optimizer_learns_scaled_branin_function(builder_factory, num_steps):
    """Reference envelope: 2% max-error criterion
    (``test_active_learning.py:56-110``)."""
    model, test_qp, test_obs = _learn(
        ScaledBranin, builder_factory(), num_steps=num_steps,
        optimizer=generate_continuous_optimizer(),
    )
    mean, _ = model.predict(test_qp)
    rng = float(jnp.max(test_obs) - jnp.min(test_obs))
    assert float(jnp.max(jnp.abs(mean - test_obs))) < 0.02 * rng


@pytest.mark.parametrize(
    "delta",
    [
        1,
        # delta=2 duplicates the 40 s BO run for the other criterion; its formula
        # (incl. the round-4 sign-error regression) is covered by the unit
        # negative-path tests, so the end-to-end duplicate runs as slow only
        pytest.param(2, marks=pytest.mark.slow),
    ],
)
def test_expected_feasibility_learns_branin_level_set_fast(delta):
    """ExpectedFeasibility drives sampling to the threshold contour: feasibility
    classification accuracy on a test sample must exceed 90% (role of reference
    ``test_active_learning.py`` level-set tests)."""
    threshold = 80.0
    model, test_qp, test_obs = _learn(
        Branin, ExpectedFeasibility(threshold, delta=delta), num_steps=15
    )
    mean, _ = model.predict(test_qp)
    pred_feasible = np.asarray(mean[:, 0] < threshold)
    true_feasible = np.asarray(test_obs[:, 0] < threshold)
    accuracy = float(np.mean(pred_feasible == true_feasible))
    assert accuracy > 0.9, f"level-set accuracy {accuracy}"
