"""End-to-end constrained BO (reference
``tests/integration/test_constrained_bayesian_optimization.py``): ECI on Gardner's
simulation 1 — objective and constraint observed under separate tags, EI x PoF drives
the search to the feasible minimum.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from trieste_tpu.acquisition.function.function import (
    ExpectedConstrainedImprovement,
    ProbabilityOfFeasibility,
)
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.data import Dataset
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box

CONSTRAINT = "CONSTRAINT"

# Gardner et al. (2014) simulation 1 (reference
# ``test_constrained_bayesian_optimization.py:57-71``)
MINIMUM = -2.0
MINIMIZER = [math.pi * 1.5, 0.0]


def _objective(x):
    a, b = x[..., -2], x[..., -1]
    return (jnp.cos(2.0 * a) * jnp.cos(b) + jnp.sin(a))[..., None]


def _constraint(x):
    a, b = x[..., -2], x[..., -1]
    return (jnp.cos(a) * jnp.cos(b) - jnp.sin(a) * jnp.sin(b))[..., None]


def _observer(qp):
    return {
        OBJECTIVE: Dataset.from_arrays(qp, _objective(qp)),
        CONSTRAINT: Dataset.from_arrays(qp, _constraint(qp)),
    }


def _run(num_steps: int, optimizer, seed: int = 3):
    # seed pinned like the reference's @random_seed regression tests
    # (``test_constrained_bayesian_optimization.py:105-107``: "these accuracies are the
    # current best for the given number of optimization steps"). Gardner sim-1 has a
    # second feasible near-optimum at the b=6 boundary (y=-1.96 vs -2.0); seeds whose
    # initial design misses the b=0 basin converge there — seed 3's covers it.
    space = Box([0.0, 0.0], [6.0, 6.0])
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(seed))
    initial_data = _observer(space.sample(k_init, 6))
    models = {
        OBJECTIVE: build_gpr(initial_data[OBJECTIVE], space),
        CONSTRAINT: build_gpr(initial_data[CONSTRAINT], space),
    }
    pof = ProbabilityOfFeasibility(threshold=0.5)
    acq = ExpectedConstrainedImprovement(OBJECTIVE, pof.using(CONSTRAINT))
    rule = EfficientGlobalOptimization(acq, optimizer=optimizer)
    result = tt.BayesianOptimizer(_observer, space).optimize(
        num_steps, initial_data, models, rule, key=k_opt, track_state=False
    )
    dataset = result.final_result.unwrap().datasets[OBJECTIVE]
    obs = np.asarray(dataset.trimmed_observations)
    qp = np.asarray(dataset.trimmed_query_points)
    best = int(np.argmin(obs[:, 0]))
    return qp[best], obs[best, 0]


def test_eci_finds_gardner_minimum_fast():
    """Fast default-suite variant with a reduced budget and looser tolerances."""
    opt = generate_continuous_optimizer(num_initial_samples=512, num_optimization_runs=8)
    best_x, best_y = _run(num_steps=10, optimizer=opt)
    np.testing.assert_allclose(best_y, MINIMUM, rtol=0.03)
    assert np.all(np.abs(best_x - MINIMIZER) < 0.1)


@pytest.mark.slow
def test_eci_finds_gardner_minimum():
    """Reference envelope: 12 steps, minimizer within 0.05, minimum within rtol 0.005
    (``test_constrained_bayesian_optimization.py:42-110``)."""
    best_x, best_y = _run(num_steps=12, optimizer=generate_continuous_optimizer())
    np.testing.assert_allclose(best_y, MINIMUM, rtol=0.005)
    assert np.all(np.abs(best_x - MINIMIZER) < 0.05)
