"""End-to-end multifidelity BO (reference
``tests/integration/test_multifidelity_bayesian_optimization.py``): MUMBO x CostWeighting
over an AR(1) multifidelity model solves the linear-fidelity problems, querying across
fidelities but judged at the top fidelity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from trieste_tpu.acquisition.combination import Product
from trieste_tpu.acquisition.function.entropy import MUMBO, CostWeighting
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.data import (
    Dataset,
    add_fidelity_column,
    get_dataset_for_fidelity,
)
from trieste_tpu.models.gp.multifidelity import build_multifidelity_autoregressive_models
from trieste_tpu.objectives import Linear2Fidelity, mk_observer
from trieste_tpu.objectives.multifidelity_objectives import linear_multifidelity
from trieste_tpu.observer import OBJECTIVE


def _nested_initial_data(problem, key):
    """Nested design: many low-fidelity points, a subset at higher fidelities
    (reference ``test_multifidelity_bayesian_optimization.py:61-84``)."""
    space = problem.search_space
    n_per_fid = [12 - 4 * f for f in range(problem.num_fidelities)]
    keys = jax.random.split(key, problem.num_fidelities)
    parts = [
        add_fidelity_column(space.sample(k, n), f)
        for f, (k, n) in enumerate(zip(keys, n_per_fid))
    ]
    qp = jnp.concatenate(parts)
    return Dataset.from_arrays(qp, linear_multifidelity(qp))


@pytest.mark.parametrize("num_steps,fast", [(6, True)])
def test_mumbo_solves_linear_two_fidelity(num_steps, fast):
    problem = Linear2Fidelity
    search_space = problem.fidelity_search_space
    observer = mk_observer(linear_multifidelity)
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = _nested_initial_data(problem, k_init)

    model = build_multifidelity_autoregressive_models(
        initial_data, problem.num_fidelities, problem.search_space
    )
    model.update(initial_data)
    model.optimize(initial_data)

    costs = [2.0 * (n + 1) for n in range(problem.num_fidelities)]
    acq = Product(
        MUMBO(search_space).using(OBJECTIVE), CostWeighting(costs).using(OBJECTIVE)
    )
    optimizer = generate_continuous_optimizer(
        num_initial_samples=512 if fast else 10_000,
        num_optimization_runs=8 if fast else 10,
    )
    rule = EfficientGlobalOptimization(builder=acq, optimizer=optimizer)

    result = tt.BayesianOptimizer(observer, search_space).optimize(
        num_steps, initial_data, model, rule, key=k_opt, track_state=False
    )
    final = result.final_result.unwrap().datasets[OBJECTIVE]
    top = get_dataset_for_fidelity(final, problem.num_fidelities - 1)
    obs = np.asarray(top.trimmed_observations)
    qp = np.asarray(top.trimmed_query_points)
    best = int(np.argmin(obs[:, 0]))
    # reference tolerances (``:130-135``): minimizer within 5%, minimum within rtol 0.1
    minimizer_err = np.abs(
        (qp[best] - np.asarray(problem.minimizers)) / np.asarray(problem.minimizers)
    )
    assert np.any(np.all(minimizer_err < 0.05, axis=-1)), f"best x {qp[best]}"
    np.testing.assert_allclose(obs[best], np.asarray(problem.minimum), rtol=0.1)
