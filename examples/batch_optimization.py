"""Batch Bayesian optimization: qEI, local penalization, and fantasizing.

Counterpart of the reference tutorial ``docs/notebooks/batch_optimization.pct.py``:
three ways to acquire a batch of query points per step, so several observations can
run in parallel.

Run: ``python examples/batch_optimization.py [num_steps]``
"""
import sys

import jax

import trieste_tpu as tt
from trieste_tpu.acquisition import (
    BatchMonteCarloExpectedImprovement,
    Fantasizer,
    LocalPenalization,
)
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin, mk_observer


def run(rule_name: str, rule, num_steps: int) -> None:
    problem = ScaledBranin
    observer = mk_observer(problem.objective)
    space = problem.search_space
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 5))
    model = build_gpr(
        initial_data, space, likelihood_variance=1e-7, trainable_likelihood=False
    )
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model, rule, key=k_opt, track_state=False
    )
    _, observation, _ = result.try_get_optimal_point()
    print(f"{rule_name:12s} best observation: {float(observation[0]):.6f}")


def main(num_steps: int = 8) -> None:
    space = ScaledBranin.search_space
    run(
        "qEI",
        EfficientGlobalOptimization(
            BatchMonteCarloExpectedImprovement(1000), num_query_points=3
        ),
        num_steps,
    )
    run(
        "local-pen",
        EfficientGlobalOptimization(LocalPenalization(space), num_query_points=3),
        num_steps,
    )
    run(
        "fantasizer",
        EfficientGlobalOptimization(Fantasizer(), num_query_points=3),
        num_steps,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
