"""Active learning: uncertainty reduction and level-set estimation.

Counterpart of the reference tutorial ``docs/notebooks/active_learning.pct.py``:
query points to learn the function everywhere (predictive variance) or to locate a
feasibility boundary (Bichon expected feasibility), rather than to find a minimum.

Run: ``python examples/active_learning.py [num_steps]``
"""
import sys

import jax
import jax.numpy as jnp

import trieste_tpu as tt
from trieste_tpu.acquisition.function.active_learning import (
    ExpectedFeasibility,
    PredictiveVariance,
)
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import Branin, mk_observer


def main(num_steps: int = 10) -> None:
    problem = Branin
    observer = mk_observer(problem.objective)
    space = problem.search_space
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 6))
    model = build_gpr(initial_data, space, likelihood_variance=1e-5)

    # 1. global model improvement: maximize the joint predictive variance
    rule = EfficientGlobalOptimization(PredictiveVariance())
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model, rule, key=k_opt, track_state=False
    )
    data = result.try_get_final_dataset()
    print(f"predictive-variance run collected {data.num_points} points")

    # 2. level-set estimation: learn the contour {x : f(x) = threshold}
    threshold = 80.0
    model2 = build_gpr(initial_data, space, likelihood_variance=1e-5)
    rule2 = EfficientGlobalOptimization(ExpectedFeasibility(threshold, delta=1))
    result2 = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model2, rule2, key=k_opt, track_state=False
    )
    final_model = result2.try_get_final_model()
    # how well is the level set located? check sign agreement on a grid
    k_grid = jax.random.PRNGKey(7)
    grid = space.sample(k_grid, 2000)
    truth_below = problem.objective(grid)[:, 0] < threshold
    pred_below = final_model.predict(grid)[0][:, 0] < threshold
    accuracy = float(jnp.mean(truth_below == pred_below))
    print(f"level-set sign accuracy after {num_steps} steps: {accuracy:.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
