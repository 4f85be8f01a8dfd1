"""Introduction: Bayesian optimization with expected improvement.

Counterpart of the reference tutorial
``docs/notebooks/expected_improvement.pct.py``: minimize the two-dimensional
ScaledBranin function with a GP surrogate and the default analytic-EI EGO rule.

Run: ``python examples/expected_improvement.py [num_steps]``
"""
import sys

import jax
import jax.numpy as jnp

import trieste_tpu as tt
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin, mk_observer


def main(num_steps: int = 15) -> None:
    problem = ScaledBranin
    observer = mk_observer(problem.objective)
    space = problem.search_space

    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 5))
    # MAP-prior GPR surrogate; the classic low-noise deterministic-objective recipe
    model = build_gpr(
        initial_data, space, likelihood_variance=1e-7, trainable_likelihood=False
    )

    bo = tt.BayesianOptimizer(observer, space)
    result = bo.optimize(num_steps, initial_data, model, key=k_opt)

    query_point, observation, _ = result.try_get_optimal_point()
    print(f"query point:   {query_point}")
    print(f"observation:   {float(observation[0]):.6f}")
    print(f"true minimum:  {float(problem.minimum[0]):.6f}")
    rel_err = abs(float(observation[0]) - float(problem.minimum[0])) / abs(
        float(problem.minimum[0])
    )
    print(f"relative error: {rel_err:.2e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
