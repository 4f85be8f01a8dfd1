"""Constrained Bayesian optimization: observed and explicit constraints.

Counterpart of the reference tutorials
``docs/notebooks/inequality_constraints.pct.py`` and
``docs/notebooks/explicit_constraints.pct.py``: (1) a black-box constraint modelled
by its own GP and folded into expected constrained improvement (Gardner et al.);
(2) known (explicit) linear constraints attached to the search space, respected by
the acquisition optimizer and feasible sampling.

Run: ``python examples/inequality_constraints.py [num_steps]``
"""
import math
import sys

import jax
import jax.numpy as jnp

import trieste_tpu as tt
from trieste_tpu.acquisition import (
    ExpectedConstrainedImprovement,
    ProbabilityOfFeasibility,
)
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.data import Dataset
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin, mk_observer
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box, LinearConstraint

CONSTRAINT = "CONSTRAINT"


def gardner_objective(x):
    a, b = x[..., -2], x[..., -1]
    return (jnp.cos(2.0 * a) * jnp.cos(b) + jnp.sin(a))[..., None]


def gardner_constraint(x):
    a, b = x[..., -2], x[..., -1]
    return (jnp.cos(a) * jnp.cos(b) - jnp.sin(a) * jnp.sin(b))[..., None]


def observer(qp):
    return {
        OBJECTIVE: Dataset.from_arrays(qp, gardner_objective(qp)),
        CONSTRAINT: Dataset.from_arrays(qp, gardner_constraint(qp)),
    }


def black_box_constraint(num_steps: int) -> None:
    """Gardner simulation 1: constraint observed alongside the objective."""
    space = Box([0.0, 0.0], [6.0, 6.0])
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(3))
    initial_data = observer(space.sample(k_init, 6))
    models = {
        OBJECTIVE: build_gpr(initial_data[OBJECTIVE], space),
        CONSTRAINT: build_gpr(initial_data[CONSTRAINT], space),
    }
    pof = ProbabilityOfFeasibility(threshold=0.5)
    rule = EfficientGlobalOptimization(
        ExpectedConstrainedImprovement(OBJECTIVE, pof.using(CONSTRAINT))
    )
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, models, rule, key=k_opt, track_state=False
    )
    data = result.final_result.unwrap().datasets[OBJECTIVE]
    best = float(jnp.min(data.trimmed_observations))
    print(f"black-box constraint: best {best:.4f} "
          f"(constrained minimum -2.0 at [{math.pi * 1.5:.3f}, 0])")


def explicit_constraint(num_steps: int) -> None:
    """A known linear constraint attached directly to the Box."""
    constraint = LinearConstraint(A=[[1.0, 1.0]], lb=[0.3], ub=[1.2])
    problem = ScaledBranin
    space = Box([0.0, 0.0], [1.0, 1.0], constraints=[constraint])
    obs = mk_observer(problem.objective)
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial = obs(space.sample_feasible(k_init, 6))
    model = build_gpr(initial, space, likelihood_variance=1e-7,
                      trainable_likelihood=False)
    result = tt.BayesianOptimizer(obs, space).optimize(
        num_steps, initial, model, key=k_opt, track_state=False
    )
    qp, observation, _ = result.try_get_optimal_point()
    feasible = bool(space.is_feasible(qp[None]).all())
    print(f"explicit constraint: best {float(observation[0]):.4f} at {qp} "
          f"(feasible: {feasible})")


def main(num_steps: int = 12) -> None:
    black_box_constraint(num_steps)
    explicit_constraint(num_steps)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
