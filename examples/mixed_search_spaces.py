"""Mixed continuous/discrete/categorical search spaces.

Counterpart of the reference tutorial
``docs/notebooks/mixed_search_spaces.pct.py``: optimize over a tagged product of a
continuous box and a discrete set; the acquisition optimizer relaxes the discrete
dimensions, optimizes continuously, and snaps back to valid members.

Run: ``python examples/mixed_search_spaces.py [num_steps]``
"""
import sys

import jax
import jax.numpy as jnp

import trieste_tpu as tt
from trieste_tpu.data import Dataset
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin
from trieste_tpu.space import Box, DiscreteSearchSpace, TaggedProductSearchSpace


def main(num_steps: int = 12) -> None:
    # first Branin coordinate continuous, second restricted to a grid of 11 values
    continuous = Box([0.0], [1.0])
    discrete = DiscreteSearchSpace(jnp.linspace(0.0, 1.0, 11)[:, None])
    space = TaggedProductSearchSpace([continuous, discrete], tags=["x1", "x2"])

    def observer(qp):
        return Dataset.from_arrays(qp, ScaledBranin.objective(qp))

    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 6))
    model = build_gpr(
        initial_data, space, likelihood_variance=1e-7, trainable_likelihood=False
    )
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model, key=k_opt, track_state=False
    )
    qp, observation, _ = result.try_get_optimal_point()
    on_grid = bool(jnp.any(jnp.isclose(discrete.points[:, 0], qp[1])))
    print(f"best point {qp} (x2 on the grid: {on_grid})")
    print(f"best observation: {float(observation[0]):.6f} "
          f"(unrestricted minimum {float(ScaledBranin.minimum[0]):.6f})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
