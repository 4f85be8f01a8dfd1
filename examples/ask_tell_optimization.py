"""Driving the BO loop yourself with the Ask/Tell interface.

Counterpart of the reference tutorial
``docs/notebooks/ask_tell_optimization.pct.py``: the open-loop interface for when
the objective is evaluated outside the framework (lab hardware, another process, a
scheduler), including pausing and resuming through a serializable state snapshot.

Run: ``python examples/ask_tell_optimization.py [num_steps]``
"""
import sys

import jax
import jax.numpy as jnp

from trieste_tpu.ask_tell_optimization import AskTellOptimizer
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin, mk_observer


def main(num_steps: int = 10) -> None:
    problem = ScaledBranin
    observer = mk_observer(problem.objective)
    space = problem.search_space
    k_init, k_loop = jax.random.split(jax.random.PRNGKey(0))
    data = observer(space.sample(k_init, 5))
    model = build_gpr(data, space, likelihood_variance=1e-7, trainable_likelihood=False)

    ask_tell = AskTellOptimizer(space, data, model, key=k_loop)
    for step in range(num_steps // 2):
        points = ask_tell.ask()
        ask_tell.tell(observer(points))  # observe however and wherever you like

    # pause: snapshot everything; resume later (or elsewhere) from the state
    state = ask_tell.to_state(copy=True)
    resumed = AskTellOptimizer.from_state(state, space)
    for step in range(num_steps - num_steps // 2):
        points = resumed.ask()
        resumed.tell(observer(points))

    best = float(jnp.min(resumed.dataset.trimmed_observations))
    print(f"best observation after resume: {best:.6f} "
          f"(true minimum {float(problem.minimum[0]):.6f})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
