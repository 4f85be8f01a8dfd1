"""Thompson sampling: discrete and continuous (trajectory-based) variants.

Counterpart of the reference tutorials ``docs/notebooks/thompson_sampling.pct.py``
and ``docs/notebooks/scalable_thompson_sampling_using_sparse_gaussian_processes
.pct.py``: batch acquisition by sampling from the posterior — over a discrete
candidate set, or by optimizing decoupled posterior trajectories; the sparse
variant scales the surrogate itself.

Run: ``python examples/thompson_sampling.py [num_steps]``
"""
import sys

import jax

import trieste_tpu as tt
from trieste_tpu.acquisition import ParallelContinuousThompsonSampling
from trieste_tpu.acquisition.rule import (
    DiscreteThompsonSampling,
    EfficientGlobalOptimization,
)
from trieste_tpu.models.gp import build_gpr, build_svgp
from trieste_tpu.objectives import ScaledBranin, mk_observer


def run(name: str, model_factory, rule, num_steps: int) -> None:
    problem = ScaledBranin
    observer = mk_observer(problem.objective)
    space = problem.search_space
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 10))
    model = model_factory(initial_data, space)
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model, rule, key=k_opt, track_state=False
    )
    _, observation, _ = result.try_get_optimal_point()
    print(f"{name:14s} best observation: {float(observation[0]):.6f}")


def main(num_steps: int = 10) -> None:
    gpr = lambda data, space: build_gpr(
        data, space, likelihood_variance=1e-7, trainable_likelihood=False
    )
    # sample the posterior at 1000 random candidates, keep the best 4
    run("discrete-TS", gpr, DiscreteThompsonSampling(1000, 4), num_steps)
    # optimize 4 decoupled posterior trajectories as a vectorized acquisition
    run(
        "parallel-CTS",
        gpr,
        EfficientGlobalOptimization(
            ParallelContinuousThompsonSampling(), num_query_points=4
        ),
        num_steps,
    )
    # the same rule over a sparse (inducing-point) surrogate for larger datasets
    svgp = lambda data, space: build_svgp(data, space, num_inducing_points=20)
    run(
        "CTS-over-SVGP",
        svgp,
        EfficientGlobalOptimization(
            ParallelContinuousThompsonSampling(), num_query_points=4
        ),
        num_steps,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
