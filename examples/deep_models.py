"""Non-GP surrogates: deep ensembles and deep Gaussian processes.

Counterpart of the reference tutorials ``docs/notebooks/deep_ensembles.pct.py``
and ``docs/notebooks/deep_gaussian_processes.pct.py``: neural-network and
deep-GP surrogates paired with trajectory-based Thompson sampling (the acquisition
family that only needs samples, not analytic posteriors).

Run: ``python examples/deep_models.py [num_steps]``
"""
import sys

import jax

import trieste_tpu as tt
from trieste_tpu.acquisition import ParallelContinuousThompsonSampling
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.models.deepgp import build_vanilla_deep_gp
from trieste_tpu.models.ensembles import build_deep_ensemble
from trieste_tpu.objectives import ScaledBranin, mk_observer


def run(name: str, model_factory, num_steps: int) -> None:
    problem = ScaledBranin
    observer = mk_observer(problem.objective)
    space = problem.search_space
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 15))
    model = model_factory(initial_data, space)
    rule = EfficientGlobalOptimization(
        ParallelContinuousThompsonSampling(), num_query_points=4
    )
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model, rule, key=k_opt, track_state=False
    )
    _, observation, _ = result.try_get_optimal_point()
    print(f"{name:14s} best observation: {float(observation[0]):.6f}")


def main(num_steps: int = 8) -> None:
    run(
        "deep-ensemble",
        lambda ds, space: build_deep_ensemble(ds, ensemble_size=5, num_train_steps=600),
        num_steps,
    )
    run(
        "deep-GP",
        lambda ds, space: build_vanilla_deep_gp(
            ds, space, num_layers=2, num_train_steps=800
        ),
        num_steps,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
