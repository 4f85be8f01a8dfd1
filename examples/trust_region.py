"""Trust-region Bayesian optimization: TREGO, TuRBO, and batched regions.

Counterpart of the reference tutorial ``docs/notebooks/trust_region.pct.py``:
rules that restrict acquisition to adaptive subregions of the space, which helps
on multimodal or higher-dimensional problems.

Run: ``python examples/trust_region.py [num_steps]``
"""
import sys

import jax

import trieste_tpu as tt
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.acquisition.trust_region import (
    BatchTrustRegionBox,
    TREGOBox,
    TURBOBox,
)
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin, mk_observer


def run(name: str, rule_factory, num_steps: int) -> None:
    problem = ScaledBranin
    observer = mk_observer(problem.objective)
    space = problem.search_space
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 5))
    model = build_gpr(
        initial_data, space, likelihood_variance=1e-7, trainable_likelihood=False
    )
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model, rule_factory(space), key=k_opt,
        track_state=False,
    )
    _, observation, _ = result.try_get_optimal_point()
    print(f"{name:10s} best observation: {float(observation[0]):.6f}")


def main(num_steps: int = 10) -> None:
    run(
        "TREGO",
        lambda space: BatchTrustRegionBox(
            init_subspaces=[TREGOBox(space)], rule=EfficientGlobalOptimization()
        ),
        num_steps,
    )
    run(
        "TuRBO",
        lambda space: BatchTrustRegionBox(
            init_subspaces=[TURBOBox(space)], rule=[EfficientGlobalOptimization()]
        ),
        num_steps,
    )
    # three independent local regions acquiring one point each per step
    run("batch-TR", lambda space: BatchTrustRegionBox(init_subspaces=3), num_steps)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
