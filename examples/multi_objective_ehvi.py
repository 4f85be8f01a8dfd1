"""Multi-objective optimization with expected hypervolume improvement.

Counterpart of the reference tutorial
``docs/notebooks/multi_objective_ehvi.pct.py``: find the Pareto front of the
two-objective VLMOP2 problem with independent GP surrogates stacked per objective
and the EHVI acquisition.

Run: ``python examples/multi_objective_ehvi.py [num_steps]``
"""
import sys

import jax
import jax.numpy as jnp

import trieste_tpu as tt
from trieste_tpu.acquisition.function.multi_objective import (
    ExpectedHypervolumeImprovement,
)
from trieste_tpu.acquisition.multi_objective.pareto import Pareto, get_reference_point
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.data import Dataset
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.models.interfaces import TrainableModelStack
from trieste_tpu.objectives import VLMOP2, mk_observer
from trieste_tpu.observer import OBJECTIVE


def main(num_steps: int = 15) -> None:
    problem = VLMOP2
    observer = mk_observer(problem.objective)
    space = problem.search_space
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 10))

    # one independent GPR per objective, stacked into a single multi-output model
    gprs = []
    for idx in range(2):
        single = Dataset.from_arrays(
            initial_data.trimmed_query_points,
            initial_data.trimmed_observations[:, idx : idx + 1],
        )
        gprs.append((build_gpr(single, space, likelihood_variance=1e-5), 1))
    model = TrainableModelStack(*gprs)

    rule = EfficientGlobalOptimization(
        ExpectedHypervolumeImprovement().using(OBJECTIVE)
    )
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model, rule, key=k_opt, track_state=False
    )

    observations = result.final_result.unwrap().datasets[OBJECTIVE].trimmed_observations
    ideal_front = problem.gen_pareto_optimal_points(100, jax.random.PRNGKey(1))
    ref_point = get_reference_point(ideal_front)
    observed_hv = Pareto(observations).hypervolume_indicator(ref_point)
    ideal_hv = Pareto(ideal_front).hypervolume_indicator(ref_point)
    print(f"observed front size: {Pareto(observations).front.shape[0]}")
    print(f"hypervolume: {float(observed_hv):.4f} (ideal {float(ideal_hv):.4f})")
    print(f"log hypervolume difference: "
          f"{float(jnp.log(jnp.maximum(ideal_hv - observed_hv, 1e-12))):.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
