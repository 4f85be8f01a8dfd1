"""Scaling Bayesian optimization over a TPU device mesh.

The TPU-native counterpart of the reference's multiprocessing/Ray tutorials
(``docs/notebooks/asynchronous_greedy_multiprocessing.pct.py``,
``asynchronous_nongreedy_batch_ray.pct.py``): instead of coordinating Python
workers, install a ``jax.sharding.Mesh`` once and the whole framework shards over
it — the acquisition optimizer's candidate pool and multi-start L-BFGS runs, the
GP trainers' restart pools, and the fused Pallas scoring kernel (per-device shards
under ``shard_map``), with XLA inserting the cross-device collectives.

Works on any device count, including a CPU emulation:
``XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/multi_chip_scaling.py``
"""
import jax
import jax.numpy as jnp

import trieste_tpu as tt
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin, mk_observer
from trieste_tpu.parallel import create_mesh, global_mesh


def main(num_steps: int = 5) -> None:
    n = len(jax.devices())
    mesh = create_mesh(n)  # one "pool" axis over every visible device
    print(f"running over {n} device(s): {jax.devices()}")

    problem = ScaledBranin
    observer = mk_observer(problem.objective)
    space = problem.search_space
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 5))

    with global_mesh(mesh):
        # everything below is IDENTICAL to the single-chip quickstart: the installed
        # mesh shards model fitting and acquisition optimization transparently
        model = build_gpr(
            initial_data, space, likelihood_variance=1e-7, trainable_likelihood=False
        )
        result = tt.BayesianOptimizer(observer, space).optimize(
            num_steps, initial_data, model, key=k_opt, track_state=False
        )

    _, observation, _ = result.try_get_optimal_point()
    print(f"best observation: {float(observation[0]):.6f} "
          f"(true minimum {float(problem.minimum[0]):.6f})")


if __name__ == "__main__":
    main()
