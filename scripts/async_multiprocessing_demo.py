"""Asynchronous BO across worker processes, driven through the Ask/Tell API.

Script equivalent of the reference's asynchronous notebooks
(``docs/notebooks/asynchronous_greedy_multiprocessing.pct.py`` /
``asynchronous_nongreedy_batch_ray.pct.py``): the main process owns the
:class:`~trieste_tpu.ask_tell_optimization.AskTellOptimizer` with an
:class:`~trieste_tpu.acquisition.rule.AsynchronousGreedy` rule (pending-point state,
local-penalization builder); worker processes simulate slow observers with variable
latency. Points are handed out the moment a worker is free — the optimizer keeps track
of in-flight ("pending") points so concurrent asks don't collide — and results are
told back as they arrive, out of order.

Usage: ``python scripts/async_multiprocessing_demo.py [num_workers] [num_observations]``
Prints the regret trajectory and exits 0 if the run improved on the initial design.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import multiprocessing as mp
import time


def observer_worker(worker_id: int, point_queue, result_queue) -> None:
    """Simulated remote worker: objective evaluation with random latency."""
    import math

    import numpy as np

    rng = np.random.default_rng(worker_id)
    while True:
        msg = point_queue.get()
        if msg is None:
            return
        idx, x = msg
        # ScaledBranin, kept dependency-free on the worker side
        x0, x1 = 15.0 * x[0] - 5.0, 15.0 * x[1]
        y = (
            (x1 - 5.1 / (4 * math.pi**2) * x0**2 + 5 / math.pi * x0 - 6) ** 2
            + 10 * (1 - 1 / (8 * math.pi)) * math.cos(x0)
            + 10
        )
        y = (y - 54.8104) / 51.9496
        time.sleep(float(rng.uniform(0.01, 0.1)))  # variable observation latency
        result_queue.put((idx, x, y))


def main(num_workers: int = 3, num_observations: int = 12) -> int:
    import jax
    import jax.numpy as jnp

    from trieste_tpu.acquisition.function.greedy_batch import LocalPenalization
    from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
    from trieste_tpu.acquisition.rule import AsynchronousGreedy
    from trieste_tpu.ask_tell_optimization import AskTellOptimizer
    from trieste_tpu.data import Dataset
    from trieste_tpu.models.gp import build_gpr
    from trieste_tpu.objectives import ScaledBranin, mk_observer
    from trieste_tpu.observer import OBJECTIVE

    problem = ScaledBranin
    space = problem.search_space
    observer = mk_observer(problem.objective)
    k_init, k_loop = jax.random.split(jax.random.PRNGKey(0))
    initial = observer(space.sample(k_init, 6))
    initial_best = float(jnp.min(initial.trimmed_observations))
    model = build_gpr(initial, space, likelihood_variance=1e-7, trainable_likelihood=False)
    rule = AsynchronousGreedy(
        LocalPenalization(space).using(OBJECTIVE),
        optimizer=generate_continuous_optimizer(
            num_initial_samples=512, num_optimization_runs=6
        ),
    )
    optimizer = AskTellOptimizer(space, initial, model, rule, key=k_loop)

    point_queue: mp.Queue = mp.Queue()
    result_queue: mp.Queue = mp.Queue()
    workers = [
        mp.Process(target=observer_worker, args=(i, point_queue, result_queue), daemon=True)
        for i in range(num_workers)
    ]
    for w in workers:
        w.start()

    # prime every worker with a point (concurrent asks -> pending-point tracking)
    import numpy as np

    issued = 0
    for _ in range(num_workers):
        pt = np.asarray(optimizer.ask()).reshape(-1)
        point_queue.put((issued, pt))
        issued += 1

    observed = 0
    while observed < num_observations:
        idx, x, y = result_queue.get(timeout=60)
        observed += 1
        optimizer.tell(
            Dataset.from_arrays(jnp.asarray([x]), jnp.asarray([[y]]))
        )
        best = float(jnp.min(optimizer.datasets[OBJECTIVE].trimmed_observations))
        print(f"observed #{observed} from task {idx}: y={y:.4f} best={best:.4f}", flush=True)
        if issued < num_observations:
            pt = np.asarray(optimizer.ask()).reshape(-1)
            point_queue.put((issued, pt))
            issued += 1

    for _ in workers:
        point_queue.put(None)
    final_best = float(jnp.min(optimizer.datasets[OBJECTIVE].trimmed_observations))
    print(f"ASYNC DEMO DONE: initial best {initial_best:.4f} -> final best {final_best:.4f}")
    return 0 if final_best < initial_best else 1


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    sys.exit(main(*args))
