"""Writer-attached vs writer-off BO-step wall-clock (round-5 ask #7 'Done' check).

With the hot-path summaries deferred (``logging.deferred_scalar``/``deferred_histogram``
drained once per step), attaching a TensorBoard writer must not add per-step device
round-trips. Interleaves the two arms A/B in one process (tunnel rate drifts) and
reports the median steady-state step time for each plus the ratio.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run_steps(writer, n_steps=8):
    from trieste_tpu.ask_tell_optimization import AskTellOptimizer
    from trieste_tpu.logging import set_step_number, tensorboard_writer
    from trieste_tpu.models.gp import build_gpr
    from trieste_tpu.objectives import Hartmann6, mk_observer
    from trieste_tpu.observer import OBJECTIVE

    problem = Hartmann6
    space = problem.search_space
    observer = mk_observer(problem.objective)
    k_init, k_loop = jax.random.split(jax.random.PRNGKey(0))
    initial = observer(space.sample(k_init, 5))
    model = build_gpr(initial, space, likelihood_variance=1e-6)
    times = []
    with tensorboard_writer(writer):
        opt = AskTellOptimizer(space, initial, model, key=k_loop)
        for i in range(n_steps):
            set_step_number(i)
            t0 = time.perf_counter()
            points = opt.ask()
            opt.tell(observer(points))
            float(jnp.sum(opt.models[OBJECTIVE].params.kernel.lengthscales))
            times.append(time.perf_counter() - t0)
    return times[-4:]


def main() -> None:
    from trieste_tpu.logging import JsonlSummaryWriter

    arms = {"off": [], "on": []}
    for r in range(3):
        arms["off"].extend(run_steps(None))
        arms["on"].extend(run_steps(JsonlSummaryWriter(tempfile.mkdtemp())))
        print(
            f"[round {r}] off={np.median(arms['off']):.3f}s on={np.median(arms['on']):.3f}s",
            flush=True,
        )
    off, on = float(np.median(arms["off"])), float(np.median(arms["on"]))
    print(f"median step: writer-off {off:.3f}s, writer-on {on:.3f}s, ratio {on/off:.3f}")


if __name__ == "__main__":
    main()
    os._exit(0)
