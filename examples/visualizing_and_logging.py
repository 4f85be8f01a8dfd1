"""Monitoring a run: summary logging and regret plotting.

Counterpart of the reference tutorial
``docs/notebooks/visualizing_with_tensorboard.pct.py``: attach a summary writer
(TensorBoard if available, a dependency-free JSONL writer otherwise) and the loop
records per-step wall-clocks, model diagnostics, and observation statistics; then
plot the regret curve from the tracked history.

Run: ``python examples/visualizing_and_logging.py [num_steps]``
"""
import sys
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp

import trieste_tpu as tt
from trieste_tpu.logging import make_summary_writer, set_tensorboard_writer
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin, mk_observer


def main(num_steps: int = 8) -> None:
    logdir = Path(tempfile.mkdtemp(prefix="trieste_tpu_logs_"))
    set_tensorboard_writer(make_summary_writer(str(logdir)))
    print(f"summaries -> {logdir}")

    problem = ScaledBranin
    observer = mk_observer(problem.objective)
    space = problem.search_space
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 5))
    model = build_gpr(
        initial_data, space, likelihood_variance=1e-7, trainable_likelihood=False
    )
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model, key=k_opt, track_state=True
    )
    set_tensorboard_writer(None)

    # regret curve from the tracked history
    best_so_far = []
    for record in result.history:
        obs = record.dataset.trimmed_observations
        best_so_far.append(float(jnp.min(obs)))
    final = result.try_get_final_dataset()
    best_so_far.append(float(jnp.min(final.trimmed_observations)))
    regret = [b - float(problem.minimum[0]) for b in best_so_far]
    print("regret per step:", " ".join(f"{r:.4f}" for r in regret))

    logged = sorted(p.name for p in logdir.glob("*"))
    print(f"log files written: {logged}")

    try:  # optional: save a regret plot if matplotlib is present
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(5, 3))
        ax.plot(regret, marker="o")
        ax.set_xlabel("step")
        ax.set_ylabel("regret")
        ax.set_yscale("log")
        fig.tight_layout()
        fig.savefig(logdir / "regret.png", dpi=120)
        print(f"regret plot -> {logdir / 'regret.png'}")
    except ImportError:
        pass


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
