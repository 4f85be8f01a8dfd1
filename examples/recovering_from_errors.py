"""Failure handling: error capture, saved history, and resuming.

Counterpart of the reference tutorial
``docs/notebooks/recovering_from_errors.pct.py``: when the observer (or any step)
raises, the loop returns an ``Err`` result that still carries the full history, so
no observations are lost — and ``continue_optimization`` resumes from it.

Run: ``python examples/recovering_from_errors.py``
"""
import jax
import jax.numpy as jnp

import trieste_tpu as tt
from trieste_tpu.data import Dataset
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin


class FlakyObserver:
    """Raises on one unlucky evaluation, then works again — like real lab hardware."""

    def __init__(self, fail_at_call: int):
        self.calls = 0
        self.fail_at_call = fail_at_call

    def __call__(self, qp):
        self.calls += 1
        if self.calls == self.fail_at_call:
            raise RuntimeError("simulated hardware failure")
        return Dataset.from_arrays(qp, ScaledBranin.objective(qp))


def main() -> None:
    space = ScaledBranin.search_space
    observer = FlakyObserver(fail_at_call=4)
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 5))
    model = build_gpr(initial_data, space, likelihood_variance=1e-7,
                      trainable_likelihood=False)

    bo = tt.BayesianOptimizer(observer, space)
    result = bo.optimize(10, initial_data, model, key=k_opt, track_state=True)
    print(f"first run ok: {result.is_ok}; history length: {len(result.history)}")
    assert result.is_err  # the simulated failure surfaced as an Err, not a crash

    # every pre-failure step was recorded; resume from the saved history
    resumed = bo.continue_optimization(10, result, key=jax.random.PRNGKey(1))
    print(f"resumed run ok: {resumed.is_ok}")
    _, observation, _ = resumed.try_get_optimal_point()
    print(f"best observation after resume: {float(observation[0]):.6f} "
          f"(true minimum {float(ScaledBranin.minimum[0]):.6f})")


if __name__ == "__main__":
    main()
