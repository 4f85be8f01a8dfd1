"""Multifidelity modelling with the autoregressive (AR1) model.

Counterpart of the reference tutorial
``docs/notebooks/multifidelity_modelling.pct.py``: combine cheap low-fidelity and
expensive high-fidelity observations in one surrogate whose query points carry a
trailing fidelity column.

Run: ``python examples/multifidelity_modelling.py``
"""
import jax
import jax.numpy as jnp

from trieste_tpu.data import Dataset, add_fidelity_column
from trieste_tpu.models.gp.multifidelity import (
    build_multifidelity_autoregressive_models,
)
from trieste_tpu.objectives import Linear2Fidelity
from trieste_tpu.objectives.multifidelity_objectives import linear_multifidelity


def main() -> None:
    problem = Linear2Fidelity
    space = problem.search_space
    k_lo, k_hi, k_test = jax.random.split(jax.random.PRNGKey(0), 3)

    # many cheap low-fidelity points, few expensive high-fidelity ones
    X_lo = space.sample(k_lo, 24)
    X_hi = space.sample(k_hi, 6)
    qp = jnp.concatenate(
        [add_fidelity_column(X_lo, 0), add_fidelity_column(X_hi, 1)]
    )
    data = Dataset.from_arrays(qp, linear_multifidelity(qp))

    model = build_multifidelity_autoregressive_models(data, 2, space)
    model.update(data)
    model.optimize(data)

    X_test = space.sample(k_test, 200)
    truth = linear_multifidelity(add_fidelity_column(X_test, 1))[:, 0]
    mean, var = model.predict(add_fidelity_column(X_test, 1))
    rmse = float(jnp.sqrt(jnp.mean((mean[:, 0] - truth) ** 2)))
    print(f"high-fidelity RMSE from 6 expensive + 24 cheap points: {rmse:.4f}")
    # cross-fidelity covariance at a query point (the AR1 coupling at work)
    cov = model.covariance_with_top_fidelity(add_fidelity_column(X_test[:1], 0))
    print(f"cov(low-fidelity obs, top-fidelity latent) at a point: {float(cov[0, 0]):.4f}")


if __name__ == "__main__":
    main()
