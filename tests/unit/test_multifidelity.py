"""Multifidelity model + MUMBO tests (role of reference multifidelity test files)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import Dataset, add_fidelity_column
from trieste_tpu.models.gp.multifidelity import (
    MultifidelityNonlinearAutoregressive,
    build_multifidelity_autoregressive_models,
)
from trieste_tpu.objectives.multifidelity_objectives import (
    Linear2Fidelity,
    linear_multifidelity,
)


@pytest.fixture(scope="module")
def fitted_ar1():
    problem = Linear2Fidelity
    space = problem.search_space
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    X_lo, X_hi = space.sample(k1, 30), space.sample(k2, 12)
    qp = jnp.concatenate([add_fidelity_column(X_lo, 0), add_fidelity_column(X_hi, 1)])
    ds = Dataset.from_arrays(qp, linear_multifidelity(qp))
    model = build_multifidelity_autoregressive_models(ds, 2, space)
    model.optimize(ds)
    return problem, ds, model


def test_ar1_learns_rho(fitted_ar1):
    """The linear-fidelity family has f_1 = 2 f_0 - 20(x-1): rho must be ~2."""
    _, _, model = fitted_ar1
    np.testing.assert_allclose(float(model.rho[0]), 2.0, atol=0.1)


def test_ar1_top_fidelity_accuracy(fitted_ar1):
    problem, _, model = fitted_ar1
    xg = jnp.linspace(0, 1, 50)[:, None]
    qg = add_fidelity_column(xg, 1)
    mean, var = model.predict(qg)
    truth = linear_multifidelity(qg)
    assert float(jnp.max(jnp.abs(mean - truth))) < 0.5
    assert bool(jnp.all(var > 0))


def test_ar1_covariance_with_top_fidelity(fitted_ar1):
    _, _, model = fitted_ar1
    xg = jnp.linspace(0, 1, 10)[:, None]
    cov_lo = model.covariance_with_top_fidelity(add_fidelity_column(xg, 0))
    cov_hi = model.covariance_with_top_fidelity(add_fidelity_column(xg, 1))
    _, var_hi = model.predict(add_fidelity_column(xg, 1))
    # at the top fidelity the covariance with itself is the variance
    np.testing.assert_allclose(np.asarray(cov_hi), np.asarray(var_hi), rtol=1e-6)
    assert bool(jnp.all(jnp.isfinite(cov_lo)))


def test_mumbo_and_cost_weighting(fitted_ar1):
    from trieste_tpu.acquisition.function.entropy import MUMBO, CostWeighting

    problem, ds, model = fitted_ar1
    mumbo = MUMBO(problem.fidelity_search_space).prepare_acquisition_function(model, ds)
    xs = problem.fidelity_search_space.sample(jax.random.PRNGKey(3), 16)
    vals = mumbo(xs[:, None, :])
    assert vals.shape == (16, 1)
    assert bool(jnp.all(jnp.isfinite(vals)))
    assert bool(jnp.all(vals >= 0))
    weighted = CostWeighting([1.0, 10.0]).apply_to(mumbo)(xs[:, None, :])
    fid = np.asarray(xs[:, -1])
    costs = np.where(fid == 0, 1.0, 10.0)
    np.testing.assert_allclose(
        np.asarray(weighted[:, 0]), np.asarray(vals[:, 0]) / costs, rtol=1e-6
    )


def test_nargp_smoke(fitted_ar1):
    from trieste_tpu.models.gp import build_gpr
    from trieste_tpu.space import Box

    problem, ds, _ = fitted_ar1
    space = problem.search_space
    k1, _ = jax.random.split(jax.random.PRNGKey(5))
    X_lo = space.sample(k1, 25)
    X_hi = jnp.linspace(0.0, 1.0, 10)[:, None]  # space-filling: NARGP extrapolates badly
    lo_ds = Dataset.from_arrays(X_lo, linear_multifidelity(add_fidelity_column(X_lo, 0)))
    hi_aug = jnp.concatenate([X_hi, jnp.zeros_like(X_hi)], axis=-1)
    hi_ds = Dataset.from_arrays(hi_aug, linear_multifidelity(add_fidelity_column(X_hi, 1)))
    model = MultifidelityNonlinearAutoregressive(
        [build_gpr(lo_ds, space), build_gpr(hi_ds, Box([0.0, -25.0], [1.0, 25.0]))]
    )
    qp = jnp.concatenate([add_fidelity_column(X_lo, 0), add_fidelity_column(X_hi, 1)])
    full = Dataset.from_arrays(qp, linear_multifidelity(qp))
    model.optimize(full)
    xg = jnp.linspace(0, 1, 20)[:, None]
    mean, var = model.predict(add_fidelity_column(xg, 1))
    truth = linear_multifidelity(add_fidelity_column(xg, 1))
    # 10 high-fidelity points in an augmented 2D space: expect the right shape, not
    # pinpoint accuracy — check strong correlation with the truth
    corr = np.corrcoef(np.asarray(mean[:, 0]), np.asarray(truth[:, 0]))[0, 1]
    assert corr > 0.95
    cov = model.covariance_with_top_fidelity(add_fidelity_column(xg, 0))
    assert bool(jnp.all(jnp.isfinite(cov)))
