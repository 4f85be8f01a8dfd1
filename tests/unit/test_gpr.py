"""Exact-GPR model tests: analytic posterior formulas, mask invariance, training,
fantasizing (role of reference ``tests/unit/models/gpflow/test_models.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import Dataset
from trieste_tpu.models.gp import GaussianProcessRegression, GPRParams, build_gpr
from trieste_tpu.models.gp import posterior as P
from trieste_tpu.ops.kernels import gram, stationary
from trieste_tpu.space import Box


@pytest.fixture
def toy():
    key = jax.random.PRNGKey(7)
    X = jax.random.uniform(key, (9, 2), dtype=jnp.float64)
    Y = jnp.sin(3.0 * X[:, :1]) + X[:, 1:] ** 2
    params = P.GPRParams(
        kernel=stationary("rbf", 1.3, [0.4, 0.6]),
        noise_variance=jnp.asarray(1e-3),
        mean_constant=jnp.asarray(0.2),
    )
    ds = Dataset.from_arrays(X, Y)
    return params, ds, X, Y


def _naive_posterior(params, X, Y, xq):
    """Direct numpy GP posterior for verification."""
    K = np.asarray(gram(params.kernel, X))
    # the framework adds a stabilizing jitter before factorization; include it here
    Kn = K + (float(params.noise_variance) + 1e-6) * np.eye(len(X))
    Ks = np.asarray(gram(params.kernel, xq, X))
    Kss = np.asarray(gram(params.kernel, xq))
    A = np.linalg.solve(Kn, np.asarray(Y) - float(params.mean_constant))
    mean = Ks @ A + float(params.mean_constant)
    cov = Kss - Ks @ np.linalg.solve(Kn, Ks.T)
    return mean, cov


def test_predict_matches_naive_formulas(toy, key):
    params, ds, X, Y = toy
    cache = P.build_cache(params, ds.query_points, ds.observations, ds.mask)
    xq = jax.random.uniform(key, (6, 2), dtype=jnp.float64)
    mean, var = P.predict_f(params, cache, xq)
    naive_mean, naive_cov = _naive_posterior(params, X, Y, xq)
    np.testing.assert_allclose(np.asarray(mean), naive_mean, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(var[:, 0]), np.diagonal(naive_cov), atol=1e-6
    )
    mj, cj = P.predict_joint(params, cache, xq)
    np.testing.assert_allclose(np.asarray(cj[0]), naive_cov, atol=1e-6)


def test_mll_matches_naive(toy):
    params, ds, X, Y = toy
    mll = P.log_marginal_likelihood(params, ds.query_points, ds.observations, ds.mask)
    K = np.asarray(gram(params.kernel, X))
    Kn = K + (float(params.noise_variance) + 1e-6) * np.eye(len(X))
    resid = np.asarray(Y)[:, 0] - float(params.mean_constant)
    sign, logdet = np.linalg.slogdet(Kn)
    expected = -0.5 * (
        resid @ np.linalg.solve(Kn, resid) + logdet + len(X) * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(float(mll), expected, rtol=1e-6)


def test_padding_invariance(toy, key):
    params, ds, X, Y = toy
    ds_exact = Dataset.from_arrays(X, Y, capacity=X.shape[0])
    ds_padded = Dataset.from_arrays(X, Y, capacity=64)
    xq = jax.random.uniform(key, (4, 2), dtype=jnp.float64)
    for a, b in [(ds_exact, ds_padded)]:
        ca = P.build_cache(params, a.query_points, a.observations, a.mask)
        cb = P.build_cache(params, b.query_points, b.observations, b.mask)
        ma, va = P.predict_f(params, ca, xq)
        mb, vb = P.predict_f(params, cb, xq)
        np.testing.assert_allclose(np.asarray(ma), np.asarray(mb), atol=1e-10)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-10)
        mll_a = P.log_marginal_likelihood(params, a.query_points, a.observations, a.mask)
        mll_b = P.log_marginal_likelihood(params, b.query_points, b.observations, b.mask)
        np.testing.assert_allclose(float(mll_a), float(mll_b), rtol=1e-12)


def test_conditional_predict_matches_refit(toy, key):
    """Fantasizing must equal retraining on the union of the data
    (the semantics of reference ``models.py:355-527``)."""
    params, ds, X, Y = toy
    cache = P.build_cache(params, ds.query_points, ds.observations, ds.mask)
    k1, k2 = jax.random.split(key)
    extra_X = jax.random.uniform(k1, (3, 2), dtype=jnp.float64)
    extra_Y = jnp.cos(extra_X[:, :1])
    xq = jax.random.uniform(k2, (5, 2), dtype=jnp.float64)

    cm, cv = P.conditional_predict_f(params, cache, xq, extra_X, extra_Y)

    ds_all = Dataset.from_arrays(
        jnp.concatenate([X, extra_X]), jnp.concatenate([Y, extra_Y])
    )
    cache_all = P.build_cache(params, ds_all.query_points, ds_all.observations, ds_all.mask)
    rm, rv = P.predict_f(params, cache_all, xq)
    np.testing.assert_allclose(np.asarray(cm), np.asarray(rm), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cv), np.asarray(rv), atol=1e-6)


def test_optimize_improves_mll(toy):
    params, ds, X, Y = toy
    model = GaussianProcessRegression(params, ds, num_kernel_samples=6)
    before = P.log_marginal_likelihood(params, ds.query_points, ds.observations, ds.mask)
    model.optimize(ds)
    after = P.log_marginal_likelihood(
        model.params, ds.query_points, ds.observations, ds.mask
    )
    assert float(after) >= float(before)


def test_update_rejects_wrong_dimension(toy):
    params, ds, *_ = toy
    model = GaussianProcessRegression(params, ds)
    bad = Dataset.from_arrays(jnp.zeros((3, 5)), jnp.zeros((3, 1)))
    with pytest.raises(ValueError):
        model.update(bad)


def test_build_gpr_defaults():
    space = Box([0.0, 0.0], [1.0, 1.0])
    X = jnp.array([[0.1, 0.2], [0.6, 0.7], [0.9, 0.3]])
    Y = jnp.array([[1.0], [2.0], [3.0]])
    model = build_gpr(Dataset.from_arrays(X, Y), space, likelihood_variance=1e-5,
                      trainable_likelihood=False)
    np.testing.assert_allclose(float(model.get_observation_noise()), 1e-5)
    ls = np.asarray(model.get_kernel().lengthscales)
    # 0.2 * extent * sqrt(D) (reference _get_lengthscales, builders.py:413-424)
    np.testing.assert_allclose(ls, 0.2 * np.sqrt(2.0), atol=1e-10)
    mean, var = model.predict(jnp.array([[0.5, 0.5]]))
    assert mean.shape == (1, 1) and var.shape == (1, 1)


def test_covariance_between_points(toy, key):
    params, ds, X, Y = toy
    cache = P.build_cache(params, ds.query_points, ds.observations, ds.mask)
    x1 = jax.random.uniform(key, (4, 2), dtype=jnp.float64)
    x2 = jax.random.uniform(jax.random.split(key)[0], (3, 2), dtype=jnp.float64)
    cov = P.covariance_between_points(params, cache, x1, x2)
    assert cov.shape == (4, 3)
    # must agree with the joint over the union
    _, joint = P.predict_joint(params, cache, jnp.concatenate([x1, x2]))
    np.testing.assert_allclose(np.asarray(cov), np.asarray(joint[0, :4, 4:]), atol=1e-8)


def test_model_sample_statistics(toy, key):
    params, ds, *_ = toy
    model = GaussianProcessRegression(params, ds)
    xq = jnp.array([[0.3, 0.4], [0.8, 0.1]])
    s = model.sample(key, xq, 50_000)
    mean, var = model.predict(xq)
    np.testing.assert_allclose(np.asarray(s.mean(0)), np.asarray(mean), atol=0.02)
    np.testing.assert_allclose(np.asarray(s.var(0)), np.asarray(var), atol=0.02)


def test_log_prior_density_matches_scipy_lognorm():
    """log_prior_density is the sum of LogNormal log-densities (constants dropped):
    differences between two kernels must match scipy exactly."""
    from scipy.stats import lognorm

    from trieste_tpu.models.gp.priors import GPPriors, log_prior_density
    from trieste_tpu.ops.kernels import stationary

    priors = GPPriors(
        ls_loc=jnp.log(jnp.array([0.3, 0.5])),
        var_loc=jnp.log(jnp.array(2.0)),
        scale=jnp.array(1.0),
    )
    k1 = stationary("matern52", variance=1.5, lengthscales=[0.2, 0.9])
    k2 = stationary("matern52", variance=4.0, lengthscales=[1.2, 0.1])

    def scipy_lp(k):
        lp = lognorm.logpdf(np.asarray(k.lengthscales), s=1.0,
                            scale=np.exp(np.asarray(priors.ls_loc))).sum()
        lp += lognorm.logpdf(float(k.variance), s=1.0,
                             scale=float(np.exp(priors.var_loc)))
        return lp

    d_ours = float(log_prior_density(k1, priors) - log_prior_density(k2, priors))
    d_scipy = scipy_lp(k1) - scipy_lp(k2)
    np.testing.assert_allclose(d_ours, d_scipy, rtol=1e-10)


def test_map_fit_keeps_lengthscales_bounded_on_flat_data(key):
    """The round-2 failure mode: near-constant observations put the MLE on a flat ridge
    where lengthscales diverge to 1e5-1e8 (VERDICT r2). With the builder priors the MAP
    must stay within the squeeze window of the space extent."""
    from trieste_tpu.models.gp import build_gpr

    space = Box([0.0, 0.0], [1.0, 1.0])
    X = space.sample(key, 5)
    Y = jnp.full((5, 1), 3.0) + 1e-9 * jnp.arange(5.0)[:, None]  # essentially flat
    model = build_gpr(Dataset.from_arrays(X, Y), space, likelihood_variance=1e-7)
    model.optimize(model.get_internal_data())
    ls = np.asarray(jnp.atleast_1d(model.get_kernel().lengthscales))
    assert np.all(ls < 300.0), f"lengthscales diverged: {ls}"
    assert np.all(ls > 1e-4), f"lengthscales collapsed: {ls}"


def test_squeeze_kernel_clips_to_window():
    from trieste_tpu.models.gp.priors import (
        SQUEEZE_LOG_RANGE,
        GPPriors,
        squeeze_kernel,
    )
    from trieste_tpu.ops.kernels import stationary

    priors = GPPriors(
        ls_loc=jnp.log(jnp.array([0.3])), var_loc=jnp.log(jnp.array(1.0)),
        scale=jnp.array(1.0),
    )
    k = stationary("rbf", variance=1e12, lengthscales=[1e-12])
    sk = squeeze_kernel(k, priors)
    np.testing.assert_allclose(
        np.log(np.asarray(sk.lengthscales)),
        np.asarray(priors.ls_loc) - SQUEEZE_LOG_RANGE,
    )
    np.testing.assert_allclose(
        np.log(float(sk.variance)), float(priors.var_loc) + SQUEEZE_LOG_RANGE
    )
