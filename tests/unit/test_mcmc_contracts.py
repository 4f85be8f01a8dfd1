"""Analytic contracts for the fully-Bayesian GPR (HMC) model (VERDICT r4 Weak #2).

Reference anchor: the reference has no MCMC model (this is a north-star addition); the
contract bar is ``test_sparse_model_contracts.py``. The identities: the posterior
mixture's predictive moments obey the law of total variance over hyperparameter
samples; a single-sample "mixture" is exactly plain GPR; the log posterior decomposes
as MLL + Gaussian prior on the unconstrained parameters; and in the strong-data /
tight-posterior regime the mixture predictive approaches the MAP predictive.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import Dataset
from trieste_tpu.models.gp import posterior as P
from trieste_tpu.models.gp.mcmc import (
    GaussianProcessRegressionMCMC,
    _log_posterior,
    _mixture_predict,
    build_gpr_mcmc,
)
from trieste_tpu.models.gp.training import pack_params, unpack_params
from trieste_tpu.ops.kernels import stationary
from trieste_tpu.space import Box


def _data(n=14, key=0):
    k = jax.random.PRNGKey(key)
    X = jax.random.uniform(k, (n, 2))
    Y = jnp.sum(jnp.square(X - 0.45), axis=-1, keepdims=True)
    return Dataset.from_arrays(X, Y)


def _params(var=1.2, ls=(0.5, 0.7), noise=1e-3):
    return P.GPRParams(
        kernel=stationary("matern52", var, list(ls)),
        noise_variance=jnp.asarray(noise),
        mean_constant=jnp.asarray(0.1),
    )


def _stack(params_list, ds):
    stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)
    caches = jax.vmap(
        lambda p: P.build_cache(
            p, ds.query_points, ds.observations, ds.mask, with_linvt=False
        )
    )(stack)
    return stack, caches


def test_mixture_predict_law_of_total_variance():
    """_mixture_predict == manual moment matching over per-sample predictions."""
    ds = _data()
    p1 = _params(1.2, (0.5, 0.7))
    p2 = _params(0.8, (0.3, 0.9), noise=5e-3)
    stack, caches = _stack([p1, p2], ds)
    x = jax.random.uniform(jax.random.PRNGKey(5), (9, 2))
    mix_mean, mix_var = _mixture_predict(stack, caches, x)

    ms, vs = [], []
    for p in (p1, p2):
        cache = P.build_cache(p, ds.query_points, ds.observations, ds.mask)
        m, v = P.predict_f_reference(p, cache, x)
        ms.append(m)
        vs.append(v)
    ms, vs = jnp.stack(ms), jnp.stack(vs)
    expect_mean = jnp.mean(ms, axis=0)
    expect_var = jnp.mean(vs + jnp.square(ms), axis=0) - jnp.square(expect_mean)
    np.testing.assert_allclose(mix_mean, expect_mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(mix_var, expect_var, rtol=1e-6, atol=1e-9)
    # the mixture never reports less variance than the average component
    assert bool(jnp.all(mix_var >= jnp.mean(vs, axis=0) - 1e-12))


def test_single_sample_mixture_is_plain_gpr():
    ds = _data()
    p = _params()
    stack, caches = _stack([p], ds)
    x = jax.random.uniform(jax.random.PRNGKey(3), (7, 2))
    mix_mean, mix_var = _mixture_predict(stack, caches, x)
    cache = P.build_cache(p, ds.query_points, ds.observations, ds.mask)
    mean, var = P.predict_f_reference(p, cache, x)
    np.testing.assert_allclose(mix_mean, mean, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(mix_var, var, rtol=1e-7, atol=1e-10)


def test_log_posterior_decomposition():
    """log_posterior(u) == MLL(unpack(u)) - 0.5 |(u-u0)/scale|^2, exactly."""
    ds = _data()
    template = _params()
    u0 = pack_params(template, train_noise=True)
    delta = 0.3 * jnp.arange(1.0, u0.shape[0] + 1.0) / u0.shape[0]
    u = u0 + delta
    scale = 1.7
    got = float(
        _log_posterior(
            u, template, ds.query_points, ds.observations, ds.mask, scale
        )
    )
    params_u = unpack_params(u, template, train_noise=True)
    mll = float(
        P.log_marginal_likelihood(params_u, ds.query_points, ds.observations, ds.mask)
    )
    expected = mll - 0.5 * float(jnp.sum(jnp.square(delta / scale)))
    np.testing.assert_allclose(got, expected, rtol=1e-9)
    # at the prior center the prior term vanishes
    at_center = float(
        _log_posterior(u0, template, ds.query_points, ds.observations, ds.mask, scale)
    )
    mll0 = float(
        P.log_marginal_likelihood(template, ds.query_points, ds.observations, ds.mask)
    )
    np.testing.assert_allclose(at_center, mll0, rtol=1e-9)


def test_tight_hyper_posterior_matches_map_predictive():
    """When every retained sample is (numerically) the same hyperparameter point, the
    mixture predictive equals the MAP predictive — the strong-prior/strong-data limit
    a correct marginalization must collapse to."""
    ds = _data()
    p = _params()
    # 5 'samples' drawn with vanishing spread around p
    perturbed = []
    for i in range(5):
        eps = 1e-9 * (i - 2)
        perturbed.append(
            p.replace(kernel=p.kernel.replace(variance=p.kernel.variance + eps))
        )
    stack, caches = _stack(perturbed, ds)
    x = jax.random.uniform(jax.random.PRNGKey(11), (6, 2))
    mix_mean, mix_var = _mixture_predict(stack, caches, x)
    cache = P.build_cache(p, ds.query_points, ds.observations, ds.mask)
    mean, var = P.predict_f_reference(p, cache, x)
    np.testing.assert_allclose(mix_mean, mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(mix_var, var, rtol=1e-5, atol=1e-9)


def test_optimize_produces_dispersed_stack_and_consistent_predictions():
    """End-to-end HMC: optimize() retains the configured number of samples, the
    samples disperse (a point mass would defeat marginalization), and the wrapper's
    predict equals _mixture_predict on the retained stack."""
    ds = _data(n=10)
    space = Box(jnp.zeros(2), jnp.ones(2))
    model = build_gpr_mcmc(
        ds, space, num_chains=4, num_samples_per_chain=6, num_warmup=20,
        num_retained=8, optimize_key=jax.random.PRNGKey(2),
    )
    model.optimize(ds)
    assert model.num_hyper_samples == 8
    ls = model.params_stack.kernel.lengthscales
    assert float(jnp.std(ls)) > 1e-4, "HMC samples did not disperse"
    x = jax.random.uniform(jax.random.PRNGKey(7), (5, 2))
    mean_w, var_w = model.predict(x)
    mean_d, var_d = _mixture_predict(model.params_stack, model._caches_stack, x)
    np.testing.assert_allclose(mean_w, mean_d, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(var_w, var_d, rtol=1e-6, atol=1e-9)
    # predict_y adds the MEAN observation noise over samples
    mean_y, var_y = model.predict_y(x)
    np.testing.assert_allclose(mean_y, mean_w, atol=1e-9)
    assert bool(jnp.all(var_y > var_w))


def test_update_refreshes_caches():
    """update() must rebuild the per-sample posterior caches for the new data."""
    ds = _data(n=10)
    space = Box(jnp.zeros(2), jnp.ones(2))
    model = build_gpr_mcmc(
        ds, space, num_chains=2, num_samples_per_chain=4, num_warmup=10,
        num_retained=4, optimize_key=jax.random.PRNGKey(4),
    )
    model.optimize(ds)
    x = jax.random.uniform(jax.random.PRNGKey(9), (4, 2))
    _, var_before = model.predict(x)
    extra_X = x[:2]
    extra_Y = jnp.sum(jnp.square(extra_X - 0.45), axis=-1, keepdims=True)
    bigger = Dataset.from_arrays(
        jnp.concatenate([ds.trimmed_query_points, extra_X]),
        jnp.concatenate([ds.trimmed_observations, extra_Y]),
    )
    model.update(bigger)
    _, var_after = model.predict(x)
    # conditioning on observations AT two of the query points shrinks their variance
    assert float(var_after[0, 0]) < float(var_before[0, 0])
    assert float(var_after[1, 0]) < float(var_before[1, 0])
