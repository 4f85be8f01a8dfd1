"""Analytic contracts for the deep-GP model (VERDICT r4 Weak #2 / ask #5).

Reference anchor: the density bar of ``tests/unit/models/gpflow/test_models.py`` and
the gpflux wrapper behavior (``trieste/models/gpflux/models.py:52-404``). Strategy
mirrors ``test_sparse_model_contracts.py``: closed-form identities a correct
implementation must satisfy exactly (up to jitter), not just smoke shapes.

Key identities:
* whitened prior recovery: ``q_mu = 0, q_sqrt = I`` makes a layer the GP prior and
  its KL zero;
* optimal-q collapse: a single layer with ``Z = X`` and the analytically optimal
  whitened variational posterior equals the exact GPR posterior;
* a deterministic inner layer (``q_mu = 0, q_sqrt = 0``, evaluated at its inducing
  points) reduces a 2-layer DGP to its outer layer (the collapse-to-SVGP contract);
* propagated-sample moments converge to the layer moments.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import Dataset
from trieste_tpu.models.deepgp.deep_gp import (
    DeepGaussianProcess,
    DGPLayerParams,
    DGPParams,
    _layer_moments,
    build_vanilla_deep_gp,
    dgp_elbo,
    dgp_propagate_samples,
    fit_dgp,
)
from trieste_tpu.models.gp.posterior import GPRParams, build_cache, predict_f_reference
from trieste_tpu.ops.kernels import gram, stationary
from trieste_tpu.space import Box


def _data(n=12, d=2, key=0):
    k = jax.random.PRNGKey(key)
    X = jax.random.uniform(k, (n, d))
    Y = jnp.sum(jnp.square(X - 0.4), axis=-1, keepdims=True)
    return X, Y


def _prior_layer(kernel, Z, d_out=1):
    M = Z.shape[0]
    return DGPLayerParams(
        kernel=kernel,
        inducing_points=Z,
        q_mu=jnp.zeros((M, d_out), Z.dtype),
        q_sqrt=jnp.broadcast_to(jnp.eye(M, dtype=Z.dtype)[None], (d_out, M, M)).copy(),
    )


def test_whitened_prior_recovery():
    """q_mu=0, q_sqrt=I: layer moments are the GP prior (mean 0, var = k diag)."""
    X, _ = _data()
    kernel = stationary("rbf", 1.7, [0.4, 0.7])
    layer = _prior_layer(kernel, X[:8])
    x = jax.random.uniform(jax.random.PRNGKey(3), (9, 2))
    mean, var = _layer_moments(layer, x)
    np.testing.assert_allclose(mean, jnp.zeros((9, 1)), atol=1e-9)
    np.testing.assert_allclose(var[:, 0], kernel.diag(x), rtol=1e-6, atol=1e-6)


def test_prior_elbo_is_average_log_likelihood():
    """At the whitened prior the KL vanishes, so the ELBO equals the Monte-Carlo
    average of the Gaussian log likelihood of the propagated samples."""
    X, Y = _data(n=6)
    kernel = stationary("rbf", 1.0, [0.5, 0.5])
    params = DGPParams(
        layers=(_prior_layer(kernel, X),),
        noise_variance=jnp.asarray(0.05),
        mean_constant=jnp.asarray(0.3),
    )
    mask = jnp.ones(6, bool)
    key = jax.random.PRNGKey(11)
    S = 16
    elbo = dgp_elbo(key, params, X, Y, mask, num_samples=S)
    f = dgp_propagate_samples(key, params, X, S)
    s2 = 0.05
    lik = -0.5 * jnp.log(2 * jnp.pi * s2) - 0.5 * jnp.square(Y[None] - f) / s2
    expected = jnp.sum(jnp.mean(lik, axis=0))
    np.testing.assert_allclose(float(elbo), float(expected), rtol=1e-6)


def _optimal_whitened_q(kernel, X, Y, noise, mean_constant):
    """Whitened optimum at Z=X: q* = N(L^-1 mu, L^-1 Sigma L^-T) where (mu, Sigma) is
    the exact GPR posterior at X. Uses the same Kuu jitter as ``_layer_moments`` so the
    whitening bases coincide exactly."""
    from trieste_tpu.utils.misc import jitter_for

    n = X.shape[0]
    K = gram(kernel, X)
    jitter = jitter_for(X.dtype)
    L = jnp.linalg.cholesky(K + jitter * jnp.eye(n))
    # the GPR cache's masked_cholesky also adds jitter on top of the noise
    Kn = K + (noise + jitter) * jnp.eye(n)
    A = jnp.linalg.solve(Kn, K)  # (K+s2)^-1 K
    mu = K @ jnp.linalg.solve(Kn, Y - mean_constant)
    Sigma = K - K @ A
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(n), lower=True)
    q_mu = Linv @ mu
    q_cov = Linv @ Sigma @ Linv.T
    q_sqrt = jnp.linalg.cholesky(q_cov + jitter * jnp.eye(n))
    return q_mu, q_sqrt[None]


def test_single_layer_optimal_q_collapses_to_exact_gpr():
    """A 1-layer DGP at the analytically optimal whitened q equals exact GPR."""
    X, Y = _data(n=10)
    kernel = stationary("rbf", 1.3, [0.5, 0.8])
    noise = 0.01
    mc = 0.2
    q_mu, q_sqrt = _optimal_whitened_q(kernel, X, Y, noise, mc)
    layer = DGPLayerParams(
        kernel=kernel, inducing_points=X, q_mu=q_mu, q_sqrt=q_sqrt
    )
    x = jax.random.uniform(jax.random.PRNGKey(5), (7, 2))
    mean_l, var_l = _layer_moments(layer, x)

    gpr = GPRParams(
        kernel=kernel,
        noise_variance=jnp.asarray(noise),
        mean_constant=jnp.asarray(mc),
    )
    ds = Dataset.from_arrays(X, Y)
    cache = build_cache(gpr, ds.query_points, ds.observations, ds.mask)
    mean_g, var_g = predict_f_reference(gpr, cache, x)

    # the DGP layer adds mean_constant at the output stage, not in the layer.
    # residual discrepancy is O(jitter/eigmin) through the two whitening bases
    np.testing.assert_allclose(mean_l + mc, mean_g, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(var_l, var_g, rtol=1e-2, atol=1e-5)


def test_deterministic_inner_layer_collapses_to_outer_layer():
    """With the inner layer's q at (0, 0) and queries AT its inducing points, the inner
    layer is a deterministic identity, so the 2-layer model's propagated samples follow
    exactly the outer layer's Gaussian."""
    X, Y = _data(n=8)
    inner_kernel = stationary("rbf", 0.8, [0.5, 0.5])
    outer_kernel = stationary("rbf", 1.1, [0.7, 0.7])
    M = X.shape[0]
    inner = DGPLayerParams(
        kernel=inner_kernel,
        inducing_points=X,
        q_mu=jnp.zeros((M, 2)),
        q_sqrt=jnp.zeros((2, M, M)),
    )
    outer = _prior_layer(outer_kernel, X, d_out=1)
    params = DGPParams(
        layers=(inner, outer),
        noise_variance=jnp.asarray(1e-3),
        mean_constant=jnp.asarray(0.5),
    )
    S = 40000  # prior std ~1; SE of the sample mean ~5e-3, so atol 4e-2 is ~8 sigma
    f = dgp_propagate_samples(jax.random.PRNGKey(2), params, X, S)  # [S, 8, 1]
    mean_o, var_o = _layer_moments(outer, X)  # outer layer at the (unchanged) inputs
    np.testing.assert_allclose(
        jnp.mean(f, axis=0), 0.5 + mean_o, atol=4e-2
    )
    np.testing.assert_allclose(jnp.var(f, axis=0), var_o, rtol=0.15, atol=1e-3)


def test_propagated_sample_moments_match_layer_moments():
    """1-layer propagation: sample mean/var over S draws converge to the closed form."""
    X, Y = _data(n=9)
    kernel = stationary("matern52", 1.2, [0.6, 0.6])
    q_mu, q_sqrt = _optimal_whitened_q(kernel, X, Y, 0.05, 0.0)
    layer = DGPLayerParams(kernel=kernel, inducing_points=X, q_mu=q_mu, q_sqrt=q_sqrt)
    params = DGPParams(
        layers=(layer,), noise_variance=jnp.asarray(0.05), mean_constant=jnp.asarray(0.0)
    )
    x = jax.random.uniform(jax.random.PRNGKey(8), (5, 2))
    S = 6000
    f = dgp_propagate_samples(jax.random.PRNGKey(13), params, x, S)
    mean_c, var_c = _layer_moments(layer, x)
    np.testing.assert_allclose(jnp.mean(f, axis=0), mean_c, atol=5e-2)
    np.testing.assert_allclose(jnp.var(f, axis=0), var_c, rtol=0.2, atol=5e-3)


def test_elbo_improves_under_training_and_is_bounded_by_optimum():
    """fit_dgp increases the ELBO; no trained 1-layer ELBO exceeds the collapsed exact
    bound (the log marginal likelihood) by more than MC noise."""
    X, Y = _data(n=10)
    kernel = stationary("rbf", 1.0, [0.5, 0.5])
    params = DGPParams(
        layers=(_prior_layer(kernel, X),),
        noise_variance=jnp.asarray(0.05),
        mean_constant=jnp.asarray(0.0),
    )
    mask = jnp.ones(10, bool)
    k = jax.random.PRNGKey(0)
    elbo_before = float(dgp_elbo(k, params, X, Y, mask, num_samples=64))
    result = fit_dgp(k, params, X, Y, mask, num_steps=300, learning_rate=0.02)
    elbo_after = float(dgp_elbo(k, result.params, X, Y, mask, num_samples=64))
    assert elbo_after > elbo_before, (elbo_before, elbo_after)

    # upper bound: exact GPR log marginal likelihood with the TRAINED kernel/noise
    from trieste_tpu.models.gp.posterior import log_marginal_likelihood

    trained = result.params
    gpr = GPRParams(
        kernel=trained.layers[0].kernel,
        noise_variance=trained.noise_variance,
        mean_constant=trained.mean_constant,
    )
    mll = float(log_marginal_likelihood(gpr, X, Y - trained.mean_constant * 0, mask))
    # ELBO <= MLL for the same hyperparameters (Jensen); allow MC slack
    assert elbo_after <= mll + 2.0, (elbo_after, mll)


def test_dgp_wrapper_contracts():
    """predict/predict_y/sample wrapper identities and update/optimize statefulness."""
    X, Y = _data(n=14)
    ds = Dataset.from_arrays(X, Y)
    space = Box(jnp.zeros(2), jnp.ones(2))
    model = build_vanilla_deep_gp(ds, space, num_layers=2, num_train_steps=50)
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 2))
    mean, var = model.predict(x)
    mean_y, var_y = model.predict_y(x)
    np.testing.assert_allclose(mean_y, mean, atol=1e-9)
    np.testing.assert_allclose(
        var_y, var + model.get_observation_noise(), atol=1e-9
    )
    # deterministic prediction surface (fixed internal key)
    mean2, var2 = model.predict(x)
    np.testing.assert_allclose(mean, mean2, atol=0)
    np.testing.assert_allclose(var, var2, atol=0)
    # leading-dim polymorphism
    mb, vb = model.predict(x.reshape(3, 2, 2))
    np.testing.assert_allclose(mb.reshape(6, 1), mean, atol=1e-9)
    s = model.sample(jax.random.PRNGKey(2), x, 5)
    assert s.shape == (5, 6, 1)
    before = model.params
    model.optimize(ds)
    after = model.params
    assert any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after))
    ), "optimize() did not move the variational parameters"
