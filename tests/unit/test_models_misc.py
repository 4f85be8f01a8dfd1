"""Unit tests for the model-layer long tail: VGP classifier + natural-gradient step,
encoded-model wrappers, model stacks, deep-ensemble components, deep-GP components
(role of reference ``tests/unit/models/gpflow/test_models.py`` sections and
``tests/unit/models/keras|gpflux``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from tests.util.misc import mk_dataset
from trieste_tpu.data import Dataset
from trieste_tpu.space import Box


# ------------------------------------------------------------------ VGP classifier


@pytest.fixture(scope="module")
def vgp_fit():
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (40, 1), minval=-2.0, maxval=2.0)
    Y = (X[:, 0] > 0).astype(X.dtype)[:, None]  # separable classes
    ds = Dataset.from_arrays(X, Y)
    from trieste_tpu.models.gp.vgp import build_vgp_classifier

    model = build_vgp_classifier(ds, Box([-2.0], [2.0]))
    result = model.optimize(ds)
    return model, ds, result


def test_vgp_classifier_learns_separable_classes(vgp_fit):
    model, ds, _ = vgp_fit
    xs = jnp.array([[-1.5], [-0.5], [0.5], [1.5]])
    p, _ = model.predict_y(xs)
    p = np.asarray(p)[:, 0]
    assert p[0] < 0.25 and p[1] < 0.5
    assert p[2] > 0.5 and p[3] > 0.75
    # probit link identity: p == Phi(mean / sqrt(1 + var))
    mean, var = model.predict(xs)
    want = scipy.stats.norm.cdf(np.asarray(mean) / np.sqrt(1 + np.asarray(var)))[:, 0]
    np.testing.assert_allclose(p, want, rtol=1e-6)


def test_vgp_natural_gradient_step_increases_elbo(vgp_fit):
    """Each natural-gradient step on (q_mu, q_sqrt) must not decrease the ELBO."""
    from trieste_tpu.models.gp.vgp import natural_gradient_step, vgp_elbo

    model, ds, _ = vgp_fit
    params = model.params.replace(
        q_mu=jnp.zeros_like(model.params.q_mu),
        q_sqrt=jnp.eye(model.params.q_sqrt.shape[0], dtype=model.params.q_mu.dtype),
    )
    args = (ds.query_points, ds.observations, ds.mask)
    elbo = float(vgp_elbo(params, *args))
    for _ in range(3):
        params = natural_gradient_step(params, *args, gamma=0.5)
        new_elbo = float(vgp_elbo(params, *args))
        assert new_elbo > elbo - 1e-6, f"ELBO decreased: {elbo} -> {new_elbo}"
        elbo = new_elbo


def test_vgp_fit_improves_elbo(vgp_fit):
    from trieste_tpu.models.gp.vgp import vgp_elbo

    model, ds, result = vgp_fit
    args = (ds.query_points, ds.observations, ds.mask)
    init = model.params.replace(
        q_mu=jnp.zeros_like(model.params.q_mu),
        q_sqrt=jnp.eye(model.params.q_sqrt.shape[0], dtype=model.params.q_mu.dtype),
    )
    assert float(vgp_elbo(model.params, *args)) > float(vgp_elbo(init, *args))


def _vgp_with_likelihood(likelihood, X, Y):
    from trieste_tpu.models.gp.vgp import VariationalGaussianProcess, VGPParams
    from trieste_tpu.ops.kernels import stationary

    ds = Dataset.from_arrays(X, Y)
    C = ds.capacity
    dtype = X.dtype
    params = VGPParams(
        kernel=stationary("matern52", variance=1.0, lengthscales=[0.8], dtype=dtype),
        mean_constant=jnp.asarray(0.0, dtype),
        q_mu=jnp.zeros((C, 1), dtype),
        q_sqrt=jnp.eye(C, dtype=dtype),
        likelihood=likelihood,
    )
    return VariationalGaussianProcess(params, ds), ds


def test_vgp_poisson_likelihood_recovers_rate():
    """VGP with a Poisson likelihood (reference wraps any GPflow likelihood,
    ``models/gpflow/models.py:1109-1383``): on counts drawn from rate exp(sin x),
    the fitted predict_y rate must correlate with the generative rate and the
    closed-form variational expectation must match quadrature."""
    from trieste_tpu.models.gp.likelihoods import (
        PoissonLikelihood,
        gauss_hermite_expectation,
    )

    key = jax.random.PRNGKey(2)
    kx, ky = jax.random.split(key)
    X = jnp.sort(jax.random.uniform(kx, (40, 1), minval=-2.0, maxval=2.0), axis=0)
    true_rate = jnp.exp(jnp.sin(2.0 * X[:, 0]))
    Y = jax.random.poisson(ky, true_rate).astype(X.dtype)[:, None]

    lik = PoissonLikelihood()
    # closed-form variational expectations == Gauss-Hermite quadrature of log_prob
    mean = jnp.linspace(-1.0, 1.0, 5)[:, None]
    var = jnp.full_like(mean, 0.3)
    yy = jnp.arange(5.0)[:, None]
    np.testing.assert_allclose(
        np.asarray(lik.variational_expectations(mean, var, yy)),
        np.asarray(gauss_hermite_expectation(lik.log_prob, mean, var, yy)),
        rtol=1e-6,
    )

    model, ds = _vgp_with_likelihood(lik, X, Y)
    model.optimize(ds)
    rate, rate_var = model.predict_y(X)
    corr = np.corrcoef(np.asarray(rate[:, 0]), np.asarray(true_rate))[0, 1]
    assert corr > 0.6, f"fitted rate uncorrelated with truth: {corr}"
    assert bool(jnp.all(rate > 0)) and bool(jnp.all(rate_var >= rate - 1e-9))


def test_vgp_gaussian_likelihood_matches_exact_gpr():
    """With a Gaussian likelihood the VGP posterior must agree with exact GPR at the
    optimum of the ELBO (conjugate case: the bound is tight)."""
    from trieste_tpu.models.gp.likelihoods import GaussianLikelihood
    from trieste_tpu.models.gp.posterior import GPRParams, build_cache, predict_f
    from trieste_tpu.models.gp.vgp import natural_gradient_step
    from trieste_tpu.ops.kernels import stationary

    key = jax.random.PRNGKey(5)
    X = jax.random.uniform(key, (20, 1), minval=-2.0, maxval=2.0)
    Y = jnp.sin(X)
    noise = 0.05
    model, ds = _vgp_with_likelihood(
        GaussianLikelihood(variance=jnp.asarray(noise, X.dtype)), X, Y
    )
    # natural-gradient steps only (hypers fixed): conjugate natgrad converges in ~1 step
    params = model.params
    args = (ds.query_points, ds.observations, ds.mask)
    for _ in range(5):
        params = natural_gradient_step(params, *args, gamma=0.9)
    model._params = params

    gpr = GPRParams(
        kernel=params.kernel,
        noise_variance=jnp.asarray(noise, X.dtype),
        mean_constant=jnp.asarray(0.0, X.dtype),
    )
    cache = build_cache(gpr, ds.query_points, ds.observations, ds.mask)
    xs = jnp.linspace(-2.0, 2.0, 9)[:, None]
    want_mean, want_var = predict_f(gpr, cache, xs)
    got_mean, got_var = model.predict(xs)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(want_mean), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_var), np.asarray(want_var), atol=2e-3)
    # predict_y adds the observation noise
    y_mean, y_var = model.predict_y(xs)
    np.testing.assert_allclose(np.asarray(y_var - got_var), noise, atol=1e-6)


def test_vgp_gaussian_likelihood_variance_is_trained():
    """fit_vgp's hyperparameter step must move a trainable Gaussian noise variance."""
    from trieste_tpu.models.gp.likelihoods import GaussianLikelihood

    key = jax.random.PRNGKey(7)
    X = jax.random.uniform(key, (25, 1), minval=-2.0, maxval=2.0)
    Y = jnp.sin(X) + 0.1 * jax.random.normal(jax.random.PRNGKey(8), X.shape, X.dtype)
    model, ds = _vgp_with_likelihood(
        GaussianLikelihood(variance=jnp.asarray(1.0, X.dtype)), X, Y
    )
    model.optimize(ds)
    fitted = float(model.params.likelihood.variance)
    assert fitted != 1.0
    assert 1e-4 < fitted < 0.5  # pulled toward the generative 0.01


# ------------------------------------------------------------------ encoded models


def test_encoded_model_routes_through_encoder():
    from tests.util.models import QuadraticMeanAndRBFKernel
    from trieste_tpu.models.encoders import EncodedProbabilisticModel

    inner = QuadraticMeanAndRBFKernel()

    def encoder(x):
        return 2.0 * jnp.asarray(x)  # doubling encoder

    wrapped = EncodedProbabilisticModel(inner, encoder)
    x = jnp.array([[0.5]])
    mean_w, var_w = wrapped.predict(x)
    mean_i, var_i = inner.predict(2.0 * x)
    np.testing.assert_allclose(np.asarray(mean_w), np.asarray(mean_i))
    np.testing.assert_allclose(np.asarray(var_w), np.asarray(var_i))
    # the pytree-partial path encodes too
    p = wrapped.predict_partial()
    m2, _ = p(x)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mean_i))


def test_encode_dataset():
    from trieste_tpu.models.encoders import encode_dataset

    ds = mk_dataset(jnp.array([[1.0], [2.0]]), jnp.array([[0.1], [0.2]]))
    enc = encode_dataset(ds, lambda x: x + 10.0)
    np.testing.assert_allclose(np.asarray(enc.trimmed_query_points), [[11.0], [12.0]])
    np.testing.assert_allclose(np.asarray(enc.trimmed_observations), [[0.1], [0.2]])


# ------------------------------------------------------------------ model stacks


def test_model_stack_concatenates_outputs():
    from tests.util.models import GaussianProcess
    from trieste_tpu.models.interfaces import ModelStack
    from trieste_tpu.ops.kernels import stationary

    m1 = GaussianProcess([lambda x: jnp.sum(x, -1)], [stationary("rbf", 1.0, 1.0)])
    m2 = GaussianProcess(
        [lambda x: -jnp.sum(x, -1), lambda x: jnp.sum(x**2, -1)],
        [stationary("rbf", 0.5, 1.0), stationary("matern32", 2.0, 1.0)],
    )
    stack = ModelStack((m1, 1), (m2, 2))
    x = jnp.array([[0.3], [0.7]])
    mean, var = stack.predict(x)
    assert mean.shape == (2, 3) and var.shape == (2, 3)
    m1m, m1v = m1.predict(x)
    m2m, m2v = m2.predict(x)
    np.testing.assert_allclose(np.asarray(mean), np.concatenate([m1m, m2m], -1))
    np.testing.assert_allclose(np.asarray(var), np.concatenate([m1v, m2v], -1))


def test_trainable_stack_splits_data_by_event_size(key):
    from trieste_tpu.models.gp import build_gpr
    from trieste_tpu.models.interfaces import TrainableModelStack

    X = jax.random.uniform(key, (10, 1))
    Y = jnp.concatenate([X**2, -X], axis=-1)
    ds = Dataset.from_arrays(X, Y)
    space = Box([0.0], [1.0])
    g1 = build_gpr(Dataset.from_arrays(X, Y[:, :1]), space, likelihood_variance=1e-4)
    g2 = build_gpr(Dataset.from_arrays(X, Y[:, 1:]), space, likelihood_variance=1e-4)
    stack = TrainableModelStack((g1, 1), (g2, 1))
    stack.update(ds)
    stack.optimize(ds)
    mean, _ = stack.predict(X)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(Y), atol=0.05)


# ------------------------------------------------------------------ deep ensembles


def test_deep_ensemble_members_disagree_off_data_and_fit_on_data(key):
    from trieste_tpu.models.ensembles.deep_ensemble import build_deep_ensemble

    X = jnp.linspace(-1.0, 1.0, 30)[:, None]
    Y = jnp.sin(2.0 * X)
    ds = Dataset.from_arrays(X, Y)
    model = build_deep_ensemble(ds, ensemble_size=4, hidden_units=(32, 32))
    model.optimize(ds)
    mean, var = model.predict(X)
    rmse = float(jnp.sqrt(jnp.mean((mean - Y) ** 2)))
    assert rmse < 0.25, f"in-sample rmse {rmse}"
    # epistemic variance must be larger far from the data
    _, var_out = model.predict(jnp.array([[3.0]]))
    assert float(var_out[0, 0]) > float(jnp.median(var))


def test_deep_ensemble_trajectory_matches_some_member(key):
    from trieste_tpu.models.ensembles.deep_ensemble import (
        DeepEnsembleTrajectorySampler,
        build_deep_ensemble,
    )

    X = jnp.linspace(-1.0, 1.0, 20)[:, None]
    ds = Dataset.from_arrays(X, jnp.square(X))
    model = build_deep_ensemble(ds, ensemble_size=3, hidden_units=(16,))
    model.optimize(ds)
    traj = DeepEnsembleTrajectorySampler(model).get_trajectory(key, batch_size=1)
    x = jnp.array([[0.2], [0.6]])[:, None, :]
    vals = np.asarray(traj(x))[:, 0]
    member_means, _ = model.predict_ensemble(x[:, 0, :])  # [E, N, L]
    member_means = np.asarray(member_means)[..., 0]
    assert any(np.allclose(vals[:, 0], m, atol=1e-5) for m in member_means)


# ------------------------------------------------------------------ deep GP


def test_deep_gp_fits_and_predicts(key):
    from trieste_tpu.models.deepgp.deep_gp import build_vanilla_deep_gp

    X = jnp.linspace(0.0, 1.0, 25)[:, None]
    Y = jnp.sin(6.0 * X)
    ds = Dataset.from_arrays(X, Y)
    model = build_vanilla_deep_gp(ds, Box([0.0], [1.0]), num_layers=2, num_inducing_points=15)
    model.optimize(ds)
    mean, var = model.predict(X)
    assert mean.shape == (25, 1) and var.shape == (25, 1)
    assert bool(jnp.all(var > 0))
    rmse = float(jnp.sqrt(jnp.mean((mean - Y) ** 2)))
    assert rmse < 0.4, f"DGP in-sample rmse {rmse}"
