"""Uniform protocol matrix across every trainable model family.

The JAX analogue of the reference's ``gpflow_interface_factory`` fixture strategy
(``tests/unit/models/gpflow/conftest.py:50-73`` + the cross-wrapper sections of
``test_models.py``): one parametrized matrix asserting the shared
``ProbabilisticModel``/``TrainableProbabilisticModel`` contracts hold for every
wrapper, not just the ones with dedicated contract files.

Contracts per family: prediction shapes and leading-dim polymorphism, ``predict_y``
variance dominating ``predict`` variance, sample-moment consistency with ``predict``,
``update`` + conditioning tightening the posterior at observed points, and sampler
protocol conformance where advertised.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import Dataset
from trieste_tpu.models.deepgp import build_vanilla_deep_gp
from trieste_tpu.models.ensembles import build_deep_ensemble
from trieste_tpu.models.gp import (
    build_gpr,
    build_gpr_mcmc,
    build_sgpr,
    build_svgp,
)
from trieste_tpu.models.interfaces import (
    HasReparamSampler,
    HasTrajectorySampler,
    ProbabilisticModel,
    TrainableProbabilisticModel,
)
from trieste_tpu.space import Box

D = 2
N = 16


def _dataset(key=0):
    k = jax.random.PRNGKey(key)
    X = jax.random.uniform(k, (N, D))
    Y = jnp.sum(jnp.square(X - 0.4), axis=-1, keepdims=True)
    return Dataset.from_arrays(X, Y)


def _space():
    return Box(jnp.zeros(D), jnp.ones(D))


FACTORIES = {
    "gpr": lambda ds, sp: build_gpr(ds, sp, likelihood_variance=1e-5),
    "sgpr": lambda ds, sp: build_sgpr(ds, sp, num_inducing_points=8),
    "svgp": lambda ds, sp: build_svgp(ds, sp, num_inducing_points=8),
    "gpr-mcmc": lambda ds, sp: build_gpr_mcmc(
        ds, sp, num_chains=2, num_samples_per_chain=4, num_warmup=10, num_retained=4
    ),
    "dgp": lambda ds, sp: build_vanilla_deep_gp(
        ds, sp, num_layers=2, num_train_steps=60
    ),
    "deep-ensemble": lambda ds, sp: build_deep_ensemble(
        ds, ensemble_size=3, num_train_steps=80
    ),
}


@pytest.fixture(scope="module", params=sorted(FACTORIES))
def fitted(request):
    """One optimized model per family, shared across this module's tests."""
    ds = _dataset()
    model = FACTORIES[request.param](ds, _space())
    model.optimize(ds)
    return request.param, model, ds


def test_is_probabilistic_and_trainable(fitted):
    name, model, ds = fitted
    assert isinstance(model, ProbabilisticModel)
    assert isinstance(model, TrainableProbabilisticModel)


def test_predict_shapes_and_dtype(fitted):
    name, model, ds = fitted
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, D))
    mean, var = model.predict(x)
    assert mean.shape == (5, 1) and var.shape == (5, 1)
    assert bool(jnp.all(var > 0))
    assert mean.dtype == x.dtype


def test_leading_dim_polymorphism(fitted):
    name, model, ds = fitted
    x = jax.random.uniform(jax.random.PRNGKey(2), (6, D))
    mean_flat, var_flat = model.predict(x)
    mean_b, var_b = model.predict(x.reshape(3, 2, D))
    np.testing.assert_allclose(mean_b.reshape(6, 1), mean_flat, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(var_b.reshape(6, 1), var_flat, rtol=1e-6, atol=1e-7)


def test_predict_y_dominates_predict_variance(fitted):
    name, model, ds = fitted
    x = jax.random.uniform(jax.random.PRNGKey(3), (7, D))
    _, var_f = model.predict(x)
    mean_y, var_y = model.predict_y(x)
    # predict_y adds observation noise (deep ensemble: predictive already total)
    assert bool(jnp.all(var_y >= var_f - 1e-12))


def test_sample_moments_consistent_with_predict(fitted):
    name, model, ds = fitted
    x = jax.random.uniform(jax.random.PRNGKey(4), (3, D))
    mean, var = model.predict(x)
    samples = model.sample(jax.random.PRNGKey(5), x, 3000)
    assert samples.shape == (3000, 3, 1)
    std = jnp.sqrt(var)
    err = jnp.abs(jnp.mean(samples, axis=0) - mean) / jnp.maximum(std, 1e-6)
    # the SE of the sample mean is std/sqrt(3000) ~ std/55; 0.5·std is generous slack
    # for the non-Gaussian families (MCMC mixtures, DGP) while catching gross breaks
    assert bool(jnp.all(err < 0.5)), err


def test_update_then_refit_tightens_at_new_points(fitted):
    name, model, ds = fitted
    if name == "deep-ensemble":
        pytest.skip("no posterior-contraction guarantee for bootstrap ensembles")
    x_new = jnp.array([[0.9, 0.1], [0.1, 0.9]])
    _, var_before = model.predict(x_new)
    y_new = jnp.sum(jnp.square(x_new - 0.4), axis=-1, keepdims=True)
    bigger = Dataset.from_arrays(
        jnp.concatenate([ds.trimmed_query_points, x_new]),
        jnp.concatenate([ds.trimmed_observations, y_new]),
    )
    model.update(bigger)
    model.optimize(bigger)
    _, var_after = model.predict(x_new)
    assert float(jnp.mean(var_after)) < float(jnp.mean(var_before)) + 1e-6


def test_advertised_samplers_conform(fitted):
    name, model, ds = fitted
    x = jax.random.uniform(jax.random.PRNGKey(6), (4, 1, D))
    if isinstance(model, HasTrajectorySampler):
        traj = model.trajectory_sampler().get_trajectory(jax.random.PRNGKey(7), 1)
        out = traj(x)
        assert out.shape[0] == 4 and jnp.all(jnp.isfinite(out))
    if isinstance(model, HasReparamSampler):
        sampler = model.reparam_sampler(16)
        s = sampler.sample(x, key=jax.random.PRNGKey(8))
        assert s.shape[-2] == 1 and jnp.all(jnp.isfinite(s))
