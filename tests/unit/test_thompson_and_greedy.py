"""Value-level tests for Thompson samplers, local-penalization, and HMC (role of
reference ``tests/unit/acquisition/test_sampler.py`` and ``test_greedy_batch.py``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.function.greedy_batch import (
    LocalPenalization,
    _hard_penalizer_fn,
    _soft_penalizer_fn,
)
from trieste_tpu.acquisition.sampler import ExactThompsonSampler, GumbelSampler
from trieste_tpu.acquisition.utils import predictor
from trieste_tpu.space import Box


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=1.0)


@pytest.fixture
def dataset():
    x = jnp.linspace(-1.0, 1.0, 6)[:, None]
    return mk_dataset(x, jnp.square(x))


# ---------------------------------------------------------------- Thompson samplers


def test_exact_thompson_sampler_near_deterministic_model(dataset, key):
    """With a vanishing kernel amplitude the joint samples collapse to the mean x^2, so
    every sampled minimizer is the candidate closest to 0."""
    model = QuadraticMeanAndRBFKernel(kernel_amplitude=1e-12)
    at = jnp.linspace(-1.0, 1.0, 21)[:, None]
    samples = ExactThompsonSampler().sample(model, 7, at, key=key)
    assert samples.shape == (7, 1)
    np.testing.assert_allclose(np.asarray(samples), 0.0, atol=1e-6)


def test_exact_thompson_min_values_bounded_by_sample_min(model, key):
    at = jnp.linspace(-1.0, 1.0, 30)[:, None]
    mins = ExactThompsonSampler(sample_min_value=True).sample(model, 50, at, key=key)
    assert mins.shape == (50, 1)
    # each min value must not exceed the smallest posterior mean by a wide margin
    mean, _ = model.predict(at)
    assert bool(jnp.all(mins <= jnp.min(mean) + 3.0))


def test_gumbel_sampler_distribution(model, key):
    """Gumbel min-value samples must lie below the minimum posterior mean and their
    spread must shrink as posterior variance shrinks."""
    at = jnp.linspace(-1.0, 1.0, 50)[:, None]
    wide = GumbelSampler().sample(model, 400, at, key=key)
    tight_model = QuadraticMeanAndRBFKernel(kernel_amplitude=1e-6)
    tight = GumbelSampler().sample(tight_model, 400, at, key=key)
    mean, _ = model.predict(at)
    assert bool(jnp.all(wide <= jnp.min(mean) + 1e-9))
    assert float(jnp.std(tight)) < float(jnp.std(wide))
    np.testing.assert_allclose(float(jnp.mean(tight)), 0.0, atol=0.05)


def test_gumbel_sampler_validation(model):
    with pytest.raises(ValueError):
        GumbelSampler(sample_min_value=False)
    with pytest.raises(ValueError):
        GumbelSampler().sample(model, 0, jnp.zeros((3, 1)))


# ---------------------------------------------------------------- local penalization


def test_soft_penalizer_analytic_and_monotone(model):
    """phi = prod_p Phi((|x - p| - radius)/(sqrt(2) scale)) — checked against scipy and
    monotonically increasing in the distance from the pending point."""
    pending = jnp.array([[0.5]])
    lipschitz, eta = jnp.asarray(4.0), jnp.asarray(-0.1)
    xs = jnp.linspace(0.5, 2.0, 9)[:, None, None]
    got = np.asarray(
        _soft_penalizer_fn(predictor(model), lipschitz, eta, pending, xs)
    )[:, 0]
    mean, var = model.predict(pending)
    radius = (float(mean[0, 0]) - float(eta)) / 4.0
    scale = np.sqrt(float(var[0, 0])) / 4.0
    # phi = 0.5 erfc(-z), z = (r - radius)/(sqrt(2) scale)  ==  Phi((r - radius)/scale)
    want = scipy.stats.norm.cdf(
        (np.abs(np.asarray(xs)[:, 0, 0] - 0.5) - radius) / scale
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert np.all(np.diff(got) >= -1e-12)  # further from pending => less penalized
    assert np.all((got >= 0) & (got <= 1))


def test_hard_penalizer_analytic(model):
    pending = jnp.array([[0.0]])
    lipschitz, eta = jnp.asarray(2.0), jnp.asarray(-0.5)
    xs = jnp.linspace(0.0, 3.0, 7)[:, None, None]
    got = np.asarray(
        _hard_penalizer_fn(predictor(model), lipschitz, eta, pending, xs)
    )[:, 0]
    mean, var = model.predict(pending)
    gamma = float(mean[0, 0]) - float(eta) + np.sqrt(float(var[0, 0]))
    want = np.minimum(1.0, 2.0 * np.abs(np.asarray(xs)[:, 0, 0]) / gamma)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("penalizer", ["soft", "hard"])
def test_local_penalization_reduces_acq_near_pending(model, dataset, penalizer, key):
    space = Box([-2.0], [2.0])
    builder = LocalPenalization(space, num_samples=200, penalizer=penalizer)
    base = builder.prepare_acquisition_function(model, dataset, None)
    x = jnp.linspace(-2.0, 2.0, 81)[:, None, None]
    best = x[jnp.argmax(base(x)[:, 0])]
    penalized = builder.update_acquisition_function(
        base, model, dataset, pending_points=best, new_optimization_step=False
    )
    # at the pending point itself the acquisition must drop strictly
    at_pending = best[None]
    assert float(penalized(at_pending)[0, 0]) < float(base(at_pending)[0, 0])
    # far away it is essentially unchanged (ratio -> 1)
    far = jnp.array([[[-2.0]]]) if float(best[0, 0]) > 0 else jnp.array([[[2.0]]])
    ratio = float(penalized(far)[0, 0]) / float(base(far)[0, 0])
    assert ratio > 0.9


def test_local_penalization_validation():
    space = Box([-2.0], [2.0])
    with pytest.raises(ValueError):
        LocalPenalization(space, num_samples=0)
    with pytest.raises(ValueError):
        LocalPenalization(space, penalizer="nope")


# ---------------------------------------------------------------- HMC conjugate check


def test_hmc_recovers_gaussian_moments(key):
    """HMC on a correlated 2d Gaussian recovers mean and covariance (the conjugate-toy
    sanity check behind the fully-Bayesian GPR)."""
    from trieste_tpu.ops.hmc import hmc_sample

    mu = jnp.array([1.0, -2.0])
    cov = jnp.array([[1.0, 0.6], [0.6, 0.8]])
    prec = jnp.linalg.inv(cov)

    def log_prob(q):
        d = q - mu
        return -0.5 * d @ prec @ d

    keys = jax.random.split(key, 8)
    inits = mu + 0.1 * jax.random.normal(keys[0], (8, 2))
    res = jax.vmap(
        lambda k, q0: hmc_sample(
            k, log_prob, q0, num_samples=400, num_warmup=200, num_leapfrog=16
        )
    )(keys, inits)
    samples = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(0), np.asarray(mu), atol=0.1)
    np.testing.assert_allclose(np.cov(samples.T), np.asarray(cov), atol=0.15)
    assert float(np.mean(np.asarray(res.accept_rate))) > 0.5
