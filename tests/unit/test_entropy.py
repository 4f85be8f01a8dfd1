"""Value-level tests for the entropy acquisition family (role of reference
``tests/unit/acquisition/test_entropy.py``): analytic recomputation of MES/GIBBON on the
closed-form ``QuadraticMeanAndRBFKernel`` fake, plus the structural properties the
reference asserts (positivity, repulsion behavior, batch diversity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.function.entropy import (
    GIBBON,
    CLAMP_LB,
    MinValueEntropySearch,
    _gibbon_quality_fn,
    _gibbon_repulsion_fn,
    _mes_fn,
)
from trieste_tpu.acquisition.sampler import ExactThompsonSampler, GumbelSampler
from trieste_tpu.acquisition.utils import predictor
from trieste_tpu.space import Box


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=0.25)


@pytest.fixture
def dataset():
    x = jnp.linspace(-1.0, 1.0, 7)[:, None]
    return mk_dataset(x, jnp.square(x))


def _mes_scipy(mean, var, min_samples):
    """Independent scipy recomputation of the MES formula
    (reference ``entropy.py:173-213``)."""
    std = np.sqrt(np.maximum(var, CLAMP_LB))
    gamma = (min_samples[None, :] - mean) / std  # [N, S]
    minus_cdf = np.clip(1.0 - scipy.stats.norm.cdf(gamma), CLAMP_LB, 1.0)
    vals = -gamma * scipy.stats.norm.pdf(gamma) / (2.0 * minus_cdf) - np.log(minus_cdf)
    return vals.mean(axis=-1)


def test_mes_matches_scipy_recomputation(model):
    min_samples = jnp.array([[-0.5], [0.1], [0.4]])
    x = jnp.linspace(-2.0, 2.0, 9)[:, None]
    fn_vals = np.asarray(_mes_fn(predictor(model), min_samples, x[:, None, :]))[:, 0]
    mean, var = model.predict(x)
    expected = _mes_scipy(
        np.asarray(mean), np.asarray(var), np.asarray(min_samples)[:, 0]
    )
    np.testing.assert_allclose(fn_vals, expected, rtol=1e-6)


def test_mes_is_positive_and_peaks_away_from_data(model, dataset):
    space = Box([-2.0], [2.0])
    builder = MinValueEntropySearch(space, num_samples=10, grid_size=500)
    mes = builder.prepare_acquisition_function(model, dataset)
    x = jnp.linspace(-2.0, 2.0, 41)[:, None, None]
    vals = mes(x)
    assert vals.shape == (41, 1)
    assert bool(jnp.all(vals >= -1e-9))
    # the mean x^2 is minimized at 0 where the min-value distribution concentrates, so
    # the entropy reduction must peak near the minimizer rather than at the edges
    assert abs(float(x[jnp.argmax(vals[:, 0]), 0, 0])) < 1.0


def test_mes_validation(model, dataset):
    space = Box([-2.0], [2.0])
    with pytest.raises(ValueError):
        MinValueEntropySearch(space, num_samples=0)
    with pytest.raises(ValueError):
        MinValueEntropySearch(space, grid_size=0)
    with pytest.raises(ValueError):
        MinValueEntropySearch(
            space, min_value_sampler=ExactThompsonSampler(sample_min_value=False)
        )
    with pytest.raises(ValueError):
        MinValueEntropySearch(space).prepare_acquisition_function(model, None)


def _gibbon_quality_scipy(mean, var, noise, min_samples):
    """Independent recomputation of the GIBBON quality lower bound
    (reference ``entropy.py:439-502``)."""
    var = np.maximum(var, CLAMP_LB)
    std = np.sqrt(var)
    rho2 = var / (var + noise)
    gamma = (min_samples[None, :] - mean) / std
    minus_cdf = np.clip(1.0 - scipy.stats.norm.cdf(gamma), CLAMP_LB, 1.0)
    ratio = scipy.stats.norm.pdf(gamma) / minus_cdf
    trunc = np.clip(1.0 - ratio * (ratio - gamma), CLAMP_LB, 1.0)
    inner = np.clip(1.0 - rho2 * (1.0 - trunc), CLAMP_LB, 1.0)
    return -0.5 * np.log(inner).mean(axis=-1)


def test_gibbon_quality_matches_scipy_recomputation(model):
    min_samples = jnp.array([[-0.3], [0.2]])
    x = jnp.linspace(-1.5, 1.5, 11)[:, None]
    got = np.asarray(
        _gibbon_quality_fn(
            predictor(model), jnp.asarray(0.25), min_samples, x[:, None, :]
        )
    )[:, 0]
    mean, var = model.predict(x)
    want = _gibbon_quality_scipy(
        np.asarray(mean), np.asarray(var), 0.25, np.asarray(min_samples)[:, 0]
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gibbon_repulsion_single_pending_analytic(model):
    """With one pending point, 0.5 log det(corr) == 0.5 log(1 - r^2) with r the
    noisy predictive correlation — checked against a direct computation."""
    from jax.tree_util import Partial

    pending = jnp.array([[0.4]])
    x = jnp.array([[[0.1]], [[1.2]]])
    joint = Partial(model.predict_joint)
    noise = jnp.asarray(0.25)
    got = np.asarray(_gibbon_repulsion_fn(None, joint, noise, pending, x))[:, 0]
    for i, xi in enumerate([0.1, 1.2]):
        pts = jnp.array([[0.4], [xi]])
        _, cov = model.predict_joint(pts)
        c = np.asarray(cov[0]) + 0.25 * np.eye(2)
        r = c[0, 1] / np.sqrt(c[0, 0] * c[1, 1])
        np.testing.assert_allclose(got[i], 0.5 * np.log(1 - r**2), rtol=1e-6)
    # repulsion is more negative the closer the candidate is to the pending point
    assert got[0] < got[1]


def test_gibbon_greedy_batch_is_diverse(model, dataset, key):
    """The repulsion term must push the second batch point away from the first."""
    space = Box([-2.0], [2.0])
    builder = GIBBON(space, key=jax.random.PRNGKey(4))
    fn = builder.prepare_acquisition_function(model, dataset, None)
    x = jnp.linspace(-2.0, 2.0, 81)[:, None, None]
    first = x[jnp.argmax(fn(x)[:, 0]), 0]
    fn2 = builder.update_acquisition_function(
        fn, model, dataset, pending_points=first[None], new_optimization_step=False
    )
    second = x[jnp.argmax(fn2(x)[:, 0]), 0]
    assert abs(float(first[0]) - float(second[0])) > 0.05
