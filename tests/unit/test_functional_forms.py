"""The function-form acquisition factories must agree with their builder-produced
counterparts (the reference exposes both surfaces; ``acquisition/function/*``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.function import (
    ExpectedImprovement,
    NegativeLowerConfidenceBound,
    ProbabilityOfImprovement,
    augmented_expected_improvement,
    expected_improvement,
    hard_local_penalizer,
    local_penalizer,
    lower_confidence_bound,
    min_value_entropy_search,
    multiple_optimism_lower_confidence_bound,
    predictive_variance,
    probability_below_threshold,
    soft_local_penalizer,
)
from trieste_tpu.acquisition.function.active_learning import PredictiveVariance
from trieste_tpu.acquisition.function.entropy import _mes_fn  # noqa: F401 - presence
from trieste_tpu.acquisition.function.multi_objective import (
    ExpectedHypervolumeImprovement,
)
from trieste_tpu.acquisition.function import expected_hv_improvement


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=1.0)


@pytest.fixture
def xs():
    return jnp.linspace(-1.0, 1.0, 7)[:, None, None] * jnp.ones((1, 1, 2))


def test_expected_improvement_matches_builder(model, xs):
    ds = mk_dataset([[0.3, 0.4], [-0.5, 0.2]], [[0.25], [0.29]])
    builder_fn = ExpectedImprovement().prepare_acquisition_function(model, ds)
    mean, _ = model.predict(ds.trimmed_query_points)
    eta = jnp.min(mean)
    np.testing.assert_allclose(
        np.asarray(expected_improvement(model, eta)(xs)),
        np.asarray(builder_fn(xs)),
        rtol=1e-6,
    )


def test_lcb_forms(model, xs):
    neg = NegativeLowerConfidenceBound(beta=1.5).prepare_acquisition_function(model)
    np.testing.assert_allclose(
        np.asarray(lower_confidence_bound(model, 1.5)(xs)),
        -np.asarray(neg(xs)),
        rtol=1e-6,
    )


def test_probability_below_threshold_matches_poi(model, xs):
    ds = mk_dataset([[0.3, 0.4]], [[0.25]])
    poi = ProbabilityOfImprovement().prepare_acquisition_function(model, ds)
    mean, _ = model.predict(ds.trimmed_query_points)
    eta = jnp.min(mean)
    np.testing.assert_allclose(
        np.asarray(probability_below_threshold(model, eta)(xs)),
        np.asarray(poi(xs)),
        rtol=1e-6,
    )


def test_augmented_ei_positive_and_bounded(model, xs):
    fn = augmented_expected_improvement(model, jnp.asarray(0.5))
    vals = np.asarray(fn(xs))
    assert vals.shape == (7, 1)
    assert np.all(vals >= 0.0)


def test_predictive_variance_matches_builder(model, xs):
    builder_fn = PredictiveVariance().prepare_acquisition_function(model)
    np.testing.assert_allclose(
        np.asarray(predictive_variance(model)(xs)),
        np.asarray(builder_fn(xs)),
        rtol=1e-6,
    )


def test_monlcb_is_vectorized(model):
    fn = multiple_optimism_lower_confidence_bound(model, search_space_dim=2)
    x = jnp.ones((5, 3, 2)) * 0.2  # V=3 slices
    assert fn(x).shape == (5, 3)


def test_mes_evaluates(model, xs):
    samples = jnp.array([[-0.5], [-0.2], [0.1]])
    vals = np.asarray(min_value_entropy_search(model, samples)(xs))
    assert vals.shape == (7, 1) and np.all(np.isfinite(vals))


def test_penalizers_in_unit_interval(model, xs):
    pending = jnp.array([[0.1, 0.1], [0.4, -0.2]])
    for factory in (soft_local_penalizer, hard_local_penalizer):
        pen = factory(model, pending, jnp.asarray(10.0), jnp.asarray(0.0))
        vals = np.asarray(pen(xs))
        assert vals.shape == (7, 1)
        assert np.all(vals >= 0.0) and np.all(vals <= 1.0 + 1e-9)
    base = expected_improvement(model, jnp.asarray(0.5))
    pen = soft_local_penalizer(model, pending, jnp.asarray(10.0), jnp.asarray(0.0))
    combined = local_penalizer(base, pen)
    np.testing.assert_allclose(
        np.asarray(combined(xs)), np.asarray(base(xs)) * np.asarray(pen(xs)), rtol=1e-6
    )


def test_expected_hv_improvement_matches_builder():
    from tests.util.models import GaussianProcess
    from trieste_tpu.acquisition.multi_objective.partition import (
        prepare_default_non_dominated_partition_bounds,
    )
    from trieste_tpu.models.interfaces import ModelStack

    class _M(QuadraticMeanAndRBFKernel):
        pass

    front = jnp.array([[0.2, 0.8], [0.5, 0.5], [0.8, 0.2]])
    ref = jnp.array([1.1, 1.1])
    bounds = prepare_default_non_dominated_partition_bounds(ref, front)
    m1 = QuadraticMeanAndRBFKernel(noise_variance=1.0)
    m2 = QuadraticMeanAndRBFKernel(noise_variance=1.0)
    stack = ModelStack((m1, 1), (m2, 1))
    xs = jnp.linspace(-1.0, 1.0, 5)[:, None, None] * jnp.ones((1, 1, 2))
    vals = np.asarray(expected_hv_improvement(stack, bounds)(xs))
    assert vals.shape == (5, 1) and np.all(vals >= 0.0)
