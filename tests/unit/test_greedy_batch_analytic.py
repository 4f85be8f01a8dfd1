"""Closed-form value tests for the local-penalization greedy-batch machinery, matching
the reference's analytic assertions
(``/root/reference/tests/unit/acquisition/function/test_greedy_batch.py``): the
soft (Gonzalez et al.) and hard (Alvi et al.) penalizers against direct scipy
recomputation, and the exact base×penalizer composition of the penalized acquisition.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from jax.tree_util import Partial

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.function.greedy_batch import (
    LocalPenalization,
    _hard_penalizer_fn,
    _soft_penalizer_fn,
)
from trieste_tpu.space import Box


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=0.5)


def test_soft_penalizer_matches_scipy_formula(model):
    lipschitz, eta = 12.0, 0.05
    pending = jnp.asarray([[0.4, 0.1], [-0.3, 0.2]])
    x = jnp.asarray([[[0.1, -0.2]]])
    got = float(
        _soft_penalizer_fn(
            Partial(model.predict), jnp.asarray(lipschitz), jnp.asarray(eta), pending, x
        )[0, 0]
    )
    mean, var = model.predict(pending)
    mean, var = np.asarray(mean)[:, 0], np.asarray(var)[:, 0]
    radius = (mean - eta) / lipschitz
    scale = np.sqrt(var) / lipschitz
    r = np.linalg.norm(np.asarray(x)[0, 0] - np.asarray(pending), axis=-1)
    z = (r - radius) / (np.sqrt(2.0) * scale)
    want = float(np.prod(0.5 * scipy.special.erfc(-z)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_hard_penalizer_matches_reference_formula(model):
    lipschitz, eta = 12.0, 0.05
    pending = jnp.asarray([[0.4, 0.1], [-0.3, 0.2]])
    x = jnp.asarray([[[0.1, -0.2]]])
    got = float(
        _hard_penalizer_fn(
            Partial(model.predict), jnp.asarray(lipschitz), jnp.asarray(eta), pending, x
        )[0, 0]
    )
    mean, var = model.predict(pending)
    mean, var = np.asarray(mean)[:, 0], np.asarray(var)[:, 0]
    gamma = mean - eta + np.sqrt(var)
    r = np.linalg.norm(np.asarray(x)[0, 0] - np.asarray(pending), axis=-1)
    want = float(np.prod(np.minimum(1.0, lipschitz * r / gamma)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("kind", ["soft", "hard"])
def test_penalizers_are_in_unit_interval_and_vanish_at_pending(model, kind):
    fn = _soft_penalizer_fn if kind == "soft" else _hard_penalizer_fn
    pending = jnp.asarray([[0.0, 0.0]])
    penalizer = Partial(
        fn, Partial(model.predict), jnp.asarray(10.0), jnp.asarray(0.0), pending
    )
    grid = jnp.stack(
        [jnp.linspace(-2.0, 2.0, 9), jnp.linspace(-2.0, 2.0, 9)], axis=-1
    )[:, None, :]
    vals = np.asarray(penalizer(grid))[:, 0]
    assert np.all(vals >= 0.0) and np.all(vals <= 1.0 + 1e-9)
    at_pending = float(penalizer(jnp.asarray([[[0.0, 0.0]]]))[0, 0])
    far = float(penalizer(jnp.asarray([[[2.0, 2.0]]]))[0, 0])
    # at the pending point (mean==eta, r==0) the soft penalizer is exactly 0.5 and
    # the hard one is 0; both approach 1 far away
    assert at_pending <= 0.5
    assert far > 0.9


@pytest.mark.parametrize("kind", ["soft", "hard"])
def test_penalized_acquisition_is_exact_base_times_penalizer(model, kind):
    """Reference ``test_locally_penalized_acquisitions_combine_base_and_penalization
    _correctly``: with pending points the prepared function equals the no-pending base
    multiplied by the penalizer built from the same lipschitz/eta state."""
    space = Box([-1.0, -1.0], [1.0, 1.0])
    data = mk_dataset([[0.2, 0.1], [-0.4, 0.3]], [[0.05], [0.25]])
    pending = jnp.asarray([[0.5, -0.5]])

    builder = LocalPenalization(space, penalizer=kind, key=jax.random.PRNGKey(0))
    with_pending = builder.prepare_acquisition_function(model, data, pending)
    base = builder._base_fn
    pen_fn = _soft_penalizer_fn if kind == "soft" else _hard_penalizer_fn
    penalizer = Partial(
        pen_fn, Partial(model.predict), builder._lipschitz, builder._eta, pending
    )
    x = jnp.asarray([[[0.1, 0.2]], [[0.8, -0.9]], [[-0.7, 0.0]]])
    got = np.asarray(with_pending(x))
    want = np.asarray(base(x)) * np.asarray(penalizer(x))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_update_without_new_step_keeps_base_function(model):
    """Within one greedy batch (new_optimization_step=False) the base acquisition and
    lipschitz state are frozen; only the penalizer changes with the pending set."""
    space = Box([-1.0, -1.0], [1.0, 1.0])
    data = mk_dataset([[0.2, 0.1], [-0.4, 0.3]], [[0.05], [0.25]])
    builder = LocalPenalization(space, key=jax.random.PRNGKey(0))
    first = builder.prepare_acquisition_function(model, data, None)
    base_before = builder._base_fn
    lipschitz_before = float(builder._lipschitz)
    updated = builder.update_acquisition_function(
        first, model, data,
        pending_points=jnp.asarray([[0.3, 0.3]]),
        new_optimization_step=False,
    )
    assert builder._base_fn is base_before
    assert float(builder._lipschitz) == lipschitz_before
    x = jnp.asarray([[[0.1, 0.2]]])
    # penalized value differs from the base at points near the pending point
    assert float(updated(x)[0, 0]) < float(base_before(x)[0, 0])
