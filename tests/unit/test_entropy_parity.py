"""Entropy-family semantic parity with the reference
(``/root/reference/tests/unit/acquisition/function/test_entropy.py``): the
cross-acquisition equivalences — MES vs probability-of-improvement at a single known
minimum sample, GIBBON vs MES choice, and the batch-GIBBON quality+repulsion
decomposition — plus MUMBO's reduction to GIBBON at the top fidelity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.function.entropy import (
    GIBBON,
    MinValueEntropySearch,
    _gibbon_quality_fn,
    _gibbon_repulsion_fn,
    _mes_fn,
)
from trieste_tpu.acquisition.function.function import ProbabilityOfImprovement
from trieste_tpu.space import Box


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=1.0)


@pytest.fixture
def grid():
    g = jnp.linspace(-1.5, 1.5, 21)
    xx, yy = jnp.meshgrid(g, g)
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)[:, None, :]  # [N, 1, 2]


def test_mes_chooses_same_as_probability_of_improvement(model, grid):
    """With a single point-mass minimum sample, maximizing MES is equivalent to
    maximizing the probability of improving on that value (reference
    ``test_min_value_entropy_search_chooses_same_as_probability_of_improvement``)."""
    from jax.tree_util import Partial

    min_value = jnp.asarray([[0.3]])
    mes = Partial(_mes_fn, Partial(model.predict), min_value)
    mes_vals = np.asarray(mes(grid))[:, 0]

    from trieste_tpu.acquisition.function.function import _poi_fn

    poi = Partial(_poi_fn, Partial(model.predict), jnp.asarray(0.3))
    poi_vals = np.asarray(poi(grid))[:, 0]

    assert int(np.argmax(mes_vals)) == int(np.argmax(poi_vals))
    # MES is a monotone transform of PoI in this single-sample case: sorting the grid
    # by PoI must leave MES (weakly) increasing, up to f32 round-off on ties
    mes_by_poi = mes_vals[np.argsort(poi_vals)]
    drops = np.diff(mes_by_poi)
    assert drops.min() > -1e-6


def test_gibbon_chooses_same_as_mes(model, grid):
    """Single-sample GIBBON's quality term and MES induce the same argmax (reference
    ``test_gibbon_chooses_same_as_min_value_entropy_search``)."""
    from jax.tree_util import Partial

    min_value = jnp.asarray([[0.3]])
    mes_vals = np.asarray(
        Partial(_mes_fn, Partial(model.predict), min_value)(grid)
    )[:, 0]
    gibbon_vals = np.asarray(
        _gibbon_quality_fn(
            Partial(model.predict), model.get_observation_noise(), min_value, grid
        )
    )[:, 0]
    assert int(np.argmax(gibbon_vals)) == int(np.argmax(mes_vals))


def test_batch_gibbon_is_quality_plus_repulsion(model):
    """Pending-point GIBBON decomposes exactly as quality + repulsion (reference
    ``test_batch_gibbon_is_sum_of_individual_gibbons_and_repulsion_term``)."""
    space = Box([-1.0, -1.0], [1.0, 1.0])
    data = mk_dataset([[0.2, 0.1], [-0.4, 0.3]], [[0.05], [0.25]])
    pending = jnp.asarray([[0.5, -0.5], [-0.2, 0.6]])
    builder = GIBBON(space, key=jax.random.PRNGKey(1))
    fn_with_pending = builder.prepare_acquisition_function(
        model, data, pending_points=pending
    )
    # the same builder state without pending points gives the pure quality term
    builder2 = GIBBON(space, key=jax.random.PRNGKey(1))
    quality_only = builder2.prepare_acquisition_function(model, data)

    from jax.tree_util import Partial

    repulsion = Partial(
        _gibbon_repulsion_fn,
        Partial(model.predict),
        Partial(model.predict_joint),
        model.get_observation_noise(),
        pending,
    )
    x = jnp.asarray([[[0.1, 0.2]], [[0.7, -0.1]], [[-0.6, -0.6]]])
    got = np.asarray(fn_with_pending(x))
    want = np.asarray(quality_only(x)) + np.asarray(repulsion(x))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gibbon_repulsion_is_nonpositive_and_decays_with_distance(model):
    """Correlation log-dets are ≤ 0, and repulsion fades away from the pending batch."""
    from jax.tree_util import Partial

    pending = jnp.asarray([[0.0, 0.0]])
    repulsion = Partial(
        _gibbon_repulsion_fn,
        Partial(model.predict),
        Partial(model.predict_joint),
        model.get_observation_noise(),
        pending,
    )
    near = float(repulsion(jnp.asarray([[[0.05, 0.0]]]))[0, 0])
    far = float(repulsion(jnp.asarray([[[1.4, 1.4]]]))[0, 0])
    assert near < far <= 0.0 + 1e-9
    assert abs(far) < 1e-2  # nearly independent -> log det ~ 0


def test_mumbo_at_top_fidelity_reduces_to_gibbon_quality(model):
    """At the top fidelity, MUMBO's information bound with
    ``cov(y_m, f_top) = var(f)`` reduces exactly to GIBBON's quality term — the
    multifidelity correlation becomes the ordinary latent/observed rho (reference
    MUMBO construction, ``entropy.py:634-791``)."""
    from jax.tree_util import Partial

    from trieste_tpu.acquisition.function.entropy import _mumbo_fn

    min_value = jnp.asarray([[0.3], [0.1]])
    x = jnp.asarray([[[0.4, -0.3]], [[0.9, 0.8]], [[-0.2, 0.0]]])
    noise = model.get_observation_noise()

    def latent_cov_with_itself(xq):
        _, var = model.predict(xq)
        return var

    mumbo_vals = np.asarray(
        _mumbo_fn(
            Partial(model.predict),
            Partial(latent_cov_with_itself),
            Partial(model.predict),
            noise,
            min_value,
            x,
        )
    )
    gibbon_vals = np.asarray(
        _gibbon_quality_fn(Partial(model.predict), noise, min_value, x)
    )
    np.testing.assert_allclose(mumbo_vals, gibbon_vals, rtol=1e-6)
