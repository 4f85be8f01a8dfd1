"""Acquisition rule tests (role of reference ``tests/unit/acquisition/test_rule.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.function.function import (
    BatchMonteCarloExpectedImprovement,
    ExpectedImprovement,
    MultipleOptimismNegativeLowerConfidenceBound,
)
from trieste_tpu.acquisition.rule import (
    AsynchronousGreedy,
    AsynchronousOptimization,
    AsynchronousRuleState,
    DiscreteThompsonSampling,
    EfficientGlobalOptimization,
    RandomSampling,
)
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box


@pytest.fixture
def setup():
    model = QuadraticMeanAndRBFKernel()
    dataset = mk_dataset([[-1.0], [0.0], [1.0]], [[1.1], [0.1], [0.9]])
    space = Box([-2.0], [2.0])
    return space, model, dataset


FAST_OPT = generate_continuous_optimizer(num_initial_samples=128, num_optimization_runs=4)


def test_ego_default_is_ei(setup, key):
    space, model, dataset = setup
    rule = EfficientGlobalOptimization(optimizer=FAST_OPT)
    pts = rule.acquire_single(space, model, dataset, key=key)
    assert pts.shape == (1, 1)
    # EI of the quadratic-mean model is maximized at the mean minimum x=0
    np.testing.assert_allclose(np.asarray(pts), [[0.0]], atol=1e-3)


def test_ego_batch_joint(setup, key):
    space, model, dataset = setup
    rule = EfficientGlobalOptimization(
        BatchMonteCarloExpectedImprovement(1000, key=key),
        optimizer=FAST_OPT,
        num_query_points=3,
    )
    pts = rule.acquire_single(space, model, dataset, key=key)
    assert pts.shape == (3, 1)
    assert bool(jnp.all(space.contains(pts)))


def test_ego_vectorized_builder(setup, key):
    space, model, dataset = setup
    rule = EfficientGlobalOptimization(
        MultipleOptimismNegativeLowerConfidenceBound(space),
        optimizer=FAST_OPT,
        num_query_points=4,
    )
    pts = rule.acquire_single(space, model, dataset, key=key)
    assert pts.shape == (4, 1)
    assert bool(jnp.all(space.contains(pts)))


def test_ego_validation():
    with pytest.raises(ValueError):
        EfficientGlobalOptimization(num_query_points=0)
    with pytest.raises(ValueError):
        EfficientGlobalOptimization(num_query_points=2)  # batch needs explicit builder


def test_random_sampling(setup, key):
    space, model, dataset = setup
    pts = RandomSampling(num_query_points=7).acquire_single(space, model, dataset, key=key)
    assert pts.shape == (7, 1)
    assert bool(jnp.all(space.contains(pts)))


def test_discrete_thompson_sampling(setup, key):
    space, model, dataset = setup
    rule = DiscreteThompsonSampling(num_search_space_samples=200, num_query_points=5)
    pts = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset}, key=key)
    assert pts.shape == (5, 1)
    # TS of the quadratic mean model should concentrate near 0
    assert float(jnp.max(jnp.abs(pts))) < 1.5


def test_discrete_thompson_sampling_validation(setup):
    with pytest.raises(ValueError):
        DiscreteThompsonSampling(0, 5)
    with pytest.raises(ValueError):
        DiscreteThompsonSampling(10, 0)


class TestAsynchronousRuleState:
    def test_add_and_remove(self):
        state = AsynchronousRuleState(None)
        assert not state.has_pending_points
        state = state.add_pending_points(jnp.array([[1.0, 2.0]]))
        state = state.add_pending_points(jnp.array([[3.0, 4.0], [5.0, 6.0]]))
        assert state.pending_points.shape == (3, 2)
        state = state.remove_points(jnp.array([[3.0, 4.0]]))
        np.testing.assert_array_equal(
            np.asarray(state.pending_points), [[1.0, 2.0], [5.0, 6.0]]
        )

    def test_remove_only_first_match(self):
        state = AsynchronousRuleState(jnp.array([[1.0], [1.0]]))
        state = state.remove_points(jnp.array([[1.0]]))
        assert state.pending_points.shape == (1, 1)


def test_asynchronous_optimization_accumulates_pending(setup, key):
    space, model, dataset = setup
    rule = AsynchronousOptimization(
        BatchMonteCarloExpectedImprovement(500, key=key).using(OBJECTIVE),
        optimizer=FAST_OPT,
        num_query_points=2,
    )
    state_fn = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset}, key=key)
    state, pts = state_fn(None)
    assert pts.shape == (2, 1)
    assert state.pending_points.shape == (2, 1)
    # second ask adds more pending points
    state_fn2 = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset}, key=key)
    state2, pts2 = state_fn2(state)
    assert state2.pending_points.shape == (4, 1)
