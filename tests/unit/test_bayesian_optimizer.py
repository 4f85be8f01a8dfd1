"""BO loop mechanics tests (role of reference ``tests/unit/test_bayesian_optimizer.py``)."""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import (
    FixedAcquisitionRule,
    assert_datasets_allclose,
    mk_dataset,
    quadratic,
)
from tests.util.models import PseudoTrainableProbModel, QuadraticMeanAndRBFKernel
from trieste_tpu.bayesian_optimizer import (
    BayesianOptimizer,
    OptimizationResult,
    Record,
    stop_at_minimum,
)
from trieste_tpu.data import Dataset
from trieste_tpu.objectives import mk_observer
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box


class _TrainableQuadratic(QuadraticMeanAndRBFKernel, PseudoTrainableProbModel):
    pass


@pytest.fixture
def observer():
    return mk_observer(quadratic)


@pytest.fixture
def search_space():
    return Box([-1.0, -1.0], [1.0, 1.0])


def test_loop_appends_data(observer, search_space):
    initial = observer(jnp.array([[0.5, 0.5]]))
    bo = BayesianOptimizer(observer, search_space)
    rule = FixedAcquisitionRule([[0.1, 0.2]])
    result = bo.optimize(
        3, initial, _TrainableQuadratic(), rule, track_state=False
    )
    assert result.is_ok
    ds = result.try_get_final_dataset()
    assert len(ds) == 4
    np.testing.assert_allclose(
        np.asarray(ds.trimmed_query_points[-1]), [0.1, 0.2], atol=1e-12
    )


def test_loop_tracks_history(observer, search_space):
    initial = observer(jnp.array([[0.5, 0.5]]))
    bo = BayesianOptimizer(observer, search_space)
    rule = FixedAcquisitionRule([[0.0, 0.0]])
    result = bo.optimize(3, initial, _TrainableQuadratic(), rule, track_state=True)
    assert len(result.history) == 3
    # history holds pre-step snapshots: step i has i extra observations
    for i, record in enumerate(result.history):
        assert len(record.datasets[OBJECTIVE]) == 1 + i


def test_loop_save_load_roundtrip(observer, search_space):
    initial = observer(jnp.array([[0.5, 0.5]]))
    bo = BayesianOptimizer(observer, search_space)
    rule = FixedAcquisitionRule([[0.0, 0.0]])
    with tempfile.TemporaryDirectory() as tmp:
        result = bo.optimize(
            2, initial, _TrainableQuadratic(), rule, track_state=True, track_path=tmp
        )
        assert result.is_ok
        result.save(tmp)
        loaded = OptimizationResult.from_path(tmp)
        assert loaded.is_ok
        assert_datasets_allclose(
            loaded.try_get_final_dataset(), result.try_get_final_dataset()
        )
        assert len(loaded.history) == 2
        assert_datasets_allclose(
            loaded.history[1].datasets[OBJECTIVE], result.history[1].datasets[OBJECTIVE]
        )


def test_observer_error_returns_err(observer, search_space):
    calls = {"n": 0}

    def failing_observer(qp):
        calls["n"] += 1
        if calls["n"] > 2:
            raise ValueError("boom")
        return observer(qp)

    initial = failing_observer(jnp.array([[0.5, 0.5]]))
    bo = BayesianOptimizer(failing_observer, search_space)
    rule = FixedAcquisitionRule([[0.0, 0.0]])
    result = bo.optimize(5, initial, _TrainableQuadratic(), rule, track_state=True)
    assert result.is_err
    with pytest.raises(ValueError):
        result.final_result.unwrap()
    assert len(result.history) >= 1  # can restart from history


def test_early_stop_callback(observer, search_space):
    initial = observer(jnp.array([[0.0, 0.0]]))  # already at the minimum
    bo = BayesianOptimizer(observer, search_space)
    rule = FixedAcquisitionRule([[0.5, 0.5]])
    result = bo.optimize(
        10,
        initial,
        _TrainableQuadratic(),
        rule,
        track_state=False,
        early_stop_callback=stop_at_minimum(jnp.array([0.0]), minimum_atol=1e-9),
    )
    assert result.is_ok
    assert len(result.try_get_final_dataset()) == 1  # stopped before any step


def test_continue_optimization(observer, search_space):
    initial = observer(jnp.array([[0.5, 0.5]]))
    bo = BayesianOptimizer(observer, search_space)
    rule = FixedAcquisitionRule([[0.0, 0.0]])
    r1 = bo.optimize(2, initial, _TrainableQuadratic(), rule, track_state=True)
    r2 = bo.continue_optimization(4, r1, acquisition_rule=rule, track_state=True)
    assert r2.is_ok
    assert len(r2.try_get_final_dataset()) == 5  # 1 + 4 steps total
    assert len(r2.history) == 4


def test_mismatched_tags_raise(observer, search_space):
    initial = {OBJECTIVE: observer(jnp.array([[0.5, 0.5]]))}
    models = {"WRONG": _TrainableQuadratic()}
    bo = BayesianOptimizer(observer, search_space)
    with pytest.raises(ValueError):
        bo.optimize(1, initial, models, FixedAcquisitionRule([[0.0, 0.0]]))


def test_try_get_optimal_point(observer, search_space):
    initial = observer(jnp.array([[0.5, 0.5], [0.1, 0.0]]))
    bo = BayesianOptimizer(observer, search_space)
    result = bo.optimize(
        1, initial, _TrainableQuadratic(), FixedAcquisitionRule([[0.9, 0.9]]),
        track_state=False,
    )
    qp, obs, idx = result.try_get_optimal_point()
    np.testing.assert_allclose(np.asarray(qp), [0.1, 0.0], atol=1e-12)
    np.testing.assert_allclose(float(obs[0]), 0.01, atol=1e-12)
