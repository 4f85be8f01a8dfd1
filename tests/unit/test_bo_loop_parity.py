"""BayesianOptimizer / OptimizationResult behavior parity with the reference's unit
matrix (``/root/reference/tests/unit/test_bayesian_optimizer.py``): result accessors
under multi-tag/multi-output/failed runs, ``from_path`` partial loading, step-file
naming, acquisition-state plumbing, and pre-filter history semantics — beyond the
flows already covered in ``test_bayesian_optimizer.py`` / ``test_bo_loop_semantics.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from tests.util.misc import FixedAcquisitionRule, mk_dataset, quadratic
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.bayesian_optimizer import (
    FrozenRecord,
    OptimizationResult,
    Record,
)
from trieste_tpu.data import Dataset
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box
from trieste_tpu.utils.misc import Err, Ok


@pytest.fixture
def space():
    return Box([-1.0, -1.0], [1.0, 1.0])


@pytest.fixture
def observer():
    return lambda x: Dataset.from_arrays(x, quadratic(x))


@pytest.fixture
def initial(observer, space):
    return observer(space.sample(jax.random.PRNGKey(0), 4))


def _record(num_outputs: int = 1, tags=(OBJECTIVE,)):
    qp = jnp.asarray([[0.1, 0.2], [0.3, 0.4]])
    obs = jnp.tile(jnp.asarray([[0.5], [0.25]]), (1, num_outputs))
    ds = Dataset.from_arrays(qp, obs)
    return Record({t: ds for t in tags}, {t: QuadraticMeanAndRBFKernel() for t in tags}, None)


def test_result_accessors_for_multiple_tags():
    result = OptimizationResult(Ok(_record(tags=(OBJECTIVE, "CONSTRAINT"))), [])
    assert set(result.try_get_final_datasets().keys()) == {OBJECTIVE, "CONSTRAINT"}
    assert set(result.try_get_final_models().keys()) == {OBJECTIVE, "CONSTRAINT"}
    with pytest.raises(ValueError):
        result.try_get_final_dataset()
    with pytest.raises(ValueError):
        result.try_get_final_model()


def test_try_get_optimal_point_raises_for_multiple_objectives():
    result = OptimizationResult(Ok(_record(num_outputs=2)), [])
    with pytest.raises(ValueError, match="single objective"):
        result.try_get_optimal_point()


def test_try_get_optimal_point_returns_minimum():
    result = OptimizationResult(Ok(_record()), [])
    qp, obs, idx = result.try_get_optimal_point()
    np.testing.assert_allclose(np.asarray(qp), [0.3, 0.4])
    np.testing.assert_allclose(np.asarray(obs), [0.25])
    assert int(idx) == 1


def test_result_accessors_raise_for_failed_optimization():
    result = OptimizationResult(Err(RuntimeError("boom")), [_record()])
    assert result.is_err and not result.is_ok
    for accessor in (
        result.try_get_final_datasets,
        result.try_get_final_models,
        result.try_get_optimal_point,
    ):
        with pytest.raises(RuntimeError, match="boom"):
            accessor()


def test_astuple_returns_components():
    history = [_record()]
    final = Ok(_record())
    result = OptimizationResult(final, history)
    got_final, got_history = result.astuple()
    assert got_final is final
    assert got_history == history


@pytest.mark.parametrize(
    "step,num_steps,expected",
    [(0, 10, "step.0.pickle"), (3, 100, "step.03.pickle"), (42, 1000, "step.042.pickle")],
)
def test_step_filename_zero_padding(step, num_steps, expected):
    assert OptimizationResult.step_filename(step, num_steps) == expected


def test_from_path_roundtrip(tmp_path):
    result = OptimizationResult(Ok(_record()), [_record(), _record()])
    result.save(tmp_path)
    loaded = OptimizationResult.from_path(tmp_path)
    assert loaded.is_ok
    assert len(loaded.history) == 2
    assert all(isinstance(r, FrozenRecord) for r in loaded.history)
    np.testing.assert_allclose(
        np.asarray(loaded.try_get_final_dataset().query_points),
        np.asarray(result.try_get_final_dataset().query_points),
    )
    np.testing.assert_allclose(
        np.asarray(loaded.history[0].load().dataset.observations),
        np.asarray(result.history[0].dataset.observations),
    )


def test_from_path_partial_result(tmp_path):
    # reference bayesian_optimizer tests: a crashed run leaves step files but no final
    # results.pickle — from_path must still load the history with an Err final result
    result = OptimizationResult(Ok(_record()), [_record(), _record(), _record()])
    result.save(tmp_path)
    (tmp_path / OptimizationResult.RESULTS_FILENAME).unlink()
    loaded = OptimizationResult.from_path(tmp_path)
    assert loaded.is_err
    assert isinstance(loaded.final_result.error, FileNotFoundError)
    assert len(loaded.history) == 3


def test_optimize_uses_specified_acquisition_state(space, observer, initial):
    seen_states = []

    class StatefulRule:
        def acquire(self, search_space, models, datasets=None, key=None):
            def stateful(state):
                seen_states.append(state)
                return (0 if state is None else state + 1), jnp.asarray([[0.0, 0.0]])

            return stateful

        def filter_datasets(self, models, datasets):
            return datasets

    result = tt.BayesianOptimizer(observer, space).optimize(
        2, initial, QuadraticMeanAndRBFKernel(), StatefulRule(),
        acquisition_state=10, track_state=True, key=jax.random.PRNGKey(1),
    )
    assert result.is_ok
    assert seen_states == [10, 11]
    # the history snapshots the state *before* each step's acquire
    assert [r.acquisition_state for r in result.history] == [10, 11]
    assert result.final_result.unwrap().acquisition_state == 12


def test_optimize_trains_all_models_each_step(space):
    class CountingModel(QuadraticMeanAndRBFKernel):
        def __init__(self):
            super().__init__()
            self.optimize_count = 0

        def optimize(self, dataset):
            self.optimize_count += 1

    def multi_observer(x):
        return {
            OBJECTIVE: Dataset.from_arrays(x, quadratic(x)),
            "CONSTRAINT": Dataset.from_arrays(x, quadratic(x) - 0.5),
        }

    x0 = space.sample(jax.random.PRNGKey(0), 4)
    initial = multi_observer(x0)
    models = {OBJECTIVE: CountingModel(), "CONSTRAINT": CountingModel()}
    result = tt.BayesianOptimizer(multi_observer, space).optimize(
        3, initial, models, FixedAcquisitionRule([[0.0, 0.0]]),
        track_state=False, key=jax.random.PRNGKey(1),
    )
    assert result.is_ok
    # 1 initial fit + 3 per-step fits, for each model
    assert models[OBJECTIVE].optimize_count == 4
    assert models["CONSTRAINT"].optimize_count == 4
    for ds in result.try_get_final_datasets().values():
        assert ds.num_points == 4 + 3


def test_failed_step_preserves_history_up_to_failure(space, initial):
    calls = []

    def flaky_observer(x):
        calls.append(x)
        if len(calls) > 2:
            raise RuntimeError("observer died")
        return Dataset.from_arrays(x, quadratic(x))

    result = tt.BayesianOptimizer(flaky_observer, space).optimize(
        5, initial, QuadraticMeanAndRBFKernel(), FixedAcquisitionRule([[0.0, 0.0]]),
        track_state=True, key=jax.random.PRNGKey(1),
    )
    assert result.is_err
    assert isinstance(result.final_result.error, RuntimeError)
    # steps 1 and 2 succeeded; step 3 recorded its pre-step state before failing
    assert len(result.history) == 3
    assert result.history[0].dataset.num_points == 4
    assert result.history[2].dataset.num_points == 6


def test_history_records_pre_filter_datasets(space, observer, initial):
    # rules that filter datasets (e.g. trust regions masking to a region) must not
    # affect the tracked history, which snapshots the full data (reference
    # test_bayesian_optimizer.py:721-733)
    class FilteringRule(FixedAcquisitionRule):
        def filter_datasets(self, models, datasets):
            return {
                tag: Dataset.from_arrays(
                    ds.query_points[:1], ds.observations[:1]
                )
                for tag, ds in datasets.items()
            }

    result = tt.BayesianOptimizer(observer, space).optimize(
        2, initial, QuadraticMeanAndRBFKernel(), FilteringRule([[0.0, 0.0]]),
        track_state=True, key=jax.random.PRNGKey(1),
    )
    assert result.is_ok
    assert result.history[0].dataset.num_points == 4
    assert result.history[1].dataset.num_points == 5
    assert result.try_get_final_dataset().num_points == 6


def test_optimize_accepts_start_step_with_prefilled_history(space, observer, initial):
    result = tt.BayesianOptimizer(observer, space).optimize(
        4, initial, QuadraticMeanAndRBFKernel(), FixedAcquisitionRule([[0.0, 0.0]]),
        track_state=True, start_step=2, key=jax.random.PRNGKey(1),
    )
    assert result.is_ok
    # steps 3..4 only
    assert len(result.history) == 2
    assert result.try_get_final_dataset().num_points == 4 + 2


def test_track_path_and_from_path_compose(space, observer, initial, tmp_path):
    run_dir = tmp_path / "run"
    result = tt.BayesianOptimizer(observer, space).optimize(
        3, initial, QuadraticMeanAndRBFKernel(), FixedAcquisitionRule([[0.0, 0.0]]),
        track_state=True, track_path=run_dir, key=jax.random.PRNGKey(1),
    )
    assert result.is_ok
    result.save_result(run_dir / OptimizationResult.RESULTS_FILENAME)
    loaded = OptimizationResult.from_path(run_dir)
    assert loaded.is_ok
    assert len(loaded.history) == 3
    assert loaded.history[0].load().dataset.num_points == 4
    np.testing.assert_allclose(
        np.asarray(loaded.try_get_final_dataset().observations),
        np.asarray(result.try_get_final_dataset().observations),
    )
