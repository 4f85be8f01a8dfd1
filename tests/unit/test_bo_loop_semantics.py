"""BO-loop step-sequence semantics (rest of reference
``tests/unit/test_bayesian_optimizer.py``): per-step call ordering, fit flags,
filter_datasets invocation, empty/mismatched dict raises, and batch-observer routing
through rank-3 query points."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from tests.util.misc import FixedAcquisitionRule, mk_dataset, quadratic
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.data import Dataset
from trieste_tpu.objectives import mk_observer
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box
from trieste_tpu.utils.misc import LocalizedTag


@pytest.fixture
def space():
    return Box([-1.0], [1.0])


@pytest.fixture
def observer():
    return mk_observer(quadratic)


class SpyModel(QuadraticMeanAndRBFKernel):
    def __init__(self):
        super().__init__(noise_variance=1.0)
        self.updates = []
        self.optimizes = []

    def update(self, dataset):
        self.updates.append(len(dataset))

    def optimize(self, dataset):
        self.optimizes.append(len(dataset))


def test_loop_fits_initial_model_then_per_step(space, observer):
    model = SpyModel()
    data = observer(space.sample(jax.random.PRNGKey(0), 4))
    bo = tt.BayesianOptimizer(observer, space)
    result = bo.optimize(2, data, model, FixedAcquisitionRule([[0.1]]),
                         key=jax.random.PRNGKey(1), track_state=False)
    assert result.is_ok
    # initial fit at n=4, then one per step at n=5, 6
    assert model.optimizes == [4, 5, 6]
    assert model.updates == [4, 5, 6]


def test_fit_initial_model_false_skips_first_fit(space, observer):
    model = SpyModel()
    data = observer(space.sample(jax.random.PRNGKey(0), 4))
    bo = tt.BayesianOptimizer(observer, space)
    bo.optimize(1, data, model, FixedAcquisitionRule([[0.1]]),
                key=jax.random.PRNGKey(1), track_state=False, fit_initial_model=False)
    assert model.optimizes == [5]  # only the per-step fit


def test_fit_model_false_never_fits(space, observer):
    model = SpyModel()
    data = observer(space.sample(jax.random.PRNGKey(0), 4))
    bo = tt.BayesianOptimizer(observer, space)
    bo.optimize(2, data, model, FixedAcquisitionRule([[0.1]]),
                key=jax.random.PRNGKey(1), track_state=False, fit_model=False)
    assert model.optimizes == []


def test_loop_rejects_empty_and_mismatched_dicts(space, observer):
    bo = tt.BayesianOptimizer(observer, space)
    with pytest.raises(ValueError):
        bo.optimize(1, {}, {}, FixedAcquisitionRule([[0.1]]))
    ds = mk_dataset([[0.0]], [[0.0]])
    with pytest.raises(ValueError, match="same global tags"):
        bo.optimize(1, {OBJECTIVE: ds}, {"OTHER": SpyModel()},
                    FixedAcquisitionRule([[0.1]]))


def test_loop_default_rule_needs_objective_tag(space, observer):
    ds = mk_dataset([[0.0]], [[0.0]])
    bo = tt.BayesianOptimizer(observer, space)
    with pytest.raises(ValueError, match="OBJECTIVE"):
        bo.optimize(1, {"OTHER": ds}, {"OTHER": SpyModel()})


def test_rule_filter_datasets_called_each_step(space, observer):
    calls = []

    class FilteringRule(FixedAcquisitionRule):
        def filter_datasets(self, models, datasets):
            calls.append(len(datasets[OBJECTIVE]))
            return datasets

    model = SpyModel()
    data = observer(space.sample(jax.random.PRNGKey(0), 4))
    bo = tt.BayesianOptimizer(observer, space)
    bo.optimize(2, data, model, FilteringRule([[0.1]]),
                key=jax.random.PRNGKey(1), track_state=False)
    # step-1 initial filter + once after each of the 2 tells
    assert calls == [4, 5, 6]


def test_rank3_points_route_through_batch_observer(space, observer):
    """A rule returning [B, V, D] points is observed through mk_batch_observer: all
    B·V points land in the global dataset; per-slot LOCAL datasets are merged only
    when the rule pre-created them (reference ``bayesian_optimizer.py:804-815`` —
    local tags exist only for LocalDatasetsAcquisitionRules)."""

    class BatchRule(FixedAcquisitionRule):
        def acquire(self, search_space, models, datasets=None, key=None):
            return jnp.array([[[0.1], [0.2]]])  # [1, 2, 1]

    model = SpyModel()
    data = observer(space.sample(jax.random.PRNGKey(0), 4))
    bo = tt.BayesianOptimizer(observer, space)
    result = bo.optimize(1, data, model, BatchRule([[0.0]]),
                         key=jax.random.PRNGKey(1), track_state=False)
    assert result.is_ok
    final = result.try_get_final_datasets()
    assert len(final[OBJECTIVE]) == 6  # both batch slots observed
    got = np.sort(np.asarray(final[OBJECTIVE].trimmed_query_points[-2:, 0]))
    np.testing.assert_allclose(got, [0.1, 0.2], atol=1e-9)


def test_early_stop_prevents_further_observer_calls(space):
    count = {"n": 0}

    def counting_observer(qp):
        count["n"] += 1
        return mk_observer(quadratic)(qp)

    data = mk_observer(quadratic)(space.sample(jax.random.PRNGKey(0), 4))
    bo = tt.BayesianOptimizer(counting_observer, space)
    bo.optimize(5, data, SpyModel(), FixedAcquisitionRule([[0.1]]),
                key=jax.random.PRNGKey(1), track_state=False,
                early_stop_callback=lambda d, m, s: True)
    assert count["n"] == 0  # stopped before the first acquisition


def test_start_step_offsets_loop_length(space, observer):
    model = SpyModel()
    data = observer(space.sample(jax.random.PRNGKey(0), 4))
    bo = tt.BayesianOptimizer(observer, space)
    result = bo.optimize(3, data, model, FixedAcquisitionRule([[0.1]]),
                         key=jax.random.PRNGKey(1), track_state=False, start_step=2)
    # only one step executed (steps 3 of 3, starting after step 2)
    assert len(result.try_get_final_dataset()) == 5
