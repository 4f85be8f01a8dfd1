"""Ask/Tell behavior parity with the reference's unit matrix
(``/root/reference/tests/unit/test_ask_tell_optimization.py``): record/state copy
semantics, construction validation, acquisition-state plumbing, and key handling
beyond the roundtrip flows already covered in ``test_ask_tell.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import FixedAcquisitionRule, mk_dataset
from tests.util.models import PseudoTrainableProbModel, QuadraticMeanAndRBFKernel
from trieste_tpu.ask_tell_optimization import (
    AskTellOptimizer,
    AskTellOptimizerNoTraining,
)
from trieste_tpu.data import Dataset
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box
from trieste_tpu.utils.misc import LocalizedTag


class _FitCountingModel(QuadraticMeanAndRBFKernel):
    """Counts update/optimize calls (reference ``test_ask_tell_optimization.py:437-509``)."""

    def __init__(self):
        super().__init__()
        self.update_count = 0
        self.optimize_count = 0

    def update(self, dataset: Dataset) -> None:
        self.update_count += 1

    def optimize(self, dataset: Dataset) -> None:
        self.optimize_count += 1


class _StatefulSpyRule:
    """A stateful rule recording the state passed to its acquire closure
    (reference ``test_ask_tell_optimization.py:511-548``)."""

    def __init__(self, query_points):
        self._qp = jnp.asarray(query_points)
        self.seen_states = []
        self.seen_keys = []

    def acquire(self, search_space, models, datasets=None, key=None):
        self.seen_keys.append(key)

        def stateful(state):
            self.seen_states.append(state)
            new_state = 0 if state is None else state + 1
            return new_state, self._qp

        return stateful

    def filter_datasets(self, models, datasets):
        return datasets


@pytest.fixture
def setup():
    space = Box([-1.0, -1.0], [1.0, 1.0])
    data = mk_dataset([[0.1, 0.2], [-0.3, 0.4]], [[0.05], [0.25]])
    model = _FitCountingModel()
    return space, data, model


def test_to_record_copy_true_is_isolated(setup):
    space, data, model = setup
    opt = AskTellOptimizer(space, data, model, FixedAcquisitionRule([[0.0, 0.0]]))
    record = opt.to_record(copy=True)
    before = np.asarray(record.dataset.query_points).copy()
    opt.tell(mk_dataset([[0.9, 0.9]], [[1.62]]))
    np.testing.assert_array_equal(np.asarray(record.dataset.query_points), before)
    assert record.dataset.num_points == 2
    assert opt.dataset.num_points == 3


def test_to_record_copy_false_shares_objects(setup):
    space, data, model = setup
    opt = AskTellOptimizer(space, data, model, FixedAcquisitionRule([[0.0, 0.0]]))
    record = opt.to_record(copy=False)
    assert record.models[OBJECTIVE] is model
    assert record.datasets[OBJECTIVE] is opt.datasets[OBJECTIVE]


def test_to_record_copy_true_copies_model(setup):
    space, data, model = setup
    opt = AskTellOptimizer(space, data, model, FixedAcquisitionRule([[0.0, 0.0]]))
    record = opt.to_record(copy=True)
    assert record.models[OBJECTIVE] is not model


def test_from_record_does_not_train_model(setup):
    space, data, model = setup
    rule = FixedAcquisitionRule([[0.0, 0.0]])
    opt = AskTellOptimizer(space, data, model, rule)
    fits_after_init = model.optimize_count
    assert fits_after_init == 1

    restored = AskTellOptimizer.from_record(opt.to_record(copy=False), space, rule)
    assert model.optimize_count == fits_after_init
    assert restored.model is model


def test_from_state_does_not_train_model(setup):
    space, data, model = setup
    rule = FixedAcquisitionRule([[0.0, 0.0]])
    opt = AskTellOptimizer(space, data, model, rule)
    fits = model.optimize_count
    AskTellOptimizer.from_state(opt.to_state(), space, rule)
    assert model.optimize_count == fits


def test_constructor_trains_model_unless_fit_model_false(setup):
    space, data, model = setup
    AskTellOptimizer(space, data, model, FixedAcquisitionRule([[0.0, 0.0]]))
    assert model.optimize_count == 1
    model2 = _FitCountingModel()
    AskTellOptimizer(
        space, data, model2, FixedAcquisitionRule([[0.0, 0.0]]), fit_model=False
    )
    assert model2.optimize_count == 0


def test_empty_datasets_raise(setup):
    space, _, _ = setup
    with pytest.raises(ValueError):
        AskTellOptimizer(space, {}, {}, FixedAcquisitionRule([[0.0, 0.0]]))


def test_mismatched_keys_raise(setup):
    space, data, model = setup
    with pytest.raises(ValueError, match="same keys"):
        AskTellOptimizer(
            space, {"A": data}, {"B": model}, FixedAcquisitionRule([[0.0, 0.0]])
        )


def test_local_dataset_tags_accepted_against_global_model(setup):
    # restoring from a local-dataset (trust-region) run: LocalizedTag datasets next to
    # a single global model must validate (reference ask_tell_optimization.py:253-268)
    space, data, model = setup
    datasets = {
        OBJECTIVE: data,
        LocalizedTag(OBJECTIVE, 0): data,
        LocalizedTag(OBJECTIVE, 1): data,
    }
    opt = AskTellOptimizer(
        space, datasets, {OBJECTIVE: model}, FixedAcquisitionRule([[0.0, 0.0]])
    )
    assert set(opt.datasets.keys()) == set(datasets.keys())


def test_default_acquisition_requires_objective_tag(setup):
    space, data, model = setup
    with pytest.raises(ValueError, match="Default acquisition"):
        AskTellOptimizer(space, {"not_objective": data}, {"not_objective": model})


def test_dataset_property_raises_for_multiple_tags(setup):
    space, data, model = setup
    opt = AskTellOptimizer(
        space,
        {OBJECTIVE: data, "CONSTRAINT": data},
        {OBJECTIVE: model, "CONSTRAINT": _FitCountingModel()},
        FixedAcquisitionRule([[0.0, 0.0]]),
    )
    with pytest.raises(ValueError, match="single dataset"):
        opt.dataset
    with pytest.raises(ValueError, match="single model"):
        opt.model
    # the mappings themselves remain available
    assert set(opt.datasets.keys()) == {OBJECTIVE, "CONSTRAINT"}
    assert set(opt.models.keys()) == {OBJECTIVE, "CONSTRAINT"}


def test_constructor_acquisition_state_reaches_stateful_rule(setup):
    space, data, model = setup
    rule = _StatefulSpyRule([[0.0, 0.0]])
    opt = AskTellOptimizer(space, data, model, rule, acquisition_state=41)
    opt.ask()
    assert rule.seen_states == [41]
    assert opt.acquisition_state == 42


def test_stateful_rule_state_threads_through_asks(setup):
    space, data, model = setup
    rule = _StatefulSpyRule([[0.0, 0.0]])
    opt = AskTellOptimizer(space, data, model, rule)
    opt.ask()
    opt.ask()
    assert rule.seen_states == [None, 0]
    assert opt.acquisition_state == 1


def test_record_roundtrip_preserves_acquisition_state(setup):
    space, data, model = setup
    rule = _StatefulSpyRule([[0.0, 0.0]])
    opt = AskTellOptimizer(space, data, model, rule, acquisition_state=7)
    record = opt.to_record()
    assert record.acquisition_state == 7
    restored = AskTellOptimizer.from_record(record, space, rule)
    assert restored.acquisition_state == 7


def test_ask_advances_key(setup):
    space, data, model = setup
    rule = _StatefulSpyRule([[0.0, 0.0]])
    opt = AskTellOptimizer(space, data, model, rule, key=jax.random.PRNGKey(0))
    opt.ask()
    opt.ask()
    k1, k2 = rule.seen_keys
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))


def test_explicit_key_makes_ask_deterministic(setup):
    space, data, model = setup

    def make():
        rule = _StatefulSpyRule([[0.0, 0.0]])
        opt = AskTellOptimizer(space, data, _FitCountingModel(), rule,
                               key=jax.random.PRNGKey(123))
        opt.ask()
        return rule.seen_keys[0]

    np.testing.assert_array_equal(np.asarray(make()), np.asarray(make()))


def test_from_record_rule_override_is_used(setup):
    space, data, model = setup
    opt = AskTellOptimizer(space, data, model, FixedAcquisitionRule([[0.0, 0.0]]))
    new_rule = FixedAcquisitionRule([[0.5, 0.5]])
    restored = AskTellOptimizer.from_record(opt.to_record(), space, new_rule)
    np.testing.assert_allclose(np.asarray(restored.ask()), [[0.5, 0.5]])


def test_no_training_variant_roundtrips_through_record(setup):
    space, data, model = setup
    rule = FixedAcquisitionRule([[0.0, 0.0]])
    opt = AskTellOptimizerNoTraining(space, data, model, rule)
    assert model.optimize_count == 0
    restored = AskTellOptimizerNoTraining.from_record(opt.to_record(), space, rule)
    restored.tell(mk_dataset([[0.9, 0.9]], [[1.62]]))
    assert model.optimize_count == 0
    assert restored.dataset.num_points == 3


def test_tell_accepts_plain_dataset_for_single_objective(setup):
    space, data, model = setup
    opt = AskTellOptimizer(space, data, model, FixedAcquisitionRule([[0.0, 0.0]]))
    opt.tell(mk_dataset([[0.0, 0.0]], [[0.0]]))
    assert opt.dataset.num_points == 3


def test_tell_retrains_all_models_once(setup):
    space, data, model = setup
    constraint_model = _FitCountingModel()
    opt = AskTellOptimizer(
        space,
        {OBJECTIVE: data, "CONSTRAINT": data},
        {OBJECTIVE: model, "CONSTRAINT": constraint_model},
        FixedAcquisitionRule([[0.0, 0.0]]),
    )
    base_obj, base_con = model.optimize_count, constraint_model.optimize_count
    opt.tell({OBJECTIVE: mk_dataset([[0.0, 0.0]], [[0.0]]),
              "CONSTRAINT": mk_dataset([[0.0, 0.0]], [[0.0]])})
    assert model.optimize_count == base_obj + 1
    assert constraint_model.optimize_count == base_con + 1


def test_models_setter_replaces_models(setup):
    space, data, model = setup
    opt = AskTellOptimizer(space, data, model, FixedAcquisitionRule([[0.0, 0.0]]))
    model2 = _FitCountingModel()
    opt.models = {OBJECTIVE: model2}
    assert opt.models[OBJECTIVE] is model2 is not model
    assert opt.model is model2


def test_models_setter_errors(setup):
    space, data, model = setup
    opt = AskTellOptimizer(space, data, model, FixedAcquisitionRule([[0.0, 0.0]]))
    with pytest.raises(ValueError, match="keys"):
        opt.models = {}
    with pytest.raises(ValueError, match="keys"):
        opt.models = {OBJECTIVE: _FitCountingModel(), "X": _FitCountingModel()}
    with pytest.raises(ValueError, match="keys"):
        opt.models = {"CONSTRAINT": _FitCountingModel()}


def test_model_setter_replaces_single_objective_model(setup):
    space, data, model = setup
    opt = AskTellOptimizer(space, data, model, FixedAcquisitionRule([[0.0, 0.0]]))
    model2 = _FitCountingModel()
    opt.model = model2
    assert opt.models[OBJECTIVE] is model2 is not model


def test_model_setter_errors(setup):
    space, data, model = setup
    one_model_odd_tag = AskTellOptimizer(
        space, {"X": data}, {"X": model}, FixedAcquisitionRule([[0.0, 0.0]])
    )
    with pytest.raises(ValueError):
        one_model_odd_tag.model = model
    two_models = AskTellOptimizer(
        space,
        {OBJECTIVE: data, "X": data},
        {OBJECTIVE: model, "X": _FitCountingModel()},
        FixedAcquisitionRule([[0.0, 0.0]]),
    )
    with pytest.raises(ValueError):
        two_models.model = model


def test_tell_unknown_localized_tag_raises_rather_than_dropping(setup):
    """Regression (round-5 review): a localized tag whose base exists but which is not
    itself a dataset key must raise — the old global-tag fallback accepted it and then
    silently dropped the observations."""
    space, data, model = setup
    opt = AskTellOptimizer(space, data, model, FixedAcquisitionRule([[0.0, 0.0]]))
    n_before = opt.dataset.num_points
    with pytest.raises(ValueError, match="Unknown tag"):
        opt.tell({LocalizedTag(OBJECTIVE, 5): mk_dataset([[0.0, 0.0]], [[0.0]])})
    assert opt.dataset.num_points == n_before


def test_from_state_forwards_local_data_ixs(setup):
    """Regression (round-5 review): a manually-assembled state carrying local_data_ixs
    must subset the global data per region on restore."""
    import jax.numpy as jnp

    from trieste_tpu.ask_tell_optimization import AskTellOptimizerState
    from trieste_tpu.bayesian_optimizer import Record

    space, data, model = setup

    class TwoRegionRule(FixedAcquisitionRule):
        num_local_datasets = 2

        def initialize_subspaces(self, search_space):
            pass

    from trieste_tpu.acquisition.rule import LocalDatasetsAcquisitionRule

    LocalDatasetsAcquisitionRule.register(TwoRegionRule)

    state = AskTellOptimizerState(
        record=Record({OBJECTIVE: data}, {OBJECTIVE: model}, None),
        local_data_ixs=(jnp.asarray([0]), jnp.asarray([1])),
    )
    opt = AskTellOptimizer.from_state(state, space, TwoRegionRule([[0.0, 0.0]]))
    local0 = opt.datasets[LocalizedTag(OBJECTIVE, 0)]
    local1 = opt.datasets[LocalizedTag(OBJECTIVE, 1)]
    assert local0.num_points == 1 and local1.num_points == 1
    np.testing.assert_allclose(
        np.asarray(local0.trimmed_query_points), np.asarray(data.query_points[:1])
    )
    np.testing.assert_allclose(
        np.asarray(local1.trimmed_query_points), np.asarray(data.query_points[1:2])
    )


def test_dataset_len_returns_common_global_size(setup):
    space, data, model = setup
    datasets = {
        OBJECTIVE: data,
        "CONSTRAINT": data,
        LocalizedTag(OBJECTIVE, 0): mk_dataset([[0.1, 0.2]], [[0.05]]),
    }
    # local datasets of other sizes are ignored
    assert AskTellOptimizer.dataset_len(datasets) == 2


def test_dataset_len_raises_on_inconsistent_global_sizes(setup):
    space, data, model = setup
    datasets = {
        OBJECTIVE: data,
        "CONSTRAINT": mk_dataset([[0.1, 0.2]], [[0.05]]),
    }
    with pytest.raises(ValueError, match="unique global dataset size"):
        AskTellOptimizer.dataset_len(datasets)
