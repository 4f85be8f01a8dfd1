"""Ask/Tell tests (role of reference ``tests/unit/test_ask_tell_optimization.py``)."""
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
from trieste_tpu.ask_tell_optimization import AskTellOptimizer, AskTellOptimizerNoTraining
from trieste_tpu.data import Dataset
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box



class _TrainableQuadratic(QuadraticMeanAndRBFKernel, PseudoTrainableProbModel):
    pass


@pytest.fixture
def setup():
    space = Box([-1.0, -1.0], [1.0, 1.0])
    initial = mk_dataset([[0.5, 0.5]], [[0.5]])
    model = _TrainableQuadratic()
    rule = FixedAcquisitionRule([[0.25, 0.25]])
    return space, initial, model, rule


def test_ask_returns_rule_points(setup):
    space, initial, model, rule = setup
    at = AskTellOptimizer(space, initial, model, rule)
    pts = at.ask()
    np.testing.assert_allclose(np.asarray(pts), [[0.25, 0.25]])


def test_tell_appends_data(setup):
    space, initial, model, rule = setup
    at = AskTellOptimizer(space, initial, model, rule)
    pts = at.ask()
    new = Dataset.from_arrays(pts, quadratic(pts))
    at.tell(new)
    assert len(at.dataset) == 2
    np.testing.assert_allclose(
        np.asarray(at.dataset.trimmed_query_points[-1]), [0.25, 0.25]
    )


def test_record_roundtrip(setup):
    space, initial, model, rule = setup
    at = AskTellOptimizer(space, initial, model, rule)
    at.tell(mk_dataset([[0.1, 0.1]], [[0.02]]))
    record = at.to_record()
    restored = AskTellOptimizer.from_record(record, space, rule)
    assert_datasets_allclose(restored.dataset, at.dataset)
    pts = restored.ask()
    np.testing.assert_allclose(np.asarray(pts), [[0.25, 0.25]])


def test_state_roundtrip(setup):
    space, initial, model, rule = setup
    at = AskTellOptimizer(space, initial, model, rule)
    state = at.to_state()
    restored = AskTellOptimizer.from_state(state, space, rule)
    assert_datasets_allclose(restored.dataset, at.dataset)


def test_no_training_variant_does_not_train(setup):
    space, initial, model, rule = setup

    class CountingModel(_TrainableQuadratic):
        optimize_calls = 0

        def optimize(self, dataset):
            CountingModel.optimize_calls += 1

    m = CountingModel()
    at = AskTellOptimizerNoTraining(space, initial, m, rule)
    at.tell(mk_dataset([[0.1, 0.1]], [[0.02]]))
    assert CountingModel.optimize_calls == 0


def test_unknown_tell_tag_raises(setup):
    space, initial, model, rule = setup
    at = AskTellOptimizer(space, initial, model, rule)
    with pytest.raises(ValueError):
        at.tell({"UNKNOWN": mk_dataset([[0.0, 0.0]], [[0.0]])})


def test_dataset_and_model_accessors(setup):
    space, initial, model, rule = setup
    at = AskTellOptimizer(space, initial, model, rule)
    assert at.model is model
    assert len(at.datasets) == 1
    assert OBJECTIVE in at.datasets


def test_track_data_false_replaces_datasets(setup):
    space, initial, model, rule = setup
    at = AskTellOptimizerNoTraining(space, initial, model, rule, track_data=False)
    full = mk_dataset([[0.5, 0.5], [0.1, 0.1]], [[0.5], [0.02]])
    at.tell(full)
    assert len(at.dataset) == 2
    np.testing.assert_allclose(
        np.asarray(at.dataset.trimmed_query_points),
        np.asarray(full.trimmed_query_points),
    )

def test_state_roundtrip_batch_trust_region_three_regions():
    """``to_state -> from_state`` for a local-dataset rule: the restored optimizer must
    accept LocalizedTag datasets next to a single global model (reference
    ``ask_tell_optimization.py:282-320,451-528``) and keep working."""
    import jax

    from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
    from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
    from trieste_tpu.acquisition.trust_region import (
        BatchTrustRegionBox,
        SingleObjectiveTrustRegionBox,
    )
    from trieste_tpu.utils.misc import LocalizedTag

    space = Box([-1.0, -1.0], [1.0, 1.0])
    initial = mk_dataset(
        [[0.5, 0.5], [-0.3, 0.2], [0.1, -0.6], [-0.7, -0.7]],
        [[0.5], [0.13], [0.37], [0.98]],
    )
    model = _TrainableQuadratic()

    def mk_rule():
        # rule=None -> default vectorized MONLCB base rule over the 3 regions
        # (reference rule.py:1354-1362)
        return BatchTrustRegionBox(
            init_subspaces=[
                SingleObjectiveTrustRegionBox(space, key=jax.random.PRNGKey(i))
                for i in range(3)
            ],
        )

    at = AskTellOptimizer(space, initial, model, mk_rule())
    pts = at.ask()
    flat = pts.reshape(-1, 2)
    at.tell(Dataset.from_arrays(flat, quadratic(flat)))

    state = at.to_state(copy=True)
    # the state now carries LocalizedTag(OBJECTIVE, 0..2) datasets + one global model
    assert any(LocalizedTag.from_tag(t).is_local for t in state.record.datasets)
    restored = AskTellOptimizer.from_state(state, space, mk_rule())
    assert_datasets_allclose(
        restored.datasets[OBJECTIVE], at.datasets[OBJECTIVE]
    )
    pts2 = restored.ask()
    assert pts2.reshape(-1, 2).shape[-1] == 2
    flat2 = pts2.reshape(-1, 2)
    restored.tell(Dataset.from_arrays(flat2, quadratic(flat2)))
