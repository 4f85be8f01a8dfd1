"""Rule and Ask/Tell edge-case matrix (role of the raise/state families of reference
``tests/unit/acquisition/test_rule.py``, 2830 LoC, and
``tests/unit/test_ask_tell_optimization.py``, 982 LoC): constructor validation, acquire
key/tag contracts, async pending-point mechanics, per-rule state round-trips, and
Ask/Tell serialization semantics."""
import copy
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import FixedAcquisitionRule, mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.function.function import (
    BatchMonteCarloExpectedImprovement,
    ExpectedImprovement,
    MultipleOptimismNegativeLowerConfidenceBound,
)
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import (
    AsynchronousGreedy,
    AsynchronousOptimization,
    AsynchronousRuleState,
    DiscreteThompsonSampling,
    EfficientGlobalOptimization,
    RandomSampling,
)
from trieste_tpu.ask_tell_optimization import AskTellOptimizer, AskTellOptimizerNoTraining
from trieste_tpu.data import Dataset
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box

FAST_OPT = generate_continuous_optimizer(num_initial_samples=64, num_optimization_runs=4)


@pytest.fixture
def space():
    return Box([-1.0], [1.0])


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=1.0)


@pytest.fixture
def dataset():
    return mk_dataset([[-0.5], [0.0], [0.5]], [[0.35], [0.1], [0.35]])


# ------------------------------------------------------------------ EGO


def test_ego_invalid_num_query_points():
    with pytest.raises(ValueError):
        EfficientGlobalOptimization(num_query_points=0)
    with pytest.raises(ValueError):
        EfficientGlobalOptimization(num_query_points=-2)


def test_ego_batch_needs_explicit_builder():
    with pytest.raises(ValueError, match="builder must be specified"):
        EfficientGlobalOptimization(num_query_points=2)


def test_ego_default_builder_is_ei():
    assert "ExpectedImprovement" in repr(EfficientGlobalOptimization())


def test_ego_acquire_single_point_in_space(space, model, dataset):
    rule = EfficientGlobalOptimization(optimizer=FAST_OPT)
    pts = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset},
                       key=jax.random.PRNGKey(0))
    assert pts.shape == (1, 1)
    assert bool(space.contains(pts[0]))


def test_ego_acquire_single_helper(space, model, dataset):
    rule = EfficientGlobalOptimization(optimizer=FAST_OPT)
    pts = rule.acquire_single(space, model, dataset, key=jax.random.PRNGKey(0))
    assert pts.shape == (1, 1)


def test_ego_joint_batch_shape(space, model, dataset):
    rule = EfficientGlobalOptimization(
        builder=BatchMonteCarloExpectedImprovement(64, key=jax.random.PRNGKey(0)),
        optimizer=FAST_OPT,
        num_query_points=3,
    )
    pts = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset},
                       key=jax.random.PRNGKey(0))
    assert pts.shape == (3, 1)
    assert bool(jnp.all(space.contains(pts)))


def test_ego_vectorized_batch_shape(space, model, dataset):
    rule = EfficientGlobalOptimization(
        builder=MultipleOptimismNegativeLowerConfidenceBound(space),
        optimizer=FAST_OPT,
        num_query_points=4,
    )
    pts = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset},
                       key=jax.random.PRNGKey(0))
    assert pts.shape == (4, 1)


def test_ego_reuses_acquisition_function(space, model, dataset):
    """The second acquire must update, not rebuild, the cached function
    (reference retracing control, ``rule.py:339-349``)."""
    rule = EfficientGlobalOptimization(optimizer=FAST_OPT)
    rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset}, key=jax.random.PRNGKey(0))
    first = rule.acquisition_function
    assert first is not None
    rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset}, key=jax.random.PRNGKey(1))
    # same Partial structure: the builder rebinds state without changing identity class
    assert type(rule.acquisition_function) is type(first)


def test_ego_num_query_points_property():
    rule = EfficientGlobalOptimization(
        builder=MultipleOptimismNegativeLowerConfidenceBound(Box([0.0], [1.0])),
        num_query_points=5,
    )
    assert rule.num_query_points == 5


# ------------------------------------------------------------------ baselines


def test_random_sampling_validation_and_shape(space, model):
    with pytest.raises(ValueError):
        RandomSampling(0)
    rule = RandomSampling(7)
    pts = rule.acquire(space, {OBJECTIVE: model}, key=jax.random.PRNGKey(0))
    assert pts.shape == (7, 1)
    assert bool(jnp.all(space.contains(pts)))
    again = rule.acquire(space, {OBJECTIVE: model}, key=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(pts), np.asarray(again))


def test_dts_constructor_validation():
    with pytest.raises(ValueError):
        DiscreteThompsonSampling(0, 1)
    with pytest.raises(ValueError):
        DiscreteThompsonSampling(10, 0)
    from trieste_tpu.acquisition.sampler import GumbelSampler

    with pytest.raises(ValueError, match="minimizer"):
        DiscreteThompsonSampling(10, 1, thompson_sampler=GumbelSampler())


def test_dts_requires_objective_tags(space, model, dataset):
    rule = DiscreteThompsonSampling(100, 2)
    with pytest.raises(ValueError, match="OBJECTIVE"):
        rule.acquire(space, {"OTHER": model}, {"OTHER": dataset}, key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="OBJECTIVE"):
        rule.acquire(space, {OBJECTIVE: model}, None, key=jax.random.PRNGKey(0))


def test_dts_returns_candidate_points(space, model, dataset):
    rule = DiscreteThompsonSampling(128, 3)
    pts = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset},
                       key=jax.random.PRNGKey(0))
    assert pts.shape == (3, 1)
    assert bool(jnp.all(space.contains(pts)))


# ------------------------------------------------------------------ async state


def test_async_state_remove_from_empty_is_noop():
    state = AsynchronousRuleState(None)
    out = state.remove_points(jnp.array([[1.0]]))
    assert not out.has_pending_points


def test_async_state_remove_unknown_point_keeps_all():
    state = AsynchronousRuleState(jnp.array([[0.0], [1.0]]))
    out = state.remove_points(jnp.array([[9.0]]))
    assert out.pending_points.shape == (2, 1)


def test_async_state_remove_matches_first_only():
    """Duplicated pending points are removed one per observed copy
    (reference ``rule.py:430-466``)."""
    state = AsynchronousRuleState(jnp.array([[1.0], [1.0], [2.0]]))
    out = state.remove_points(jnp.array([[1.0]]))
    np.testing.assert_array_equal(np.asarray(out.pending_points), [[1.0], [2.0]])
    out2 = out.remove_points(jnp.array([[1.0], [2.0]]))
    assert not out2.has_pending_points


def test_async_state_add_accumulates_in_order():
    state = AsynchronousRuleState(None).add_pending_points(jnp.array([[0.0]]))
    state = state.add_pending_points(jnp.array([[1.0], [2.0]]))
    np.testing.assert_array_equal(np.asarray(state.pending_points), [[0.0], [1.0], [2.0]])


def test_async_state_is_picklable():
    state = AsynchronousRuleState(jnp.array([[0.5]]))
    again = pickle.loads(pickle.dumps(state))
    np.testing.assert_array_equal(
        np.asarray(again.pending_points), np.asarray(state.pending_points)
    )


def test_async_optimization_accumulates_pending(space, model):
    # the observed set must not contain the EI maximizer (x=0), else the state-func's
    # remove-observed step would (correctly) drop the first pending point
    dataset = mk_dataset([[-0.5], [0.5]], [[0.35], [0.35]])
    rule = AsynchronousOptimization(
        builder=BatchMonteCarloExpectedImprovement(32, key=jax.random.PRNGKey(0)).using(OBJECTIVE),
        optimizer=FAST_OPT,
        num_query_points=1,
    )
    stateful = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset},
                            key=jax.random.PRNGKey(0))
    state, pts1 = stateful(None)
    assert state.pending_points.shape == (1, 1)
    stateful2 = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset},
                             key=jax.random.PRNGKey(1))
    state2, pts2 = stateful2(state)
    assert state2.pending_points.shape == (2, 1)


def test_async_optimization_removes_observed_pending(space, model):
    """Pending points that appear in the dataset are dropped on the next acquire
    (reference ``rule.py:560-566``)."""
    dataset = mk_dataset([[-0.5], [0.5]], [[0.35], [0.35]])
    rule = AsynchronousOptimization(
        builder=BatchMonteCarloExpectedImprovement(32, key=jax.random.PRNGKey(0)).using(OBJECTIVE),
        optimizer=FAST_OPT,
        num_query_points=1,
    )
    stateful = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset},
                            key=jax.random.PRNGKey(0))
    state, pts1 = stateful(None)
    observed = dataset + mk_dataset(np.asarray(pts1).tolist(),
                                    [[float(np.sum(np.asarray(pts1) ** 2))]])
    stateful2 = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: observed},
                             key=jax.random.PRNGKey(1))
    state2, _ = stateful2(state)
    # the observed point left the pending set; only the new one remains
    assert state2.pending_points.shape == (1, 1)


def test_async_greedy_requires_greedy_builder(space):
    with pytest.raises(NotImplementedError, match="greedy"):
        AsynchronousGreedy(builder=ExpectedImprovement().using(OBJECTIVE))
    with pytest.raises(ValueError):
        AsynchronousGreedy(builder=None)


# ------------------------------------------------------------------ state round-trips


def _roundtrip(region):
    return pickle.loads(pickle.dumps(region))


def test_box_region_pickle_roundtrip(space):
    from trieste_tpu.acquisition.trust_region import SingleObjectiveTrustRegionBox

    region = SingleObjectiveTrustRegionBox(
        Box([0.0, 0.0], [1.0, 1.0]), key=jax.random.PRNGKey(0)
    )
    region.initialize()
    region.update(datasets={OBJECTIVE: mk_dataset([[0.5, 0.5]], [[1.0]])})
    again = _roundtrip(region)
    np.testing.assert_array_equal(np.asarray(again.lower), np.asarray(region.lower))
    np.testing.assert_array_equal(np.asarray(again.eps), np.asarray(region.eps))
    assert again._y_min == region._y_min


def test_trego_region_pickle_roundtrip():
    from trieste_tpu.acquisition.trust_region import TREGOBox

    region = TREGOBox(Box([0.0, 0.0], [1.0, 1.0]), key=jax.random.PRNGKey(0))
    region.initialize(datasets={OBJECTIVE: mk_dataset([[0.4, 0.4]], [[5.0]])})
    region.update(datasets={OBJECTIVE: mk_dataset([[0.4, 0.4]], [[5.0]])})
    again = _roundtrip(region)
    assert again.is_global == region.is_global
    np.testing.assert_array_equal(np.asarray(again.eps), np.asarray(region.eps))


def test_turbo_region_pickle_roundtrip():
    from trieste_tpu.acquisition.trust_region import TURBOBox

    region = TURBOBox(Box([0.0, 0.0], [1.0, 1.0]))
    region.initialize(datasets={OBJECTIVE: mk_dataset([[0.4, 0.4]], [[5.0]])})
    region.update(datasets={OBJECTIVE: mk_dataset([[0.3, 0.3]], [[4.0]])})
    again = _roundtrip(region)
    assert again.L == region.L
    assert again.success_counter == region.success_counter


def test_discrete_regions_pickle_roundtrip():
    from trieste_tpu.acquisition.trust_region import (
        FixedPointTrustRegionDiscrete,
        SingleObjectiveTrustRegionDiscrete,
    )
    from trieste_tpu.space import DiscreteSearchSpace

    grid = jnp.stack(
        jnp.meshgrid(jnp.linspace(0, 1, 5), jnp.linspace(0, 1, 5)), axis=-1
    ).reshape(-1, 2)
    space = DiscreteSearchSpace(grid)
    for cls in (FixedPointTrustRegionDiscrete, SingleObjectiveTrustRegionDiscrete):
        region = cls(space, key=jax.random.PRNGKey(1))
        region.initialize()
        again = _roundtrip(region)
        np.testing.assert_array_equal(np.asarray(again.points), np.asarray(region.points))


def test_product_region_pickle_roundtrip():
    from trieste_tpu.acquisition.trust_region import (
        SingleObjectiveTrustRegionBox,
        UpdatableTrustRegionProduct,
    )

    region = UpdatableTrustRegionProduct(
        [
            SingleObjectiveTrustRegionBox(Box([0.0], [1.0]), key=jax.random.PRNGKey(0)),
            SingleObjectiveTrustRegionBox(Box([2.0], [3.0]), key=jax.random.PRNGKey(1)),
        ]
    )
    region.initialize()
    again = _roundtrip(region)
    np.testing.assert_array_equal(np.asarray(again.lower), np.asarray(region.lower))
    assert list(again.regions.keys()) == list(region.regions.keys())


def test_batch_trust_region_state_pickle_roundtrip():
    from trieste_tpu.acquisition.trust_region import (
        BatchTrustRegionState,
        SingleObjectiveTrustRegionBox,
    )

    regions = tuple(
        SingleObjectiveTrustRegionBox(Box([0.0], [1.0]), region_index=i,
                                      key=jax.random.PRNGKey(i))
        for i in range(2)
    )
    for r in regions:
        r.initialize()
    state = BatchTrustRegionState(regions)
    again = pickle.loads(pickle.dumps(state))
    assert again.acquisition_space.num_subspaces == 2
    np.testing.assert_array_equal(
        np.asarray(again.subspaces[1].lower), np.asarray(state.subspaces[1].lower)
    )


def test_qhsri_constructor_validation():
    from trieste_tpu.acquisition.rule import BatchHypervolumeSharpeRatioIndicator

    with pytest.raises(ValueError):
        BatchHypervolumeSharpeRatioIndicator(num_query_points=0)


# ------------------------------------------------------------------ Ask/Tell


def test_ask_tell_requires_populated_dicts(space):
    with pytest.raises(ValueError):
        AskTellOptimizer(space, {}, {})


def test_ask_tell_requires_matching_keys(space, model, dataset):
    with pytest.raises(ValueError, match="same keys"):
        AskTellOptimizerNoTraining(
            space, {OBJECTIVE: dataset}, {"OTHER": model},
            acquisition_rule=FixedAcquisitionRule([[0.0]]),
        )


def test_ask_tell_default_rule_requires_objective(space, model, dataset):
    with pytest.raises(ValueError, match="OBJECTIVE"):
        AskTellOptimizerNoTraining(
            space, {"OTHER": dataset}, {"OTHER": model}
        )


def test_ask_tell_tell_unknown_tag_raises(space, model, dataset):
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: dataset}, {OBJECTIVE: model},
        acquisition_rule=FixedAcquisitionRule([[0.0]]),
    )
    with pytest.raises(ValueError, match="Unknown tag"):
        opt.tell({"BOGUS": dataset})


def test_ask_tell_tell_appends_when_tracking(space, model, dataset):
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: dataset}, {OBJECTIVE: model},
        acquisition_rule=FixedAcquisitionRule([[0.0]]),
    )
    opt.tell(mk_dataset([[0.9]], [[0.81]]))
    assert len(opt.dataset) == 4
    np.testing.assert_allclose(np.asarray(opt.dataset.trimmed_query_points[-1]), [0.9])


def test_ask_tell_tell_replaces_when_not_tracking(space, model, dataset):
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: dataset}, {OBJECTIVE: model},
        acquisition_rule=FixedAcquisitionRule([[0.0]]),
        track_data=False,
    )
    full = mk_dataset([[0.1], [0.2]], [[0.01], [0.04]])
    opt.tell(full)
    assert len(opt.dataset) == 2


def test_ask_tell_ask_returns_rule_points(space, model, dataset):
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: dataset}, {OBJECTIVE: model},
        acquisition_rule=FixedAcquisitionRule([[0.25]]),
    )
    np.testing.assert_array_equal(np.asarray(opt.ask()), [[0.25]])


def test_ask_tell_record_roundtrip(space, model, dataset):
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: dataset}, {OBJECTIVE: model},
        acquisition_rule=FixedAcquisitionRule([[0.0]]),
    )
    record = opt.to_record()
    again = AskTellOptimizerNoTraining.from_record(
        record, space, acquisition_rule=FixedAcquisitionRule([[0.0]])
    )
    assert len(again.dataset) == len(opt.dataset)
    np.testing.assert_array_equal(
        np.asarray(again.dataset.trimmed_query_points),
        np.asarray(opt.dataset.trimmed_query_points),
    )


def test_ask_tell_record_copy_isolation(space, model, dataset):
    """to_record(copy=True) must deep-copy: mutating the optimizer afterwards does not
    change the record (reference ``ask_tell_optimization.py:451-478``)."""
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: dataset}, {OBJECTIVE: model},
        acquisition_rule=FixedAcquisitionRule([[0.0]]),
    )
    record = opt.to_record(copy=True)
    opt.tell(mk_dataset([[0.9]], [[0.81]]))
    assert len(record.datasets[OBJECTIVE]) == 3  # unchanged


def test_ask_tell_state_roundtrip_preserves_predictions(space, dataset):
    model = QuadraticMeanAndRBFKernel(noise_variance=1.0)
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: dataset}, {OBJECTIVE: model},
        acquisition_rule=FixedAcquisitionRule([[0.0]]),
    )
    state = opt.to_state()
    again = AskTellOptimizerNoTraining.from_state(
        state, space, acquisition_rule=FixedAcquisitionRule([[0.0]])
    )
    x = jnp.array([[0.3]])
    np.testing.assert_allclose(
        np.asarray(again.model.predict(x)[0]), np.asarray(opt.model.predict(x)[0])
    )


def test_ask_tell_single_accessors_raise_on_multi_tag(space, model, dataset):
    opt = AskTellOptimizerNoTraining(
        space,
        {OBJECTIVE: dataset, "C": dataset},
        {OBJECTIVE: model, "C": model},
        acquisition_rule=FixedAcquisitionRule([[0.0]]),
    )
    with pytest.raises(ValueError):
        opt.dataset
    with pytest.raises(ValueError):
        opt.model


def test_ask_tell_key_advances_between_asks(space, model, dataset):
    """Consecutive asks must consume fresh PRNG subkeys (different proposals for a
    stochastic rule)."""
    rule = RandomSampling(1)
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: dataset}, {OBJECTIVE: model},
        acquisition_rule=rule, key=jax.random.PRNGKey(5),
    )
    a = np.asarray(opt.ask())
    b = np.asarray(opt.ask())
    assert not np.array_equal(a, b)


# ------------------------------------------------------------------ EGO greedy path


def test_ego_greedy_batch_returns_diverse_points(space, model, dataset):
    """The greedy loop feeds accumulated pending points back into the builder, so a
    penalizing builder yields B distinct locations (reference ``rule.py:371-399``)."""
    from trieste_tpu.acquisition.function.greedy_batch import LocalPenalization

    rule = EfficientGlobalOptimization(
        builder=LocalPenalization(space, num_samples=64, key=jax.random.PRNGKey(0)),
        optimizer=FAST_OPT,
        num_query_points=3,
    )
    pts = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset},
                       key=jax.random.PRNGKey(0))
    assert pts.shape == (3, 1)
    flat = np.asarray(pts)[:, 0]
    # pairwise distinct: penalization pushes later picks away from earlier ones
    for i in range(3):
        for j in range(i + 1, 3):
            assert abs(flat[i] - flat[j]) > 1e-3, flat


def test_ego_greedy_pending_points_see_earlier_choices(space, model, dataset):
    """The builder receives exactly the previously chosen points as pending."""
    from trieste_tpu.acquisition.interface import (
        AcquisitionFunction,
        GreedyAcquisitionFunctionBuilder,
    )

    seen = []

    class RecordingBuilder(GreedyAcquisitionFunctionBuilder):
        def prepare_acquisition_function(self, models, datasets=None, pending_points=None):
            seen.append(None if pending_points is None else np.asarray(pending_points))
            return lambda x: -jnp.sum(jnp.asarray(x)[..., 0, :] ** 2, -1, keepdims=True)

        def update_acquisition_function(self, function, models, datasets=None,
                                        pending_points=None, new_optimization_step=True):
            seen.append(None if pending_points is None else np.asarray(pending_points))
            return function

    rule = EfficientGlobalOptimization(
        builder=RecordingBuilder(), optimizer=FAST_OPT, num_query_points=3
    )
    pts = rule.acquire(space, {OBJECTIVE: model}, {OBJECTIVE: dataset},
                       key=jax.random.PRNGKey(0))
    assert pts.shape == (3, 1)
    assert seen[0] is None  # first optimization has no pending points
    assert seen[1].shape == (1, 1) and seen[2].shape == (2, 1)
    np.testing.assert_allclose(seen[2][0], seen[1][0])  # accumulation, not replacement
