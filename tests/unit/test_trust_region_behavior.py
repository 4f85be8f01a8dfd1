"""Trust-region behavioral matrix (role of the deeper reference
``tests/unit/acquisition/test_rule.py`` trust-region sections, ``rule.py:1261-2625``):
filter_datasets semantics across flavors, product-region active-dims slicing,
dataset-filter masks, vectorized vs per-region acquire paths, and region_index
propagation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.acquisition.trust_region import (
    BatchTrustRegionBox,
    BatchTrustRegionProduct,
    FixedPointTrustRegionDiscrete,
    SingleObjectiveTrustRegionBox,
    SingleObjectiveTrustRegionDiscrete,
    TREGOBox,
    UpdatableTrustRegionProduct,
)
from trieste_tpu.acquisition.utils import with_local_datasets
from trieste_tpu.data import Dataset
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box, DiscreteSearchSpace, TaggedProductSearchSpace
from trieste_tpu.utils.misc import LocalizedTag

FAST_OPT = generate_continuous_optimizer(num_initial_samples=64, num_optimization_runs=4)


@pytest.fixture
def space():
    return Box([0.0, 0.0], [1.0, 1.0])


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel()


def _global_ds(n=10, key=jax.random.PRNGKey(0)):
    X = jax.random.uniform(key, (n, 2))
    return Dataset.from_arrays(X, jnp.sum((X - 0.5) ** 2, -1, keepdims=True))


# ------------------------------------------------------------------ filter_datasets semantics


def test_filter_datasets_initializes_then_updates(space, model):
    """First filter call initializes every region; later calls update them
    (reference ``rule.py:1501-1532``)."""
    rule = BatchTrustRegionBox(init_subspaces=2)
    rule.initialize_subspaces(space)
    ds = _global_ds()
    datasets = dict(with_local_datasets({OBJECTIVE: ds}, 2))
    models = {OBJECTIVE: model}
    state, _ = rule.filter_datasets(models, datasets)(None)
    eps_after_init = [np.asarray(s.eps).copy() for s in state.subspaces]
    # feed a clearly-improving local observation: the update branch must run (eps moves)
    state2, _ = rule.filter_datasets(models, datasets)(state)
    for s, eps0 in zip(state2.subspaces, eps_after_init):
        assert s is not None
        # eps either expanded (success) or shrank (failure) but must have moved
        assert not np.allclose(np.asarray(s.eps), eps0) or s.requires_initialization is False


def test_filter_keeps_global_tags_untouched(space, model):
    rule = BatchTrustRegionBox(init_subspaces=2)
    rule.initialize_subspaces(space)
    ds = _global_ds()
    datasets = dict(with_local_datasets({OBJECTIVE: ds}, 2))
    _, filtered = rule.filter_datasets({OBJECTIVE: model}, datasets)(None)
    np.testing.assert_array_equal(
        np.asarray(filtered[OBJECTIVE].query_points), np.asarray(ds.query_points)
    )


def test_filter_local_datasets_subset_of_region(space, model):
    rule = BatchTrustRegionBox(init_subspaces=3)
    rule.initialize_subspaces(space)
    ds = _global_ds(20)
    datasets = dict(with_local_datasets({OBJECTIVE: ds}, 3))
    state, filtered = rule.filter_datasets({OBJECTIVE: model}, datasets)(None)
    for i, region in enumerate(state.subspaces):
        local = filtered[LocalizedTag(OBJECTIVE, i)]
        if len(local) and len(local) != len(ds):  # non-fallback case
            qp = local.trimmed_query_points
            assert bool(jnp.all(region.contains(qp)))


def test_filter_empty_region_falls_back_to_global(model):
    """A region containing no observations yields the full dataset so models stay
    buildable."""
    space = Box([0.0, 0.0], [1.0, 1.0])
    region = SingleObjectiveTrustRegionBox(space, key=jax.random.PRNGKey(0))
    region.initialize()
    region.location = jnp.array([0.05, 0.05])
    region.eps = jnp.array([0.01, 0.01])
    region._resize_bounds()
    rule = BatchTrustRegionBox(init_subspaces=[region])
    rule.initialize_subspaces(space)
    rule._initialized = True  # force the update path (no re-init scatter)
    X = jnp.full((4, 2), 0.9)  # all far outside the region
    ds = Dataset.from_arrays(X, jnp.ones((4, 1)))
    datasets = dict(with_local_datasets({OBJECTIVE: ds}, 1))
    _, filtered = rule.filter_datasets({OBJECTIVE: model}, datasets)(None)
    assert len(filtered[LocalizedTag(OBJECTIVE, 0)]) == 4  # fell back


def test_trego_filter_keeps_everything(space, model):
    rule = BatchTrustRegionBox(
        init_subspaces=[TREGOBox(space, key=jax.random.PRNGKey(0))],
        rule=EfficientGlobalOptimization(optimizer=FAST_OPT),
    )
    rule.initialize_subspaces(space)
    ds = _global_ds(12)
    datasets = dict(with_local_datasets({OBJECTIVE: ds}, 1))
    _, filtered = rule.filter_datasets({OBJECTIVE: model}, datasets)(None)
    assert len(filtered[LocalizedTag(OBJECTIVE, 0)]) == 12


# ------------------------------------------------------------------ acquire paths


def test_vectorized_acquire_returns_one_point_per_region(space, model):
    rule = BatchTrustRegionBox(init_subspaces=3)  # default vectorized MONLCB rule
    rule.initialize_subspaces(space)
    ds = _global_ds()
    datasets = dict(with_local_datasets({OBJECTIVE: ds}, 3))
    state, filtered = rule.filter_datasets({OBJECTIVE: model}, datasets)(None)
    state_fn = rule.acquire(space, {OBJECTIVE: model}, filtered, key=jax.random.PRNGKey(0))
    state2, points = state_fn(state)
    assert points.shape == (1, 3, 2)
    # each point lies in its own region
    for v in range(3):
        assert bool(state2.subspaces[v].contains(points[0, v]))


def test_per_region_acquire_uses_local_rules(space, model):
    rules = [
        EfficientGlobalOptimization(optimizer=FAST_OPT),
        EfficientGlobalOptimization(optimizer=FAST_OPT),
    ]
    rule = BatchTrustRegionBox(init_subspaces=2, rule=rules)
    rule.initialize_subspaces(space)
    ds = _global_ds()
    datasets = dict(with_local_datasets({OBJECTIVE: ds}, 2))
    state, filtered = rule.filter_datasets({OBJECTIVE: model}, datasets)(None)
    state_fn = rule.acquire(space, {OBJECTIVE: model}, filtered, key=jax.random.PRNGKey(0))
    state2, points = state_fn(state)
    assert points.shape == (1, 2, 2)
    for v in range(2):
        assert bool(state2.subspaces[v].contains(points[0, v]))


def test_init_subspaces_sets_region_indices(space):
    regions = [
        SingleObjectiveTrustRegionBox(space, key=jax.random.PRNGKey(i)) for i in range(3)
    ]
    BatchTrustRegionBox(init_subspaces=regions)
    assert [r.region_index for r in regions] == [0, 1, 2]


def test_num_local_datasets_matches_regions(space):
    rule = BatchTrustRegionBox(init_subspaces=4)
    rule.initialize_subspaces(space)
    assert rule.num_local_datasets == 4


# ------------------------------------------------------------------ product regions


def _mixed_space():
    return TaggedProductSearchSpace(
        [Box([0.0], [1.0]), DiscreteSearchSpace(jnp.linspace(0, 1, 11)[:, None])],
        tags=["cont", "disc"],
    )


def _product_region(key=jax.random.PRNGKey(0)):
    space = _mixed_space()
    return space, UpdatableTrustRegionProduct(
        [
            SingleObjectiveTrustRegionBox(space.get_subspace("cont"), key=key),
            SingleObjectiveTrustRegionDiscrete(
                space.get_subspace("disc"), key=jax.random.PRNGKey(7)
            ),
        ],
        tags=["cont", "disc"],
        region_index=0,
    )


def test_product_region_assigns_active_dims():
    space, region = _product_region()
    region.initialize()
    sub_regions = list(region.regions.values())
    assert sub_regions[0].input_active_dims == (0, 1)
    assert sub_regions[1].input_active_dims == (1, 2)


def test_product_region_update_slices_columns(model):
    """Each member region reads only its own columns of the global data when updating
    (reference active-dims slicing, ``rule.py:2389-2547``)."""
    space, region = _product_region()
    region.initialize()
    cont = list(region.regions.values())[0]
    cont.location = jnp.array([0.5])
    cont.eps = jnp.array([0.3])
    cont._resize_bounds()
    cont._y_min = 1.0
    # global data: columns [cont, disc]; best point at cont=0.52
    ds = mk_dataset([[0.52, 0.4], [0.9, 0.6]], [[0.5], [2.0]])
    region.update(datasets={OBJECTIVE: ds})
    np.testing.assert_allclose(np.asarray(cont.location), [0.52], atol=1e-9)


def test_product_region_membership_is_componentwise():
    space, region = _product_region()
    region.initialize()
    subs = list(region.regions.values())
    # pick a point inside both member regions
    cont_pt = float(jnp.clip(subs[0].location[0], subs[0].lower[0], subs[0].upper[0]))
    disc_pt = np.asarray(subs[1].points)[0]
    inside = jnp.array([cont_pt, float(disc_pt[0])])
    assert bool(region.contains(inside))
    outside = jnp.array([cont_pt, 0.03 + float(disc_pt[0])])  # not a member of disc part
    assert not bool(region.contains(outside))


def test_product_region_requires_initialization_any_member():
    space, region = _product_region()
    region.initialize()
    assert not region.requires_initialization
    list(region.regions.values())[1]._needs_init = True
    assert region.requires_initialization


def test_batch_trust_region_product_default_subspaces(model):
    space = _mixed_space()
    rule = BatchTrustRegionProduct(init_subspaces=2)
    rule.initialize_subspaces(space)
    assert rule.num_local_datasets == 2
    subs = rule._subspaces
    assert len(subs) == 2
    for s in subs:
        assert isinstance(s, UpdatableTrustRegionProduct)
        kinds = [type(r).__name__ for r in s.regions.values()]
        assert kinds == [
            "SingleObjectiveTrustRegionBox",
            "SingleObjectiveTrustRegionDiscrete",
        ]


def test_batch_trust_region_product_rejects_plain_box():
    rule = BatchTrustRegionProduct(init_subspaces=2)
    with pytest.raises(ValueError):
        rule.initialize_subspaces(Box([0.0], [1.0]))


def test_fixed_point_region_never_moves():
    space = DiscreteSearchSpace(jnp.linspace(0, 1, 7)[:, None])
    region = FixedPointTrustRegionDiscrete(space, key=jax.random.PRNGKey(0))
    region.initialize()
    pt = np.asarray(region.points).copy()
    region.update(datasets={OBJECTIVE: mk_dataset([[0.5]], [[0.1]])})
    np.testing.assert_array_equal(np.asarray(region.points), pt)


# ------------------------------------------------------------------ dataset_filter_mask


def test_dataset_filter_mask_uses_active_dims(model):
    """A member region's mask reads the global data's sliced columns."""
    space, region = _product_region()
    region.initialize()
    cont = list(region.regions.values())[0]
    cont.location = jnp.array([0.5])
    cont.eps = jnp.array([0.1])
    cont._resize_bounds()
    ds = mk_dataset([[0.5, 0.2], [0.95, 0.2]], [[1.0], [2.0]])
    mask = np.asarray(cont.dataset_filter_mask(ds))
    assert mask[0] and not mask[1]
