"""Trust-region framework tests (role of reference ``tests/unit/acquisition/test_rule.py``
trust-region sections)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from tests.util.misc import mk_dataset, quadratic
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.acquisition.trust_region import (
    BatchTrustRegionBox,
    BatchTrustRegionState,
    SingleObjectiveTrustRegionBox,
    TREGOBox,
    TURBOBox,
)
from trieste_tpu.acquisition.utils import copy_to_local_models
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import mk_observer
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box
from trieste_tpu.utils.misc import LocalizedTag

FAST_OPT = generate_continuous_optimizer(num_initial_samples=128, num_optimization_runs=4)


@pytest.fixture
def space():
    return Box([0.0, 0.0], [1.0, 1.0])


def test_single_objective_region_success_expands(space):
    region = SingleObjectiveTrustRegionBox(space, key=jax.random.PRNGKey(0))
    region.initialize()
    region.location = jnp.array([0.5, 0.5])
    region.eps = jnp.array([0.2, 0.2])
    region._y_min = 1.0
    region._resize_bounds()
    better = {OBJECTIVE: mk_dataset([[0.5, 0.5]], [[0.5]])}
    region.update(datasets=better)
    np.testing.assert_allclose(np.asarray(region.eps), 0.2 / 0.7, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(region.location), [0.5, 0.5])


def test_single_objective_region_failure_shrinks(space):
    region = SingleObjectiveTrustRegionBox(space, key=jax.random.PRNGKey(0))
    region.initialize()
    region.location = jnp.array([0.5, 0.5])
    region.eps = jnp.array([0.2, 0.2])
    region._y_min = -10.0  # nothing in the region will beat this
    region._resize_bounds()
    worse = {OBJECTIVE: mk_dataset([[0.5, 0.5]], [[0.5]])}
    region.update(datasets=worse)
    np.testing.assert_allclose(np.asarray(region.eps), 0.2 * 0.7, rtol=1e-6)


def test_region_reinitializes_when_tiny(space):
    region = SingleObjectiveTrustRegionBox(space, min_eps=0.1, key=jax.random.PRNGKey(0))
    region.initialize()
    region.eps = jnp.array([0.11, 0.11])
    region._y_min = -10.0
    region.update(datasets={OBJECTIVE: mk_dataset([[0.5, 0.5]], [[0.5]])})
    # failure shrinks below min_eps -> fresh region at full zeta size
    np.testing.assert_allclose(np.asarray(region.eps), 0.5, rtol=1e-6)


def test_trego_alternates_phases(space):
    """Reference phase machine (``rule.py:1979``): success -> global, failure ->
    toggle; the first post-init update is always a success (``_y_min`` starts inf)."""
    region = TREGOBox(space, key=jax.random.PRNGKey(0))
    region.initialize(datasets={OBJECTIVE: mk_dataset([[0.5, 0.5]], [[10.0]])})
    assert region.is_global
    # first update is always a success (y_min starts at inf) -> stays global,
    # recentres on the best point
    region.update(datasets={OBJECTIVE: mk_dataset([[0.5, 0.5]], [[20.0]])})
    assert region.is_global
    np.testing.assert_allclose(np.asarray(region.location), [0.5, 0.5])
    # no improvement -> failure -> toggle to local phase
    region.update(datasets={OBJECTIVE: mk_dataset([[0.5, 0.5]], [[20.0]])})
    assert not region.is_global
    # improvement while local -> success -> back to global, eps expanded
    eps_before = np.asarray(region.eps).copy()
    region.update(datasets={OBJECTIVE: mk_dataset([[0.4, 0.4]], [[-5.0]])})
    assert region.is_global
    np.testing.assert_allclose(np.asarray(region.eps), eps_before / 0.7, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(region.location), [0.4, 0.4])
    # failure while global -> toggle back to local, eps unchanged (global-mode eps
    # updates are no-ops, reference rule.py:1969-1975)
    eps_before = np.asarray(region.eps).copy()
    region.update(datasets={OBJECTIVE: mk_dataset([[0.4, 0.4]], [[-5.0]])})
    assert not region.is_global
    np.testing.assert_allclose(np.asarray(region.eps), eps_before)


def test_trego_never_filters_dataset(space):
    """TREGO's local dataset keeps every point (reference ``rule.py:2004-2023``)."""
    region = TREGOBox(space, key=jax.random.PRNGKey(0))
    region.initialize()
    region._is_global = False
    region.location = jnp.array([0.1, 0.1])
    region.eps = jnp.array([0.05, 0.05])
    region._resize_bounds()
    ds = mk_dataset([[0.1, 0.1], [0.9, 0.9]], [[1.0], [2.0]])
    mask = region.dataset_filter_mask(ds)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ds.mask))
    # while a plain region restricts to membership
    plain = SingleObjectiveTrustRegionBox(space, key=jax.random.PRNGKey(0))
    plain.initialize()
    plain.location = jnp.array([0.1, 0.1])
    plain.eps = jnp.array([0.05, 0.05])
    plain._resize_bounds()
    pmask = np.asarray(plain.dataset_filter_mask(ds))
    assert pmask[0] and not pmask[1]


def test_turbo_doubles_and_halves(space):
    region = TURBOBox(space, success_tolerance=2, failure_tolerance=2)
    region.initialize(datasets={OBJECTIVE: mk_dataset([[0.5, 0.5]], [[1.0]])})
    L0 = region.L
    for y in ([[0.5]], [[0.2]]):  # two successes
        region.update(datasets={OBJECTIVE: mk_dataset([[0.5, 0.5]], y)})
    assert region.L == pytest.approx(2 * L0)
    for y in ([[5.0]], [[5.0]]):  # two failures
        region.update(datasets={OBJECTIVE: mk_dataset([[0.5, 0.5]], y)})
    assert region.L == pytest.approx(L0)


def test_discrete_region_first_update_succeeds():
    """The first post-init update (``_y_min`` starts inf) must be a success: the
    region recentres on the best in-region point and expands, instead of the
    inf-minus-inf NaN comparison silently failing forever."""
    from trieste_tpu.acquisition.trust_region import SingleObjectiveTrustRegionDiscrete
    from trieste_tpu.space import DiscreteSearchSpace

    points = jnp.stack(
        jnp.meshgrid(jnp.linspace(0, 1, 11), jnp.linspace(0, 1, 11)), axis=-1
    ).reshape(-1, 2)
    space = DiscreteSearchSpace(points)
    region = SingleObjectiveTrustRegionDiscrete(space, key=jax.random.PRNGKey(0))
    region.initialize()
    assert not np.isfinite(region._y_min)
    eps0 = region.eps
    # any finite observation inside the region is an improvement over inf
    inside = np.asarray(region.points)[0]
    ds = {OBJECTIVE: mk_dataset([inside.tolist()], [[3.5]])}
    region.update(datasets=ds)
    assert region._y_min == pytest.approx(3.5)
    assert region.eps == pytest.approx(eps0 / 0.7)
    np.testing.assert_allclose(np.asarray(region.location), inside)
    # and subsequent non-improving data is a failure that shrinks eps
    eps1 = region.eps
    region.update(datasets={OBJECTIVE: mk_dataset([inside.tolist()], [[10.0]])})
    assert region._y_min == pytest.approx(3.5)
    assert region.eps == pytest.approx(eps1 * 0.7)


def test_discrete_region_converges_on_quadratic():
    """End-to-end runtime check of the advisor's scenario: a discrete single-objective
    region must recentre toward the minimizer instead of looping re-initialization."""
    from trieste_tpu.acquisition.trust_region import SingleObjectiveTrustRegionDiscrete
    from trieste_tpu.space import DiscreteSearchSpace

    grid = jnp.stack(
        jnp.meshgrid(jnp.linspace(0, 1, 21), jnp.linspace(0, 1, 21)), axis=-1
    ).reshape(-1, 2)
    space = DiscreteSearchSpace(grid)
    region = SingleObjectiveTrustRegionDiscrete(space, key=jax.random.PRNGKey(3))
    region.initialize()
    key = jax.random.PRNGKey(7)
    for _ in range(8):
        key, sub = jax.random.split(key)
        n = region.points.shape[0]
        idx = jax.random.randint(sub, (min(4, n),), 0, n)
        qp = region.points[idx]
        obs = jnp.sum((qp - 0.5) ** 2, axis=-1, keepdims=True)
        region.update(datasets={OBJECTIVE: tt.Dataset.from_arrays(qp, obs)})
    assert np.isfinite(region._y_min)  # success branch was reachable
    np.testing.assert_allclose(np.asarray(region.location), [0.5, 0.5], atol=0.3)


def test_turbo_first_update_with_empty_init_is_inf_safe(space):
    """TuRBO initialized without data has ``_y_min = inf``; the first data-bearing
    update must count as a success, not a NaN-comparison failure."""
    region = TURBOBox(space, success_tolerance=1, failure_tolerance=2)
    region.initialize()  # no datasets: _y_min stays inf
    assert not np.isfinite(region._y_min)
    L0 = region.L
    region.update(datasets={OBJECTIVE: mk_dataset([[0.5, 0.5]], [[1.0]])})
    assert region.L == pytest.approx(2 * L0)  # success_tolerance=1 -> doubled


def test_batch_trust_region_with_local_models(space):
    """Per-region local models + per-region rules (reference ``rule.py:1417-1435``)."""
    observer = mk_observer(quadratic)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    initial = observer(space.sample(k1, 6))
    global_model = build_gpr(initial, space, likelihood_variance=1e-7,
                             trainable_likelihood=False)
    local_models = copy_to_local_models(global_model, 2)
    rule = BatchTrustRegionBox(
        init_subspaces=2,
        rule=[
            EfficientGlobalOptimization(optimizer=FAST_OPT),
            EfficientGlobalOptimization(optimizer=FAST_OPT),
        ],
    )
    datasets = {OBJECTIVE: initial}
    bo = tt.BayesianOptimizer(observer, space)
    result = bo.optimize(
        3, datasets, dict(local_models), rule, key=k2, track_state=False
    )
    assert result.is_ok, result.final_result
    ds = result.try_get_final_datasets()
    assert OBJECTIVE in ds
    assert LocalizedTag(OBJECTIVE, 0) in ds
    # 2 points per step (one per region)
    assert len(ds[OBJECTIVE]) == 6 + 3 * 2


def test_batch_trust_region_state_roundtrip(space):
    regions = tuple(
        SingleObjectiveTrustRegionBox(space, region_index=i, key=jax.random.PRNGKey(i))
        for i in range(3)
    )
    for r in regions:
        r.initialize()
    state = BatchTrustRegionState(regions)
    acq_space = state.acquisition_space
    assert acq_space.num_subspaces == 3
    import copy as copy_module

    state2 = copy_module.deepcopy(state)
    np.testing.assert_allclose(
        np.asarray(state2.subspaces[0].lower), np.asarray(state.subspaces[0].lower)
    )


def test_mask_to_region_is_device_resident_and_stable(key):
    """Local datasets keep the global capacity (no recompiles as membership fluctuates)
    and preserve insertion order of member rows."""
    from trieste_tpu.acquisition.trust_region import _mask_to_region
    from trieste_tpu.data import Dataset

    X = jax.random.uniform(key, (10, 2))
    Y = jnp.sum(X, axis=-1, keepdims=True)
    ds = Dataset.from_arrays(X, Y)  # capacity 16
    misses0 = None

    for lo in (0.0, 0.3, 0.6, 0.95):
        inside = jnp.all(X >= lo, axis=-1)
        inside_padded = jnp.concatenate([inside, jnp.zeros(ds.capacity - 10, bool)])
        local = _mask_to_region(ds, inside_padded)
        assert local.capacity == ds.capacity  # shape-stable
        n = int(jnp.sum(inside))
        assert int(local.num_points) == n
        expected = np.asarray(X)[np.asarray(inside)]
        np.testing.assert_allclose(np.asarray(local.trimmed_query_points), expected)
        if misses0 is None:
            misses0 = _mask_to_region._cache_size()

    # every membership pattern after the first reused the SAME compiled program
    assert _mask_to_region._cache_size() == misses0


def test_batch_trust_region_filter_keeps_capacity(key):
    """End-to-end: filter_datasets yields local datasets at the global capacity."""
    from trieste_tpu.acquisition.trust_region import BatchTrustRegionBox
    from trieste_tpu.acquisition.utils import with_local_datasets
    from trieste_tpu.data import Dataset
    from trieste_tpu.objectives import SimpleQuadratic
    from trieste_tpu.observer import OBJECTIVE
    from tests.util.models import QuadraticMeanAndRBFKernel

    space = SimpleQuadratic.search_space
    X = space.sample(key, 12)
    ds = Dataset.from_arrays(X, SimpleQuadratic.objective(X))
    rule = BatchTrustRegionBox(init_subspaces=3)
    rule.initialize_subspaces(space)
    datasets = dict(with_local_datasets({OBJECTIVE: ds}, 3))
    models = {OBJECTIVE: QuadraticMeanAndRBFKernel()}
    state, filtered = rule.filter_datasets(models, datasets)(None)
    for tag, local in filtered.items():
        assert local.capacity == ds.capacity
