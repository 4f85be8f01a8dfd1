"""Objective-catalogue and multi-objective-utility edge cases (role of reference
``tests/unit/objectives/test_single_objectives.py`` /
``test_multi_objectives.py`` / ``tests/unit/acquisition/multi_objective``):
every problem's recorded optimum is verified against its own objective, evaluation is
batch-shaped, and the Pareto/partition utilities honor their contracts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.acquisition.multi_objective.dominance import (
    non_dominated,
    non_dominated_mask,
)
from trieste_tpu.acquisition.multi_objective.pareto import (
    Pareto,
    get_reference_point,
)
from trieste_tpu.acquisition.multi_objective.partition import (
    ExactPartition2dNonDominated,
    prepare_default_non_dominated_partition_bounds,
)
from trieste_tpu.objectives import (
    Ackley5,
    Branin,
    GramacyLee,
    Hartmann3,
    Hartmann6,
    Levy8,
    LogarithmicGoldsteinPrice,
    Michalewicz2,
    Michalewicz5,
    Michalewicz10,
    Rosenbrock4,
    ScaledBranin,
    Shekel4,
    SimpleQuadratic,
    Trid10,
)
from trieste_tpu.objectives.multi_objectives import DTLZ1, DTLZ2, VLMOP2, dtlz_mkd

ALL_PROBLEMS = [
    Branin,
    ScaledBranin,
    SimpleQuadratic,
    GramacyLee,
    LogarithmicGoldsteinPrice,
    Hartmann3,
    Hartmann6,
    Shekel4,
    Levy8,
    Rosenbrock4,
    Ackley5,
    Michalewicz2,
    Michalewicz5,
    Michalewicz10,
    Trid10,
]


@pytest.mark.parametrize("problem", ALL_PROBLEMS, ids=lambda p: p.name)
def test_problem_minimizers_achieve_recorded_minimum(problem):
    y = problem.objective(problem.minimizers)
    np.testing.assert_allclose(
        np.asarray(y), np.broadcast_to(np.asarray(problem.minimum), y.shape),
        rtol=2e-4, atol=2e-5,
    )


@pytest.mark.parametrize("problem", ALL_PROBLEMS, ids=lambda p: p.name)
def test_problem_minimizers_lie_in_search_space(problem):
    assert bool(jnp.all(problem.search_space.contains(problem.minimizers)))


@pytest.mark.parametrize("problem", ALL_PROBLEMS, ids=lambda p: p.name)
def test_problem_random_points_do_not_beat_minimum(problem, key):
    """No sampled point evaluates below the recorded global minimum."""
    x = problem.search_space.sample(key, 512)
    y = problem.objective(x)
    assert y.shape == (512, 1)
    assert float(jnp.min(y)) >= float(problem.minimum[0]) - 1e-6


@pytest.mark.parametrize("problem", [Branin, Hartmann6], ids=lambda p: p.name)
def test_problem_objective_supports_batch_ranks(problem, key):
    D = problem.search_space.dimension
    x = problem.search_space.sample(key, 6).reshape(2, 3, D)
    y = problem.objective(x)
    assert y.shape == (2, 3, 1)


# ------------------------------------------------------------------ multi-objective problems


def test_vlmop2_pareto_points_are_non_dominated(key):
    pts = VLMOP2.gen_pareto_optimal_points(64, key)
    assert pts.shape == (64, 2)
    assert bool(jnp.all(non_dominated_mask(pts)))


@pytest.mark.parametrize("factory", [DTLZ1, DTLZ2])
@pytest.mark.parametrize("num_objectives", [2, 3])
def test_dtlz_pareto_points_are_non_dominated(factory, num_objectives, key):
    problem = factory(input_dim=4 + num_objectives, num_objectives=num_objectives)
    pts = problem.gen_pareto_optimal_points(32, key)
    assert pts.shape == (32, num_objectives)
    assert bool(jnp.all(non_dominated_mask(pts)))


def test_dtlz_objective_shapes(key):
    problem = DTLZ2(input_dim=5, num_objectives=3)
    x = problem.search_space.sample(key, 10)
    y = problem.objective(x)
    assert y.shape == (10, 3)


def test_dtlz_front_dominates_random_evaluations(key):
    """Pareto-front images must not be dominated by any random evaluation."""
    problem = DTLZ2(input_dim=5, num_objectives=2)
    k1, k2 = jax.random.split(key)
    front = problem.gen_pareto_optimal_points(16, k1)
    ys = problem.objective(problem.search_space.sample(k2, 256))
    # no random y strictly dominates a front point
    dominates = jnp.all(ys[:, None, :] <= front[None, :, :] - 1e-9, axis=-1)
    assert not bool(jnp.any(dominates))


def test_dtlz_mkd_helper():
    m, k, d = dtlz_mkd(6, 2)
    assert (m, k, d) == (2, 5, 6)


# ------------------------------------------------------------------ dominance


def test_non_dominated_empty():
    front, mask = non_dominated(jnp.zeros((0, 2)))
    assert front.shape[0] == 0
    assert mask.shape == (0,)


def test_non_dominated_single_point():
    front, mask = non_dominated(jnp.array([[1.0, 2.0]]))
    np.testing.assert_array_equal(np.asarray(front), [[1.0, 2.0]])
    assert bool(mask[0])


def test_non_dominated_duplicates_kept():
    """Equal points do not dominate each other — both stay on the front."""
    pts = jnp.array([[1.0, 1.0], [1.0, 1.0], [2.0, 2.0]])
    mask = np.asarray(non_dominated_mask(pts))
    assert mask[0] and mask[1] and not mask[2]


def test_non_dominated_weak_domination():
    """A point equal in one objective and worse in the other is dominated."""
    pts = jnp.array([[1.0, 1.0], [1.0, 2.0]])
    mask = np.asarray(non_dominated_mask(pts))
    assert mask[0] and not mask[1]


def test_non_dominated_three_objectives():
    pts = jnp.array(
        [[1.0, 2.0, 3.0], [3.0, 2.0, 1.0], [2.0, 2.0, 2.0], [3.0, 3.0, 3.0]]
    )
    mask = np.asarray(non_dominated_mask(pts))
    np.testing.assert_array_equal(mask, [True, True, True, False])


# ------------------------------------------------------------------ Pareto / hypervolume


def test_pareto_filters_to_front():
    obs = jnp.array([[1.0, 3.0], [2.0, 2.0], [3.0, 1.0], [3.0, 3.0]])
    assert Pareto(obs).front.shape == (3, 2)
    # already_non_dominated skips the filter
    assert Pareto(obs, already_non_dominated=True).front.shape == (4, 2)


def test_hypervolume_zero_when_reference_on_front():
    front = jnp.array([[1.0, 1.0]])
    hv = Pareto(front).hypervolume_indicator(jnp.array([1.0, 1.0]))
    assert float(hv) == pytest.approx(0.0, abs=1e-12)


def test_hypervolume_additive_for_disjoint_boxes():
    front = jnp.array([[0.0, 2.0], [2.0, 0.0]])
    hv = Pareto(front).hypervolume_indicator(jnp.array([3.0, 3.0]))
    # two 1x3 strips plus shared 1x1 corner counted once: 3 + 3 - 1 = 5
    assert float(hv) == pytest.approx(5.0, rel=1e-10)


def test_hypervolume_monotone_in_reference():
    front = jnp.array([[0.0, 1.0], [1.0, 0.0]])
    small = Pareto(front).hypervolume_indicator(jnp.array([2.0, 2.0]))
    large = Pareto(front).hypervolume_indicator(jnp.array([3.0, 3.0]))
    assert float(large) > float(small)


def test_get_reference_point_dominates_front():
    front = jnp.array([[0.0, 2.0], [1.0, 1.0], [2.0, 0.0]])
    ref = get_reference_point(front)
    assert bool(jnp.all(ref >= front.max(axis=0)))


def test_get_reference_point_empty_raises():
    with pytest.raises(ValueError):
        get_reference_point(jnp.zeros((0, 2)))


def test_sample_diverse_subset_shape_and_membership():
    ys = jnp.stack(
        [jnp.linspace(0.0, 1.0, 20), jnp.linspace(1.0, 0.0, 20)], axis=-1
    )
    pareto = Pareto(ys)
    subset, counts = pareto.sample_diverse_subset(5)
    assert subset.shape == (5, 2)
    assert int(jnp.sum(counts)) == 5
    member = (subset[:, None, :] == pareto.front[None, :, :]).all(-1).any(-1)
    assert bool(jnp.all(member))


def test_sample_diverse_subset_validation():
    pareto = Pareto(jnp.array([[0.0, 1.0], [1.0, 0.0]]))
    with pytest.raises(ValueError):
        pareto.sample_diverse_subset(0)
    with pytest.raises(ValueError):
        pareto.sample_diverse_subset(5, allow_repeats=False)


# ------------------------------------------------------------------ partition


def test_exact_2d_partition_known_cells():
    front = jnp.array([[1.0, 2.0], [2.0, 1.0]])
    lower, upper = ExactPartition2dNonDominated(front).partition_bounds(
        jnp.array([0.0, 0.0]), jnp.array([3.0, 3.0])
    )
    # cells tile the dominated-complement exactly: total volume 9 - HV
    vol = float(jnp.sum(jnp.prod(upper - lower, axis=-1)))
    hv = float(Pareto(front).hypervolume_indicator(jnp.array([3.0, 3.0])))
    assert vol == pytest.approx(9.0 - hv, rel=1e-9)


def test_default_partition_handles_empty_front():
    lower, upper = prepare_default_non_dominated_partition_bounds(
        jnp.array([2.0, 2.0]), jnp.zeros((0, 2))
    )
    # single cell spanning everything below the reference point
    assert lower.shape[0] == 1
    np.testing.assert_array_equal(np.asarray(upper[0]), [2.0, 2.0])


def test_partition_cell_volumes_nonnegative(key):
    ys = jax.random.uniform(key, (12, 2))
    front = Pareto(ys).front
    ref = get_reference_point(front) + 0.1
    lower, upper = prepare_default_non_dominated_partition_bounds(ref, front)
    assert bool(jnp.all(upper >= lower))
