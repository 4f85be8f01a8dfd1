"""Multi-objective partition/Pareto behavior parity with the reference
(``/root/reference/tests/unit/acquisition/multi_objective/test_partition.py`` and
``test_pareto.py``): 3-objective divide-and-conquer volume identity, validation
raises, and diverse-subset selection semantics.
"""
from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.acquisition.multi_objective.partition import (
    DividedAndConquerNonDominated,
    ExactPartition2dNonDominated,
    non_dominated_partition_bounds,
    prepare_default_non_dominated_partition_bounds,
)
from trieste_tpu.acquisition.multi_objective.pareto import Pareto, get_reference_point


def _brute_force_hv(front, anti, ref, n=200_000):
    rng = np.random.default_rng(0)
    pts = rng.uniform(anti, ref, size=(n, len(ref)))
    dominated = np.any(np.all(pts[:, None, :] >= front[None, :, :], axis=-1), axis=-1)
    return dominated.mean() * np.prod(np.asarray(ref) - np.asarray(anti))


def test_divide_conquer_three_dimension_volume_identity():
    # the reference's 3-objective fixture (test_partition.py:304-311); our partition
    # uses box subtraction rather than index grids, so we assert the geometric
    # invariants instead of internal cell indices: disjoint cells whose total volume
    # complements the dominated hypervolume
    front = np.asarray([[0.0, 2.0, 1.0], [7.0, 6.0, 0.0], [9.0, 0.0, 1.0]])
    anti = np.asarray([-1.0, -2.0, -3.0])
    ref = np.asarray([10.0, 10.0, 10.0])
    lower, upper = DividedAndConquerNonDominated(front).partition_bounds(anti, ref)
    lower, upper = np.asarray(lower), np.asarray(upper)
    assert np.all(upper >= lower)
    vols = np.prod(upper - lower, axis=-1)
    # cells are pairwise disjoint
    for i, j in itertools.combinations(range(len(vols)), 2):
        inter_lo = np.maximum(lower[i], lower[j])
        inter_hi = np.minimum(upper[i], upper[j])
        assert np.prod(np.maximum(inter_hi - inter_lo, 0.0)) == pytest.approx(0.0)
    box_volume = np.prod(ref - anti)
    dominated_volume = _brute_force_hv(front, anti, ref)
    np.testing.assert_allclose(
        vols.sum(), box_volume - dominated_volume, rtol=5e-3
    )


def test_partition_bounds_raises_when_reference_does_not_dominate():
    front = np.asarray([[0.0, 2.0, 1.0], [7.0, 6.0, 0.0]])
    with pytest.raises(ValueError, match="dominate"):
        non_dominated_partition_bounds(jnp.asarray([5.0, 5.0, 5.0]), front)


def test_exact_partition_2d_rejects_other_dimensions():
    with pytest.raises(ValueError, match="2 objectives"):
        ExactPartition2dNonDominated(np.asarray([[0.0, 1.0, 2.0]]))


def test_default_partition_with_no_observations_is_single_cell():
    lower, upper = prepare_default_non_dominated_partition_bounds(
        jnp.asarray([2.0, 3.0]), None, anti_reference=jnp.asarray([-1.0, -1.0])
    )
    np.testing.assert_array_equal(np.asarray(lower), [[-1.0, -1.0]])
    np.testing.assert_array_equal(np.asarray(upper), [[2.0, 3.0]])


def test_default_partition_filters_dominated_observations():
    # observations include dominated points: the partition must be computed from the
    # non-dominated subset only, so the dominated point's region is excluded
    obs = jnp.asarray([[0.0, 1.0], [1.0, 0.0], [0.9, 0.9]])  # third is dominated... by neither!
    obs = jnp.asarray([[0.0, 1.0], [1.0, 0.0], [1.5, 1.5]])  # third dominated by both
    ref = jnp.asarray([2.0, 2.0])
    anti = jnp.asarray([-1.0, -1.0])
    lower_all, upper_all = prepare_default_non_dominated_partition_bounds(ref, obs, anti)
    lower_front, upper_front = prepare_default_non_dominated_partition_bounds(
        ref, obs[:2], anti
    )
    np.testing.assert_allclose(np.asarray(lower_all), np.asarray(lower_front))
    np.testing.assert_allclose(np.asarray(upper_all), np.asarray(upper_front))


def test_hypervolume_raises_for_reference_below_front():
    with pytest.raises(ValueError, match="dominate"):
        Pareto(jnp.asarray([[0.0, 1.0], [1.0, 0.0]])).hypervolume_indicator(
            jnp.asarray([0.5, 0.5])
        )


def test_hypervolume_three_objective_brute_force():
    front = np.asarray([[0.0, 2.0, 1.0], [7.0, 6.0, 0.0], [9.0, 0.0, 1.0]])
    ref = jnp.asarray([10.0, 10.0, 10.0])
    hv = float(Pareto(jnp.asarray(front)).hypervolume_indicator(ref))
    want = _brute_force_hv(front, front.min(axis=0), np.asarray(ref))
    np.testing.assert_allclose(hv, want, rtol=5e-3)


def test_get_reference_point_matches_reference_formula():
    # reference pareto.py get_reference_point: worst front point + spread margin
    obs = jnp.asarray([[0.0, 1.0], [1.0, 0.0], [0.2, 0.7]])
    ref = np.asarray(get_reference_point(obs))
    assert np.all(ref >= np.asarray([[1.0, 1.0]]))


def test_sample_diverse_subset_no_repeats_returns_whole_front():
    # reference test_pareto_sample_diverse_subset_choose_batch_no_repeats_return_same_front
    front = jnp.asarray([[0.0, 1.0], [0.5, 0.5], [1.0, 0.0]])
    pareto = Pareto(front, already_non_dominated=True)
    samples, counts = pareto.sample_diverse_subset(3, allow_repeats=False)
    assert samples.shape == (3, 2)
    np.testing.assert_array_equal(np.asarray(counts), 1)
    got = {tuple(np.asarray(row)) for row in samples}
    want = {tuple(np.asarray(row)) for row in front}
    assert got == want


def test_sample_diverse_subset_no_repeats_too_large_raises():
    pareto = Pareto(jnp.asarray([[0.0, 1.0], [1.0, 0.0]]), already_non_dominated=True)
    with pytest.raises(ValueError, match="distinct"):
        pareto.sample_diverse_subset(5, allow_repeats=False)
    with pytest.raises(ValueError, match="positive"):
        pareto.sample_diverse_subset(0)


def test_sample_diverse_subset_with_repeats_total_count():
    front = jnp.asarray([[0.0, 1.0], [0.5, 0.5], [1.0, 0.0]])
    pareto = Pareto(front, already_non_dominated=True)
    samples, counts = pareto.sample_diverse_subset(7, allow_repeats=True)
    assert samples.shape == (7, 2)
    assert int(np.sum(np.asarray(counts))) == 7
    # every sampled point is a front member
    front_set = {tuple(np.asarray(r)) for r in front}
    assert {tuple(np.asarray(r)) for r in samples} <= front_set
