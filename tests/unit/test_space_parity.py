"""Search-space behavior parity with the reference's unit matrix
(``/root/reference/tests/unit/test_space.py``): degenerate boxes, discrete-product
identities, deepcopy, equality across types, and empty-sample dtypes — beyond the
coverage in ``test_space.py`` / ``test_space_edge_cases.py``.
"""
from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.space import (
    Box,
    CategoricalSearchSpace,
    DiscreteSearchSpace,
    TaggedMultiSearchSpace,
    TaggedProductSearchSpace,
)


@pytest.mark.parametrize(
    "lower,upper",
    [
        ([], []),
        ([0.0], [0.0]),
        ([-1.0, 0.0, -2.0], [2.0, 1.0, -0.5]),
        ([-1.0, 0.0, -2.0], [2.0, 1.0, -2.0]),
    ],
)
def test_box_with_zero_width(lower, upper):
    # reference test_space.py:438-455 — collapsed dimensions are valid boxes
    box = Box(lower, upper)
    lo, hi = np.asarray(lower), np.asarray(upper)
    assert bool(box.contains(jnp.asarray(lo)))
    assert bool(box.contains(jnp.asarray(hi)))
    assert bool(box.contains(jnp.asarray((lo + hi) / 2)))
    if box.dimension > 0:
        assert not bool(box.contains(jnp.asarray(lo - 1)))
        assert not bool(box.contains(jnp.asarray(hi + 1)))
    samples = box.sample(jax.random.PRNGKey(0), 10)
    assert samples.shape == (10, box.dimension)
    assert bool(jnp.all(box.contains(samples)))


def test_zero_width_box_qmc_sampling():
    box = Box([0.0, 1.0], [0.0, 2.0])
    for pts in (
        box.sample_halton(jax.random.PRNGKey(0), 8),
        box.sample_sobol(8),
    ):
        assert pts.shape == (8, 2)
        np.testing.assert_array_equal(np.asarray(pts[:, 0]), 0.0)
        assert bool(jnp.all(box.contains(pts)))


def test_empty_box_sampling_shapes_and_dtype():
    # reference test_box_empty_{sobol,halton}_sampling_returns_correct_dtype
    box = Box([], [])
    assert box.dimension == 0
    for pts in (
        box.sample(jax.random.PRNGKey(0), 3),
        box.sample_halton(jax.random.PRNGKey(0), 3),
        box.sample_sobol(3),
    ):
        assert pts.shape == (3, 0)
        assert pts.dtype == box.lower.dtype


def test_discrete_mul_for_empty_search_space():
    # reference test_space.py:288-293 — empty point sets propagate through products
    dss = DiscreteSearchSpace(jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]))
    empty = DiscreteSearchSpace(jnp.zeros((0, 1)))
    assert (empty * dss).points.shape == (0, 3)
    assert (dss * empty).points.shape == (0, 3)


def test_discrete_mul_for_identity_space():
    # reference test_space.py:296-301 — a single zero-dim point is the product identity
    dss = DiscreteSearchSpace(jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]))
    identity = DiscreteSearchSpace(jnp.zeros((1, 0)))
    np.testing.assert_array_equal(np.asarray((dss * identity).points), np.asarray(dss.points))
    np.testing.assert_array_equal(np.asarray((identity * dss).points), np.asarray(dss.points))


def test_to_tags_raises_for_non_integers():
    space = CategoricalSearchSpace(["A", "B", "C"])
    with pytest.raises(ValueError, match="integral"):
        space.to_tags(jnp.asarray([[1.0], [1.2]]))
    assert space.to_tags(jnp.asarray([[1.0], [2.0]])) == [["B"], ["C"]]


@pytest.mark.parametrize(
    "space",
    [
        Box([-1.0, 0.0], [1.0, 2.0]),
        DiscreteSearchSpace(jnp.asarray([[0.5], [1.5]])),
        CategoricalSearchSpace([3, 2]),
        TaggedProductSearchSpace(
            [Box([0.0], [1.0]), DiscreteSearchSpace(jnp.asarray([[2.0], [3.0]]))]
        ),
        TaggedMultiSearchSpace([Box([0.0], [1.0]), Box([2.0], [3.0])]),
    ],
)
def test_search_space_deepcopy(space):
    # reference test_{box,discrete,collection}_space_deepcopy
    clone = copy.deepcopy(space)
    assert clone.dimension == space.dimension
    np.testing.assert_array_equal(np.asarray(clone.lower), np.asarray(space.lower))
    np.testing.assert_array_equal(np.asarray(clone.upper), np.asarray(space.upper))
    samples = clone.sample(jax.random.PRNGKey(0), 4)
    assert bool(jnp.all(clone.contains(samples)))


def test_search_space_equality_matrix():
    # reference test___eq___search_spaces — equality within and across space types
    box = Box([0.0], [1.0])
    dss = DiscreteSearchSpace(jnp.asarray([[0.0], [1.0]]))
    cat = CategoricalSearchSpace(2)
    assert box == Box([0.0], [1.0])
    assert box != Box([0.0], [2.0])
    assert dss == DiscreteSearchSpace(jnp.asarray([[0.0], [1.0]]))
    assert dss != DiscreteSearchSpace(jnp.asarray([[0.0], [2.0]]))
    assert box != dss
    # a categorical space is not equal to a plain discrete space with the same points
    assert cat != dss
    assert dss != cat


def test_product_space_handles_zero_width_subspace():
    # reference test_product_space_handles_empty_spaces analogue: a degenerate
    # (zero-width) subspace composes into products and sampling
    degenerate = Box([0.5], [0.5])
    product = TaggedProductSearchSpace([degenerate, Box([0.0], [1.0])])
    assert product.dimension == 2
    samples = product.sample(jax.random.PRNGKey(0), 6)
    np.testing.assert_array_equal(np.asarray(samples[:, 0]), 0.5)
    assert bool(jnp.all(product.contains(samples)))


def test_discrete_space_sampling_statistics_uniform():
    # with-replacement sampling visits all points for large N
    points = jnp.asarray([[0.0], [1.0], [2.0], [3.0]])
    space = DiscreteSearchSpace(points)
    samples = np.asarray(space.sample(jax.random.PRNGKey(3), 4000))
    _, counts = np.unique(samples, return_counts=True)
    assert len(counts) == 4
    np.testing.assert_allclose(counts / 4000, 0.25, atol=0.05)


def test_box_discretize_sample_count_and_membership():
    box = Box([-1.0, 0.0], [1.0, 2.0])
    discrete = box.discretize(jax.random.PRNGKey(0), 50)
    assert discrete.points.shape == (50, 2)
    assert bool(jnp.all(box.contains(discrete.points)))
    # resampling from the discretization stays within the original box
    resampled = discrete.sample(jax.random.PRNGKey(1), 10)
    assert bool(jnp.all(box.contains(resampled)))


def test_pow_matches_repeated_mul():
    box = Box([0.0], [1.0])
    cubed = box**3
    manual = box * box * box
    assert cubed.dimension == manual.dimension == 3
    np.testing.assert_array_equal(np.asarray(cubed.lower), np.asarray(manual.lower))
    dss = DiscreteSearchSpace(jnp.asarray([[0.0], [1.0]]))
    squared = dss**2
    assert squared.points.shape == (4, 2)


def test_box_equality_includes_constraints():
    """Regression (round-5 review): a constrained box must not compare equal to the
    same box without (or with different) constraints."""
    from trieste_tpu.space import LinearConstraint

    A, lb, ub = [[1.0, 1.0]], [0.0], [1.0]
    plain = Box([0.0, 0.0], [1.0, 1.0])
    constrained = Box([0.0, 0.0], [1.0, 1.0], constraints=[LinearConstraint(A, lb, ub)])
    same = Box([0.0, 0.0], [1.0, 1.0], constraints=[LinearConstraint(A, lb, ub)])
    other = Box([0.0, 0.0], [1.0, 1.0], constraints=[LinearConstraint(A, lb, [2.0])])
    assert constrained != plain and plain != constrained
    assert constrained == same
    assert constrained != other


def test_categorical_equality_includes_category_names():
    """Regression (round-5 review): category NAMES are part of the space identity."""
    colours = CategoricalSearchSpace([["red", "green"]])
    switch = CategoricalSearchSpace([["on", "off"]])
    assert colours != switch
    assert colours == CategoricalSearchSpace([["red", "green"]])
    # and a categorical space is still never equal to a plain discrete space
    assert colours != DiscreteSearchSpace(colours.points)


def test_one_hot_encoder_mixin_membership():
    """Regression (round-5 review): encoder-bearing spaces are HasOneHotEncoder."""
    from trieste_tpu.space import HasOneHotEncoder

    assert isinstance(CategoricalSearchSpace(3), HasOneHotEncoder)
    assert isinstance(
        TaggedProductSearchSpace([Box([0.0], [1.0]), CategoricalSearchSpace(3)]),
        HasOneHotEncoder,
    )
    assert not isinstance(Box([0.0], [1.0]), HasOneHotEncoder)
    assert not isinstance(DiscreteSearchSpace(jnp.asarray([[0.0]])), HasOneHotEncoder)
