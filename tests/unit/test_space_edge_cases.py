"""Search-space edge-case matrix (role of the bulk of reference
``tests/unit/test_space.py``, 1889 LoC): invalid-argument raises, shape behavior across
batch ranks, dtype policy, equality/repr, constraint mechanics, and encoder corners."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.space import (
    Box,
    CategoricalSearchSpace,
    DiscreteSearchSpace,
    GeneralDiscreteSearchSpace,
    LinearConstraint,
    NonlinearConstraint,
    SampleTimeoutError,
    TaggedMultiSearchSpace,
    TaggedProductSearchSpace,
    cast_encoder,
    one_hot_encoded_space,
    one_hot_encoder,
)


# ------------------------------------------------------------------ Box validation


@pytest.mark.parametrize(
    "lower, upper",
    [
        ([1.0], [0.0]),  # inverted bounds
        ([0.0, 0.0], [1.0]),  # mismatched shapes
        ([0.5, 1.0], [1.0, 0.5]),  # one dimension inverted
    ],
)
def test_box_invalid_bounds_raise(lower, upper):
    with pytest.raises(ValueError):
        Box(lower, upper)


def test_box_rejects_rank2_bounds():
    with pytest.raises(ValueError):
        Box([[0.0]], [[1.0]])


def test_box_contains_wrong_dimension_raises():
    box = Box([0.0, 0.0], [1.0, 1.0])
    with pytest.raises(ValueError, match="dimension"):
        box.contains(jnp.zeros((4, 3)))


def test_box_contains_boundary_points_inclusive():
    box = Box([0.0], [1.0])
    assert [0.0] in box
    assert [1.0] in box


@pytest.mark.parametrize("rank", [1, 2, 3, 4])
def test_box_contains_batch_ranks(rank):
    """contains maps over arbitrary leading batch dims (reference ``space.py:245-270``)."""
    box = Box([0.0, 0.0], [1.0, 1.0])
    shape = (2,) * (rank - 1) + (2,)
    got = box.contains(jnp.full(shape, 0.5))
    assert got.shape == shape[:-1]
    assert bool(jnp.all(got))


def test_box_sample_zero_points(key):
    s = Box([0.0], [1.0]).sample(key, 0)
    assert s.shape == (0, 1)


def test_box_sample_dtype_is_default_float(key):
    from trieste_tpu.utils.misc import default_float

    s = Box([0.0], [1.0]).sample(key, 3)
    assert s.dtype == default_float()


def test_box_sample_reproducible_per_key(key):
    box = Box([0.0, 0.0], [1.0, 1.0])
    np.testing.assert_array_equal(
        np.asarray(box.sample(key, 5)), np.asarray(box.sample(key, 5))
    )
    other = box.sample(jax.random.split(key)[0], 5)
    assert not np.array_equal(np.asarray(box.sample(key, 5)), np.asarray(other))


def test_box_equality_and_repr():
    a, b, c = Box([0.0], [1.0]), Box([0.0], [1.0]), Box([0.0], [2.0])
    assert a == b
    assert a != c
    assert "Box" in repr(a)


def test_box_pow_invalid_raises():
    box = Box([0.0], [1.0])
    with pytest.raises(ValueError):
        box**0
    with pytest.raises(ValueError):
        box ** (-1)


def test_box_pow_one_is_identity_dim():
    assert (Box([0.0], [1.0]) ** 1).dimension == 1


def test_box_product_chain():
    got = Box([0.0], [1.0]).product(Box([2.0], [3.0]), Box([4.0], [5.0]))
    assert got.dimension == 3
    np.testing.assert_array_equal(np.asarray(got.lower), [0.0, 2.0, 4.0])
    np.testing.assert_array_equal(np.asarray(got.upper), [1.0, 3.0, 5.0])


def test_box_halton_deterministic_per_key(key):
    box = Box([0.0, 0.0], [1.0, 1.0])
    np.testing.assert_array_equal(
        np.asarray(box.sample_halton(key, 16)), np.asarray(box.sample_halton(key, 16))
    )


def test_box_sobol_skip_changes_points():
    box = Box([0.0, 0.0], [1.0, 1.0])
    a = box.sample_sobol(16, skip=0)
    b = box.sample_sobol(16, skip=16)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    assert bool(jnp.all(box.contains(a))) and bool(jnp.all(box.contains(b)))


def test_discretize_produces_member_points(key):
    box = Box([-1.0], [1.0])
    d = box.discretize(key, 12)
    assert isinstance(d, DiscreteSearchSpace)
    assert d.points.shape == (12, 1)
    assert bool(jnp.all(box.contains(d.points)))


# ------------------------------------------------------------------ discrete spaces


def test_discrete_space_rejects_wrong_rank():
    with pytest.raises(ValueError):
        DiscreteSearchSpace(jnp.zeros((3,)))
    with pytest.raises(ValueError):
        DiscreteSearchSpace(jnp.zeros((2, 2, 2)))


def test_discrete_space_bounds_are_columnwise_extrema():
    space = DiscreteSearchSpace(jnp.array([[0.0, 5.0], [2.0, 1.0], [1.0, 3.0]]))
    np.testing.assert_array_equal(np.asarray(space.lower), [0.0, 1.0])
    np.testing.assert_array_equal(np.asarray(space.upper), [2.0, 5.0])


def test_discrete_space_sample_is_with_replacement(key):
    """Sampling more than the member count must work (uniform with replacement)."""
    space = DiscreteSearchSpace(jnp.array([[0.0], [1.0]]))
    s = space.sample(key, 50)
    assert s.shape == (50, 1)
    assert set(np.asarray(s).ravel().tolist()) <= {0.0, 1.0}


def test_discrete_space_sample_distribution(key):
    """Uniform categorical sampling: each member appears with roughly equal frequency."""
    space = DiscreteSearchSpace(jnp.array([[0.0], [1.0], [2.0], [3.0]]))
    s = np.asarray(space.sample(key, 4000)).ravel()
    counts = np.bincount(s.astype(int), minlength=4)
    np.testing.assert_allclose(counts / 4000.0, 0.25, atol=0.05)


def test_discrete_space_contains_batch_ranks():
    space = DiscreteSearchSpace(jnp.array([[0.0, 1.0], [2.0, 3.0]]))
    batch = jnp.array([[[0.0, 1.0], [9.0, 9.0]], [[2.0, 3.0], [2.0, 3.0]]])
    got = space.contains(batch)
    np.testing.assert_array_equal(np.asarray(got), [[True, False], [True, True]])


def test_discrete_space_contains_wrong_dimension_raises():
    space = DiscreteSearchSpace(jnp.array([[0.0, 1.0]]))
    with pytest.raises(ValueError):
        space.contains(jnp.zeros((3,)))


def test_discrete_product_enumerates_cartesian():
    a = DiscreteSearchSpace(jnp.array([[0.0], [1.0]]))
    b = DiscreteSearchSpace(jnp.array([[10.0], [20.0], [30.0]]))
    prod = a * b
    assert isinstance(prod, GeneralDiscreteSearchSpace)
    assert prod.points.shape == (6, 2)
    rows = {tuple(r) for r in np.asarray(prod.points).tolist()}
    assert rows == {(x, y) for x in (0.0, 1.0) for y in (10.0, 20.0, 30.0)}


def test_discrete_space_equality():
    pts = jnp.array([[0.0], [1.0]])
    assert DiscreteSearchSpace(pts) == DiscreteSearchSpace(pts)
    assert DiscreteSearchSpace(pts) != DiscreteSearchSpace(pts + 1)
    # categorical and plain discrete spaces are never equal, even with equal points
    assert DiscreteSearchSpace(jnp.array([[0.0], [1.0]])) != CategoricalSearchSpace(2)


# ------------------------------------------------------------------ categorical spaces


@pytest.mark.parametrize("bad", [[], [0], [3, 0], [[]]])
def test_categorical_invalid_categories_raise(bad):
    with pytest.raises(ValueError):
        CategoricalSearchSpace(bad)


def test_categorical_from_sizes():
    space = CategoricalSearchSpace([3, 2])
    assert space.dimension == 2
    assert space.points.shape == (6, 2)
    assert space.tags == [("0", "1", "2"), ("0", "1")]


def test_categorical_from_single_int():
    space = CategoricalSearchSpace(4)
    assert space.dimension == 1
    assert space.points.shape == (4, 1)


def test_categorical_from_tag_list():
    space = CategoricalSearchSpace(["low", "mid", "high"])
    assert space.dimension == 1
    assert space.to_tags(jnp.array([[2.0]])) == [["high"]]


def test_categorical_to_tags_batch():
    space = CategoricalSearchSpace([["a", "b"], ["x", "y", "z"]])
    got = space.to_tags(jnp.array([[0.0, 2.0], [1.0, 0.0]]))
    assert got == [["a", "z"], ["b", "x"]]


def test_categorical_one_hot_multi_dim():
    space = CategoricalSearchSpace([3, 3])
    enc = space.one_hot_encoder()
    got = enc(jnp.array([[1.0, 2.0]]))
    np.testing.assert_array_equal(np.asarray(got), [[0, 1, 0, 0, 0, 1]])


def test_categorical_one_hot_binary_passthrough_mixed():
    """Binary dims stay single 0/1 columns even when mixed with wider dims."""
    space = CategoricalSearchSpace([2, 3])
    got = space.one_hot_encoder()(jnp.array([[1.0, 0.0]]))
    np.testing.assert_array_equal(np.asarray(got), [[1.0, 1.0, 0.0, 0.0]])


def test_categorical_one_hot_preserves_batch_shape():
    space = CategoricalSearchSpace([3])
    got = space.one_hot_encoder()(jnp.zeros((2, 5, 1)))
    assert got.shape == (2, 5, 3)


def test_categorical_product_merges_tags():
    a = CategoricalSearchSpace([["r", "g"]])
    b = CategoricalSearchSpace([["x", "y", "z"]])
    prod = a * b
    assert isinstance(prod, CategoricalSearchSpace)
    assert prod.tags == [("r", "g"), ("x", "y", "z")]
    assert prod.points.shape == (6, 2)


def test_one_hot_encoded_space_of_categorical():
    space = CategoricalSearchSpace([3])
    enc_space = one_hot_encoded_space(space)
    assert isinstance(enc_space, DiscreteSearchSpace)
    assert enc_space.points.shape == (3, 3)  # identity rows


def test_one_hot_encoded_space_passthrough_for_box():
    box = Box([0.0], [1.0])
    assert one_hot_encoded_space(box) is box


def test_cast_encoder_casts():
    space = CategoricalSearchSpace([3])
    enc = cast_encoder(space.one_hot_encoder(), jnp.int32)
    assert enc(jnp.array([[1.0]])).dtype == jnp.int32


# ------------------------------------------------------------------ tagged collections


def test_tagged_product_duplicate_tags_raise():
    with pytest.raises(ValueError, match="unique"):
        TaggedProductSearchSpace([Box([0.0], [1.0]), Box([0.0], [1.0])], tags=["a", "a"])


def test_tagged_product_tag_count_mismatch_raises():
    with pytest.raises(ValueError):
        TaggedProductSearchSpace([Box([0.0], [1.0])], tags=["a", "b"])


def test_tagged_product_unknown_tag_raises():
    space = TaggedProductSearchSpace([Box([0.0], [1.0])], tags=["a"])
    with pytest.raises(ValueError, match="unknown"):
        space.get_subspace("b")


def test_tagged_product_default_tags_are_unique():
    space = TaggedProductSearchSpace([Box([0.0], [1.0]), Box([0.0], [1.0])])
    assert len(set(space.subspace_tags)) == 2


def test_tagged_product_dimension_ranges():
    space = TaggedProductSearchSpace(
        [Box([0.0, 0.0], [1.0, 1.0]), DiscreteSearchSpace(jnp.array([[7.0]]))],
        tags=["box", "point"],
    )
    assert space.subspace_dimension_range("box") == (0, 2)
    assert space.subspace_dimension_range("point") == (2, 3)
    comp = space.get_subspace_component("point", jnp.array([[0.1, 0.2, 7.0]]))
    np.testing.assert_array_equal(np.asarray(comp), [[7.0]])


def test_tagged_product_contains_mixed():
    space = TaggedProductSearchSpace(
        [Box([0.0], [1.0]), DiscreteSearchSpace(jnp.array([[5.0], [6.0]]))]
    )
    assert [0.5, 5.0] in space
    assert [0.5, 5.5] not in space  # not a member of the discrete part
    assert [1.5, 5.0] not in space  # outside the box


def test_tagged_product_nested():
    inner = TaggedProductSearchSpace([Box([0.0], [1.0])], tags=["i"])
    outer = TaggedProductSearchSpace(
        [inner, Box([2.0], [3.0])], tags=["in", "out"]
    )
    assert outer.dimension == 2
    np.testing.assert_array_equal(np.asarray(outer.lower), [0.0, 2.0])


def test_tagged_product_fix_subspace_sampling(key):
    space = TaggedProductSearchSpace(
        [Box([0.0], [1.0]), Box([0.0], [1.0])], tags=["a", "b"]
    )
    fixed = space.fix_subspace("a", jnp.array([[0.25]]))
    s = fixed.sample(key, 8)
    np.testing.assert_array_equal(np.asarray(s[:, 0]), [0.25] * 8)
    assert bool(jnp.all((s[:, 1] >= 0) & (s[:, 1] <= 1)))


def test_one_hot_encoded_space_of_product():
    space = TaggedProductSearchSpace(
        [Box([0.0], [1.0]), CategoricalSearchSpace([3])], tags=["cont", "cat"]
    )
    enc_space = one_hot_encoded_space(space)
    assert enc_space.dimension == 4  # 1 continuous + 3 one-hot
    enc = one_hot_encoder(space)
    got = enc(jnp.array([[0.5, 2.0]]))
    np.testing.assert_array_equal(np.asarray(got), [[0.5, 0.0, 0.0, 1.0]])


def test_tagged_multi_space_requires_same_dim_and_nonempty():
    with pytest.raises(ValueError):
        TaggedMultiSearchSpace([])
    with pytest.raises(ValueError):
        TaggedMultiSearchSpace([Box([0.0], [1.0]), Box([0.0, 0.0], [1.0, 1.0])])


def test_tagged_multi_space_contains_shape_check():
    space = TaggedMultiSearchSpace([Box([0.0], [1.0]), Box([0.0], [1.0])])
    with pytest.raises(ValueError):
        space.contains(jnp.zeros((5, 3, 1)))  # wrong V
    got = space.contains(jnp.full((5, 2, 1), 0.5))
    assert got.shape == (5, 2)


def test_tagged_multi_space_product_unsupported():
    space = TaggedMultiSearchSpace([Box([0.0], [1.0])])
    with pytest.raises(NotImplementedError):
        space * Box([0.0], [1.0])


def test_tagged_multi_space_per_subspace_sampling(key):
    space = TaggedMultiSearchSpace([Box([0.0], [1.0]), Box([10.0], [11.0])])
    s = space.sample(key, 50)
    assert bool(jnp.all(s[:, 0, 0] <= 1.0))
    assert bool(jnp.all(s[:, 1, 0] >= 10.0))


# ------------------------------------------------------------------ constraints


def test_linear_constraint_shift_reindexes():
    c = LinearConstraint(A=jnp.array([[1.0, 2.0]]), lb=jnp.array([0.0]), ub=jnp.array([1.0]))
    shifted = c.shift(offset=1, width=2, total_dim=4)
    x = jnp.array([[9.0, 0.5, 0.25, 9.0]])  # constrained dims are cols 1:3
    np.testing.assert_allclose(
        np.asarray(shifted.residual(x)), np.asarray(c.residual(jnp.array([[0.5, 0.25]])))
    )


def test_linear_constraint_equality():
    mk = lambda: LinearConstraint(A=jnp.eye(2), lb=jnp.zeros(2), ub=jnp.ones(2))
    assert mk() == mk()
    other = LinearConstraint(A=2 * jnp.eye(2), lb=jnp.zeros(2), ub=jnp.ones(2))
    assert mk() != other


def test_nonlinear_constraint_residual_rank():
    c = NonlinearConstraint(lambda x: x[..., 0] * x[..., 1], lb=0.0, ub=1.0)
    r = c.residual(jnp.full((3, 4, 2), 0.5))
    assert r.shape == (3, 4, 2)  # lb and ub residuals stacked on last axis


def test_constraints_residuals_without_constraints_raises():
    with pytest.raises(NotImplementedError):
        Box([0.0], [1.0]).constraints_residuals(jnp.array([[0.5]]))


def test_sample_feasible_timeout_for_infeasible_constraint(key):
    c = NonlinearConstraint(lambda x: x[..., 0], lb=5.0, ub=6.0)  # never in [0,1]
    box = Box([0.0], [1.0], constraints=[c])
    with pytest.raises(SampleTimeoutError):
        box.sample_feasible(key, 4)


def test_sample_halton_and_sobol_feasible(key):
    c = NonlinearConstraint(lambda x: x[..., 0] + x[..., 1], lb=0.0, ub=1.0)
    box = Box([0.0, 0.0], [1.0, 1.0], constraints=[c])
    h = box.sample_halton_feasible(key, 20)
    s = box.sample_sobol_feasible(20)
    for got in (h, s):
        assert got.shape == (20, 2)
        assert bool(jnp.all(box.is_feasible(got)))


def test_is_feasible_batch_shape():
    c = LinearConstraint(A=jnp.ones((1, 2)), lb=jnp.array([0.0]), ub=jnp.array([1.0]))
    box = Box([0.0, 0.0], [1.0, 1.0], constraints=[c])
    pts = jnp.array([[[0.2, 0.2], [0.9, 0.9]], [[0.1, 0.1], [0.5, 0.6]]])
    got = box.is_feasible(pts)
    np.testing.assert_array_equal(np.asarray(got), [[True, False], [True, False]])
