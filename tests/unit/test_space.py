"""Search space tests (role of reference ``tests/unit/test_space.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.space import (
    Box,
    CategoricalSearchSpace,
    DiscreteSearchSpace,
    LinearConstraint,
    NonlinearConstraint,
    TaggedMultiSearchSpace,
    TaggedProductSearchSpace,
    one_hot_encoder,
)


@pytest.fixture
def box():
    return Box([-1.0, 0.0], [2.0, 3.0])


def test_box_sampling_within_bounds(box, key):
    s = box.sample(key, 100)
    assert s.shape == (100, 2)
    assert bool(jnp.all(box.contains(s)))


def test_box_halton_and_sobol_sampling(box, key):
    for s in (box.sample_halton(key, 64), box.sample_sobol(64)):
        assert s.shape == (64, 2)
        assert bool(jnp.all(box.contains(s)))
        # QMC should cover the space evenly: mean close to center
        np.testing.assert_allclose(
            np.asarray(s.mean(0)), np.asarray((box.lower + box.upper) / 2), atol=0.15
        )


def test_box_contains(box):
    assert [0.0, 1.0] in box
    assert [5.0, 1.0] not in box
    batch = jnp.array([[[0.0, 1.0]], [[5.0, 1.0]]])
    got = box.contains(batch)
    np.testing.assert_array_equal(np.asarray(got), [[True], [False]])


def test_box_validation():
    with pytest.raises(ValueError):
        Box([1.0], [0.0])
    with pytest.raises(ValueError):
        Box([0.0, 1.0], [1.0])


def test_box_product_and_pow(box):
    prod = box * Box([5.0], [6.0])
    assert prod.dimension == 3
    np.testing.assert_array_equal(np.asarray(prod.lower), [-1.0, 0.0, 5.0])
    sq = box**2
    assert sq.dimension == 4


def test_discrete_space(key):
    points = jnp.array([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]])
    space = DiscreteSearchSpace(points)
    assert space.dimension == 2
    s = space.sample(key, 10)
    assert all(bool(space.contains(p)) for p in s)
    assert [2.0, 3.0] in space
    assert [1.0, 1.0] not in space
    prod = space * DiscreteSearchSpace(jnp.array([[7.0]]))
    assert prod.points.shape == (3, 3)


def test_categorical_space(key):
    space = CategoricalSearchSpace([["red", "green", "blue"], ["on", "off"]])
    assert space.dimension == 2
    assert space.points.shape == (6, 2)
    tags = space.to_tags(jnp.array([[0.0, 1.0]]))
    assert tags[0] == ["red", "off"]
    enc = space.one_hot_encoder()
    encoded = enc(jnp.array([[1.0, 0.0]]))
    # 3 categories -> 3 one-hot cols; binary -> single passthrough col
    np.testing.assert_array_equal(np.asarray(encoded), [[0.0, 1.0, 0.0, 0.0]])


def test_one_hot_encoder_identity_for_box(box):
    enc = one_hot_encoder(box)
    x = jnp.array([[0.5, 0.5]])
    np.testing.assert_array_equal(np.asarray(enc(x)), np.asarray(x))


def test_tagged_product_space(key):
    space = TaggedProductSearchSpace(
        [Box([0.0], [1.0]), DiscreteSearchSpace(jnp.array([[2.0], [3.0]]))],
        tags=["cont", "disc"],
    )
    assert space.dimension == 2
    s = space.sample(key, 20)
    assert bool(jnp.all(space.contains(s)))
    comp = space.get_subspace_component("disc", s)
    assert set(np.asarray(comp).ravel().tolist()) <= {2.0, 3.0}
    fixed = space.fix_subspace("disc", jnp.array([[2.0]]))
    s2 = fixed.sample(key, 5)
    np.testing.assert_array_equal(np.asarray(s2[:, 1]), [2.0] * 5)


def test_tagged_multi_space(key):
    space = TaggedMultiSearchSpace([Box([0.0], [1.0]), Box([2.0], [3.0])])
    s = space.sample(key, 7)
    assert s.shape == (7, 2, 1)
    assert bool(jnp.all(space.contains(s)))
    assert space.lower.shape == (2, 1)
    with pytest.raises(ValueError):
        TaggedMultiSearchSpace([Box([0.0], [1.0]), Box([0.0, 0.0], [1.0, 1.0])])


def test_linear_constraint_residual():
    c = LinearConstraint(A=jnp.eye(2), lb=jnp.zeros(2), ub=jnp.ones(2))
    r = c.residual(jnp.array([[0.5, 0.25]]))
    np.testing.assert_allclose(np.asarray(r), [[0.5, 0.25, 0.5, 0.75]])


def test_constrained_box_feasibility(key):
    c = NonlinearConstraint(lambda x: x[..., 0] + x[..., 1], lb=0.5, ub=2.0)
    box = Box([0.0, 0.0], [1.0, 1.0], constraints=[c])
    assert box.has_constraints
    s = box.sample_feasible(key, 50)
    assert bool(jnp.all(box.is_feasible(s)))
    assert s.shape == (50, 2)


def test_discretize(box, key):
    d = box.discretize(key, 30)
    assert d.points.shape == (30, 2)
    assert bool(jnp.all(box.contains(d.points)))


def test_box_product_preserves_constraints(key):
    """Products carry both operands' constraints, re-indexed onto the product dims."""
    c1 = LinearConstraint(A=jnp.ones((1, 2)), lb=jnp.array([0.5]), ub=jnp.array([2.0]))
    c2 = NonlinearConstraint(lambda x: x[..., 0] - x[..., 1], lb=-0.25, ub=0.25)
    left = Box([0.0, 0.0], [1.0, 1.0], constraints=[c1])
    right = Box([0.0, 0.0], [1.0, 1.0], constraints=[c2])
    prod = left * right
    assert prod.dimension == 4
    assert prod.has_constraints
    assert len(prod.constraints) == 2
    # feasibility factorizes over operands
    good = jnp.array([[0.5, 0.5, 0.4, 0.5]])
    bad_left = jnp.array([[0.1, 0.1, 0.4, 0.5]])  # sum < 0.5 violates c1
    bad_right = jnp.array([[0.5, 0.5, 0.9, 0.1]])  # diff > 0.25 violates c2
    assert bool(prod.is_feasible(good)[0])
    assert not bool(prod.is_feasible(bad_left)[0])
    assert not bool(prod.is_feasible(bad_right)[0])
    s = prod.sample_feasible(key, 30)
    assert bool(jnp.all(prod.is_feasible(s)))


def test_box_product_unconstrained_stays_unconstrained():
    prod = Box([0.0], [1.0]) * Box([0.0], [1.0])
    assert not prod.has_constraints
