"""Dataset tests (role of reference ``tests/unit/test_data.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import assert_datasets_allclose, mk_dataset
from trieste_tpu.data import (
    Dataset,
    add_fidelity_column,
    check_and_extract_fidelity_query_points,
    get_dataset_for_fidelity,
    split_dataset_by_fidelity,
)


def test_from_arrays_pads_to_pow2():
    ds = Dataset.from_arrays(jnp.zeros((5, 2)), jnp.zeros((5, 1)))
    assert ds.capacity == 8
    assert len(ds) == 5
    assert ds.query_points.shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(ds.mask), [True] * 5 + [False] * 3)


def test_from_arrays_shape_validation():
    with pytest.raises(ValueError):
        Dataset.from_arrays(jnp.zeros((5, 2)), jnp.zeros((4, 1)))
    with pytest.raises(ValueError):
        Dataset.from_arrays(jnp.zeros((5,)), jnp.zeros((5, 1)))
    with pytest.raises(ValueError):
        Dataset.from_arrays(jnp.zeros((5, 2)), jnp.zeros((5, 1)), capacity=3)


def test_concatenation_matches_reference_semantics():
    a = mk_dataset([[1.0, 2.0]], [[3.0]])
    b = mk_dataset([[4.0, 5.0]], [[6.0]])
    c = a + b
    assert_datasets_allclose(c, mk_dataset([[1.0, 2.0], [4.0, 5.0]], [[3.0], [6.0]]))


def test_concatenation_grows_capacity():
    a = Dataset.from_arrays(jnp.ones((7, 2)), jnp.ones((7, 1)))  # capacity 8
    b = Dataset.from_arrays(jnp.zeros((3, 2)), jnp.zeros((3, 1)))
    c = a + b
    assert len(c) == 10
    assert c.capacity >= 10
    np.testing.assert_array_equal(
        np.asarray(c.trimmed_observations[:, 0]), [1.0] * 7 + [0.0] * 3
    )


def test_append_within_capacity_is_jittable():
    ds = Dataset.from_arrays(jnp.zeros((3, 2)), jnp.zeros((3, 1)), capacity=16)

    @jax.jit
    def step(d, qp, obs):
        return d.append_within_capacity(qp, obs)

    d2 = step(ds, jnp.ones((2, 2)), jnp.ones((2, 1)))
    assert int(d2.num_points) == 5
    np.testing.assert_array_equal(np.asarray(d2.query_points[3:5]), np.ones((2, 2)))


def test_astuple():
    qp, obs = mk_dataset([[0.0, 1.0]], [[2.0]]).astuple()
    np.testing.assert_array_equal(np.asarray(qp), [[0.0, 1.0]])
    np.testing.assert_array_equal(np.asarray(obs), [[2.0]])


def test_dataset_is_pytree():
    ds = mk_dataset([[1.0, 2.0]], [[3.0]])
    leaves = jax.tree_util.tree_leaves(ds)
    assert len(leaves) == 3  # qp, obs, count
    ds2 = jax.tree_util.tree_map(lambda x: x, ds)
    assert_datasets_allclose(ds, ds2)


def test_fidelity_helpers():
    qp = jnp.array([[0.1, 0.0], [0.2, 1.0], [0.3, 0.0]])
    obs = jnp.array([[1.0], [2.0], [3.0]])
    ds = Dataset.from_arrays(qp, obs, capacity=3)
    inputs, fid = check_and_extract_fidelity_query_points(qp)
    np.testing.assert_array_equal(np.asarray(fid[:, 0]), [0.0, 1.0, 0.0])
    per_fid = split_dataset_by_fidelity(ds, 2)
    assert len(per_fid[0]) == 2 and len(per_fid[1]) == 1
    lo = get_dataset_for_fidelity(ds, 0)
    np.testing.assert_allclose(np.asarray(lo.trimmed_observations[:, 0]), [1.0, 3.0])
    with_col = add_fidelity_column(inputs, 5)
    np.testing.assert_array_equal(np.asarray(with_col[:, -1]), [5.0] * 3)
