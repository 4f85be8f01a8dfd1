"""Dataset / utils edge-case matrix (role of reference ``tests/unit/test_data.py`` and
``tests/unit/utils/test_misc.py``): construction raises, capacity mechanics, jittable
append semantics, multifidelity helper validation, Result monad and tag helpers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import (
    Dataset,
    add_fidelity_column,
    check_and_extract_fidelity_query_points,
    get_dataset_for_fidelity,
    split_dataset_by_fidelity,
)
from trieste_tpu.observer import filter_finite, map_is_finite
from trieste_tpu.utils.misc import (
    Err,
    LocalizedTag,
    Ok,
    Timer,
    flatten_leading_dims,
    get_value_for_tag,
    ignoring_local_tags,
    map_values,
)


# ------------------------------------------------------------------ construction


@pytest.mark.parametrize(
    "qp_shape, obs_shape",
    [
        ((3,), (3, 1)),  # rank-1 query points
        ((3, 2), (3,)),  # rank-1 observations
        ((3, 2), (4, 1)),  # mismatched leading dims
        ((3, 2, 1), (3, 1)),  # rank-3 query points
    ],
)
def test_dataset_invalid_shapes_raise(qp_shape, obs_shape):
    with pytest.raises(ValueError):
        Dataset.from_arrays(jnp.zeros(qp_shape), jnp.zeros(obs_shape))


def test_dataset_capacity_below_count_raises():
    with pytest.raises(ValueError):
        Dataset.from_arrays(jnp.zeros((5, 1)), jnp.zeros((5, 1)), capacity=4)


def test_dataset_explicit_capacity_respected():
    ds = Dataset.from_arrays(jnp.zeros((3, 1)), jnp.zeros((3, 1)), capacity=11)
    assert ds.capacity == 11
    assert len(ds) == 3


def test_dataset_empty():
    ds = Dataset.from_arrays(jnp.zeros((0, 2)), jnp.zeros((0, 1)))
    assert len(ds) == 0
    assert ds.dimension == 2
    assert not bool(jnp.any(ds.mask))
    qp, obs = ds.astuple()
    assert qp.shape == (0, 2)


def test_dataset_multi_output():
    ds = Dataset.from_arrays(jnp.zeros((4, 2)), jnp.zeros((4, 3)))
    assert ds.num_outputs == 3


# ------------------------------------------------------------------ growth & append


def test_with_capacity_grow_preserves_data():
    ds = Dataset.from_arrays(jnp.ones((3, 1)), 2 * jnp.ones((3, 1)))
    grown = ds.with_capacity(32)
    assert grown.capacity == 32
    assert len(grown) == 3
    np.testing.assert_array_equal(
        np.asarray(grown.trimmed_query_points), np.asarray(ds.trimmed_query_points)
    )


def test_with_capacity_identity():
    ds = Dataset.from_arrays(jnp.ones((3, 1)), jnp.ones((3, 1)))
    assert ds.with_capacity(ds.capacity) is ds


def test_with_capacity_trim_below_count_raises():
    ds = Dataset.from_arrays(jnp.ones((5, 1)), jnp.ones((5, 1)), capacity=16)
    with pytest.raises(ValueError):
        ds.with_capacity(4)


def test_with_capacity_trim_padding_only():
    ds = Dataset.from_arrays(jnp.ones((5, 1)), jnp.ones((5, 1)), capacity=16)
    trimmed = ds.with_capacity(8)
    assert trimmed.capacity == 8
    assert len(trimmed) == 5


def test_append_within_capacity_is_jittable():
    ds = Dataset.from_arrays(jnp.zeros((2, 1)), jnp.zeros((2, 1)), capacity=8)

    @jax.jit
    def step(d):
        return d.append_within_capacity(jnp.ones((1, 1)), 3 * jnp.ones((1, 1)))

    out = step(ds)
    assert int(out.num_points) == 3
    np.testing.assert_array_equal(np.asarray(out.trimmed_observations[-1]), [3.0])
    # same compiled program serves any dataset of the same capacity
    out2 = step(out)
    assert int(out2.num_points) == 4


def test_add_grows_capacity_geometrically():
    a = Dataset.from_arrays(jnp.zeros((7, 1)), jnp.zeros((7, 1)))  # capacity 8
    b = Dataset.from_arrays(jnp.ones((3, 1)), jnp.ones((3, 1)))
    combined = a + b
    assert len(combined) == 10
    assert combined.capacity >= 16  # grew beyond 8
    np.testing.assert_array_equal(np.asarray(combined.trimmed_query_points[7:]), np.ones((3, 1)))


def test_add_within_capacity_keeps_capacity():
    a = Dataset.from_arrays(jnp.zeros((2, 1)), jnp.zeros((2, 1)), capacity=16)
    b = Dataset.from_arrays(jnp.ones((2, 1)), jnp.ones((2, 1)))
    assert (a + b).capacity == 16


def test_add_preserves_order():
    a = Dataset.from_arrays(jnp.array([[1.0], [2.0]]), jnp.zeros((2, 1)))
    b = Dataset.from_arrays(jnp.array([[3.0]]), jnp.ones((1, 1)))
    combined = a + b
    np.testing.assert_array_equal(
        np.asarray(combined.trimmed_query_points[:, 0]), [1.0, 2.0, 3.0]
    )


def test_dataset_is_a_pytree():
    ds = Dataset.from_arrays(jnp.ones((2, 1)), jnp.ones((2, 1)))
    leaves = jax.tree_util.tree_leaves(ds)
    assert len(leaves) == 3  # query_points, observations, num_points
    doubled = jax.tree_util.tree_map(lambda x: x, ds)
    assert isinstance(doubled, Dataset)


def test_dataset_repr_shows_count_and_capacity():
    ds = Dataset.from_arrays(jnp.ones((2, 1)), jnp.ones((2, 1)))
    assert "n=2" in repr(ds)


# ------------------------------------------------------------------ multifidelity


def test_fidelity_extraction_validates():
    with pytest.raises(ValueError, match="enough dimensions"):
        check_and_extract_fidelity_query_points(jnp.zeros((3, 1)))
    with pytest.raises(ValueError, match="non-negative"):
        check_and_extract_fidelity_query_points(jnp.array([[0.5, -1.0]]))
    with pytest.raises(ValueError, match="integer"):
        check_and_extract_fidelity_query_points(jnp.array([[0.5, 0.5]]))
    with pytest.raises(ValueError, match="maximum fidelity"):
        check_and_extract_fidelity_query_points(jnp.array([[0.5, 3.0]]), max_fidelity=2)


def test_fidelity_extraction_splits_columns():
    qp = jnp.array([[0.1, 0.2, 1.0], [0.3, 0.4, 0.0]])
    inputs, fid = check_and_extract_fidelity_query_points(qp)
    assert inputs.shape == (2, 2)
    np.testing.assert_array_equal(np.asarray(fid[:, 0]), [1.0, 0.0])


def test_split_dataset_by_fidelity_partitions():
    qp = jnp.array([[0.1, 0.0], [0.2, 1.0], [0.3, 0.0], [0.4, 1.0], [0.5, 1.0]])
    obs = jnp.arange(5.0)[:, None]
    ds = Dataset.from_arrays(qp, obs)
    lo, hi = split_dataset_by_fidelity(ds, 2)
    assert len(lo) == 2 and len(hi) == 3
    np.testing.assert_array_equal(np.asarray(lo.trimmed_observations[:, 0]), [0.0, 2.0])
    np.testing.assert_array_equal(np.asarray(hi.trimmed_observations[:, 0]), [1.0, 3.0, 4.0])
    # fidelity column dropped
    assert lo.dimension == 1


def test_split_dataset_invalid_count_raises():
    ds = Dataset.from_arrays(jnp.zeros((1, 2)), jnp.zeros((1, 1)))
    with pytest.raises(ValueError):
        split_dataset_by_fidelity(ds, 0)


def test_get_dataset_for_missing_fidelity_is_empty():
    qp = jnp.array([[0.1, 0.0]])
    ds = Dataset.from_arrays(qp, jnp.zeros((1, 1)))
    got = get_dataset_for_fidelity(ds, 5)
    assert len(got) == 0


def test_add_fidelity_column_scalar_and_batch():
    qp = jnp.zeros((3, 2))
    got = add_fidelity_column(qp, 2)
    assert got.shape == (3, 3)
    np.testing.assert_array_equal(np.asarray(got[:, 2]), [2.0] * 3)
    batched = add_fidelity_column(jnp.zeros((4, 3, 2)), 1)
    assert batched.shape == (4, 3, 3)


# ------------------------------------------------------------------ observers


def test_filter_finite_drops_nan_and_inf():
    qp = jnp.array([[0.0], [1.0], [2.0], [3.0]])
    obs = jnp.array([[1.0], [jnp.nan], [-jnp.inf], [4.0]])
    ds = filter_finite(qp, obs)
    assert len(ds) == 2
    np.testing.assert_array_equal(np.asarray(ds.trimmed_query_points[:, 0]), [0.0, 3.0])


def test_filter_finite_all_bad_is_empty():
    ds = filter_finite(jnp.zeros((2, 1)), jnp.full((2, 1), jnp.nan))
    assert len(ds) == 0


def test_map_is_finite_keeps_all_rows():
    qp = jnp.array([[0.0], [1.0]])
    obs = jnp.array([[jnp.nan], [1.0]])
    ds = map_is_finite(qp, obs)
    assert len(ds) == 2
    np.testing.assert_array_equal(np.asarray(ds.trimmed_observations[:, 0]), [0.0, 1.0])


def test_filter_finite_shape_validation():
    with pytest.raises(ValueError):
        filter_finite(jnp.zeros((3, 1)), jnp.zeros((4, 1)))


# ------------------------------------------------------------------ Result monad & misc


def test_ok_unwrap_and_flags():
    r = Ok(42)
    assert r.is_ok and not r.is_err
    assert r.unwrap() == 42


def test_err_unwrap_raises_original_exception():
    exc = RuntimeError("boom")
    r = Err(exc)
    assert r.is_err and not r.is_ok
    with pytest.raises(RuntimeError, match="boom"):
        r.unwrap()


def test_timer_measures_elapsed():
    import time

    with Timer() as t:
        time.sleep(0.01)
    assert t.time >= 0.01


def test_map_values_preserves_keys():
    got = map_values(str, {1: 10, 2: 20})
    assert got == {1: "10", 2: "20"}


def test_localized_tag_roundtrip():
    tag = LocalizedTag("OBJ", 3)
    assert tag.is_local
    parsed = LocalizedTag.from_tag(tag)
    assert parsed == tag
    plain = LocalizedTag.from_tag("OBJ")
    assert not plain.is_local
    assert plain.global_tag == "OBJ"


def test_ignoring_local_tags_filters():
    mapping = {"A": 1, LocalizedTag("A", 0): 2, "B": 3}
    got = ignoring_local_tags(mapping)
    assert got == {"A": 1, "B": 3}


def test_get_value_for_tag_matches_local_variants():
    mapping = {LocalizedTag("OBJ", 1): "local"}
    tag, value = get_value_for_tag(mapping, LocalizedTag("OBJ", 1))
    assert value == "local"
    missing_tag, missing = get_value_for_tag({}, "OBJ")
    assert missing is None


@pytest.mark.parametrize("output_dims", [1, 2, 3])
def test_flatten_leading_dims_output_dims(output_dims):
    x = jnp.zeros((2, 3, 4))
    flat, unflatten = flatten_leading_dims(x, output_dims=output_dims)
    assert flat.ndim == output_dims
    assert unflatten(flat).shape == x.shape


def test_flatten_leading_dims_invalid_output_dims():
    x = jnp.zeros((2, 3))
    with pytest.raises(ValueError):
        flatten_leading_dims(x, output_dims=0)
    with pytest.raises(ValueError):
        flatten_leading_dims(x, output_dims=3)
