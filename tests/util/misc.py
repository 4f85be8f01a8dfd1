"""Shared test helpers (role of reference ``tests/util/misc.py``)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from trieste_tpu.data import Dataset


def mk_dataset(query_points: Sequence, observations: Sequence) -> Dataset:
    """Build an exact-capacity dataset from nested lists
    (reference ``tests/util/misc.py:126-140``)."""
    qp = jnp.asarray(query_points, jnp.float64)
    obs = jnp.asarray(observations, jnp.float64)
    return Dataset.from_arrays(qp, obs, capacity=qp.shape[0])


def empty_dataset(query_point_shape: Sequence[int], observation_shape: Sequence[int]) -> Dataset:
    """(reference ``tests/util/misc.py:142-152``)"""
    qp = jnp.zeros((0, *query_point_shape), jnp.float64)
    obs = jnp.zeros((0, *observation_shape), jnp.float64)
    return Dataset.from_arrays(qp, obs, capacity=8)


def assert_datasets_allclose(a: Dataset, b: Dataset, atol: float = 1e-12) -> None:
    """(reference ``tests/util/misc.py:251-270``)"""
    assert int(a.num_points) == int(b.num_points)
    np.testing.assert_allclose(
        np.asarray(a.trimmed_query_points), np.asarray(b.trimmed_query_points), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(a.trimmed_observations), np.asarray(b.trimmed_observations), atol=atol
    )


def quadratic(x: jnp.ndarray) -> jnp.ndarray:
    """``x -> ||x||^2`` as an observer-style objective (reference ``tests/util/misc.py``)."""
    x = jnp.asarray(x)
    return jnp.sum(x**2, axis=-1, keepdims=True)


class FixedAcquisitionRule:
    """An acquisition rule returning a fixed point (reference ``tests/util/misc.py:178``)."""

    def __init__(self, query_points):
        self._qp = jnp.asarray(query_points)

    def acquire(self, search_space, models, datasets=None, key=None):
        return self._qp

    def acquire_single(self, search_space, model, dataset=None, key=None):
        return self._qp

    def filter_datasets(self, models, datasets):
        return datasets
