"""Observational data containers.

TPU-native rebuild of the reference ``trieste/data.py``. The reference ``Dataset``
(``data.py:26-112``) holds exact-size tensors and relies on TF's dynamic shapes to avoid
retracing (``models/gpflow/models.py:146-166``). XLA requires static shapes, so here a
:class:`Dataset` is a **fixed-capacity padded device buffer** plus a traced ``num_points``
count: appending points within capacity is a pure jittable update, and capacity grows
geometrically on overflow so a full BO run compiles only O(log n) distinct shapes.

All numerics downstream (GP posteriors, acquisition functions) are mask-aware: rows at or
beyond ``num_points`` are padding and must not influence results.

Examples (doctest parity with the reference's ``--doctest-modules`` suite):

>>> import jax.numpy as jnp
>>> from trieste_tpu.data import Dataset
>>> ds = Dataset.from_arrays(jnp.zeros((3, 2)), jnp.ones((3, 1)))
>>> len(ds)
3
>>> ds.capacity  # padded to the next power of two
8
>>> ds.query_points.shape, ds.observations.shape
((8, 2), (8, 1))
>>> more = Dataset.from_arrays(jnp.ones((2, 2)), jnp.zeros((2, 1)))
>>> combined = ds + more  # concatenation appends within capacity
>>> len(combined)
5
>>> qp, obs = combined.astuple()  # trimmed views of the valid prefix
>>> qp.shape
(5, 2)
>>> bool(combined.mask[4]), bool(combined.mask[5])
(True, False)
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .types import TensorType


def _ceil_pow2(n: int, minimum: int = 8) -> int:
    c = minimum
    while c < n:
        c *= 2
    return c


@struct.dataclass
class Dataset:
    """A container for observer query points and observations
    (reference ``data.py:26-112``), as a registered pytree.

    :param query_points: padded ``[C, D]`` buffer of query points.
    :param observations: padded ``[C, L]`` buffer of observations.
    :param num_points: traced scalar count of valid leading rows (``<= C``).
    """

    query_points: jax.Array
    observations: jax.Array
    num_points: jax.Array

    def __post_init__(self) -> None:
        qp, obs = self.query_points, self.observations
        if hasattr(qp, "ndim"):
            if qp.ndim != 2 or obs.ndim != 2:
                raise ValueError(
                    f"query_points and observations must be rank 2, got "
                    f"{qp.shape} and {obs.shape}"
                )
            if qp.shape[0] != obs.shape[0]:
                raise ValueError(
                    f"Leading shapes must match, got {qp.shape} and {obs.shape}"
                )

    # -- construction -------------------------------------------------------------

    @classmethod
    def from_arrays(
        cls, query_points: TensorType, observations: TensorType, capacity: int | None = None
    ) -> "Dataset":
        """Build a dataset from exact-size arrays, padding up to ``capacity`` (default:
        next power of two)."""
        qp = jnp.asarray(query_points)
        obs = jnp.asarray(observations)
        if qp.ndim != 2 or obs.ndim != 2 or qp.shape[0] != obs.shape[0]:
            raise ValueError(
                f"expected matching rank-2 arrays, got {qp.shape} and {obs.shape}"
            )
        n = qp.shape[0]
        cap = _ceil_pow2(n) if capacity is None else capacity
        if cap < n:
            raise ValueError(f"capacity {cap} < number of points {n}")
        qp = jnp.concatenate([qp, jnp.zeros((cap - n, qp.shape[1]), qp.dtype)], axis=0)
        obs = jnp.concatenate([obs, jnp.zeros((cap - n, obs.shape[1]), obs.dtype)], axis=0)
        return cls(qp, obs, jnp.asarray(n, jnp.int32))

    # -- static/padded geometry ---------------------------------------------------

    @property
    def capacity(self) -> int:
        """Static padded capacity C."""
        return self.query_points.shape[0]

    @property
    def dimension(self) -> int:
        return self.query_points.shape[-1]

    @property
    def num_outputs(self) -> int:
        return self.observations.shape[-1]

    @property
    def mask(self) -> jax.Array:
        """``[C]`` boolean validity mask."""
        return jnp.arange(self.capacity) < self.num_points

    # -- host-side views (concrete count required) --------------------------------

    def __len__(self) -> int:
        return int(self.num_points)

    @property
    def trimmed_query_points(self) -> jax.Array:
        """``[n, D]`` valid query points (host-side; requires a concrete count)."""
        return self.query_points[: int(self.num_points)]

    @property
    def trimmed_observations(self) -> jax.Array:
        return self.observations[: int(self.num_points)]

    def astuple(self) -> Tuple[jax.Array, jax.Array]:
        """The trimmed ``(query_points, observations)`` pair (reference ``data.py:104``)."""
        return self.trimmed_query_points, self.trimmed_observations

    # -- growth -------------------------------------------------------------------

    def with_capacity(self, capacity: int) -> "Dataset":
        """Return a copy padded (or validly trimmed) to exactly ``capacity``."""
        if capacity == self.capacity:
            return self
        if capacity > self.capacity:
            extra = capacity - self.capacity
            qp = jnp.concatenate(
                [self.query_points, jnp.zeros((extra, self.dimension), self.query_points.dtype)]
            )
            obs = jnp.concatenate(
                [
                    self.observations,
                    jnp.zeros((extra, self.num_outputs), self.observations.dtype),
                ]
            )
            return Dataset(qp, obs, self.num_points)
        if capacity < int(self.num_points):
            raise ValueError(f"cannot trim capacity {capacity} below count {int(self.num_points)}")
        return Dataset(
            self.query_points[:capacity], self.observations[:capacity], self.num_points
        )

    def append_within_capacity(
        self, query_points: TensorType, observations: TensorType
    ) -> "Dataset":
        """Jittable append of ``[B, D]``/``[B, L]`` rows at ``num_points``; the caller must
        ensure ``num_points + B <= capacity`` (rows beyond capacity are dropped by XLA's
        clamped dynamic-update-slice semantics)."""
        qp = jnp.asarray(query_points)
        obs = jnp.asarray(observations)
        start = jnp.asarray(self.num_points, jnp.int32)
        zero = jnp.zeros((), jnp.int32)
        new_qp = jax.lax.dynamic_update_slice(
            self.query_points, qp.astype(self.query_points.dtype), (start, zero)
        )
        new_obs = jax.lax.dynamic_update_slice(
            self.observations, obs.astype(self.observations.dtype), (start, zero)
        )
        return Dataset(new_qp, new_obs, start + qp.shape[0])

    def __add__(self, other: "Dataset") -> "Dataset":
        """Host-side concatenation (reference ``data.py:62-90``), growing capacity
        geometrically when needed."""
        n_total = int(self.num_points) + int(other.num_points)
        ds = self
        if n_total > self.capacity:
            ds = self.with_capacity(_ceil_pow2(n_total, minimum=self.capacity * 2))
        return ds.append_within_capacity(
            other.trimmed_query_points, other.trimmed_observations
        )

    def __repr__(self) -> str:
        return (
            f"Dataset(n={int(self.num_points) if not isinstance(self.num_points, jax.core.Tracer) else '?'}"
            f"/{self.capacity}, D={self.dimension}, L={self.num_outputs})"
        )


# -- multifidelity helpers (reference ``data.py:115-204``) -------------------------


def check_and_extract_fidelity_query_points(
    query_points: TensorType, max_fidelity: int | None = None
) -> Tuple[jax.Array, jax.Array]:
    """Split ``[..., D+1]`` points into ``[..., D]`` inputs and ``[..., 1]`` fidelity column,
    validating the fidelities are non-negative integers (reference ``data.py:115-161``)."""
    query_points = jnp.asarray(query_points)
    if query_points.shape[-1] < 2:
        raise ValueError(
            "Query points do not have enough dimensions to include a fidelity column"
        )
    input_points = query_points[..., :-1]
    fidelity_col = query_points[..., -1:]
    # concrete (non-traced) fidelities are validated eagerly, matching the reference's
    # checks (``data.py:115-161``): non-negative integers, bounded by max_fidelity
    if not isinstance(fidelity_col, jax.core.Tracer):
        import numpy as np

        fids = np.asarray(fidelity_col)
        if fids.size:
            if np.any(fids < 0):
                raise ValueError(f"fidelity must be non-negative, got minimum {fids.min()}")
            if np.any(fids != np.round(fids)):
                raise ValueError("fidelity column must contain integer values")
            if max_fidelity is not None and np.any(fids > max_fidelity):
                raise ValueError(
                    f"fidelity {fids.max()} exceeds the maximum fidelity {max_fidelity}"
                )
    return input_points, fidelity_col


def split_dataset_by_fidelity(dataset: Dataset, num_fidelities: int) -> list[Dataset]:
    """Host-side split into one dataset per fidelity level (reference ``data.py:164-174``)."""
    if num_fidelities < 1:
        raise ValueError(f"num_fidelities must be positive, got {num_fidelities}")
    return [get_dataset_for_fidelity(dataset, f) for f in range(num_fidelities)]


def get_dataset_for_fidelity(dataset: Dataset, fidelity: int) -> Dataset:
    """Host-side extraction of the points at one fidelity, dropping the fidelity column
    (reference ``data.py:177-192``)."""
    qp, obs = dataset.astuple()
    inputs, fid = check_and_extract_fidelity_query_points(qp)
    m = jnp.squeeze(fid, -1) == fidelity
    import numpy as np

    mask = np.asarray(m)
    return Dataset.from_arrays(inputs[mask], obs[mask])


def add_fidelity_column(query_points: TensorType, fidelity: int | TensorType) -> jax.Array:
    """Append a constant fidelity column (reference ``data.py:195-204``)."""
    query_points = jnp.asarray(query_points)
    col = jnp.full(query_points.shape[:-1] + (1,), fidelity, query_points.dtype)
    return jnp.concatenate([query_points, col], axis=-1)
