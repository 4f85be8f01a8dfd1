"""Box decomposition of the non-dominated region.

TPU-native rebuild of the reference ``trieste/acquisition/multi_objective/partition.py``:
``prepare_default_non_dominated_partition_bounds`` (``partition.py:28-104``),
``ExactPartition2dNonDominated`` (``partition.py:179``) and a general-M decomposition in
the role of ``DividedAndConquerNonDominated`` (``partition.py:221``).

The general algorithm is box subtraction: start from the single cell
``[-inf, anti_reference] .. [reference]`` and subtract each front point's dominated
box ``[p, reference]``; subtracting a box from a cell leaves at most M disjoint boxes
(the staircase decomposition). The result is a disjoint cell cover of the non-dominated
region, computed host-side (fronts are small) and consumed as ``[K, M]`` device arrays by
the differentiable EHVI kernels.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...types import TensorType


def _subtract_dominated_box(
    cells: list[tuple[np.ndarray, np.ndarray]], point: np.ndarray
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Remove the region ``[point, +inf)`` from every cell, keeping disjoint boxes."""
    out: list[tuple[np.ndarray, np.ndarray]] = []
    M = point.shape[0]
    for lower, upper in cells:
        a = np.maximum(lower, point)
        if np.any(a >= upper):
            out.append((lower, upper))  # no intersection with the dominated box
            continue
        # staircase split: for each dim j keep the slab below a_j, with dims < j clamped
        for j in range(M):
            if a[j] <= lower[j]:
                continue
            lo = lower.copy()
            hi = upper.copy()
            lo[:j] = a[:j]
            hi[j] = a[j]
            if np.all(lo < hi):
                out.append((lo, hi))
    return out


def non_dominated_partition_bounds(
    reference: TensorType,
    front: TensorType,
    anti_reference: Optional[TensorType] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Disjoint cells ``(lower [K, M], upper [K, M])`` covering the region not dominated
    by ``front``, bounded above by ``reference`` (minimization). Lower bounds are
    ``-inf`` (or ``anti_reference``) where unbounded."""
    ref = np.asarray(reference, dtype=np.float64)
    fr = np.atleast_2d(np.asarray(front, dtype=np.float64))
    M = ref.shape[-1]
    if anti_reference is None:
        anti = np.full(M, -np.inf)
    else:
        anti = np.asarray(anti_reference, dtype=np.float64)
    if fr.size and np.any(fr > ref):
        raise ValueError(
            f"reference point {ref} must dominate every front point; got front max "
            f"{fr.max(0)}"
        )
    cells = [(anti.copy(), ref.copy())]
    for p in fr:
        cells = _subtract_dominated_box(cells, p)
    if not cells:
        lower = np.zeros((0, M))
        upper = np.zeros((0, M))
    else:
        lower = np.stack([c[0] for c in cells])
        upper = np.stack([c[1] for c in cells])
    return jnp.asarray(lower), jnp.asarray(upper)


def prepare_default_non_dominated_partition_bounds(
    reference: TensorType,
    observations: Optional[TensorType] = None,
    anti_reference: Optional[TensorType] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Default partition of the non-dominated region (reference ``partition.py:28-104``):
    2-objective exact partition, general-M box subtraction otherwise."""
    from .dominance import non_dominated

    ref = jnp.asarray(reference)
    if observations is None or np.asarray(observations).size == 0:
        M = ref.shape[-1]
        anti = (
            jnp.full((1, M), -jnp.inf)
            if anti_reference is None
            else jnp.asarray(anti_reference)[None]
        )
        return anti, ref[None]
    front, _ = non_dominated(observations)
    if ref.shape[-1] == 2:
        return ExactPartition2dNonDominated(front).partition_bounds(
            jnp.full((2,), -jnp.inf) if anti_reference is None else jnp.asarray(anti_reference),
            ref,
        )
    return non_dominated_partition_bounds(ref, front, anti_reference)


class ExactPartition2dNonDominated:
    """Exact 2-objective partition by sorting the front (reference ``partition.py:179``)."""

    def __init__(self, front: TensorType):
        fr = np.atleast_2d(np.asarray(front))
        if fr.shape[-1] != 2:
            raise ValueError(f"ExactPartition2dNonDominated requires 2 objectives, got {fr.shape[-1]}")
        self.front = fr[np.argsort(fr[:, 0])]

    def partition_bounds(
        self, anti_reference: TensorType, reference: TensorType
    ) -> Tuple[jax.Array, jax.Array]:
        anti = np.asarray(anti_reference, dtype=np.float64)
        ref = np.asarray(reference, dtype=np.float64)
        fr = self.front
        N = fr.shape[0]
        # staircase cells, left to right: x-bounds between consecutive front x's
        first = np.concatenate([[anti[0]], fr[:, 0]])
        second = np.concatenate([fr[:, 0], [ref[0]]])
        y_upper = np.concatenate([[ref[1]], np.minimum.accumulate(fr[:, 1])])
        lower = np.stack([first, np.full(N + 1, anti[1])], axis=-1)
        upper = np.stack([second, y_upper], axis=-1)
        keep = np.all(lower < upper, axis=-1)
        return jnp.asarray(lower[keep]), jnp.asarray(upper[keep])


class DividedAndConquerNonDominated:
    """General-M disjoint decomposition (role of reference ``partition.py:221``)."""

    def __init__(self, front: TensorType, threshold: int = 0):
        self.front = jnp.atleast_2d(jnp.asarray(front))

    def partition_bounds(
        self, anti_reference: TensorType, reference: TensorType
    ) -> Tuple[jax.Array, jax.Array]:
        return non_dominated_partition_bounds(reference, self.front, anti_reference)
