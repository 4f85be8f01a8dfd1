"""Pareto front container and hypervolume computations.

TPU-native rebuild of the reference ``trieste/acquisition/multi_objective/pareto.py``:
the :class:`Pareto` front with its cell-partition hypervolume indicator
(``pareto.py:29-80``), the default reference point heuristic (``pareto.py:270``), and a
diverse-subset selector (``pareto.py:82-268``) — the reference solves a Sharpe-ratio QP
with cvxpy; here the simplex-constrained QP is solved by projected gradient descent in
pure JAX, removing the host dependency.

Examples:

>>> import jax.numpy as jnp
>>> from trieste_tpu.acquisition.multi_objective.pareto import Pareto, get_reference_point
>>> observations = jnp.array([[0.0, 2.0], [1.0, 1.0], [2.0, 0.0], [2.0, 2.0]])
>>> front = Pareto(observations).front  # [2, 2] is dominated
>>> front.shape
(3, 2)
>>> ref = get_reference_point(front)
>>> ref.shape
(2,)
>>> hv = Pareto(observations).hypervolume_indicator(jnp.array([3.0, 3.0]))
>>> round(float(hv), 6)
6.0
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...types import TensorType
from .dominance import non_dominated
from .partition import non_dominated_partition_bounds


class Pareto:
    """A Pareto front of observed points (reference ``pareto.py:29-80``)."""

    def __init__(self, observations: TensorType, already_non_dominated: bool = False):
        obs = jnp.atleast_2d(jnp.asarray(observations))
        if not already_non_dominated:
            obs, _ = non_dominated(obs)
        self.front = obs

    def hypervolume_indicator(self, reference: TensorType) -> jax.Array:
        """Dominated hypervolume w.r.t. ``reference`` (reference ``pareto.py:40-80``):
        volume of the bounding box minus the clipped non-dominated cells."""
        ref = jnp.asarray(reference)
        if self.front.shape[0] == 0:
            raise ValueError("empty front")
        if bool(jnp.any(jnp.max(self.front, axis=0) > ref)):
            raise ValueError("reference point must dominate the whole front")
        ideal = jnp.min(self.front, axis=0)
        lower, upper = non_dominated_partition_bounds(
            ref, self.front, anti_reference=ideal
        )
        total = jnp.prod(ref - ideal)
        if lower.shape[0] == 0:
            return total
        cell_vols = jnp.prod(jnp.maximum(upper - jnp.maximum(lower, ideal), 0.0), axis=-1)
        return total - jnp.sum(cell_vols)

    def sample_diverse_subset(
        self,
        sample_size: int,
        allow_repeats: bool = True,
        bounds_delta_scale_factor: float = 0.2,
        bounds_min_delta: float = 1e-9,
    ) -> Tuple[jax.Array, jax.Array]:
        """Sharpe-ratio-based diverse subset (reference ``pareto.py:82-268``).

        Solves max_w (p^T w) / sqrt(w^T Q w) over the probability simplex by the standard
        transformation to a convex QP, via projected gradient (pure JAX; the reference
        uses cvxpy). Returns the sampled points and their selection counts.
        """
        front = np.asarray(self.front)
        n = front.shape[0]
        if sample_size <= 0:
            raise ValueError(f"sample_size must be positive, got {sample_size}")
        if not allow_repeats and sample_size > n:
            raise ValueError(
                f"cannot sample {sample_size} distinct points from a front of size {n}"
            )
        lo = front.min(axis=0)
        hi = front.max(axis=0)
        delta = np.maximum((hi - lo) * bounds_delta_scale_factor, bounds_min_delta)
        lower, upper = lo - delta, hi + delta
        # per-point probabilities of dominating a uniform random point, and pairwise joint
        p = np.prod((upper - front) / (upper - lower), axis=-1)  # [n]
        both = np.maximum(front[:, None, :], front[None, :, :])
        P = np.prod((upper - both) / (upper - lower), axis=-1)  # [n, n]
        Q = P - np.outer(p, p)
        Q = Q + 1e-9 * np.eye(n)

        # maximize Sharpe ratio p^T w / sqrt(w^T Q w) on the simplex:
        # equivalent QP: min y^T Q y  s.t. p^T y = 1, y >= 0; w = y / sum(y)
        Qj = jnp.asarray(Q)
        pj = jnp.asarray(p)

        def project(y):
            # project onto {y >= 0, p^T y = 1} approximately via clipping + rescale
            y = jnp.maximum(y, 0.0)
            s = jnp.dot(pj, y)
            return y / jnp.maximum(s, 1e-12)

        def step(y, _):
            g = 2.0 * (Qj @ y)
            y = project(y - 0.5 / (jnp.linalg.norm(Qj, 2) + 1e-9) * g)
            return y, None

        y0 = project(jnp.ones(n))
        y, _ = jax.lax.scan(step, y0, None, length=500)
        w = y / jnp.maximum(jnp.sum(y), 1e-12)

        counts = np.floor(np.asarray(w) * sample_size).astype(int)
        if not allow_repeats:
            counts = np.minimum(counts, 1)
        # distribute the remainder by largest weight fraction
        remainder = sample_size - counts.sum()
        frac = np.asarray(w) * sample_size - np.floor(np.asarray(w) * sample_size)
        order = np.argsort(-frac)
        i = 0
        while remainder > 0 and i < len(order):
            idx = order[i]
            if allow_repeats or counts[idx] == 0:
                counts[idx] += 1
                remainder -= 1
            i += 1
            if i == len(order) and remainder > 0 and allow_repeats:
                i = 0
        samples = np.repeat(front, counts, axis=0)
        return jnp.asarray(samples), jnp.asarray(counts)


def get_reference_point(observations: TensorType) -> jax.Array:
    """Default reference point: the worst front point pushed out by the front extent
    (reference ``pareto.py:270-293``)."""
    obs = jnp.atleast_2d(jnp.asarray(observations))
    if obs.shape[0] == 0:
        raise ValueError("empty observations")
    front, _ = non_dominated(obs)
    worst = jnp.max(front, axis=0)
    ideal = jnp.min(front, axis=0)
    return worst + 2.0 * (worst - ideal) / jnp.maximum(front.shape[0], 1)
