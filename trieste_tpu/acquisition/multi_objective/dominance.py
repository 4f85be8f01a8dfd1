"""Pareto dominance.

TPU-native rebuild of the reference ``trieste/acquisition/multi_objective/dominance.py``:
the reference's sort-and-filter ``tf.while`` loop (``dominance.py:23-70``) becomes one
vectorized O(N²) comparison — a single fused XLA program, no loop.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...types import TensorType


def non_dominated(observations: TensorType) -> Tuple[jax.Array, jax.Array]:
    """Compute the non-dominated subset (minimization).

    :param observations: ``[N, M]`` objective vectors.
    :return: ``(front, mask)`` — the non-dominated points (host-trimmed) and the boolean
        ``[N]`` mask of non-dominated rows (reference returns the same pair).
    """
    obs = jnp.asarray(observations)
    mask = non_dominated_mask(obs)
    import numpy as np

    return obs[np.asarray(mask)], mask


def non_dominated_mask(observations: TensorType) -> jax.Array:
    """Jittable boolean mask of non-dominated rows, ``[N]``."""
    obs = jnp.asarray(observations)
    # i is dominated iff exists j: obs_j <= obs_i (all dims) and obs_j < obs_i (any dim)
    leq = jnp.all(obs[None, :, :] <= obs[:, None, :], axis=-1)  # [i, j]
    lt = jnp.any(obs[None, :, :] < obs[:, None, :], axis=-1)
    dominated = jnp.any(leq & lt, axis=1)
    return ~dominated
