"""Device mesh helpers.

A single named axis ``"pool"`` is the natural data-parallel axis for Bayesian
optimization: every expensive stage is embarrassingly parallel over a pool (candidate
points, L-BFGS restarts, hyperparameter restarts, MC samples), with only cheap
``top_k``/``argmin`` reductions crossing devices — those become XLA ``all_gather``/
``psum`` collectives over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

POOL_AXIS = "pool"


def create_mesh(
    num_devices: Optional[int] = None, axis_name: str = POOL_AXIS
) -> Mesh:
    """A 1-D mesh over (the first) ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices but only {len(devices)} available"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def pool_sharding(mesh: Mesh, axis_name: str = POOL_AXIS) -> NamedSharding:
    """Shard the leading axis over the pool."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding."""
    return NamedSharding(mesh, PartitionSpec())
