"""Device mesh helpers.

A single named axis ``"pool"`` is the natural data-parallel axis for Bayesian
optimization: every expensive stage is embarrassingly parallel over a pool (candidate
points, L-BFGS restarts, hyperparameter restarts, MC samples), with only cheap
``top_k``/``argmin`` reductions crossing devices — those become XLA ``all_gather``/
``psum`` collectives over ICI.
"""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

POOL_AXIS = "pool"

_ACTIVE_MESH: Optional[Mesh] = None


def set_global_mesh(mesh: Optional[Mesh]) -> None:
    """Install ``mesh`` as the framework-wide pool mesh (``None`` disables sharding).

    While a mesh is active, every pool-shaped stage of the framework — acquisition seed
    candidates, multi-start L-BFGS runs (:mod:`trieste_tpu.acquisition.optimizer`), and
    GP hyperparameter restarts (``fit_gpr``/``fit_sgpr``/``fit_svgp``) — is sharded over
    its ``"pool"`` axis via ``with_sharding_constraint``; XLA inserts the cross-device
    ``top_k``/``argmin`` collectives. This replaces the reference's single-host greenlet
    concurrency (``acquisition/optimizer.py:566-745``) with ICI-parallel execution.
    """
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_global_mesh() -> Optional[Mesh]:
    """The currently active pool mesh, or ``None``."""
    return _ACTIVE_MESH


@contextlib.contextmanager
def global_mesh(mesh: Optional[Mesh]) -> Iterator[Optional[Mesh]]:
    """Context manager form of :func:`set_global_mesh`."""
    previous = _ACTIVE_MESH
    set_global_mesh(mesh)
    try:
        yield mesh
    finally:
        set_global_mesh(previous)


def current_pool_sharding() -> Optional[NamedSharding]:
    """Leading-axis pool sharding for the active mesh, or ``None`` when unsharded."""
    if _ACTIVE_MESH is None:
        return None
    return NamedSharding(_ACTIVE_MESH, PartitionSpec(POOL_AXIS))


def current_axis_sharding(axis: int, ndim: int) -> Optional[NamedSharding]:
    """Pool sharding over arbitrary axis ``axis`` of an ``ndim``-rank array, or ``None``
    when no mesh is active. Used to shard secondary pool axes (e.g. the MC-sample axis
    of the reparametrization samplers, whose *last* axis is the sample count)."""
    if _ACTIVE_MESH is None:
        return None
    spec = [None] * ndim
    spec[axis] = POOL_AXIS
    return NamedSharding(_ACTIVE_MESH, PartitionSpec(*spec))


def round_to_mesh(n: int) -> int:
    """Round a pool size up to a multiple of the active mesh size (identity without a
    mesh) so sharded axes divide evenly across devices."""
    if _ACTIVE_MESH is None:
        return n
    d = _ACTIVE_MESH.size
    return ((n + d - 1) // d) * d


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


def initialize_multi_host(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_count: Optional[int] = None,
) -> None:
    """Join a multi-host (multi-process) JAX runtime (SURVEY.md §5.8: the DCN axis).

    On TPU pods each host's chips attach automatically and collectives ride ICI within
    a slice / DCN across slices; on CPU (CI emulation) set ``local_device_count`` to
    emulate several devices per process. Call before any JAX computation, then build
    the global pool mesh with :func:`create_multi_host_mesh`.
    """
    if local_device_count is not None:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={local_device_count}"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def create_multi_host_mesh(axis_name: str = POOL_AXIS) -> Mesh:
    """A 1-D pool mesh over *all* devices of the multi-process runtime (every host's
    devices, in process order — so a pool axis shards contiguous blocks per host and
    the ``top_k``/``argmin`` reductions are the only cross-host (DCN) collectives)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def pool_sharding(mesh: Mesh, axis_name: str = POOL_AXIS) -> NamedSharding:
    """Shard the leading axis over the pool."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding."""
    return NamedSharding(mesh, PartitionSpec())
