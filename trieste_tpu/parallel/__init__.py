"""Multi-chip execution: mesh construction and framework-wide pool sharding.

The reference has no distributed backend (SURVEY.md §2.10/§5.8) — its parallelism is
greenlet multi-start L-BFGS and vectorized acquisition. Here those axes become device
axes on a ``jax.sharding.Mesh``: installing a mesh with :func:`set_global_mesh` (or the
:func:`global_mesh` context manager) makes the acquisition optimizer shard its candidate
pool and multi-start runs, and the GP trainers shard their hyperparameter restarts, with
XLA inserting the cross-device ``top_k``/``argmin`` collectives over ICI. No separate
"distributed" code path exists: ``BayesianOptimizer``, EGO, ``model.optimize`` and the
Ask/Tell loop all pick up the active mesh transparently.
"""

from .mesh import (
    POOL_AXIS,
    create_mesh,
    create_multi_host_mesh,
    current_axis_sharding,
    current_pool_sharding,
    initialize_multi_host,
    get_global_mesh,
    global_mesh,
    pool_sharding,
    replicated,
    round_to_mesh,
    set_global_mesh,
)

__all__ = [
    "POOL_AXIS",
    "create_mesh",
    "create_multi_host_mesh",
    "current_axis_sharding",
    "current_pool_sharding",
    "initialize_multi_host",
    "get_global_mesh",
    "global_mesh",
    "pool_sharding",
    "replicated",
    "round_to_mesh",
    "set_global_mesh",
]
