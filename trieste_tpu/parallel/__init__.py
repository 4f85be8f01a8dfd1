"""Multi-chip execution: mesh construction and sharded BO steps.

The reference has no distributed backend (SURVEY.md §2.10/§5.8) — its parallelism is
greenlet multi-start L-BFGS and vectorized acquisition. Here those axes become device
axes on a ``jax.sharding.Mesh``: candidate pools, multi-start optimization runs, GP
hyperparameter restarts and MC samples are sharded with ``NamedSharding`` and reduced
with XLA collectives inserted by ``pjit``.
"""

from .mesh import create_mesh, pool_sharding, replicated
from .bo_step import distributed_acquisition_step, distributed_bo_step, distributed_fit

__all__ = [
    "create_mesh",
    "pool_sharding",
    "replicated",
    "distributed_acquisition_step",
    "distributed_bo_step",
    "distributed_fit",
]
