"""Continuous Thompson sampling via trajectory draws.

TPU-native rebuild of the reference
``trieste/acquisition/function/continuous_thompson_sampling.py``: negated posterior
function draws are maximized by the continuous optimizer. The parallel variant is a
vectorized acquisition — one independent trajectory per slice — which on TPU is a single
batched feature matmul per evaluation (the V axis rides the MXU and shards under pjit).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.tree_util import Partial

from ...data import Dataset
from ...models.interfaces import HasTrajectorySampler, ProbabilisticModel
from ...types import TensorType
from ..interface import (
    AcquisitionFunction,
    SingleModelAcquisitionBuilder,
    SingleModelGreedyAcquisitionBuilder,
    SingleModelVectorizedAcquisitionBuilder,
)


def _negated_trajectory(trajectory, x):
    """(reference ``negate_trajectory_function``, ``continuous_thompson_sampling.py:188``)"""
    return -trajectory(x)


def negate_trajectory_function(trajectory) -> AcquisitionFunction:
    return Partial(_negated_trajectory, trajectory)


def _negated_vectorized_trajectory(trajectory, x):
    # trajectory: [N, V, D] -> [N, V, 1]; vectorized acquisition wants [N, V]
    return -trajectory(x)[..., 0]


class ParallelContinuousThompsonSampling(SingleModelVectorizedAcquisitionBuilder):
    """PCTS: V independent trajectory draws maximized simultaneously as a vectorized
    acquisition (reference ``continuous_thompson_sampling.py:110-186``)."""

    def __init__(self, *, key: Optional[jax.Array] = None, batch_size: Optional[int] = None):
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._sampler = None
        self._batch_size = batch_size  # resolved lazily from the optimizer's V if None

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        if not isinstance(model, HasTrajectorySampler):
            raise ValueError(
                f"ParallelContinuousThompsonSampling only supports models with a "
                f"trajectory_sampler method; received {model!r}"
            )
        self._sampler = model.trajectory_sampler()
        self._key, sub = jax.random.split(self._key)
        self._trajectory_key = sub
        return _LazyBatchTrajectory(self._sampler, sub)

    def update_acquisition_function(
        self,
        function: AcquisitionFunction,
        model: ProbabilisticModel,
        dataset: Optional[Dataset] = None,
    ) -> AcquisitionFunction:
        # a fresh draw each BO step (reference resamples on update)
        return self.prepare_acquisition_function(model, dataset)

    def __repr__(self) -> str:
        return "ParallelContinuousThompsonSampling()"


class _LazyBatchTrajectory:
    """Callable that materializes a V-batch trajectory on first call (V comes from the
    input's slice axis, like the reference's lazily-resized trajectories)."""

    def __init__(self, sampler, key):
        self._sampler = sampler
        self._key = key
        self._trajectory = None
        self._V = None

    def _ensure(self, V: int):
        if self._trajectory is None or self._V != V:
            self._trajectory = self._sampler.get_trajectory(self._key, batch_size=V)
            self._V = V
        return self._trajectory

    def __call__(self, x: TensorType) -> jax.Array:
        x = jnp.asarray(x)
        traj = self._ensure(x.shape[-2])
        return -traj(x)[..., 0]

    def as_partial(self, V: int) -> Partial:
        """The pytree form for the jitted optimizer, once V is known."""
        return Partial(_negated_vectorized_trajectory, self._ensure(V))


class GreedyContinuousThompsonSampling(SingleModelGreedyAcquisitionBuilder):
    """Greedy CTS: one negated trajectory at a time, resampled for every batch point
    (reference ``continuous_thompson_sampling.py:30-108`` — a greedy builder whose
    pending points only trigger the trajectory redraw)."""

    def __init__(self, *, key: Optional[jax.Array] = None):
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._sampler = None

    def prepare_acquisition_function(
        self,
        model: ProbabilisticModel,
        dataset: Optional[Dataset] = None,
        pending_points=None,
    ) -> AcquisitionFunction:
        if not isinstance(model, HasTrajectorySampler):
            raise ValueError(
                f"GreedyContinuousThompsonSampling only supports models with a "
                f"trajectory_sampler method; received {model!r}"
            )
        self._sampler = model.trajectory_sampler()
        self._key, sub = jax.random.split(self._key)
        trajectory = self._sampler.get_trajectory(sub, batch_size=1)
        return Partial(_greedy_traj_fn, trajectory)

    def update_acquisition_function(
        self,
        function: AcquisitionFunction,
        model: ProbabilisticModel,
        dataset: Optional[Dataset] = None,
        pending_points=None,
        new_optimization_step: bool = True,
    ) -> AcquisitionFunction:
        # each greedy batch element gets a fresh trajectory draw (reference :88-108)
        return self.prepare_acquisition_function(model, dataset, pending_points)

    def __repr__(self) -> str:
        return "GreedyContinuousThompsonSampling()"


def _greedy_traj_fn(trajectory, x):
    # x: [..., 1, D] -> [..., 1]
    x = jnp.asarray(x)
    flat = jnp.reshape(x, (-1, 1, x.shape[-1]))
    vals = -trajectory(flat)[..., 0]  # [N, 1]
    return jnp.reshape(vals, x.shape[:-2] + (1,))
