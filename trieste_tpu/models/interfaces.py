"""Probabilistic-model protocols.

TPU-native rebuild of the reference's runtime-checkable capability protocols
(``trieste/models/interfaces.py:39-331``). The protocol structure is kept — acquisition
builders require intersections of capabilities — but the underlying models are
object-shells over immutable pytree state: ``update``/``optimize`` return nothing yet
internally swap a pytree, and every numeric method is a thin wrapper over a jitted pure
function of ``(params, cache, inputs)``.

Random sampling takes explicit PRNG keys instead of relying on global seeds.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import (
    Any,
    Callable,
    Optional,
    Protocol,
    Sequence,
    Tuple,
    runtime_checkable,
)

import jax
import jax.numpy as jnp

from ..data import Dataset
from ..types import TensorType


@runtime_checkable
class ProbabilisticModel(Protocol):
    """A probabilistic model (reference ``interfaces.py:39-95``)."""

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        """Marginal mean and variance at ``query_points [..., D]`` → two ``[..., L]``."""
        raise NotImplementedError

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        """``num_samples`` independent joint samples, ``[..., S, N, L]``."""
        raise NotImplementedError

    def log(self, dataset: Optional[Dataset] = None) -> None:
        """Log model-specific summaries (reference ``interfaces.py:88-95``)."""
        raise NotImplementedError


@runtime_checkable
class TrainableProbabilisticModel(ProbabilisticModel, Protocol):
    """A trainable model (reference ``interfaces.py:99-120``)."""

    def update(self, dataset: Dataset) -> None:
        """Set the model data (no hyperparameter training)."""
        raise NotImplementedError

    def optimize(self, dataset: Dataset) -> Any:
        """Train the model hyperparameters on ``dataset``."""
        raise NotImplementedError


@runtime_checkable
class SupportsPredictJoint(ProbabilisticModel, Protocol):
    """Models exposing full-covariance predictions (reference ``interfaces.py:124-141``)."""

    def predict_joint(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        """``[..., B, D]`` → mean ``[..., B, L]``, covariance ``[..., L, B, B]``."""
        raise NotImplementedError


@runtime_checkable
class SupportsPredictY(ProbabilisticModel, Protocol):
    """Models that can predict observations incl. noise (reference ``interfaces.py:144-163``)."""

    def predict_y(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError


@runtime_checkable
class SupportsGetKernel(ProbabilisticModel, Protocol):
    """(reference ``interfaces.py:167-182``)"""

    def get_kernel(self) -> Any:
        raise NotImplementedError


@runtime_checkable
class SupportsGetObservationNoise(ProbabilisticModel, Protocol):
    """(reference ``interfaces.py:185-196``)"""

    def get_observation_noise(self) -> jax.Array:
        raise NotImplementedError


@runtime_checkable
class SupportsGetInternalData(ProbabilisticModel, Protocol):
    """(reference ``interfaces.py:199-210``)"""

    def get_internal_data(self) -> Dataset:
        raise NotImplementedError


@runtime_checkable
class SupportsGetMeanFunction(ProbabilisticModel, Protocol):
    """(reference ``interfaces.py:213-226``)"""

    def get_mean_function(self) -> Callable[[TensorType], jax.Array]:
        raise NotImplementedError


@runtime_checkable
class FastUpdateModel(ProbabilisticModel, Protocol):
    """Models supporting closed-form conditioning on hypothesized ("fantasized") extra
    data, with arbitrary leading batch dims (reference ``interfaces.py:229-296``)."""

    def conditional_predict_f(
        self, query_points: TensorType, additional_data: Dataset
    ) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError

    def conditional_predict_joint(
        self, query_points: TensorType, additional_data: Dataset
    ) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError

    def conditional_predict_f_sample(
        self, key: jax.Array, query_points: TensorType, additional_data: Dataset, num_samples: int
    ) -> jax.Array:
        raise NotImplementedError

    def conditional_predict_y(
        self, query_points: TensorType, additional_data: Dataset
    ) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError


@runtime_checkable
class SupportsCovarianceBetweenPoints(SupportsPredictJoint, Protocol):
    """(reference ``interfaces.py:709-720`` / ``models/gpflow/interface.py``)"""

    def covariance_between_points(
        self, query_points_1: TensorType, query_points_2: TensorType
    ) -> jax.Array:
        raise NotImplementedError


@runtime_checkable
class SupportsGetInducingVariables(ProbabilisticModel, Protocol):
    """(reference ``interfaces.py:706-720``)"""

    def get_inducing_variables(self) -> Tuple[jax.Array, jax.Array, jax.Array, bool]:
        raise NotImplementedError


@runtime_checkable
class SupportsCovarianceWithTopFidelity(ProbabilisticModel, Protocol):
    """Multifidelity models (reference ``interfaces.py:723-745``)."""

    @property
    def num_fidelities(self) -> int:
        raise NotImplementedError

    def covariance_with_top_fidelity(self, query_points: TensorType) -> jax.Array:
        raise NotImplementedError


# ---------------------------------------------------------------------------------
# Samplers (reference interfaces.py:567-703)
# ---------------------------------------------------------------------------------


class ReparametrizationSampler(ABC):
    """Repeatable MC sampling via the reparametrization trick: ``qmc``/normal base samples
    are frozen at construction so repeated calls are deterministic given the same key
    (reference ``interfaces.py:567-626``)."""

    def __init__(self, sample_size: int, model: ProbabilisticModel):
        if sample_size <= 0:
            raise ValueError(f"sample_size must be positive, got {sample_size}")
        self._sample_size = sample_size
        self._model = model
        self._initialized = False

    @property
    def sample_size(self) -> int:
        return self._sample_size

    @abstractmethod
    def sample(self, at: TensorType, *, key: Optional[jax.Array] = None) -> jax.Array:
        """``at: [..., B, D]`` → samples ``[..., S, B, L]``."""

    def reset_sampler(self) -> None:
        """Forget the frozen base samples so the next :meth:`sample` redraws
        (reference ``interfaces.py:620-626``)."""
        self._initialized = False
        # subclasses freeze their base draws in ``_eps``; clearing it here makes reset
        # actually redraw rather than only flipping the flag
        if hasattr(self, "_eps"):
            self._eps = None


TrajectoryFunction = Callable[[TensorType], jax.Array]
"""A function ``[N, B, D] -> [N, B, L]`` drawn from a model posterior
(reference ``interfaces.py:629-638``)."""


class TrajectoryFunctionClass(ABC):
    """A trajectory function with state (frozen feature weights), callable and
    pytree-serializable (reference ``interfaces.py:629-638``)."""

    @abstractmethod
    def __call__(self, x: TensorType) -> jax.Array:
        ...


class TrajectorySampler(ABC):
    """Draws approximate posterior-sample functions (reference ``interfaces.py:641-703``)."""

    def __init__(self, model: ProbabilisticModel):
        self._model = model

    @abstractmethod
    def get_trajectory(self, key: jax.Array) -> TrajectoryFunction:
        """Draw a new trajectory function."""

    def update_trajectory(self, trajectory: TrajectoryFunction) -> TrajectoryFunction:
        """Refresh a trajectory after the model changed (default: rebuild in place)."""
        return trajectory

    def resample_trajectory(
        self, trajectory: TrajectoryFunction, key: Optional[jax.Array] = None
    ) -> TrajectoryFunction:
        """Redraw randomness without rebuilding features (default: new trajectory)."""
        import jax as _jax

        return self.get_trajectory(key if key is not None else _jax.random.PRNGKey(0))


# ---------------------------------------------------------------------------------
# Model stacks (reference interfaces.py:337-564)
# ---------------------------------------------------------------------------------


def _stack_predict_pure(member_predictors, x):
    means, vars_ = zip(*[p(x) for p in member_predictors])
    return jnp.concatenate(means, axis=-1), jnp.concatenate(vars_, axis=-1)


def _stack_predict_joint_pure(member_predictors, x):
    means, covs = zip(*[p(x) for p in member_predictors])
    return jnp.concatenate(means, axis=-1), jnp.concatenate(covs, axis=-3)


def _stack_sample_pure(member_samplers, x):
    return jnp.concatenate([s(x) for s in member_samplers], axis=-1)


class ModelStack:
    """Fuse independent models over disjoint output slices into one multi-output model
    (reference ``interfaces.py:337-466``)."""

    def __init__(
        self,
        model_with_event_size: Tuple[ProbabilisticModel, int],
        *models_with_event_sizes: Tuple[ProbabilisticModel, int],
    ):
        pairs = [model_with_event_size, *models_with_event_sizes]
        self._models: Sequence[ProbabilisticModel] = [m for m, _ in pairs]
        self._event_sizes: Sequence[int] = [s for _, s in pairs]

    @property
    def models(self) -> Sequence[ProbabilisticModel]:
        return self._models

    @property
    def event_sizes(self) -> Sequence[int]:
        return self._event_sizes

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        means, vars_ = zip(*[m.predict(query_points) for m in self._models])
        return jnp.concatenate(means, axis=-1), jnp.concatenate(vars_, axis=-1)

    def predict_partial(self):
        """Pytree Partial concatenating member marginal predictions (the stacks'
        counterpart of the exact-GP no-retrace path)."""
        from jax.tree_util import Partial

        from ..acquisition.utils import predictor

        return Partial(_stack_predict_pure, tuple(predictor(m) for m in self._models))

    def predict_joint_partial(self):
        from jax.tree_util import Partial

        from ..acquisition.utils import joint_predictor

        return Partial(
            _stack_predict_joint_pure,
            tuple(joint_predictor(m) for m in self._models),
        )

    def sample_joint_partial(self, num_samples: int, key: jax.Array):
        """Key-frozen joint sampling over the stack, concatenating member outputs
        (members must expose ``sample_joint_partial``)."""
        from jax.tree_util import Partial

        keys = jax.random.split(key, len(self._models))
        return Partial(
            _stack_sample_pure,
            tuple(
                m.sample_joint_partial(num_samples, k)
                for m, k in zip(self._models, keys)
            ),
        )

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        keys = jax.random.split(key, len(self._models))
        samples = [
            m.sample(k, query_points, num_samples) for m, k in zip(self._models, keys)
        ]
        return jnp.concatenate(samples, axis=-1)

    def log(self, dataset: Optional[Dataset] = None) -> None:
        for i, m in enumerate(self._models):
            m.log(dataset)

    def _split_observations(self, observations: jax.Array) -> Sequence[jax.Array]:
        import numpy as np

        splits = np.cumsum(self._event_sizes)[:-1]
        return jnp.split(observations, splits, axis=-1)


class TrainableModelStack(ModelStack):
    """A stack of trainable models: data is split by output slice
    (reference ``interfaces.py:469-509``)."""

    def update(self, dataset: Dataset) -> None:
        obs_parts = self._split_observations(dataset.trimmed_observations)
        qp = dataset.trimmed_query_points
        for m, obs in zip(self._models, obs_parts):
            m.update(Dataset.from_arrays(qp, obs))  # type: ignore[attr-defined]

    def optimize(self, dataset: Dataset) -> None:
        obs_parts = self._split_observations(dataset.trimmed_observations)
        qp = dataset.trimmed_query_points
        for m, obs in zip(self._models, obs_parts):
            m.optimize(Dataset.from_arrays(qp, obs))  # type: ignore[attr-defined]


class PredictJointModelStack(ModelStack):
    """Stack exposing block-diagonal joint predictions (reference ``interfaces.py:512-536``)."""

    def predict_joint(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        means, covs = zip(*[m.predict_joint(query_points) for m in self._models])  # type: ignore[attr-defined]
        return jnp.concatenate(means, axis=-1), jnp.concatenate(covs, axis=-3)


class PredictYModelStack(ModelStack):
    """(reference ``interfaces.py:539-552``)"""

    def predict_y(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        means, vars_ = zip(*[m.predict_y(query_points) for m in self._models])  # type: ignore[attr-defined]
        return jnp.concatenate(means, axis=-1), jnp.concatenate(vars_, axis=-1)


class TrainablePredictJointModelStack(TrainableModelStack, PredictJointModelStack):
    """Combination stack (reference ``interfaces.py`` typed stack combinations)."""


@runtime_checkable
class HasTrajectorySampler(ProbabilisticModel, Protocol):
    """(reference ``interfaces.py:300-311``)"""

    def trajectory_sampler(self) -> TrajectorySampler:
        raise NotImplementedError


@runtime_checkable
class HasReparamSampler(ProbabilisticModel, Protocol):
    """(reference ``interfaces.py:315-331``)"""

    def reparam_sampler(self, num_samples: int) -> ReparametrizationSampler:
        raise NotImplementedError


class HasReparamSamplerModelStack(ModelStack):
    """Stack whose members all support reparametrization sampling
    (reference ``interfaces.py:490-510``)."""

    def reparam_sampler(self, num_samples: int) -> "ReparametrizationSampler":
        from .stacks import StackReparametrizationSampler

        return StackReparametrizationSampler(num_samples, self)
