"""Acquisition rules: how query points are chosen each BO step.

TPU-native rebuild of the reference ``trieste/acquisition/rule.py`` (2810 LoC). This
module provides the rule ABCs and the point-selection rules
(:class:`EfficientGlobalOptimization`, :class:`RandomSampling`,
:class:`DiscreteThompsonSampling`, asynchronous rules); the batch trust-region framework
lives in :mod:`trieste_tpu.acquisition.trust_region` and is re-exported by the package.

Stateful rules follow the reference's functional ``State`` protocol
(``types.py:28-33``): ``acquire`` may return a callable ``state -> (state, points)``,
which is a pure function of pytrees — jittable on TPU.

Examples — the async pending-point state machine (reference ``rule.py:402-489``):

>>> import jax.numpy as jnp
>>> from trieste_tpu.acquisition.rule import AsynchronousRuleState
>>> state = AsynchronousRuleState(None)
>>> state.has_pending_points
False
>>> state = state.add_pending_points(jnp.array([[0.0, 0.0], [1.0, 1.0]]))
>>> state.has_pending_points
True
>>> state.pending_points.shape
(2, 2)
>>> state = state.remove_points(jnp.array([[1.0, 1.0]]))  # observation arrived
>>> state.pending_points.shape
(1, 2)
"""
from __future__ import annotations

import copy
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Callable, Generic, Mapping, Optional, Sequence, Tuple, TypeVar, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Dataset
from ..models.interfaces import ProbabilisticModel
from ..observer import OBJECTIVE
from ..space import SearchSpace
from ..types import Tag, TensorType
from .interface import (
    AcquisitionFunction,
    AcquisitionFunctionBuilder,
    GreedyAcquisitionFunctionBuilder,
    SingleModelAcquisitionBuilder,
    SingleModelGreedyAcquisitionBuilder,
    SingleModelVectorizedAcquisitionBuilder,
    VectorizedAcquisitionFunctionBuilder,
)
from .optimizer import (
    AcquisitionOptimizer,
    automatic_optimizer_selector,
    batchify_joint,
    batchify_vectorize,
)
from .sampler import ExactThompsonSampler, ThompsonSampler

ResultType = TypeVar("ResultType")
SearchSpaceType = TypeVar("SearchSpaceType", bound=SearchSpace)
ProbabilisticModelType = TypeVar("ProbabilisticModelType", bound=ProbabilisticModel)

T = TypeVar("T")
StateFunc = Callable[[Optional[T]], Tuple[Optional[T], jax.Array]]


class AcquisitionRule(ABC, Generic[ResultType, SearchSpaceType, ProbabilisticModelType]):
    """The central mechanism for choosing query points (reference ``rule.py:109-190``)."""

    @abstractmethod
    def acquire(
        self,
        search_space: SearchSpaceType,
        models: Mapping[Tag, ProbabilisticModelType],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
        key: Optional[jax.Array] = None,
    ) -> ResultType:
        """Return query points ``[..., B, D]`` or a ``State`` callable."""

    def acquire_single(
        self,
        search_space: SearchSpaceType,
        model: ProbabilisticModelType,
        dataset: Optional[Dataset] = None,
        key: Optional[jax.Array] = None,
    ) -> ResultType:
        """Single-model convenience wrapper (reference ``rule.py:151-174``)."""
        if isinstance(dataset, dict) or isinstance(model, dict):
            raise ValueError(
                "AcquisitionRule.acquire_single method does not support multiple datasets "
                "or models: use acquire instead"
            )
        return self.acquire(
            search_space,
            {OBJECTIVE: model},
            {OBJECTIVE: dataset} if dataset is not None else None,
            key=key,
        )

    def filter_datasets(
        self,
        models: Mapping[Tag, ProbabilisticModelType],
        datasets: Mapping[Tag, Dataset],
    ) -> Union[Mapping[Tag, Dataset], StateFunc]:
        """Filter datasets before model updates (default no-op; trust regions override) —
        reference ``rule.py:176-190``."""
        return datasets


class LocalDatasetsAcquisitionRule(
    AcquisitionRule[ResultType, SearchSpaceType, ProbabilisticModelType]
):
    """Marker ABC for rules that need per-region local datasets
    (reference ``rule.py:193-206``)."""

    @property
    @abstractmethod
    def num_local_datasets(self) -> int:
        ...

    @abstractmethod
    def initialize_subspaces(self, search_space: SearchSpaceType) -> None:
        ...


class EfficientGlobalOptimization(
    AcquisitionRule[jax.Array, SearchSpaceType, ProbabilisticModelType]
):
    """The default rule: build an acquisition function and maximize it
    (reference ``rule.py:209-399``).

    Batching semantics follow the reference: vectorized builders use
    :func:`batchify_vectorize`, greedy builders run a sequential pending-points loop, and
    plain builders with ``num_query_points > 1`` use :func:`batchify_joint`.
    """

    def __init__(
        self,
        builder: Optional[
            Union[
                AcquisitionFunctionBuilder,
                GreedyAcquisitionFunctionBuilder,
                SingleModelAcquisitionBuilder,
                SingleModelGreedyAcquisitionBuilder,
                VectorizedAcquisitionFunctionBuilder,
                SingleModelVectorizedAcquisitionBuilder,
            ]
        ] = None,
        optimizer: Optional[AcquisitionOptimizer] = None,
        num_query_points: int = 1,
        initial_acquisition_function: Optional[AcquisitionFunction] = None,
    ):
        if num_query_points <= 0:
            raise ValueError(
                f"Number of query points must be greater than 0, got {num_query_points}"
            )
        if builder is None:
            if num_query_points == 1:
                from .function.function import ExpectedImprovement

                builder = ExpectedImprovement()
            else:
                raise ValueError(
                    "An acquisition function builder must be specified for batch sizes "
                    "greater than one"
                )
        if optimizer is None:
            optimizer = automatic_optimizer_selector
        if isinstance(
            builder, (SingleModelAcquisitionBuilder, SingleModelGreedyAcquisitionBuilder)
        ):
            builder = builder.using(OBJECTIVE)

        self._builder = builder
        self._optimizer = optimizer
        self._num_query_points = num_query_points
        self._acquisition_function: Optional[AcquisitionFunction] = (
            initial_acquisition_function
        )

        if num_query_points > 1:
            if isinstance(builder, VectorizedAcquisitionFunctionBuilder):
                self._optimizer = batchify_vectorize(self._optimizer, num_query_points)
            elif not isinstance(builder, GreedyAcquisitionFunctionBuilder):
                self._optimizer = batchify_joint(self._optimizer, num_query_points)

    @property
    def acquisition_function(self) -> Optional[AcquisitionFunction]:
        return self._acquisition_function

    @property
    def num_query_points(self) -> int:
        return self._num_query_points

    def acquire(
        self,
        search_space: SearchSpaceType,
        models: Mapping[Tag, ProbabilisticModelType],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(2**31))
        if isinstance(self._builder, GreedyAcquisitionFunctionBuilder):
            return self._acquire_greedy(search_space, models, datasets, key)

        if self._acquisition_function is None:
            self._acquisition_function = self._builder.prepare_acquisition_function(
                models, datasets
            )
        else:
            self._acquisition_function = self._builder.update_acquisition_function(
                self._acquisition_function, models, datasets
            )
        points = self._optimizer(search_space, self._acquisition_function, key=key)
        from ..logging import deferred_histogram

        # deferred: the fetch happens at the loop's per-step flush, not mid-acquire
        deferred_histogram("EGO.query_points", lambda: np.asarray(points))
        return points

    def _acquire_greedy(
        self,
        search_space: SearchSpaceType,
        models: Mapping[Tag, ProbabilisticModelType],
        datasets: Optional[Mapping[Tag, Dataset]],
        key: jax.Array,
    ) -> jax.Array:
        """Sequential greedy batch construction (reference ``rule.py:371-399``)."""
        keys = jax.random.split(key, self._num_query_points)
        if self._acquisition_function is None:
            self._acquisition_function = self._builder.prepare_acquisition_function(
                models, datasets, None
            )
        else:
            self._acquisition_function = self._builder.update_acquisition_function(
                self._acquisition_function, models, datasets, None
            )
        points = self._optimizer(search_space, self._acquisition_function, key=keys[0])
        for i in range(self._num_query_points - 1):
            self._acquisition_function = self._builder.update_acquisition_function(
                self._acquisition_function,
                models,
                datasets,
                pending_points=points,
                new_optimization_step=False,
            )
            chosen = self._optimizer(
                search_space, self._acquisition_function, key=keys[i + 1]
            )
            points = jnp.concatenate([points, chosen], axis=0)
        return points

    def __repr__(self) -> str:
        return (
            f"EfficientGlobalOptimization({self._builder!r}, {self._optimizer!r}, "
            f"{self._num_query_points!r})"
        )


class RandomSampling(AcquisitionRule[jax.Array, SearchSpace, ProbabilisticModel]):
    """Uniform random baseline (reference ``rule.py:836-876``)."""

    def __init__(self, num_query_points: int = 1):
        if num_query_points <= 0:
            raise ValueError(
                f"Number of query points must be greater than 0, got {num_query_points}"
            )
        self._num_query_points = num_query_points

    def acquire(
        self,
        search_space: SearchSpace,
        models: Mapping[Tag, ProbabilisticModel],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(2**31))
        return search_space.sample(key, self._num_query_points)

    def __repr__(self) -> str:
        return f"RandomSampling({self._num_query_points!r})"


class DiscreteThompsonSampling(AcquisitionRule[jax.Array, SearchSpace, ProbabilisticModel]):
    """Thompson sampling over a random finite discretization of the space
    (reference ``rule.py:879-994``)."""

    def __init__(
        self,
        num_search_space_samples: int,
        num_query_points: int,
        thompson_sampler: Optional[ThompsonSampler] = None,
    ):
        if num_search_space_samples <= 0:
            raise ValueError(
                f"Search space must be greater than 0, got {num_search_space_samples}"
            )
        if num_query_points <= 0:
            raise ValueError(
                f"Number of query points must be greater than 0, got {num_query_points}"
            )
        if thompson_sampler is not None and thompson_sampler.sample_min_value:
            raise ValueError("Thompson sampling requires a minimizer (not min-value) sampler")
        self._num_search_space_samples = num_search_space_samples
        self._num_query_points = num_query_points
        self._thompson_sampler = thompson_sampler or ExactThompsonSampler()

    def acquire(
        self,
        search_space: SearchSpace,
        models: Mapping[Tag, ProbabilisticModel],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        if models.keys() != {OBJECTIVE}:
            raise ValueError(
                f"dict of models must contain the single key {OBJECTIVE!r}, "
                f"got keys {models.keys()}"
            )
        if datasets is None or datasets.keys() != {OBJECTIVE}:
            raise ValueError(
                f"datasets must contain the single key {OBJECTIVE!r}"
            )
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(2**31))
        k_space, k_sample = jax.random.split(key)
        candidates = search_space.sample(k_space, self._num_search_space_samples)
        return self._thompson_sampler.sample(
            models[OBJECTIVE], self._num_query_points, candidates, key=k_sample
        )

    def __repr__(self) -> str:
        return (
            f"DiscreteThompsonSampling({self._num_search_space_samples!r}, "
            f"{self._num_query_points!r}, {self._thompson_sampler!r})"
        )


# ---------------------------------------------------------------------------------
# Asynchronous rules (reference rule.py:402-833)
# ---------------------------------------------------------------------------------


@dataclass(frozen=True)
class AsynchronousRuleState:
    """Pending points state for asynchronous BO (reference ``rule.py:402-489``)."""

    pending_points: Optional[jax.Array] = None  # [P, D]

    @property
    def has_pending_points(self) -> bool:
        return self.pending_points is not None and self.pending_points.shape[0] > 0

    def remove_points(self, points_to_remove: TensorType) -> "AsynchronousRuleState":
        """Drop pending points that were observed (first match only per observed point) —
        reference ``rule.py:430-466``."""
        if not self.has_pending_points:
            return self
        pending = np.asarray(self.pending_points)
        remove = np.asarray(points_to_remove)
        keep = np.ones(len(pending), bool)
        for row in remove:
            matches = np.where(keep & np.all(np.isclose(pending, row), axis=-1))[0]
            if len(matches):
                keep[matches[0]] = False
        return AsynchronousRuleState(jnp.asarray(pending[keep]))

    def add_pending_points(self, new_points: TensorType) -> "AsynchronousRuleState":
        """(reference ``rule.py:468-489``)"""
        new = jnp.atleast_2d(jnp.asarray(new_points))
        if not self.has_pending_points:
            return AsynchronousRuleState(new)
        return AsynchronousRuleState(
            jnp.concatenate([self.pending_points, new], axis=0)
        )


class AsynchronousOptimization(
    AcquisitionRule[
        Callable[[Optional[AsynchronousRuleState]], Tuple[Optional[AsynchronousRuleState], jax.Array]],
        SearchSpace,
        ProbabilisticModel,
    ]
):
    """Asynchronous BO with non-greedy batch acquisition functions: pending points are
    prepended to every candidate batch and only the new tail is optimized
    (reference ``rule.py:492-677``)."""

    def __init__(
        self,
        builder: Optional[AcquisitionFunctionBuilder] = None,
        optimizer: Optional[AcquisitionOptimizer] = None,
        num_query_points: int = 1,
    ):
        if num_query_points <= 0:
            raise ValueError(
                f"Number of query points must be greater than 0, got {num_query_points}"
            )
        if builder is None:
            from ..models.interfaces import HasReparamSampler
            from .function.function import BatchMonteCarloExpectedImprovement

            builder = BatchMonteCarloExpectedImprovement(10_000).using(OBJECTIVE)
        if optimizer is None:
            optimizer = automatic_optimizer_selector
        if isinstance(builder, SingleModelAcquisitionBuilder):
            builder = builder.using(OBJECTIVE)
        self._builder = builder
        self._optimizer = batchify_joint(optimizer, num_query_points)
        self._num_query_points = num_query_points
        self._acquisition_function: Optional[AcquisitionFunction] = None

    def acquire(
        self,
        search_space: SearchSpace,
        models: Mapping[Tag, ProbabilisticModel],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
        key: Optional[jax.Array] = None,
    ):
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(2**31))
        if self._acquisition_function is None:
            self._acquisition_function = self._builder.prepare_acquisition_function(
                models, datasets
            )
        else:
            self._acquisition_function = self._builder.update_acquisition_function(
                self._acquisition_function, models, datasets
            )

        def state_func(
            state: Optional[AsynchronousRuleState],
        ) -> Tuple[Optional[AsynchronousRuleState], jax.Array]:
            if state is None:
                state = AsynchronousRuleState(None)
            if datasets is not None and OBJECTIVE in datasets:
                state = state.remove_points(datasets[OBJECTIVE].trimmed_query_points)
            if state.has_pending_points:
                pending = state.pending_points

                def function_with_pending(x: TensorType) -> jax.Array:
                    x = jnp.asarray(x)  # [..., B, D]
                    expanded = jnp.broadcast_to(
                        pending, x.shape[:-2] + pending.shape
                    )
                    return self._acquisition_function(
                        jnp.concatenate([expanded, x], axis=-2)
                    )

                acq = function_with_pending
            else:
                acq = self._acquisition_function
            new_points = self._optimizer(search_space, acq, key=key)
            state = state.add_pending_points(new_points)
            return state, new_points

        return state_func

    def __repr__(self) -> str:
        return f"AsynchronousOptimization({self._builder!r}, {self._num_query_points!r})"


class AsynchronousGreedy(
    AcquisitionRule[
        Callable[[Optional[AsynchronousRuleState]], Tuple[Optional[AsynchronousRuleState], jax.Array]],
        SearchSpace,
        ProbabilisticModel,
    ]
):
    """Asynchronous BO with greedy (pending-points-aware) builders
    (reference ``rule.py:680-833``)."""

    def __init__(
        self,
        builder: Union[
            GreedyAcquisitionFunctionBuilder, SingleModelGreedyAcquisitionBuilder
        ],
        optimizer: Optional[AcquisitionOptimizer] = None,
        num_query_points: int = 1,
    ):
        if builder is None:
            raise ValueError("Builder cannot be None")
        if num_query_points <= 0:
            raise ValueError(
                f"Number of query points must be greater than 0, got {num_query_points}"
            )
        if optimizer is None:
            optimizer = automatic_optimizer_selector
        if isinstance(builder, SingleModelGreedyAcquisitionBuilder):
            builder = builder.using(OBJECTIVE)
        if not isinstance(builder, GreedyAcquisitionFunctionBuilder):
            # reference ``rule.py:713-721``: this rule's loop relies on the
            # pending-points protocol, which only greedy builders implement
            raise NotImplementedError(
                f"AsynchronousGreedy requires a greedy acquisition builder, "
                f"got {type(builder).__name__}"
            )
        self._builder = builder
        self._optimizer = optimizer
        self._num_query_points = num_query_points
        self._acquisition_function: Optional[AcquisitionFunction] = None

    def acquire(
        self,
        search_space: SearchSpace,
        models: Mapping[Tag, ProbabilisticModel],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
        key: Optional[jax.Array] = None,
    ):
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(2**31))

        def state_func(
            state: Optional[AsynchronousRuleState],
        ) -> Tuple[Optional[AsynchronousRuleState], jax.Array]:
            nonlocal key
            if state is None:
                state = AsynchronousRuleState(None)
            if datasets is not None and OBJECTIVE in datasets:
                state = state.remove_points(datasets[OBJECTIVE].trimmed_query_points)
            if self._acquisition_function is None:
                self._acquisition_function = self._builder.prepare_acquisition_function(
                    models, datasets, state.pending_points
                )
            else:
                self._acquisition_function = self._builder.update_acquisition_function(
                    self._acquisition_function, models, datasets, state.pending_points
                )
            keys = jax.random.split(key, self._num_query_points)
            new_points = self._optimizer(
                search_space, self._acquisition_function, key=keys[0]
            )
            state = state.add_pending_points(new_points)
            for i in range(self._num_query_points - 1):
                self._acquisition_function = self._builder.update_acquisition_function(
                    self._acquisition_function,
                    models,
                    datasets,
                    state.pending_points,
                    new_optimization_step=False,
                )
                batch_point = self._optimizer(
                    search_space, self._acquisition_function, key=keys[i + 1]
                )
                new_points = jnp.concatenate([new_points, batch_point], axis=0)
                state = state.add_pending_points(batch_point)
            return state, new_points

        return state_func

    def __repr__(self) -> str:
        return f"AsynchronousGreedy({self._builder!r}, {self._num_query_points!r})"


class BatchHypervolumeSharpeRatioIndicator(
    AcquisitionRule[jax.Array, SearchSpace, ProbabilisticModel]
):
    """qHSRI: batch selection by Sharpe-ratio-diverse sampling of the mean/std Pareto
    front (reference ``rule.py:2628-2809``). The reference uses pymoo NSGA-II + a cvxpy
    QP; here both are self-contained — a host NSGA-II whose population evaluations batch
    through the device-side model, and a projected-gradient simplex QP
    (:meth:`~trieste_tpu.acquisition.multi_objective.Pareto.sample_diverse_subset`).
    """

    def __init__(
        self,
        num_query_points: int = 1,
        ga_population_size: int = 100,
        ga_n_generations: int = 50,
        filter_threshold: float = 0.1,
    ):
        if num_query_points <= 0:
            raise ValueError(f"num_query_points must be positive, got {num_query_points}")
        if not 0.0 <= filter_threshold < 1.0:
            raise ValueError(f"filter_threshold must be in [0, 1), got {filter_threshold}")
        self._num_query_points = num_query_points
        self._population_size = ga_population_size
        self._n_generations = ga_n_generations
        self._filter_threshold = filter_threshold

    def _find_mean_std_front(self, model, space):
        """NSGA-II over (mean, -std): candidates trading off exploitation/exploration
        (reference ``_find_non_dominated_points``, ``rule.py:2700-2740``)."""
        from .multi_objective.nsga2 import nsga2

        def objective(x_np: np.ndarray) -> np.ndarray:
            mean, var = model.predict(jnp.asarray(x_np))
            std = jnp.sqrt(jnp.maximum(var, 1e-24))
            return np.asarray(jnp.concatenate([mean, -std], axis=-1))

        return nsga2(
            objective,
            np.asarray(space.lower),
            np.asarray(space.upper),
            population_size=self._population_size,
            num_generations=self._n_generations,
        )

    def acquire(
        self,
        search_space: SearchSpace,
        models: Mapping[Tag, ProbabilisticModel],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        if models.keys() != {OBJECTIVE}:
            raise ValueError(
                f"dict of models must contain the single key {OBJECTIVE!r}"
            )
        if datasets is None or OBJECTIVE not in datasets or len(datasets[OBJECTIVE]) == 0:
            raise ValueError("qHSRI requires a non-empty objective dataset")
        model = models[OBJECTIVE]
        points, front = self._find_mean_std_front(model, search_space)
        means, neg_stds = front[:, :1], front[:, 1:]
        stds = -neg_stds

        # probability-of-improvement filter (reference ``rule.py:2742-2770``)
        from jax.scipy.stats import norm as jnorm

        eta = float(jnp.min(datasets[OBJECTIVE].trimmed_observations))
        pi = np.asarray(jnorm.cdf((eta - jnp.asarray(means)) / jnp.asarray(stds)))[:, 0]
        keep = pi >= self._filter_threshold
        if keep.sum() < self._num_query_points:
            keep = np.argsort(-pi)[: max(self._num_query_points, 5)]
            points, means, stds = points[keep], means[keep], stds[keep]
        else:
            points, means, stds = points[keep], means[keep], stds[keep]

        from .multi_objective import Pareto

        front_vals = np.concatenate([means, -stds], axis=-1)
        pareto = Pareto(jnp.asarray(front_vals))
        _, counts = pareto.sample_diverse_subset(
            self._num_query_points, allow_repeats=True
        )
        # map sampled front rows back to query points
        front_np = np.asarray(pareto.front)
        chosen: list[np.ndarray] = []
        for row, count in zip(front_np, np.asarray(counts)):
            if count <= 0:
                continue
            idx = int(
                np.argmin(np.linalg.norm(front_vals - row[None, :], axis=-1))
            )
            chosen.extend([points[idx]] * int(count))
        return jnp.asarray(np.stack(chosen[: self._num_query_points]))

    def __repr__(self) -> str:
        return (
            f"BatchHypervolumeSharpeRatioIndicator({self._num_query_points!r}, "
            f"{self._population_size!r}, {self._n_generations!r}, "
            f"{self._filter_threshold!r})"
        )
