"""Acquisition-function interfaces.

TPU-native rebuild of the reference ``trieste/acquisition/interface.py`` (394 LoC).

An acquisition function maps query points ``[..., B, D]`` to values ``[..., 1]``
(reference ``interface.py:27-38``). Here every acquisition function is a
``jax.tree_util.Partial`` — a module-level pure function bound to a pytree of state
(model parameters, posterior cache, incumbent eta, MC base samples). Because a ``Partial``
is itself a pytree, the jitted acquisition optimizer treats a *new* acquisition function
with the *same structure* as the same compiled program with different leaf values: this is
the JAX analogue of the reference's ``AcquisitionFunctionClass`` + ``tf.Variable`` update
idiom for avoiding retraces (``interface.py:41-49``).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Callable, Generic, Mapping, Optional, Sequence, TypeVar

import jax

from ..data import Dataset
from ..models.interfaces import ProbabilisticModel
from ..observer import OBJECTIVE
from ..types import Tag, TensorType

AcquisitionFunction = Callable[[TensorType], jax.Array]
"""Maps ``[..., B, D]`` to ``[..., 1]`` (reference ``interface.py:27-38``)."""

VectorizedAcquisitionFunction = Callable[[TensorType], jax.Array]
"""Maps ``[..., V, D]`` to ``[..., V]`` — one value per vectorized slice."""

ProbabilisticModelType = TypeVar(
    "ProbabilisticModelType", bound=ProbabilisticModel, contravariant=True
)


class AcquisitionFunctionBuilder(Generic[ProbabilisticModelType], ABC):
    """Builds and updates acquisition functions over tagged models/datasets
    (reference ``interface.py:52-87``)."""

    @abstractmethod
    def prepare_acquisition_function(
        self,
        models: Mapping[Tag, ProbabilisticModelType],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
    ) -> AcquisitionFunction:
        """Build an acquisition function from models and data."""

    def update_acquisition_function(
        self,
        function: AcquisitionFunction,
        models: Mapping[Tag, ProbabilisticModelType],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
    ) -> AcquisitionFunction:
        """Refresh an acquisition function after model/data updates. The default rebuilds;
        overriding implementations update the bound state in place (cheap — same pytree
        structure means no retrace downstream)."""
        return self.prepare_acquisition_function(models, datasets)


class SingleModelAcquisitionBuilder(Generic[ProbabilisticModelType], ABC):
    """Convenience base for acquisitions over a single model/dataset pair
    (reference ``interface.py:90-157``)."""

    def using(self, tag: Tag = OBJECTIVE) -> AcquisitionFunctionBuilder:
        """Lift to a tagged :class:`AcquisitionFunctionBuilder` (reference
        ``interface.py:97-133``)."""
        single = self

        class _Anon(AcquisitionFunctionBuilder):
            def prepare_acquisition_function(self, models, datasets=None):
                return single.prepare_acquisition_function(
                    models[tag], datasets[tag] if datasets is not None else None
                )

            def update_acquisition_function(self, function, models, datasets=None):
                return single.update_acquisition_function(
                    function, models[tag], datasets[tag] if datasets is not None else None
                )

            def __repr__(self) -> str:
                return f"{single!r} using tag {tag!r}"

        return _Anon()

    @abstractmethod
    def prepare_acquisition_function(
        self,
        model: ProbabilisticModelType,
        dataset: Optional[Dataset] = None,
    ) -> AcquisitionFunction:
        ...

    def update_acquisition_function(
        self,
        function: AcquisitionFunction,
        model: ProbabilisticModelType,
        dataset: Optional[Dataset] = None,
    ) -> AcquisitionFunction:
        return self.prepare_acquisition_function(model, dataset)


class GreedyAcquisitionFunctionBuilder(Generic[ProbabilisticModelType], ABC):
    """Builders for greedy batch rules: the function depends on the points already chosen
    for the batch (``pending_points``) — reference ``interface.py:160-309``."""

    @abstractmethod
    def prepare_acquisition_function(
        self,
        models: Mapping[Tag, ProbabilisticModelType],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
        pending_points: Optional[TensorType] = None,
    ) -> AcquisitionFunction:
        ...

    def update_acquisition_function(
        self,
        function: AcquisitionFunction,
        models: Mapping[Tag, ProbabilisticModelType],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
        pending_points: Optional[TensorType] = None,
        new_optimization_step: bool = True,
    ) -> AcquisitionFunction:
        return self.prepare_acquisition_function(models, datasets, pending_points)


class SingleModelGreedyAcquisitionBuilder(Generic[ProbabilisticModelType], ABC):
    """(reference ``interface.py:216-309``)"""

    def using(self, tag: Tag = OBJECTIVE) -> GreedyAcquisitionFunctionBuilder:
        single = self

        class _Anon(GreedyAcquisitionFunctionBuilder):
            def prepare_acquisition_function(self, models, datasets=None, pending_points=None):
                return single.prepare_acquisition_function(
                    models[tag],
                    datasets[tag] if datasets is not None else None,
                    pending_points,
                )

            def update_acquisition_function(
                self, function, models, datasets=None, pending_points=None,
                new_optimization_step=True,
            ):
                return single.update_acquisition_function(
                    function,
                    models[tag],
                    datasets[tag] if datasets is not None else None,
                    pending_points,
                    new_optimization_step,
                )

        return _Anon()

    @abstractmethod
    def prepare_acquisition_function(
        self,
        model: ProbabilisticModelType,
        dataset: Optional[Dataset] = None,
        pending_points: Optional[TensorType] = None,
    ) -> AcquisitionFunction:
        ...

    def update_acquisition_function(
        self,
        function: AcquisitionFunction,
        model: ProbabilisticModelType,
        dataset: Optional[Dataset] = None,
        pending_points: Optional[TensorType] = None,
        new_optimization_step: bool = True,
    ) -> AcquisitionFunction:
        return self.prepare_acquisition_function(model, dataset, pending_points)


class VectorizedAcquisitionFunctionBuilder(AcquisitionFunctionBuilder[ProbabilisticModelType]):
    """Builders of vectorized acquisition functions ``[..., V, D] -> [..., V]``, optimized
    slice-wise over :class:`~trieste_tpu.space.TaggedMultiSearchSpace` or batched spaces
    (reference ``interface.py:312-365``)."""


class SingleModelVectorizedAcquisitionBuilder(
    SingleModelAcquisitionBuilder[ProbabilisticModelType]
):
    """(reference ``interface.py:330-365``)"""

    def using(self, tag: Tag = OBJECTIVE) -> AcquisitionFunctionBuilder:
        single = self

        class _Anon(VectorizedAcquisitionFunctionBuilder):
            def prepare_acquisition_function(self, models, datasets=None):
                return single.prepare_acquisition_function(
                    models[tag], datasets[tag] if datasets is not None else None
                )

            def update_acquisition_function(self, function, models, datasets=None):
                return single.update_acquisition_function(
                    function, models[tag], datasets[tag] if datasets is not None else None
                )

        return _Anon()


PenalizationFunction = Callable[[TensorType], jax.Array]
"""``[..., 1, D] -> [..., 1]`` multiplicative penalization (reference ``interface.py:368-381``)."""

UpdatablePenalizationFunction = PenalizationFunction
"""In JAX, "updatable" penalizations are rebuilt as new Partials (reference
``interface.py:384-394`` uses in-place ``tf.Variable`` updates instead)."""
