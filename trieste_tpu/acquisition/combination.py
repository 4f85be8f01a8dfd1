"""Acquisition-function combination: Reducer / Sum / Product / Map.

TPU-native rebuild of the reference ``trieste/acquisition/combination.py:28-170``.
Combined functions stay pytree ``Partial``s so the no-retrace property composes.
"""
from __future__ import annotations

from typing import Callable, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.tree_util import Partial

from ..data import Dataset
from ..models.interfaces import ProbabilisticModel
from ..types import Tag, TensorType
from .interface import AcquisitionFunction, AcquisitionFunctionBuilder


def _sum_fn(fns: Sequence[Callable], x: TensorType) -> jax.Array:
    result = fns[0](x)
    for f in fns[1:]:
        result = result + f(x)
    return result


def _product_fn(fns: Sequence[Callable], x: TensorType) -> jax.Array:
    result = fns[0](x)
    for f in fns[1:]:
        result = result * f(x)
    return result


def _map_fn(wrapper: Callable, fn: Callable, x: TensorType) -> jax.Array:
    return wrapper(fn(x))


class Reducer(AcquisitionFunctionBuilder):
    """Combines several builders by reducing their functions
    (reference ``combination.py:28-108``)."""

    def __init__(self, *builders: AcquisitionFunctionBuilder):
        if not builders:
            raise TypeError("At least one builder must be specified")
        self._acquisitions = tuple(builders)

    @property
    def acquisitions(self) -> Sequence[AcquisitionFunctionBuilder]:
        return self._acquisitions

    def _reduce_fn(self, fns: Sequence[AcquisitionFunction]) -> AcquisitionFunction:
        raise NotImplementedError

    def prepare_acquisition_function(
        self,
        models: Mapping[Tag, ProbabilisticModel],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
    ) -> AcquisitionFunction:
        fns = tuple(
            b.prepare_acquisition_function(models, datasets) for b in self._acquisitions
        )
        return self._reduce_fn(fns)

    def update_acquisition_function(
        self,
        function: AcquisitionFunction,
        models: Mapping[Tag, ProbabilisticModel],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
    ) -> AcquisitionFunction:
        return self.prepare_acquisition_function(models, datasets)

    def __repr__(self) -> str:
        return f"{type(self).__name__}({', '.join(map(repr, self._acquisitions))})"


class Sum(Reducer):
    """Pointwise sum (reference ``combination.py:111-136``)."""

    def _reduce_fn(self, fns: Sequence[AcquisitionFunction]) -> AcquisitionFunction:
        return Partial(_sum_fn, tuple(fns))


class Product(Reducer):
    """Pointwise product (reference ``combination.py:139-164``)."""

    def _reduce_fn(self, fns: Sequence[AcquisitionFunction]) -> AcquisitionFunction:
        return Partial(_product_fn, tuple(fns))


class Map(Reducer):
    """Apply a wrapper function to a single builder's output
    (reference ``combination.py:167-170``)."""

    def __init__(self, wrapper: Callable[[jax.Array], jax.Array], builder: AcquisitionFunctionBuilder):
        super().__init__(builder)
        self._wrapper = wrapper

    def _reduce_fn(self, fns: Sequence[AcquisitionFunction]) -> AcquisitionFunction:
        return Partial(_map_fn, Partial(self._wrapper), fns[0])
