"""The open-loop Ask/Tell interface.

TPU-native rebuild of the reference ``trieste/ask_tell_optimization.py`` (756 LoC): users
drive the loop themselves (e.g. from an async scheduler or another process) while the
framework keeps the models, datasets and acquisition state. All state is pickleable and
round-trips through :class:`AskTellOptimizerState`, the analogue of the reference's
``to_state/from_state`` protocol (``ask_tell_optimization.py:76-92,451-576``).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Generic, Mapping, Optional, Tuple, TypeVar, Union

import jax
import jax.numpy as jnp
import numpy as np

from .bayesian_optimizer import Record, optimize_model_and_save_result
from .data import Dataset
from .models.interfaces import ProbabilisticModel, TrainableProbabilisticModel
from .observer import OBJECTIVE
from .space import SearchSpace
from .types import Tag, TensorType
from .utils.misc import LocalizedTag, ignoring_local_tags

StateType = TypeVar("StateType")


@dataclass(frozen=True)
class AskTellOptimizerState(Generic[StateType]):
    """Serializable snapshot of an Ask/Tell run (reference
    ``ask_tell_optimization.py:76-92``)."""

    record: Record[StateType]
    local_data_ixs: Optional[Tuple[jax.Array, ...]] = None
    local_data_len: Optional[int] = None


class AskTellOptimizerABC(ABC, Generic[StateType]):
    """Ask/Tell BO driver (reference ``ask_tell_optimization.py:94-729``)."""

    def __init__(
        self,
        search_space: SearchSpace,
        datasets: Union[Mapping[Tag, Dataset], Dataset],
        models: Union[Mapping[Tag, TrainableProbabilisticModel], TrainableProbabilisticModel],
        acquisition_rule: Optional[object] = None,
        acquisition_state: Optional[StateType] = None,
        *,
        fit_model: bool = True,
        track_data: bool = True,
        local_data_ixs: Optional[Tuple[TensorType, ...]] = None,
        key: Optional[jax.Array] = None,
    ):
        if isinstance(datasets, Dataset):
            datasets = {OBJECTIVE: datasets}
            models = {OBJECTIVE: models}  # type: ignore[dict-item]
        datasets = dict(datasets)
        models = dict(models)
        if not datasets or not models:
            raise ValueError("dicts of datasets and models must be populated.")
        # compare modulo local tags: a state restored from a local-dataset (trust-region)
        # run carries LocalizedTag datasets next to a single global model (reference
        # handles exactly this on restore — ``ask_tell_optimization.py:253-268,282-320``)
        dataset_gtags = {LocalizedTag.from_tag(tag).global_tag for tag in datasets}
        model_gtags = {LocalizedTag.from_tag(tag).global_tag for tag in models}
        if dataset_gtags != model_gtags:
            raise ValueError(
                f"datasets and models should contain the same keys (modulo local tags). "
                f"Got {datasets.keys()} and {models.keys()} respectively."
            )
        self._search_space = search_space
        self._datasets = datasets
        self._models = models
        self._acquisition_state = acquisition_state
        self._track_data = track_data
        self._key = key if key is not None else jax.random.PRNGKey(np.random.randint(2**31))

        if acquisition_rule is None:
            if datasets.keys() != {OBJECTIVE}:
                raise ValueError(
                    f"Default acquisition requires the single key {OBJECTIVE!r}, "
                    f"got keys {datasets.keys()}"
                )
            from .acquisition.rule import EfficientGlobalOptimization

            acquisition_rule = EfficientGlobalOptimization()
        self._acquisition_rule = acquisition_rule

        from .acquisition.rule import LocalDatasetsAcquisitionRule

        if isinstance(acquisition_rule, LocalDatasetsAcquisitionRule):
            from .acquisition.utils import with_local_datasets

            acquisition_rule.initialize_subspaces(search_space)
            self._datasets = dict(
                with_local_datasets(
                    self._datasets,
                    acquisition_rule.num_local_datasets,
                    local_data_ixs,
                )
            )

        filtered = acquisition_rule.filter_datasets(self._models, self._datasets)
        if callable(filtered):
            self._acquisition_state, filtered = filtered(self._acquisition_state)
        self._filtered_datasets = dict(filtered)

        if fit_model:
            for tag, model in self._models.items():
                ds = self._dataset_for_tag(tag)
                self.update_model(model, ds)

    # -- abstract training hook ------------------------------------------------------

    @abstractmethod
    def update_model(self, model: TrainableProbabilisticModel, dataset: Dataset) -> None:
        """How to (re)train a model when data changes."""

    # -- accessors ---------------------------------------------------------------------

    def _dataset_for_tag(self, tag: Tag) -> Dataset:
        ltag = LocalizedTag.from_tag(tag)
        for candidate in (tag, ltag.global_tag):
            if candidate in self._filtered_datasets:
                return self._filtered_datasets[candidate]
        raise ValueError(f"no dataset for tag {tag!r}")

    @property
    def datasets(self) -> Mapping[Tag, Dataset]:
        return self._datasets

    @property
    def dataset(self) -> Dataset:
        datasets = ignoring_local_tags(self.datasets)
        if len(datasets) == 1:
            return next(iter(datasets.values()))
        raise ValueError(f"expected a single dataset, found {len(datasets)}")

    @property
    def models(self) -> Mapping[Tag, TrainableProbabilisticModel]:
        return self._models

    @models.setter
    def models(self, models: Mapping[Tag, TrainableProbabilisticModel]) -> None:
        """Replace the models; the keys must match the current ones exactly
        (reference ``ask_tell_optimization.py:362-375``)."""
        if models.keys() != self._models.keys():
            raise ValueError(
                f"New models contain incorrect keys. Expected {self._models.keys()}, "
                f"received {models.keys()}."
            )
        self._models = dict(models)

    @property
    def model(self) -> TrainableProbabilisticModel:
        models = ignoring_local_tags(self.models)
        if len(models) == 1:
            return next(iter(models.values()))
        raise ValueError(f"expected a single model, found {len(models)}")

    @model.setter
    def model(self, model: TrainableProbabilisticModel) -> None:
        """Replace the model of a single-model optimizer keyed by the default
        ``OBJECTIVE`` tag (reference ``ask_tell_optimization.py:384-398``)."""
        if self._models.keys() != {OBJECTIVE}:
            raise ValueError(
                f"Expected a single model keyed by {OBJECTIVE!r}, found "
                f"{self._models.keys()}"
            )
        self._models = {OBJECTIVE: model}

    @property
    def acquisition_state(self) -> Optional[StateType]:
        return self._acquisition_state

    @classmethod
    def dataset_len(cls, datasets: Mapping[Tag, Dataset]) -> int:
        """The common size of the global (non-local) datasets
        (reference ``ask_tell_optimization.py:435-449``)."""
        lens = {
            tag: int(ds.num_points)
            for tag, ds in datasets.items()
            if not LocalizedTag.from_tag(tag).is_local
        }
        unique = set(lens.values())
        if len(unique) != 1:
            raise ValueError(
                f"Expected unique global dataset size, got {sorted(unique)}: {lens}"
            )
        return next(iter(unique))

    # -- serialization -----------------------------------------------------------------

    def to_record(self, copy: bool = True) -> Record[StateType]:
        """(reference ``ask_tell_optimization.py:451-478``)"""
        import copy as copy_module

        return Record(
            copy_module.deepcopy(self._datasets) if copy else self._datasets,
            copy_module.deepcopy(self._models) if copy else self._models,
            copy_module.deepcopy(self._acquisition_state)
            if copy
            else self._acquisition_state,
        )

    @classmethod
    def from_record(
        cls,
        record: Record[StateType],
        search_space: SearchSpace,
        acquisition_rule: Optional[object] = None,
        track_data: bool = True,
    ) -> "AskTellOptimizerABC[StateType]":
        """(reference ``ask_tell_optimization.py:480-528``). Models are not refit."""
        return cls(
            search_space,
            dict(record.datasets),
            dict(record.models),  # type: ignore[arg-type]
            acquisition_rule=acquisition_rule,
            acquisition_state=record.acquisition_state,
            fit_model=False,
            track_data=track_data,
        )

    def to_state(self, copy: bool = False) -> AskTellOptimizerState[StateType]:
        """(reference ``ask_tell_optimization.py:530-540``)"""
        return AskTellOptimizerState(record=self.to_record(copy=copy))

    @classmethod
    def from_state(
        cls,
        state: AskTellOptimizerState[StateType],
        search_space: SearchSpace,
        acquisition_rule: Optional[object] = None,
        track_data: bool = True,
    ) -> "AskTellOptimizerABC[StateType]":
        """(reference ``ask_tell_optimization.py:542-576``). ``state.local_data_ixs``,
        when set, re-derives the per-region local datasets on restore; records whose
        datasets already carry localized tags restore those directly."""
        return cls(
            search_space,
            dict(state.record.datasets),
            dict(state.record.models),  # type: ignore[arg-type]
            acquisition_rule=acquisition_rule,
            acquisition_state=state.record.acquisition_state,
            fit_model=False,
            track_data=track_data,
            local_data_ixs=state.local_data_ixs,
        )

    # -- the loop ----------------------------------------------------------------------

    def ask(self) -> jax.Array:
        """Optimize the acquisition and return query points
        (reference ``ask_tell_optimization.py:595-632``)."""
        self._key, acquire_key = jax.random.split(self._key)
        points_or_stateful = self._acquisition_rule.acquire(
            self._search_space, self._models, datasets=self._filtered_datasets,
            key=acquire_key,
        )
        if callable(points_or_stateful):
            self._acquisition_state, query_points = points_or_stateful(
                self._acquisition_state
            )
        else:
            query_points = points_or_stateful
        return query_points

    def tell(
        self, new_data: Union[Mapping[Tag, Dataset], Dataset]
    ) -> None:
        """Incorporate new observations, re-filter and retrain
        (reference ``ask_tell_optimization.py:634-729``).

        With ``track_data=True`` (default) ``new_data`` holds only the NEW observations
        and is appended; with ``track_data=False`` the caller owns the data and passes
        the FULL updated datasets, which replace the internal ones (the reference's
        index-inference bookkeeping, ``:670-703``, is subsumed by the rules'
        ``filter_datasets`` re-masking).
        """
        if isinstance(new_data, Dataset):
            new_data = {OBJECTIVE: new_data}
        new_data = dict(new_data)
        unknown = set(new_data.keys()) - set(self._datasets.keys())
        if unknown:
            # every told tag must address an existing dataset: accepting a localized
            # tag whose base merely exists would silently drop the observations
            raise ValueError(
                f"Unknown tag(s) {unknown!r} in new data; expected keys "
                f"{self._datasets.keys()}"
            )
        for tag, ds in new_data.items():
            if self._track_data:
                self._datasets[tag] = self._datasets[tag] + ds
            else:
                self._datasets[tag] = ds
        filtered = self._acquisition_rule.filter_datasets(self._models, self._datasets)
        if callable(filtered):
            self._acquisition_state, filtered = filtered(self._acquisition_state)
        self._filtered_datasets = dict(filtered)
        for tag, model in self._models.items():
            self.update_model(model, self._dataset_for_tag(tag))
        from .logging import flush_deferred_summaries

        # drain hot-path summaries queued during ask(): tell() already synchronizes
        # with the device through the new observations, so this adds no extra fetch
        flush_deferred_summaries()


class AskTellOptimizer(AskTellOptimizerABC[StateType]):
    """Ask/Tell with model updating and hyperparameter training
    (reference ``ask_tell_optimization.py:738-747``)."""

    def update_model(self, model: TrainableProbabilisticModel, dataset: Dataset) -> None:
        model.update(dataset)
        optimize_model_and_save_result(model, dataset)


class AskTellOptimizerNoTraining(AskTellOptimizerABC[StateType]):
    """Ask/Tell that never retrains models (reference ``ask_tell_optimization.py:749-756``)."""

    def update_model(self, model: TrainableProbabilisticModel, dataset: Dataset) -> None:
        pass
