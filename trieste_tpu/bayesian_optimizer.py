"""The closed-loop Bayesian optimizer.

TPU-native rebuild of the reference ``trieste/bayesian_optimizer.py`` (1207 LoC). The
loop itself is a host driver — control must leave the device at the observer boundary —
but everything inside a step (acquisition build, optimization, model training, dataset
append) runs as jitted device programs over pytree state. Loop state (datasets, model
parameter pytrees, acquisition state, PRNG key) is checkpointable via pickle per step,
like the reference's dill ``Record`` protocol (``bayesian_optimizer.py:101-183``).
"""
from __future__ import annotations

import copy
import pickle
import traceback
from dataclasses import dataclass
from pathlib import Path
from typing import (
    Callable,
    Generic,
    Mapping,
    MutableMapping,
    Optional,
    Sequence,
    Tuple,
    TypeVar,
    Union,
)

import jax
import jax.numpy as jnp
import numpy as np

from .data import Dataset
from .logging import (
    flush_deferred_summaries,
    get_tensorboard_writer,
    scalar,
    set_step_number,
    text,
)
from .models.interfaces import ProbabilisticModel, TrainableProbabilisticModel
from .observer import OBJECTIVE, Observer
from .space import SearchSpace
from .types import State, Tag, TensorType
from .utils.misc import Err, LocalizedTag, Ok, Result, Timer, ignoring_local_tags, map_values

StateType = TypeVar("StateType")
TrainableProbabilisticModelType = TypeVar(
    "TrainableProbabilisticModelType", bound=TrainableProbabilisticModel
)

EarlyStopCallback = Callable[
    [Mapping[Tag, Dataset], Mapping[Tag, ProbabilisticModel], Optional[object]], bool
]


@dataclass(frozen=True)
class Record(Generic[StateType]):
    """Container for the data, models and acquisition state at a BO step
    (reference ``bayesian_optimizer.py:101-139``)."""

    datasets: Mapping[Tag, Dataset]
    models: Mapping[Tag, ProbabilisticModel]
    acquisition_state: Optional[StateType]

    @property
    def dataset(self) -> Dataset:
        """The single dataset, if there is exactly one (ignoring local tags)."""
        datasets = ignoring_local_tags(self.datasets)
        if len(datasets) == 1:
            return next(iter(datasets.values()))
        raise ValueError(f"expected a single dataset, found {len(datasets)}")

    @property
    def model(self) -> ProbabilisticModel:
        models = ignoring_local_tags(self.models)
        if len(models) == 1:
            return next(iter(models.values()))
        raise ValueError(f"expected a single model, found {len(models)}")

    def save(self, path: Union[str, Path]) -> "FrozenRecord[StateType]":
        """Pickle this record to disk (reference ``bayesian_optimizer.py:134-139``)."""
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self, f)
        return FrozenRecord(Path(path))


@dataclass(frozen=True)
class FrozenRecord(Generic[StateType]):
    """A lazily-loaded on-disk record (reference ``bayesian_optimizer.py:142-182``)."""

    path: Path

    def load(self) -> Record[StateType]:
        with open(self.path, "rb") as f:
            return pickle.load(f)

    @property
    def datasets(self) -> Mapping[Tag, Dataset]:
        return self.load().datasets

    @property
    def models(self) -> Mapping[Tag, ProbabilisticModel]:
        return self.load().models

    @property
    def acquisition_state(self) -> Optional[StateType]:
        return self.load().acquisition_state

    @property
    def dataset(self) -> Dataset:
        return self.load().dataset

    @property
    def model(self) -> ProbabilisticModel:
        return self.load().model


class OptimizationResult(Generic[StateType]):
    """The result of a BO run: a final :class:`Record` (or error) plus the step history
    (reference ``bayesian_optimizer.py:187-346``)."""

    STEP_GLOB = "step.*.pickle"
    RESULTS_FILENAME = "results.pickle"

    def __init__(
        self,
        final_result: Result[Record[StateType]],
        history: Sequence[Union[Record[StateType], FrozenRecord[StateType]]],
    ):
        self.final_result = final_result
        self.history = list(history)

    def astuple(
        self,
    ) -> Tuple[
        Result[Record[StateType]],
        Sequence[Union[Record[StateType], FrozenRecord[StateType]]],
    ]:
        return self.final_result, self.history

    @property
    def is_ok(self) -> bool:
        return self.final_result.is_ok

    @property
    def is_err(self) -> bool:
        return self.final_result.is_err

    def try_get_final_datasets(self) -> Mapping[Tag, Dataset]:
        """(reference ``bayesian_optimizer.py:243-256``)"""
        return self.final_result.unwrap().datasets

    def try_get_final_dataset(self) -> Dataset:
        return self.final_result.unwrap().dataset

    def try_get_final_models(self) -> Mapping[Tag, ProbabilisticModel]:
        return self.final_result.unwrap().models

    def try_get_final_model(self) -> ProbabilisticModel:
        return self.final_result.unwrap().model

    def try_get_optimal_point(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Return (query point, observation, index) of the minimum observation
        (reference ``bayesian_optimizer.py:288-302``)."""
        dataset = self.try_get_final_dataset()
        if dataset.num_outputs != 1:
            raise ValueError("expected a single objective")
        qp, obs = dataset.astuple()
        idx = jnp.argmin(obs[:, 0])
        return qp[idx], obs[idx], idx

    @staticmethod
    def step_filename(step: int, num_steps: int) -> str:
        """(reference ``bayesian_optimizer.py:206-212``)"""
        return f"step.{step:0{len(str(num_steps - 1))}d}.pickle"

    def save_result(self, path: Union[str, Path]) -> None:
        """Pickle the final result only (reference ``bayesian_optimizer.py:316-320``)."""
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self.final_result, f)

    def save(self, base_path: Union[str, Path]) -> None:
        """Save the whole result to a directory (reference ``bayesian_optimizer.py:322-329``)."""
        base = Path(base_path)
        base.mkdir(parents=True, exist_ok=True)
        self.save_result(base / self.RESULTS_FILENAME)
        for i, record in enumerate(self.history):
            if isinstance(record, FrozenRecord):
                continue
            record.save(base / self.step_filename(i, len(self.history)))

    @classmethod
    def from_path(cls, base_path: Union[str, Path]) -> "OptimizationResult[StateType]":
        """Load a saved result (reference ``bayesian_optimizer.py:331-346``)."""
        base = Path(base_path)
        try:
            with open(base / cls.RESULTS_FILENAME, "rb") as f:
                final_result = pickle.load(f)
        except FileNotFoundError as e:
            final_result = Err(e)
        history = [FrozenRecord(p) for p in sorted(base.glob(cls.STEP_GLOB))]
        return cls(final_result, history)


class BayesianOptimizer(Generic[StateType]):
    """The main closed-loop optimizer (reference ``bayesian_optimizer.py:349-883``)."""

    def __init__(self, observer: Observer, search_space: SearchSpace):
        self._observer = observer
        self._search_space = search_space

    def __repr__(self) -> str:
        return f"BayesianOptimizer({self._observer!r}, {self._search_space!r})"

    def optimize(
        self,
        num_steps: int,
        datasets: Union[Mapping[Tag, Dataset], Dataset],
        models: Union[Mapping[Tag, TrainableProbabilisticModel], TrainableProbabilisticModel],
        acquisition_rule: Optional[object] = None,
        acquisition_state: Optional[StateType] = None,
        *,
        track_state: bool = True,
        track_path: Optional[Union[str, Path]] = None,
        fit_model: bool = True,
        fit_initial_model: bool = True,
        early_stop_callback: Optional[EarlyStopCallback] = None,
        start_step: int = 0,
        key: Optional[jax.Array] = None,
    ) -> OptimizationResult[StateType]:
        """Run the BO loop (semantics follow reference ``bayesian_optimizer.py:570-883``):
        per step {early-stop check → record state → rule.acquire (State protocol) →
        observer → dataset append → rule.filter_datasets → model update+optimize →
        summaries}, catching all exceptions into an ``Err`` result carrying the history."""
        if isinstance(datasets, Dataset):
            datasets = {OBJECTIVE: datasets}
            models = {OBJECTIVE: models}  # type: ignore[dict-item]
        datasets = dict(datasets)
        models = dict(models)
        if num_steps < 0:
            raise ValueError(f"num_steps must be at least 0, got {num_steps}")
        dataset_globals = {LocalizedTag.from_tag(t).global_tag for t in datasets}
        model_globals = {LocalizedTag.from_tag(t).global_tag for t in models}
        if dataset_globals != model_globals:
            raise ValueError(
                f"datasets and models should cover the same global tags. Got "
                f"{datasets.keys()} and {models.keys()} respectively."
            )
        if not datasets:
            raise ValueError("dicts of datasets and models must be populated.")
        if acquisition_rule is None:
            if datasets.keys() != {OBJECTIVE}:
                raise ValueError(
                    f"Default acquisition requires the single key {OBJECTIVE!r}, "
                    f"got keys {datasets.keys()}"
                )
            from .acquisition.rule import EfficientGlobalOptimization

            acquisition_rule = EfficientGlobalOptimization()
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(2**31))

        history: list[Union[Record[StateType], FrozenRecord[StateType]]] = []
        # sizes at entry: rows up to these counts are plotted as "initial" in the
        # pairplot summaries (role of the reference's observation_plot_dfs,
        # bayesian_optimizer.py:977-1006)
        initial_counts = {
            tag: int(ds.num_points) for tag, ds in datasets.items()
        }
        writer = get_tensorboard_writer()
        if writer is not None:
            text(
                "metadata",
                f"Observer: {self._observer}\nSearch space: {self._search_space}\n"
                f"Devices: {jax.devices()}",
            )

        from .acquisition.rule import LocalDatasetsAcquisitionRule

        is_local_rule = isinstance(acquisition_rule, LocalDatasetsAcquisitionRule)

        step = start_step
        try:
            if is_local_rule and start_step == 0:
                from .acquisition.utils import with_local_datasets

                acquisition_rule.initialize_subspaces(self._search_space)
                datasets = dict(
                    with_local_datasets(datasets, acquisition_rule.num_local_datasets)
                )
            filtered_datasets = acquisition_rule.filter_datasets(models, datasets)
            if callable(filtered_datasets):
                acquisition_state, filtered_datasets = filtered_datasets(acquisition_state)
            filtered_datasets = dict(filtered_datasets)

            if fit_model and fit_initial_model and start_step == 0:
                with Timer() as initial_model_fitting_timer:
                    for tag, model in models.items():
                        tag_data = filtered_datasets.get(tag, None)
                        if tag_data is None:
                            _, tag_data = _match_tag(filtered_datasets, tag)
                        model.update(tag_data)
                        optimize_model_and_save_result(model, tag_data)
                if writer is not None:
                    with _step_ctx(-1):
                        scalar(
                            "wallclock/model_fitting", initial_model_fitting_timer.time
                        )

            for step in range(start_step + 1, num_steps + 1):
                set_step_number(step)
                if early_stop_callback and early_stop_callback(
                    datasets, models, acquisition_state
                ):
                    break
                if track_state:
                    try:
                        record = Record(
                            copy.deepcopy(datasets),
                            copy.deepcopy(models),
                            copy.deepcopy(acquisition_state),
                        )
                        if track_path is None:
                            history.append(record)
                        else:
                            track_path = Path(track_path)
                            history.append(
                                record.save(
                                    track_path / OptimizationResult.step_filename(
                                        step, num_steps
                                    )
                                )
                            )
                    except Exception as e:
                        raise NotImplementedError(
                            "Failed to save the optimization state; pass "
                            "track_state=False to disable tracking"
                        ) from e

                with Timer() as total_step_wallclock_timer:
                    key, acquire_key = jax.random.split(key)
                    with Timer() as query_point_generation_timer:
                        points_or_stateful = acquisition_rule.acquire(
                            self._search_space, models, datasets=filtered_datasets,
                            key=acquire_key,
                        )
                        if callable(points_or_stateful):
                            acquisition_state, query_points = points_or_stateful(
                                acquisition_state
                            )
                        else:
                            query_points = points_or_stateful

                    with Timer() as observation_timer:
                        observer_output = self._call_observer(query_points)
                        tagged_output = (
                            observer_output
                            if isinstance(observer_output, Mapping)
                            else {OBJECTIVE: observer_output}
                        )
                        for tag in datasets:
                            ltag = LocalizedTag.from_tag(tag)
                            if tag in tagged_output:
                                new_data = tagged_output[tag]
                            elif ltag.global_tag in tagged_output and not ltag.is_local:
                                new_data = tagged_output[ltag.global_tag]
                            else:
                                continue
                            datasets[tag] = datasets[tag] + new_data

                    filtered_datasets = acquisition_rule.filter_datasets(models, datasets)
                    if callable(filtered_datasets):
                        acquisition_state, filtered_datasets = filtered_datasets(
                            acquisition_state
                        )
                    filtered_datasets = dict(filtered_datasets)

                    with Timer() as model_fitting_timer:
                        if fit_model:
                            for tag, model in models.items():
                                tag_data = filtered_datasets.get(tag)
                                if tag_data is None:
                                    _, tag_data = _match_tag(filtered_datasets, tag)
                                model.update(tag_data)
                                optimize_model_and_save_result(model, tag_data)

                if writer is not None:
                    write_summary_observations(
                        datasets, models, tagged_output, model_fitting_timer,
                        initial_counts,
                    )
                    write_summary_query_points(datasets, initial_counts)
                    scalar("wallclock/step", total_step_wallclock_timer.time)
                    scalar(
                        "wallclock/query_point_generation",
                        query_point_generation_timer.time,
                    )
                    scalar("wallclock/observation", observation_timer.time)
                    # drain hot-path summaries queued during acquire/optimize: the
                    # device values they fetch are already resolved by the observer
                    # round-trip, so this adds no extra sync
                    flush_deferred_summaries()

        except Exception as error:  # noqa: BLE001
            tb = traceback.format_exc()
            print(tb)
            print(f"Optimization failed at step {step}, encountered error: {error}")
            if isinstance(error, MemoryError):
                print(
                    "\nOne possible cause of memory errors is trying to evaluate "
                    "acquisition functions over large candidate sets; consider wrapping "
                    "your acquisition optimizer with split_acquisition_function_calls "
                    "to evaluate in chunks."
                )
            return OptimizationResult(Err(error), history)

        record = Record(datasets, models, acquisition_state)
        return OptimizationResult(Ok(record), history)

    def continue_optimization(
        self,
        num_steps: int,
        previous_result: OptimizationResult[StateType],
        **kwargs: object,
    ) -> OptimizationResult[StateType]:
        """Resume from a previous result's final record or last history entry
        (reference ``bayesian_optimizer.py:885-928``)."""
        if previous_result.is_ok:
            record: Record[StateType] = previous_result.final_result.unwrap()
            start_step = len(previous_result.history)
        elif previous_result.history:
            last = previous_result.history[-1]
            record = last.load() if isinstance(last, FrozenRecord) else last
            start_step = len(previous_result.history) - 1
        else:
            raise ValueError("previous_result has neither a final result nor history")
        result = self.optimize(
            num_steps,
            dict(record.datasets),
            dict(record.models),  # type: ignore[arg-type]
            acquisition_state=record.acquisition_state,
            start_step=start_step,
            **kwargs,  # type: ignore[arg-type]
        )
        result.history = list(previous_result.history[:start_step]) + list(result.history)
        return result

    def _call_observer(self, query_points: TensorType):
        qp = jnp.asarray(query_points)
        if qp.ndim == 3:
            from .objectives.utils import mk_batch_observer

            return mk_batch_observer(self._observer)(qp)
        return self._observer(qp)


def _match_tag(datasets: Mapping[Tag, Dataset], tag: Tag) -> Tuple[Tag, Dataset]:
    """Find data for a tag, falling back from local to global (reference uses
    get_value_for_tag with local-tag fallbacks)."""
    ltag = LocalizedTag.from_tag(tag)
    for candidate in (tag, ltag.global_tag):
        if candidate in datasets:
            return candidate, datasets[candidate]
    raise ValueError(f"no dataset found for tag {tag!r}")


def optimize_model_and_save_result(model, dataset: Dataset):
    """Train a model, logging the result (reference ``models/utils.py:125-132``)."""
    result = model.optimize(dataset)
    if get_tensorboard_writer() is not None and hasattr(result, "loss"):
        from .logging import deferred_scalar

        deferred_scalar("model.training_loss", result.loss)
    return result


def write_summary_observations(
    datasets: Mapping[Tag, Dataset],
    models: Mapping[Tag, ProbabilisticModel],
    tagged_output: Mapping[Tag, Dataset],
    model_fitting_timer: Timer,
    initial_counts: Optional[Mapping[Tag, int]] = None,
) -> None:
    """Log per-tag model internals, best/new observations (per output dimension) and,
    for multi-output tags, an observation pairplot figure with non-dominated points
    highlighted (reference ``bayesian_optimizer.py:1009-1106``)."""
    from .logging import deferred_histogram, deferred_scalar, include_summary, pyplot

    for tag, dataset in ignoring_local_tags(datasets).items():
        obs_dev = dataset.trimmed_observations  # stays on device; no eager fetch
        if obs_dev.shape[0] == 0:
            continue
        model = models.get(tag)
        if model is not None and hasattr(model, "log"):
            try:
                model.log(dataset)
            except Exception:  # noqa: BLE001 - diagnostics must not kill the loop
                pass
        L = obs_dev.shape[-1]
        new_obs_dev = (
            tagged_output[tag].trimmed_observations
            if tag in tagged_output
            else jnp.zeros((0, L))
        )
        for i in range(L):
            suffix = f"[{i}]" if L > 1 else ""
            if new_obs_dev.shape[0]:
                deferred_histogram(
                    f"{tag}.observation{suffix}/new_observations", new_obs_dev[..., i]
                )
                deferred_scalar(
                    f"{tag}.observation{suffix}/best_new_observation",
                    jnp.min(new_obs_dev[..., i]),
                )
            deferred_scalar(
                f"{tag}.observation{suffix}/best_overall", jnp.min(obs_dev[..., i])
            )
        if L >= 2 and include_summary(f"{tag}.observations/_pairplot"):
            obs = np.asarray(obs_dev)
            new_obs = np.asarray(new_obs_dev)
            try:
                from .acquisition.multi_objective.dominance import non_dominated
                from .experimental.plotting.pairplot import (
                    observation_groups,
                    pairplot,
                )

                n_init = min((initial_counts or {}).get(tag, 0), obs.shape[0])
                n_new = min(new_obs.shape[0], obs.shape[0] - n_init)
                n_old = obs.shape[0] - n_init - n_new
                _, nd_mask = non_dominated(jnp.asarray(obs))
                fig = pairplot(
                    obs,
                    observation_groups(n_init, n_old, n_new, np.asarray(nd_mask)),
                )
                pyplot(f"{tag}.observations/_pairplot", fig)
            except Exception:  # noqa: BLE001
                pass
    scalar("wallclock/model_fitting", model_fitting_timer.time)


def write_summary_query_points(
    datasets: Mapping[Tag, Dataset],
    initial_counts: Optional[Mapping[Tag, int]] = None,
) -> None:
    """Log per-input-dimension query-point histograms and (for D>=2) a query-point
    pairplot (reference ``bayesian_optimizer.py:1109-1157``)."""
    from .logging import deferred_histogram, include_summary, pyplot

    for tag, dataset in ignoring_local_tags(datasets).items():
        qp_dev = dataset.trimmed_query_points  # device; fetched at the step flush
        if qp_dev.shape[0] == 0:
            continue
        for i in range(qp_dev.shape[-1]):
            deferred_histogram(f"{tag}.query_points/[{i}]", qp_dev[:, i])
        if qp_dev.shape[-1] >= 2 and include_summary(f"{tag}.query_points/_pairplot"):
            qp = np.asarray(qp_dev)
            try:
                from .experimental.plotting.pairplot import (
                    observation_groups,
                    pairplot,
                )

                n_init = min((initial_counts or {}).get(tag, 0), qp.shape[0])
                fig = pairplot(
                    qp, observation_groups(n_init, qp.shape[0] - n_init, 0)
                )
                pyplot(f"{tag}.query_points/_pairplot", fig)
            except Exception:  # noqa: BLE001
                pass


class _step_ctx:
    def __init__(self, step: int):
        self._step = step

    def __enter__(self):
        from .logging import get_step_number, set_step_number

        self._old = get_step_number()
        set_step_number(max(self._step, 0))

    def __exit__(self, *args):
        set_step_number(self._old)


def stop_at_minimum(
    minimum: Optional[TensorType] = None,
    minimizers: Optional[TensorType] = None,
    minimum_rtol: float = 0.005,
    minimum_atol: float = 0.0,
    minimizers_atol: float = 1e-5,
    minimizers_rtol: float = 0.0,
) -> EarlyStopCallback:
    """Early-stop callback: stop once the best observation is close to the known minimum
    or the best point close to a known minimizer (reference
    ``bayesian_optimizer.py:1160-1207``)."""

    def callback(
        datasets: Mapping[Tag, Dataset],
        _models: Mapping[Tag, ProbabilisticModel],
        _state: Optional[object],
    ) -> bool:
        tagged = ignoring_local_tags(datasets)
        if OBJECTIVE not in tagged:
            return False
        qp, obs = tagged[OBJECTIVE].astuple()
        if obs.shape[0] == 0:
            return False
        idx = int(jnp.argmin(obs[:, 0]))
        best_y = np.asarray(obs[idx, 0])
        best_x = np.asarray(qp[idx])
        if minimum is not None and np.allclose(
            best_y, np.asarray(minimum), rtol=minimum_rtol, atol=minimum_atol
        ):
            return True
        if minimizers is not None:
            mins = np.asarray(minimizers)
            if np.any(
                np.all(
                    np.isclose(best_x, mins, rtol=minimizers_rtol, atol=minimizers_atol),
                    axis=-1,
                )
            ):
                return True
        return False

    return callback
