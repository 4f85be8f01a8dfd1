"""Batch trust-region acquisition rules.

TPU-native rebuild of the reference trust-region framework
(``trieste/acquisition/rule.py:997-2625``): updatable regions, the stateful
:class:`BatchTrustRegion` rule, and the Box-region family (vanilla hypercube regions,
TREGO's global/local alternation, TuRBO). Region geometry lives in jnp arrays inside
light object shells; the compute-heavy part of a step — acquiring V points over the
region fleet — runs as ONE vectorized acquisition over a
:class:`~trieste_tpu.space.TaggedMultiSearchSpace` (the V axis is a vmap/shard axis),
matching §2.10 of SURVEY.md rather than the reference's per-object Python loops.

State management follows the reference exactly: ``acquire`` returns a ``State`` callable
producing ``[B, V, D]`` points, and ``filter_datasets`` is the state-returning step that
initializes/updates regions and re-masks the per-region local datasets
(``rule.py:1501-1566``).
"""
from __future__ import annotations

import copy
from dataclasses import dataclass
from typing import Callable, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data import Dataset
from ..models.interfaces import ProbabilisticModel
from ..observer import OBJECTIVE
from ..space import (
    Box,
    CategoricalSearchSpace,
    DiscreteSearchSpace,
    GeneralDiscreteSearchSpace,
    SearchSpace,
    TaggedMultiSearchSpace,
    TaggedProductSearchSpace,
)
from ..types import Tag, TensorType
from ..utils.misc import LocalizedTag, get_value_for_tag
from .rule import AcquisitionRule, EfficientGlobalOptimization, LocalDatasetsAcquisitionRule


class UpdatableTrustRegion(SearchSpace):
    """A search (sub)space that updates itself from models/datasets
    (reference ``UpdatableSearchSpace``/``UpdatableTrustRegion``, ``rule.py:997-1232``)."""

    def __init__(self, region_index: Optional[int] = None):
        self.region_index = region_index
        self.input_active_dims: Optional[Tuple[int, int]] = None  # (start, end) slice

    def with_input_active_dims(self, x: TensorType) -> jax.Array:
        """Slice this region's active input columns (reference ``input_active_dims``,
        ``rule.py:1106-1165``) — used by product regions over mixed spaces."""
        x = jnp.asarray(x)
        if self.input_active_dims is None:
            return x
        lo, hi = self.input_active_dims
        return x[..., lo:hi]

    @property
    def requires_initialization(self) -> bool:
        """Whether the region wants re-initialization rather than update this step."""
        return False

    def initialize(
        self,
        models: Optional[Mapping[Tag, ProbabilisticModel]] = None,
        datasets: Optional[Mapping[Tag, Dataset]] = None,
    ) -> None:
        raise NotImplementedError

    def update(
        self,
        models: Optional[Mapping[Tag, ProbabilisticModel]] = None,
        datasets: Optional[Mapping[Tag, Dataset]] = None,
    ) -> None:
        raise NotImplementedError

    def dataset_filter_mask(self, global_ds: Dataset) -> jax.Array:
        """Row mask of the global dataset that this region's local dataset keeps
        (reference ``get_datasets_filter_mask``, ``rule.py:1186-1210``). Default:
        region membership. TREGO overrides to keep the full dataset."""
        qp = self.with_input_active_dims(global_ds.query_points)
        return self.contains(qp) & global_ds.mask

    def _get_tagged_dataset(
        self, datasets: Optional[Mapping[Tag, Dataset]]
    ) -> Optional[Dataset]:
        """The objective dataset for this region, preferring the localized tag
        (reference ``select_in_region`` semantics, ``rule.py:1106-1165``)."""
        if datasets is None:
            return None
        if self.region_index is not None:
            local = LocalizedTag(OBJECTIVE, self.region_index)
            if local in datasets:
                return datasets[local]
        _, ds = get_value_for_tag(datasets, OBJECTIVE)
        return ds


@dataclass(frozen=True)
class BatchTrustRegionState:
    """Acquisition state holding the region fleet (reference ``BatchTrustRegionState``,
    ``rule.py:1240-1258``)."""

    subspaces: Tuple[UpdatableTrustRegion, ...]

    @property
    def acquisition_space(self) -> TaggedMultiSearchSpace:
        return TaggedMultiSearchSpace(list(self.subspaces))


class BatchTrustRegion(
    LocalDatasetsAcquisitionRule[
        Callable[
            [Optional[BatchTrustRegionState]],
            Tuple[Optional[BatchTrustRegionState], jax.Array],
        ],
        SearchSpace,
        ProbabilisticModel,
    ]
):
    """Base rule running a base acquisition rule over a fleet of trust regions
    (reference ``rule.py:1261-1566``).

    With a single base rule the regions are searched **vectorized** (one EGO call over the
    ``TaggedMultiSearchSpace``); with one rule per region they are searched sequentially
    with local→global tag remapping (reference ``rule.py:1417-1435``).
    """

    def __init__(
        self,
        init_subspaces: Union[None, int, Sequence[UpdatableTrustRegion]] = None,
        rule: Union[None, AcquisitionRule, Sequence[AcquisitionRule]] = None,
    ):
        self._init_subspaces: Optional[Tuple[UpdatableTrustRegion, ...]]
        if init_subspaces is None or isinstance(init_subspaces, int):
            self._num_regions = init_subspaces or 1
            self._init_subspaces = None
        else:
            self._init_subspaces = tuple(init_subspaces)
            self._num_regions = len(self._init_subspaces)
            for i, s in enumerate(self._init_subspaces):
                s.region_index = i
        self._rule = rule
        self._subspaces: Optional[Tuple[UpdatableTrustRegion, ...]] = None
        self._initialized = False

    @property
    def num_local_datasets(self) -> int:
        return self._num_regions

    def _make_default_subspaces(
        self, search_space: SearchSpace
    ) -> Tuple[UpdatableTrustRegion, ...]:
        raise NotImplementedError

    def _make_default_rule(self) -> AcquisitionRule:
        """Heuristic default base rule (reference ``rule.py:1354-1362``)."""
        from .function.function import MultipleOptimismNegativeLowerConfidenceBound

        return EfficientGlobalOptimization(
            MultipleOptimismNegativeLowerConfidenceBound(self._global_search_space),
            num_query_points=self._num_regions,
        )

    def initialize_subspaces(self, search_space: SearchSpace) -> None:
        """(reference ``rule.py:1335-1352``)"""
        self._global_search_space = search_space
        if self._subspaces is None:
            if self._init_subspaces is None:
                self._subspaces = self._make_default_subspaces(search_space)
            else:
                self._subspaces = self._init_subspaces
            self._num_regions = len(self._subspaces)
        if self._rule is None:
            self._rule = self._make_default_rule()

    def acquire(
        self,
        search_space: SearchSpace,
        models: Mapping[Tag, ProbabilisticModel],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
        key: Optional[jax.Array] = None,
    ):
        if self._subspaces is None:
            self.initialize_subspaces(search_space)
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(2**31))

        def state_func(
            state: Optional[BatchTrustRegionState],
        ) -> Tuple[Optional[BatchTrustRegionState], jax.Array]:
            subspaces = state.subspaces if state is not None else self._subspaces
            acq_space = TaggedMultiSearchSpace(list(subspaces))
            if isinstance(self._rule, (list, tuple)):
                # sequential per-region path with local tags exposed as global
                points = []
                keys = jax.random.split(key, len(subspaces))
                for i, (subspace, rule_i) in enumerate(zip(subspaces, self._rule)):
                    local_models = _select_local(models, i)
                    local_datasets = _select_local(datasets, i) if datasets else None
                    pts = rule_i.acquire(
                        subspace, local_models, local_datasets, key=keys[i]
                    )
                    points.append(pts)
                qp = jnp.stack(points, axis=1)  # [B, V, D]
            else:
                pts = self._rule.acquire(acq_space, models, datasets, key=key)
                qp = jnp.reshape(pts, (-1, len(subspaces), pts.shape[-1]))
            return BatchTrustRegionState(tuple(subspaces)), qp

        return state_func

    def filter_datasets(
        self,
        models: Mapping[Tag, ProbabilisticModel],
        datasets: Mapping[Tag, Dataset],
    ):
        """The state-returning region update + local-dataset re-masking step
        (reference ``rule.py:1501-1566``)."""

        def state_func(
            state: Optional[BatchTrustRegionState],
        ) -> Tuple[Optional[BatchTrustRegionState], Mapping[Tag, Dataset]]:
            subspaces = (
                state.subspaces if state is not None and state.subspaces else self._subspaces
            )
            assert subspaces is not None
            for subspace in subspaces:
                if not self._initialized or subspace.requires_initialization:
                    subspace.initialize(models, datasets)
                else:
                    subspace.update(models, datasets)
            self._initialized = True
            self._subspaces = tuple(subspaces)

            # re-mask local datasets to their regions (reference :1535-1561),
            # device-resident: the local dataset keeps the GLOBAL padded capacity and
            # only permutes rows / shrinks num_points, so downstream jits (model fit,
            # posterior cache) see a stable shape across steps even as region
            # membership fluctuates — no per-step recompilation
            filtered: dict[Tag, Dataset] = {}
            for tag, dataset in datasets.items():
                ltag = LocalizedTag.from_tag(tag)
                if not ltag.is_local:
                    filtered[tag] = dataset
            for tag, dataset in datasets.items():
                ltag = LocalizedTag.from_tag(tag)
                if ltag.is_local:
                    global_ds = filtered.get(ltag.global_tag, dataset)
                    region = subspaces[ltag.local_index]
                    inside = region.dataset_filter_mask(global_ds)
                    local_ds = _mask_to_region(global_ds, inside)
                    if int(local_ds.num_points) == 0:
                        # a freshly (re)initialized region may contain no observations
                        # yet; fall back to the full dataset so models/acquisitions
                        # remain buildable until the region collects its own points
                        filtered[tag] = global_ds
                    else:
                        filtered[tag] = local_ds
            return BatchTrustRegionState(tuple(subspaces)), filtered

        return state_func


def _is_improvement(y_new: float, y_min: float, kappa_margin: float) -> bool:
    """Inf-safe success test: ``y_new < y_min - kappa_margin`` when ``y_min`` is
    finite; any finite ``y_new`` improves on an empty (``y_min = inf``) region.
    Guards against ``inf - kappa*abs(inf) = nan``, which compares False forever."""
    if not np.isfinite(y_min):
        return bool(np.isfinite(y_new))
    return bool(y_new < y_min - kappa_margin)


@jax.jit
def _mask_to_region(global_ds: Dataset, inside: jax.Array) -> Dataset:
    """Restrict a padded dataset to the rows where ``inside`` holds, at unchanged
    capacity: a stable partition moves member rows to the front (preserving insertion
    order) and ``num_points`` drops to the member count. One compiled program per
    capacity bucket, reused by every region on every step."""
    order = jnp.argsort(~inside, stable=True)  # members first, original order kept
    return Dataset(
        global_ds.query_points[order],
        global_ds.observations[order],
        jnp.sum(inside).astype(jnp.int32),
    )


def _select_local(mapping: Mapping[Tag, object], index: int) -> dict[Tag, object]:
    """Remap region-local tags to their global names for a per-region rule
    (reference ``rule.py:1423-1433``)."""
    out: dict[Tag, object] = {}
    for tag, value in mapping.items():
        ltag = LocalizedTag.from_tag(tag)
        if ltag.is_local and ltag.local_index == index:
            out[ltag.global_tag] = value
        elif not ltag.is_local and ltag.global_tag not in out:
            out.setdefault(tag, value)
    return out


# ---------------------------------------------------------------------------------
# Box regions (reference rule.py:1569-2218)
# ---------------------------------------------------------------------------------


class UpdatableTrustRegionBox(Box, UpdatableTrustRegion):
    """A box trust region inside a global box (reference ``rule.py:1780-1820``)."""

    def __init__(self, global_search_space: Box, region_index: Optional[int] = None):
        self._global_search_space = global_search_space
        Box.__init__(self, global_search_space.lower, global_search_space.upper)
        UpdatableTrustRegion.__init__(self, region_index)

    @property
    def global_search_space(self) -> Box:
        return self._global_search_space

    def _set_bounds(self, lower: jax.Array, upper: jax.Array) -> None:
        self._lower = lower
        self._upper = upper


class SingleObjectiveTrustRegionBox(UpdatableTrustRegionBox):
    """Classic hypercube trust region with success/failure eps-scaling
    (reference ``HypercubeTrustRegion`` ``rule.py:1569-1777`` +
    ``SingleObjectiveTrustRegionBox`` ``rule.py:1823-1860``).

    * success (min observation improved by more than ``kappa``-relative): move the
      location to the best point and expand ``eps`` by ``1/beta``;
    * failure: shrink ``eps`` by ``beta``;
    * ``eps`` below ``min_eps``: flag for re-initialization at a random location.
    """

    def __init__(
        self,
        global_search_space: Box,
        beta: float = 0.7,
        kappa: float = 1e-4,
        zeta: float = 0.5,
        min_eps: float = 1e-2,
        region_index: Optional[int] = None,
        *,
        key: Optional[jax.Array] = None,
    ):
        super().__init__(global_search_space, region_index)
        self._beta = beta
        self._kappa = kappa
        self._zeta = zeta
        self._min_eps = min_eps
        self._key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(2**31)
        )
        self._needs_init = True
        self._region_initialized = False
        self._y_min = np.inf
        self.location: Optional[jax.Array] = None
        self.eps: Optional[jax.Array] = None

    @property
    def requires_initialization(self) -> bool:
        return self._needs_init

    def _resize_bounds(self) -> None:
        g = self.global_search_space
        lower = jnp.maximum(self.location - self.eps, g.lower)
        upper = jnp.minimum(self.location + self.eps, g.upper)
        self._set_bounds(lower, upper)

    def _region_min(
        self, datasets: Optional[Mapping[Tag, Dataset]]
    ) -> Tuple[Optional[jax.Array], float]:
        """Best (point, value) among observations inside the region."""
        ds = self._get_tagged_dataset(datasets)
        if ds is None or len(ds) == 0:
            return None, np.inf
        qp, obs = ds.astuple()
        qp = self.with_input_active_dims(qp)
        inside = np.asarray(Box.contains(self, qp))
        if not inside.any():
            return None, np.inf
        qp_in, obs_in = np.asarray(qp)[inside], np.asarray(obs)[inside, 0]
        idx = int(np.argmin(obs_in))
        return jnp.asarray(qp_in[idx]), float(obs_in[idx])

    def initialize(self, models=None, datasets=None) -> None:
        g = self.global_search_space
        self._key, sub = jax.random.split(self._key)
        self.location = g.sample(sub, 1)[0]
        self.eps = self._zeta * (g.upper - g.lower)
        self._resize_bounds()
        # no data observed for this fresh region yet: force the first update to be a
        # success so the location recentres on the best point (reference
        # ``HypercubeTrustRegion.__init__``/``initialize``, ``rule.py:1664-1667``)
        self._y_min = np.inf
        self._region_initialized = True
        self._needs_init = False

    def _step_success(self, y_new: float) -> bool:
        """Improvement beyond ``kappa``-scaled region volume (reference ``rule.py:1694-1695``)."""
        tr_volume = float(jnp.prod(self.upper - self.lower))
        return y_new < self._y_min - self._kappa * tr_volume

    def update(self, models=None, datasets=None) -> None:
        best_point, y_new = self._region_min(datasets)
        if best_point is not None and self._step_success(y_new):
            # success: recentre on the best point and expand
            self.location = best_point
            self.eps = self.eps / self._beta
            self._y_min = y_new
        else:
            self.eps = self.eps * self._beta
        if float(jnp.max(self.eps)) < self._min_eps:
            self._needs_init = True
            self.initialize(models, datasets)
            return
        self._resize_bounds()


class BatchTrustRegionBox(BatchTrustRegion):
    """Batch trust-region rule over box regions (reference ``rule.py:1863-1920``)."""

    def _make_default_subspaces(
        self, search_space: SearchSpace
    ) -> Tuple[UpdatableTrustRegion, ...]:
        return tuple(
            SingleObjectiveTrustRegionBox(
                search_space, region_index=i, key=jax.random.PRNGKey(i)
            )
            for i in range(self._num_regions)
        )


class TREGOBox(SingleObjectiveTrustRegionBox):
    """TREGO: alternate between a global phase (the whole space) and a local
    trust-region phase (reference ``rule.py:1923-2035``, :cite:`diouane2022trego`).

    Reference semantics replicated exactly: success keeps/returns the search global,
    failure *toggles* the phase (global→local, local→global); ``eps`` only changes
    when the completed step was local; the tracked minimum is the **global** dataset
    minimum; the model always sees the full dataset (``get_datasets_filter_mask`` is
    all-true, reference ``rule.py:2004-2023``); the first initialization starts
    global, re-initializations (after ``eps`` collapse) start local."""

    def __init__(self, global_search_space: Box, **kwargs: object):
        super().__init__(global_search_space, **kwargs)  # type: ignore[arg-type]
        self._is_global = True

    @property
    def is_global(self) -> bool:
        return self._is_global

    def _resize_bounds(self) -> None:
        if self._is_global:
            g = self.global_search_space
            self._set_bounds(g.lower, g.upper)
        else:
            super()._resize_bounds()

    def dataset_filter_mask(self, global_ds: Dataset) -> jax.Array:
        # TREGO never filters the dataset: the model is always fit on all points
        # (reference rule.py:2004-2023)
        return global_ds.mask

    def _global_min(
        self, datasets: Optional[Mapping[Tag, Dataset]]
    ) -> Tuple[Optional[jax.Array], float]:
        """Best (point, value) over the FULL dataset (reference ``get_dataset_min``
        with ``in_region_only=False``, ``rule.py:2025-2035``)."""
        ds = self._get_tagged_dataset(datasets)
        if ds is None or len(ds) == 0:
            return None, np.inf
        qp, obs = ds.astuple()
        qp = np.asarray(self.with_input_active_dims(qp))
        obs = np.asarray(obs)[:, 0]
        idx = int(np.argmin(obs))
        return jnp.asarray(qp[idx]), float(obs[idx])

    def initialize(self, models=None, datasets=None) -> None:
        # first initialization starts global; re-initializations start local
        # (reference rule.py:1986-2001: the _update_domain toggle inverts this flag)
        self._is_global = not self._region_initialized
        super().initialize(models, datasets)

    def update(self, models=None, datasets=None) -> None:
        best_point, y_new = self._global_min(datasets)
        success = best_point is not None and self._step_success(y_new)
        if not self._is_global:
            # eps only changes while in the local phase (reference eps setter no-ops
            # in global mode, rule.py:1969-1975)
            self.eps = self.eps / self._beta if success else self.eps * self._beta
        if success:
            self.location = best_point
            self._y_min = y_new
        # phase: success -> global; failure -> toggle (reference rule.py:1979)
        self._is_global = success or not self._is_global
        if float(jnp.max(self.eps)) < self._min_eps:
            self._needs_init = True
            self.initialize(models, datasets)
            return
        self._resize_bounds()


class TURBOBox(UpdatableTrustRegionBox):
    """TuRBO trust region: L doubles after ``success_tolerance`` consecutive successes,
    halves after ``failure_tolerance`` consecutive failures, with lengthscale-shaped box
    widths (reference ``rule.py:2038-2218``)."""

    def __init__(
        self,
        global_search_space: Box,
        L_min: Optional[float] = None,
        L_init: Optional[float] = None,
        L_max: Optional[float] = None,
        success_tolerance: int = 3,
        failure_tolerance: Optional[int] = None,
        region_index: Optional[int] = None,
    ):
        super().__init__(global_search_space, region_index)
        extent = float(jnp.max(global_search_space.upper - global_search_space.lower))
        D = global_search_space.dimension
        self.L_min = L_min if L_min is not None else 0.5**7 * extent
        self.L_init = L_init if L_init is not None else 0.8 * extent
        self.L_max = L_max if L_max is not None else 1.6 * extent
        self.success_tolerance = success_tolerance
        self.failure_tolerance = (
            failure_tolerance if failure_tolerance is not None else max(2, D)
        )
        if success_tolerance <= 0:
            raise ValueError("success tolerance must be an integer greater than 0")
        if self.failure_tolerance <= 0:
            raise ValueError("failure tolerance must be an integer greater than 0")
        self.L = self.L_init
        self.success_counter = 0
        self.failure_counter = 0
        self._y_min = np.inf
        self.location: Optional[jax.Array] = None
        self._needs_init = True

    @property
    def requires_initialization(self) -> bool:
        return self._needs_init

    def _lengthscale_weights(self, models: Optional[Mapping[Tag, ProbabilisticModel]]):
        """Box widths shaped by the model's ARD lengthscales (reference ``rule.py:2160-2185``)."""
        D = self.global_search_space.dimension
        if models is None:
            return jnp.ones(D)
        _, model = get_value_for_tag(models, OBJECTIVE)
        if model is None or not hasattr(model, "get_kernel"):
            return jnp.ones(D)
        try:
            ls = jnp.broadcast_to(jnp.atleast_1d(model.get_kernel().lengthscales), (D,))
        except Exception:  # noqa: BLE001
            return jnp.ones(D)
        gm = jnp.exp(jnp.mean(jnp.log(jnp.maximum(ls, 1e-12))))
        return ls / gm

    def _resize(self, models, datasets) -> None:
        ds = self._get_tagged_dataset(datasets)
        if ds is not None and len(ds) > 0:
            qp, obs = ds.astuple()
            qp = self.with_input_active_dims(qp)
            idx = int(jnp.argmin(obs[:, 0]))
            self.location = qp[idx]
            self._y_min = min(self._y_min, float(obs[idx, 0]))
        elif self.location is None:
            self.location = self.global_search_space.sample(jax.random.PRNGKey(0), 1)[0]
        weights = self._lengthscale_weights(models)
        half = 0.5 * self.L * weights
        g = self.global_search_space
        self._set_bounds(
            jnp.maximum(self.location - half, g.lower),
            jnp.minimum(self.location + half, g.upper),
        )

    def initialize(self, models=None, datasets=None) -> None:
        self.L = self.L_init
        self.success_counter = 0
        self.failure_counter = 0
        self._y_min = np.inf
        self._resize(models, datasets)
        self._needs_init = False

    def update(self, models=None, datasets=None) -> None:
        ds = self._get_tagged_dataset(datasets)
        if ds is None or len(ds) == 0:
            return
        _, obs = ds.astuple()
        y_new = float(jnp.min(obs[:, 0]))
        if _is_improvement(y_new, self._y_min, 1e-10 * abs(self._y_min)):
            self.success_counter += 1
            self.failure_counter = 0
        else:
            self.failure_counter += 1
            self.success_counter = 0
        if self.success_counter >= self.success_tolerance:
            self.L = min(2.0 * self.L, self.L_max)
            self.success_counter = 0
        elif self.failure_counter >= self.failure_tolerance:
            self.L = self.L / 2.0
            self.failure_counter = 0
        if self.L < self.L_min:
            self._needs_init = True
            self.initialize(models, datasets)
            return
        self._resize(models, datasets)


# ---------------------------------------------------------------------------------
# Discrete regions (reference rule.py:2221-2388)
# ---------------------------------------------------------------------------------


class UpdatableTrustRegionDiscrete(GeneralDiscreteSearchSpace, UpdatableTrustRegion):
    """A trust region over a finite global point set: the region is a neighborhood
    (Euclidean over normalized numerics, Hamming for categoricals) around a location
    (reference ``rule.py:2221-2294``)."""

    def __init__(
        self,
        global_search_space: GeneralDiscreteSearchSpace,
        region_index: Optional[int] = None,
    ):
        self._global_search_space = global_search_space
        GeneralDiscreteSearchSpace.__init__(self, global_search_space.points)
        UpdatableTrustRegion.__init__(self, region_index)

    @property
    def global_search_space(self) -> GeneralDiscreteSearchSpace:
        return self._global_search_space

    def _distances(self, location: jax.Array) -> jax.Array:
        """Per-point distance to ``location`` over the global point set."""
        pts = self._global_search_space.points
        if isinstance(self._global_search_space, CategoricalSearchSpace):
            return jnp.sum(pts != location[None, :], axis=-1).astype(pts.dtype)
        lo = self._global_search_space.lower
        hi = self._global_search_space.upper
        extent = jnp.maximum(hi - lo, 1e-12)
        return jnp.linalg.norm((pts - location[None, :]) / extent, axis=-1)

    def _select(self, keep_mask: np.ndarray) -> None:
        pts = np.asarray(self._global_search_space.points)
        if not keep_mask.any():
            keep_mask = keep_mask.copy()
            keep_mask[0] = True
        self._points = jnp.asarray(pts[keep_mask])


class FixedPointTrustRegionDiscrete(UpdatableTrustRegionDiscrete):
    """A single random fixed point of the global set; never moves
    (reference ``rule.py:2297-2330``)."""

    def __init__(
        self,
        global_search_space: GeneralDiscreteSearchSpace,
        region_index: Optional[int] = None,
        *,
        key: Optional[jax.Array] = None,
    ):
        super().__init__(global_search_space, region_index)
        self._key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(2**31)
        )

    def initialize(self, models=None, datasets=None) -> None:
        self._key, sub = jax.random.split(self._key)
        idx = int(jax.random.randint(sub, (), 0, self._global_search_space.points.shape[0]))
        self._points = self._global_search_space.points[idx : idx + 1]

    def update(self, models=None, datasets=None) -> None:
        pass  # fixed point: nothing to update


class SingleObjectiveTrustRegionDiscrete(UpdatableTrustRegionDiscrete):
    """Discrete region with success/failure eps scaling over normalized distances
    (reference ``rule.py:2332-2388``)."""

    def __init__(
        self,
        global_search_space: GeneralDiscreteSearchSpace,
        beta: float = 0.7,
        kappa: float = 1e-4,
        zeta: float = 0.5,
        min_eps: float = 1e-2,
        region_index: Optional[int] = None,
        *,
        key: Optional[jax.Array] = None,
    ):
        super().__init__(global_search_space, region_index)
        self._beta = beta
        self._kappa = kappa
        self._zeta = zeta
        self._min_eps = min_eps
        self._key = key if key is not None else jax.random.PRNGKey(
            np.random.randint(2**31)
        )
        self._needs_init = True
        self._y_min = np.inf
        self.location: Optional[jax.Array] = None
        self.eps: float = zeta

    @property
    def requires_initialization(self) -> bool:
        return self._needs_init

    def _resize(self) -> None:
        d = np.asarray(self._distances(self.location))
        if isinstance(self._global_search_space, CategoricalSearchSpace):
            radius = max(self.eps * self._global_search_space.dimension, 1.0)
        else:
            radius = self.eps
        self._select(d <= radius)

    def _region_min(self, datasets):
        ds = self._get_tagged_dataset(datasets)
        if ds is None or len(ds) == 0:
            return None, np.inf
        qp, obs = ds.astuple()
        qp = self.with_input_active_dims(qp)
        inside = np.asarray(GeneralDiscreteSearchSpace._contains(self, qp))
        if not inside.any():
            return None, np.inf
        qp_in, obs_in = np.asarray(qp)[inside], np.asarray(obs)[inside, 0]
        idx = int(np.argmin(obs_in))
        return jnp.asarray(qp_in[idx]), float(obs_in[idx])

    def initialize(self, models=None, datasets=None) -> None:
        self._key, sub = jax.random.split(self._key)
        g = self._global_search_space
        idx = int(jax.random.randint(sub, (), 0, g.points.shape[0]))
        self.location = g.points[idx]
        self.eps = self._zeta
        self._resize()
        # fresh region: first update is always a success (reference rule.py:1664-1667)
        self._y_min = np.inf
        self._needs_init = False

    def update(self, models=None, datasets=None) -> None:
        best_point, y_new = self._region_min(datasets)
        if best_point is not None and _is_improvement(
            y_new, self._y_min, self._kappa * abs(self._y_min)
        ):
            self.location = best_point
            self.eps /= self._beta
            self._y_min = y_new
        else:
            self.eps *= self._beta
        if self.eps < self._min_eps:
            self._needs_init = True
            self.initialize(models, datasets)
            return
        self._resize()


# ---------------------------------------------------------------------------------
# Product regions for mixed spaces (reference rule.py:2389-2625)
# ---------------------------------------------------------------------------------


class UpdatableTrustRegionProduct(TaggedProductSearchSpace, UpdatableTrustRegion):
    """A product of per-subspace trust regions over a mixed global product space
    (reference ``rule.py:2389-2547``)."""

    def __init__(
        self,
        regions: Sequence[UpdatableTrustRegion],
        tags: Optional[Sequence[str]] = None,
        region_index: Optional[int] = None,
    ):
        self._regions = list(regions)
        TaggedProductSearchSpace.__init__(self, list(regions), tags)
        UpdatableTrustRegion.__init__(self, region_index)
        for r in self._regions:
            r.region_index = region_index

    @property
    def regions(self) -> Mapping[str, UpdatableTrustRegion]:
        return {t: self._spaces[t] for t in self._tags}

    @property
    def requires_initialization(self) -> bool:
        return any(r.requires_initialization for r in self._regions)

    def _sync(self) -> None:
        # re-derive the product geometry after subregions moved
        TaggedProductSearchSpace.__init__(self, self._regions, self._tags)

    def _assign_active_dims(self) -> None:
        for tag, r in zip(self._tags, self._regions):
            r.input_active_dims = self.subspace_dimension_range(tag)

    def initialize(self, models=None, datasets=None) -> None:
        self._assign_active_dims()
        for r in self._regions:
            r.region_index = self.region_index
            r.initialize(models, datasets)
        self._sync()

    def update(self, models=None, datasets=None) -> None:
        self._assign_active_dims()
        for r in self._regions:
            r.update(models, datasets)
        self._sync()


class BatchTrustRegionProduct(BatchTrustRegion):
    """Batch trust-region rule over mixed product regions (reference ``rule.py:2550-2625``).

    Default subspaces pair a :class:`SingleObjectiveTrustRegionBox` for each continuous
    component with a :class:`SingleObjectiveTrustRegionDiscrete` for each discrete one;
    the default base rule runs per-region EGO (the mixed-space optimizer handles the
    relaxation)."""

    def _make_default_subspaces(self, search_space):
        if not isinstance(search_space, TaggedProductSearchSpace):
            raise ValueError(
                "BatchTrustRegionProduct requires a TaggedProductSearchSpace"
            )
        subspaces = []
        for i in range(self._num_regions):
            regions = []
            for tag in search_space.subspace_tags:
                sub = search_space.get_subspace(tag)
                if isinstance(sub, GeneralDiscreteSearchSpace):
                    regions.append(
                        SingleObjectiveTrustRegionDiscrete(
                            sub, key=jax.random.PRNGKey(1000 + i)
                        )
                    )
                else:
                    regions.append(
                        SingleObjectiveTrustRegionBox(sub, key=jax.random.PRNGKey(i))
                    )
            subspaces.append(
                UpdatableTrustRegionProduct(
                    regions, tags=list(search_space.subspace_tags), region_index=i
                )
            )
        return tuple(subspaces)

    def _make_default_rule(self):
        return [
            EfficientGlobalOptimization() for _ in range(self._num_regions)
        ]
