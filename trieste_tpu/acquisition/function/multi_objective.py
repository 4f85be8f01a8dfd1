"""Multi-objective acquisition functions.

TPU-native rebuild of the reference ``trieste/acquisition/function/multi_objective.py``:
analytic EHVI over a box decomposition of the non-dominated region
(``multi_objective.py:49-252``), reparametrization-trick batch MC EHVI with exact
inclusion–exclusion union volumes (``multi_objective.py:253-414``), the constrained
variant (``multi_objective.py:415-505``) and HIPPO penalization batches
(``multi_objective.py:506-757``).

All cell math is vectorized over ``[K]`` cells × ``[M]`` objectives on device; the
decompositions themselves are built host-side from the (small) observed front.
"""
from __future__ import annotations

import itertools
from typing import Callable, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm
from jax.tree_util import Partial

from ...data import Dataset
from ...models.interfaces import HasReparamSampler, ProbabilisticModel
from ...observer import OBJECTIVE
from ...types import Tag, TensorType
from ..interface import (
    AcquisitionFunction,
    AcquisitionFunctionBuilder,
    GreedyAcquisitionFunctionBuilder,
    SingleModelAcquisitionBuilder,
    SingleModelGreedyAcquisitionBuilder,
)
from ..multi_objective import (
    Pareto,
    get_reference_point,
    prepare_default_non_dominated_partition_bounds,
)
from ..utils import predictor
from .function import _product_fn, _sample_fn_for, _validate_dataset


def _psi_minus_diff(
    mean: jax.Array, std: jax.Array, lower: jax.Array, upper: jax.Array
) -> jax.Array:
    """Per-objective factor ``E[(u - max(y, l))^+] = psi(u,u) - psi(l,l)`` where
    ``psi(a, a) = std*pdf(z_a) + (a - mean)*cdf(z_a)`` (Yang et al. box-decomposition EHVI,
    the formulation behind reference ``multi_objective.py:150-252``).

    ``mean/std: [..., 1, M]``, ``lower/upper: [K, M]`` → ``[..., K, M]``.
    """
    zu = (upper - mean) / std
    psi_u = std * norm.pdf(zu) + (upper - mean) * norm.cdf(zu)
    finite_l = jnp.isfinite(lower)
    safe_lower = jnp.where(finite_l, lower, 0.0)
    zl = (safe_lower - mean) / std
    psi_l = std * norm.pdf(zl) + (safe_lower - mean) * norm.cdf(zl)
    psi_l = jnp.where(finite_l, psi_l, 0.0)
    return jnp.maximum(psi_u - psi_l, 0.0)


def _ehvi_fn(
    predict: Callable, lower: jax.Array, upper: jax.Array, x: TensorType
) -> jax.Array:
    """Analytic EHVI, ``x: [..., 1, D] -> [..., 1]``."""
    mean, var = predict(jnp.asarray(x)[..., 0, :])  # [..., M]
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    factors = _psi_minus_diff(mean[..., None, :], std[..., None, :], lower, upper)
    contrib = jnp.prod(factors, axis=-1)  # [..., K]
    return jnp.sum(contrib, axis=-1, keepdims=True)


class ExpectedHypervolumeImprovement(SingleModelAcquisitionBuilder):
    """Analytic expected hypervolume improvement over the cell decomposition of the
    current non-dominated region (reference ``multi_objective.py:49-252``)."""

    def __init__(
        self,
        reference_point_spec: Optional[Callable[[TensorType], jax.Array]] = None,
    ):
        self._ref_spec = reference_point_spec or get_reference_point

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        dataset = _validate_dataset(dataset, "ExpectedHypervolumeImprovement")
        mean, _ = model.predict(dataset.trimmed_query_points)
        reference = self._ref_spec(mean)
        front = Pareto(mean).front
        lower, upper = prepare_default_non_dominated_partition_bounds(reference, front)
        return Partial(_ehvi_fn, predictor(model), lower, upper)

    def update_acquisition_function(
        self, function, model, dataset=None
    ) -> AcquisitionFunction:
        return self.prepare_acquisition_function(model, dataset)

    def __repr__(self) -> str:
        return "ExpectedHypervolumeImprovement()"


def _subset_masks(batch_size: int) -> jax.Array:
    """``[2^B - 1, B]`` boolean masks of the non-empty subsets, for inclusion-exclusion."""
    masks = list(itertools.product([False, True], repeat=batch_size))[1:]
    return jnp.asarray(masks)


def _batch_ehvi_fn(
    sample: Callable,
    lower: jax.Array,  # [K, M]
    upper: jax.Array,  # [K, M]
    subset_masks: jax.Array,  # [T, B]
    x: TensorType,
) -> jax.Array:
    """qEHVI by Monte Carlo with exact per-cell union volumes via inclusion-exclusion
    (reference ``batch_ehvi``, ``multi_objective.py:350-414``).

    ``x: [..., B, D] -> [..., 1]``.
    """
    samples = sample(jnp.asarray(x))  # [..., S, B, M]
    m = jnp.maximum(samples[..., None, :, :], lower[:, None, :])  # [..., S, K, B, M]
    signs = jnp.where(jnp.sum(subset_masks, axis=-1) % 2 == 1, 1.0, -1.0)  # [T]
    # subset max over batch: mask [T, B] applied to m [..., S, K, B, M] -> [..., S, K, T, M]
    masked = jnp.where(
        subset_masks[:, :, None], m[..., None, :, :], -jnp.inf
    )  # [..., S, K, T, B, M]
    subset_max = jnp.max(masked, axis=-2)  # [..., S, K, T, M]
    vols = jnp.prod(
        jnp.maximum(upper[:, None, :] - subset_max, 0.0), axis=-1
    )  # [..., S, K, T]
    union = jnp.sum(signs * vols, axis=-1)  # [..., S, K]
    hvi = jnp.sum(union, axis=-1)  # [..., S]
    return jnp.mean(hvi, axis=-1, keepdims=True)


class BatchMonteCarloExpectedHypervolumeImprovement(SingleModelAcquisitionBuilder):
    """(reference ``multi_objective.py:253-414``)"""

    def __init__(
        self,
        sample_size: int,
        reference_point_spec: Optional[Callable[[TensorType], jax.Array]] = None,
        *,
        key: Optional[jax.Array] = None,
    ):
        if sample_size <= 0:
            raise ValueError(f"sample_size must be positive, got {sample_size}")
        self._sample_size = sample_size
        self._ref_spec = reference_point_spec or get_reference_point
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        dataset = _validate_dataset(
            dataset, "BatchMonteCarloExpectedHypervolumeImprovement"
        )
        mean, _ = model.predict(dataset.trimmed_query_points)
        reference = self._ref_spec(mean)
        front = Pareto(mean).front
        lower, upper = prepare_default_non_dominated_partition_bounds(reference, front)
        sample_fn = _sample_fn_for(model, self._sample_size, self._key, joint=True)
        return _BatchEHVIWithLazyMasks(sample_fn, lower, upper)

    def update_acquisition_function(
        self, function, model, dataset=None
    ) -> AcquisitionFunction:
        return self.prepare_acquisition_function(model, dataset)

    def __repr__(self) -> str:
        return f"BatchMonteCarloExpectedHypervolumeImprovement({self._sample_size!r})"


class _BatchEHVIWithLazyMasks:
    """Materializes the subset-mask table once the batch size B is known."""

    def __init__(self, sample_fn, lower, upper):
        self._sample_fn = sample_fn
        self._lower = lower
        self._upper = upper
        self._masks: Optional[jax.Array] = None

    def _partial_for(self, B: int) -> Partial:
        if self._masks is None or self._masks.shape[-1] != B:
            self._masks = _subset_masks(B)
        return Partial(
            _batch_ehvi_fn, self._sample_fn, self._lower, self._upper, self._masks
        )

    def __call__(self, x: TensorType) -> jax.Array:
        x = jnp.asarray(x)
        return self._partial_for(x.shape[-2])(x)


class ExpectedConstrainedHypervolumeImprovement(AcquisitionFunctionBuilder):
    """EHVI over the feasible region times the probability of feasibility
    (reference ``multi_objective.py:415-505``)."""

    def __init__(
        self,
        objective_tag: Tag,
        constraint_builder: AcquisitionFunctionBuilder,
        min_feasibility_probability: float = 0.5,
        reference_point_spec: Optional[Callable[[TensorType], jax.Array]] = None,
    ):
        self._objective_tag = objective_tag
        self._constraint_builder = constraint_builder
        self._min_feasibility_probability = min_feasibility_probability
        self._ref_spec = reference_point_spec or get_reference_point

    def prepare_acquisition_function(
        self,
        models: Mapping[Tag, ProbabilisticModel],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
    ) -> AcquisitionFunction:
        if datasets is None or self._objective_tag not in datasets:
            raise ValueError(
                f"ExpectedConstrainedHypervolumeImprovement requires a dataset for "
                f"{self._objective_tag!r}"
            )
        objective_dataset = _validate_dataset(
            datasets[self._objective_tag], "ExpectedConstrainedHypervolumeImprovement"
        )
        objective_model = models[self._objective_tag]
        constraint_fn = self._constraint_builder.prepare_acquisition_function(
            models, datasets
        )
        qp = objective_dataset.trimmed_query_points
        pof = constraint_fn(qp[:, None, :])[..., 0]
        feasible = np.asarray(pof >= self._min_feasibility_probability)
        if not feasible.any():
            return constraint_fn
        mean, _ = objective_model.predict(qp)
        feasible_mean = jnp.asarray(np.asarray(mean)[feasible])
        reference = self._ref_spec(feasible_mean)
        front = Pareto(feasible_mean).front
        lower, upper = prepare_default_non_dominated_partition_bounds(reference, front)
        ehvi = Partial(_ehvi_fn, predictor(objective_model), lower, upper)
        return Partial(_product_fn, (ehvi, constraint_fn))

    def __repr__(self) -> str:
        return (
            f"ExpectedConstrainedHypervolumeImprovement({self._objective_tag!r}, "
            f"{self._constraint_builder!r})"
        )


def _hippo_penalty_fn(
    member_states: Sequence,  # tuple of (params, cache) per output model
    pending_points: jax.Array,  # [P, D]
    x: TensorType,
) -> jax.Array:
    """HIPPO penalization (reference ``hippo_penalizer``, ``multi_objective.py:650-757``):
    down-weight candidates predicted to correlate with pending points."""
    from ...models.gp import posterior as P

    x = jnp.asarray(x)  # [..., 1, D]
    flat = jnp.reshape(x, (-1, x.shape[-1]))  # [N, D]
    penalties = []
    for params, cache in member_states:
        cov = P.covariance_between_points(params, cache, flat, pending_points)  # [N, P]
        _, var_x = P.predict_f(params, cache, flat)  # [N, 1]
        _, var_p = P.predict_f(params, cache, pending_points)  # [P, 1]
        rho2 = jnp.square(cov) / jnp.maximum(var_x * var_p[:, 0][None, :], 1e-24)
        penalties.append(jnp.prod(1.0 - jnp.clip(rho2, 0.0, 1.0), axis=-1))  # [N]
    penalty = jnp.prod(jnp.stack(penalties, axis=-1), axis=-1)  # [N]
    return jnp.reshape(penalty, x.shape[:-2] + (1,))


class HIPPO(SingleModelGreedyAcquisitionBuilder):
    """Penalization-based batch multi-objective acquisition
    (reference ``multi_objective.py:506-649``): the base (EHVI by default) is multiplied
    by correlation penalties around pending points."""

    def __init__(
        self,
        objective_tag: Tag = OBJECTIVE,
        base_acquisition_function_builder: Optional[SingleModelAcquisitionBuilder] = None,
    ):
        self._objective_tag = objective_tag
        self._base_builder = (
            base_acquisition_function_builder or ExpectedHypervolumeImprovement()
        )

    def _member_states(self, model: ProbabilisticModel):
        members = getattr(model, "models", [model])
        states = []
        for m in members:
            if not (hasattr(m, "params") and hasattr(m, "posterior_cache")):
                raise NotImplementedError(
                    "HIPPO currently requires exact-GP members (params/posterior_cache)"
                )
            states.append((m.params, m.posterior_cache))
        return tuple(states)

    def prepare_acquisition_function(
        self,
        model: ProbabilisticModel,
        dataset: Optional[Dataset] = None,
        pending_points: Optional[TensorType] = None,
    ) -> AcquisitionFunction:
        base = self._base_builder.prepare_acquisition_function(model, dataset)
        if pending_points is None or jnp.size(pending_points) == 0:
            return base
        penalty = Partial(
            _hippo_penalty_fn, self._member_states(model), jnp.asarray(pending_points)
        )
        return Partial(_product_fn, (base, penalty))

    def update_acquisition_function(
        self,
        function,
        model,
        dataset=None,
        pending_points=None,
        new_optimization_step: bool = True,
    ) -> AcquisitionFunction:
        return self.prepare_acquisition_function(model, dataset, pending_points)

    def __repr__(self) -> str:
        return f"HIPPO({self._objective_tag!r}, {self._base_builder!r})"
