"""Entropy-based acquisition functions: min-value entropy search (MES) and GIBBON.

TPU-native rebuild of the reference ``trieste/acquisition/function/entropy.py`` (MES
``entropy.py:50-213``, GIBBON ``entropy.py:236-621``). The multifidelity variant (MUMBO)
ships with the multifidelity model family.

Min-value samples come from the Thompson samplers in
:mod:`trieste_tpu.acquisition.sampler` (Gumbel by default) over a random space
discretization; the MC average over samples is a single vectorized device computation.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm
from jax.tree_util import Partial

from ...data import Dataset
from ...models.interfaces import (
    ProbabilisticModel,
    SupportsGetObservationNoise,
)
from ...space import SearchSpace
from ...types import TensorType
from ..interface import (
    AcquisitionFunction,
    SingleModelAcquisitionBuilder,
    SingleModelGreedyAcquisitionBuilder,
)
from ..sampler import GumbelSampler, ThompsonSampler
from ..utils import predictor

CLAMP_LB = 1e-8


def _mes_fn(predict: Callable, min_value_samples: jax.Array, x: TensorType) -> jax.Array:
    """MES value (reference ``min_value_entropy_search``, ``entropy.py:173-213``):
    expected entropy reduction of the min-value distribution, averaged over sampled
    minima. ``x: [..., 1, D] -> [..., 1]``."""
    mean, var = predict(jnp.asarray(x)[..., 0, :])  # [..., 1]
    std = jnp.sqrt(jnp.maximum(var, CLAMP_LB))
    gamma = (min_value_samples[:, 0] - mean) / std  # [..., S]
    minus_cdf = jnp.clip(1.0 - norm.cdf(gamma), CLAMP_LB, 1.0)
    value = -gamma * norm.pdf(gamma) / (2.0 * minus_cdf) - jnp.log(minus_cdf)
    return jnp.mean(value, axis=-1, keepdims=True)


class MinValueEntropySearch(SingleModelAcquisitionBuilder):
    """MES (reference ``entropy.py:50-172``): samples global-minimum values over a random
    grid and scores candidates by the expected entropy reduction."""

    def __init__(
        self,
        search_space: SearchSpace,
        num_samples: int = 5,
        grid_size: int = 1000,
        min_value_sampler: Optional[ThompsonSampler] = None,
        *,
        key: Optional[jax.Array] = None,
    ):
        if num_samples <= 0:
            raise ValueError(f"num_samples must be positive, got {num_samples}")
        if grid_size <= 0:
            raise ValueError(f"grid_size must be positive, got {grid_size}")
        if min_value_sampler is not None and not min_value_sampler.sample_min_value:
            raise ValueError("MinValueEntropySearch requires a sample_min_value sampler")
        self._search_space = search_space
        self._num_samples = num_samples
        self._grid_size = grid_size
        self._sampler = min_value_sampler or GumbelSampler()
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def _sample_min_values(self, model: ProbabilisticModel, dataset: Dataset) -> jax.Array:
        """Grid = random samples + observed points (reference ``entropy.py:148-165``)."""
        self._key, k_grid, k_sample = jax.random.split(self._key, 3)
        grid = self._search_space.sample(k_grid, self._grid_size)
        grid = jnp.concatenate([grid, dataset.trimmed_query_points], axis=0)
        return self._sampler.sample(model, self._num_samples, grid, key=k_sample)

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        if dataset is None or len(dataset) == 0:
            raise ValueError("MinValueEntropySearch requires a non-empty dataset")
        samples = self._sample_min_values(model, dataset)
        return Partial(_mes_fn, predictor(model), samples)

    def update_acquisition_function(
        self,
        function: AcquisitionFunction,
        model: ProbabilisticModel,
        dataset: Optional[Dataset] = None,
    ) -> AcquisitionFunction:
        return self.prepare_acquisition_function(model, dataset)

    def __repr__(self) -> str:
        return f"MinValueEntropySearch({self._search_space!r}, {self._num_samples!r})"


def _gibbon_quality_fn(
    predict: Callable,
    noise_variance: jax.Array,
    min_value_samples: jax.Array,
    x: TensorType,
) -> jax.Array:
    """GIBBON quality term (reference ``gibbon_quality_term``, ``entropy.py:439-502``):
    a lower bound on the information that observing y(x) gives about the minimum."""
    mean, var = predict(jnp.asarray(x)[..., 0, :])  # [..., 1]
    var = jnp.maximum(var, CLAMP_LB)
    std = jnp.sqrt(var)
    rho2 = var / (var + noise_variance)  # latent/observed correlation^2
    gamma = (min_value_samples[:, 0] - mean) / std  # [..., S]
    minus_cdf = jnp.clip(1.0 - norm.cdf(gamma), CLAMP_LB, 1.0)
    ratio = norm.pdf(gamma) / minus_cdf
    # variance ratio of the lower-truncated latent: 1 - r(r - gamma), r = phi/Psi
    trunc_ratio = jnp.clip(1.0 - ratio * (ratio - gamma), CLAMP_LB, 1.0)
    inner = jnp.clip(1.0 - rho2 * (1.0 - trunc_ratio), CLAMP_LB, 1.0)
    value = -0.5 * jnp.mean(jnp.log(inner), axis=-1, keepdims=True)
    return value


def _gibbon_repulsion_fn(
    predict: Callable,
    joint_cov_with_pending: Callable,
    noise_variance: jax.Array,
    pending_points: jax.Array,
    x: TensorType,
) -> jax.Array:
    """GIBBON repulsion term (reference ``gibbon_repulsion_term``, ``entropy.py:503-621``):
    1/2 log det of the predictive correlation matrix of [pending; x]."""
    x = jnp.asarray(x)  # [..., 1, D]
    flat = jnp.reshape(x, (-1, x.shape[-1]))  # [N, D]

    def single(xi: jax.Array) -> jax.Array:
        pts = jnp.concatenate([pending_points, xi[None]], axis=0)  # [P+1, D]
        _, cov = joint_cov_with_pending(pts)  # [L, P+1, P+1]
        cov = cov[0] + noise_variance * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        d = jnp.sqrt(jnp.diagonal(cov))
        corr = cov / (d[:, None] * d[None, :])
        sign, logdet = jnp.linalg.slogdet(corr)
        return 0.5 * logdet

    vals = jax.vmap(single)(flat)
    return jnp.reshape(vals, x.shape[:-2] + (1,))


def _gibbon_with_repulsion_fn(quality, repulsion, x):
    return quality(x) + repulsion(x)


class GIBBON(SingleModelGreedyAcquisitionBuilder):
    """General-purpose Information-Based Bayesian OptimisatioN: a cheap MES approximation
    whose greedy batch construction adds a determinant-based diversity (repulsion) term
    (reference ``entropy.py:236-621``)."""

    def __init__(
        self,
        search_space: SearchSpace,
        num_samples: int = 5,
        grid_size: int = 1000,
        min_value_sampler: Optional[ThompsonSampler] = None,
        rescaled_repulsion: bool = True,
        *,
        key: Optional[jax.Array] = None,
    ):
        self._mes = MinValueEntropySearch(
            search_space, num_samples, grid_size, min_value_sampler, key=key
        )
        self._rescaled_repulsion = rescaled_repulsion
        self._min_value_samples: Optional[jax.Array] = None

    def prepare_acquisition_function(
        self,
        model: ProbabilisticModel,
        dataset: Optional[Dataset] = None,
        pending_points: Optional[TensorType] = None,
    ) -> AcquisitionFunction:
        if dataset is None or len(dataset) == 0:
            raise ValueError("GIBBON requires a non-empty dataset")
        if not isinstance(model, SupportsGetObservationNoise):
            raise ValueError("GIBBON requires a model with observation noise")
        self._min_value_samples = self._mes._sample_min_values(model, dataset)
        quality = Partial(
            _gibbon_quality_fn,
            predictor(model),
            model.get_observation_noise(),
            self._min_value_samples,
        )
        if pending_points is None or jnp.size(pending_points) == 0:
            return quality
        from ..utils import joint_predictor

        repulsion = Partial(
            _gibbon_repulsion_fn,
            predictor(model),
            joint_predictor(model),
            model.get_observation_noise(),
            jnp.asarray(pending_points),
        )
        return Partial(_gibbon_with_repulsion_fn, quality, repulsion)

    def update_acquisition_function(
        self,
        function: AcquisitionFunction,
        model: ProbabilisticModel,
        dataset: Optional[Dataset] = None,
        pending_points: Optional[TensorType] = None,
        new_optimization_step: bool = True,
    ) -> AcquisitionFunction:
        if new_optimization_step or self._min_value_samples is None:
            return self.prepare_acquisition_function(model, dataset, pending_points)
        # keep the same min-value samples within a batch (reference ``entropy.py:389-420``)
        quality = Partial(
            _gibbon_quality_fn,
            predictor(model),
            model.get_observation_noise(),
            self._min_value_samples,
        )
        if pending_points is None or jnp.size(pending_points) == 0:
            return quality
        from ..utils import joint_predictor

        repulsion = Partial(
            _gibbon_repulsion_fn,
            predictor(model),
            joint_predictor(model),
            model.get_observation_noise(),
            jnp.asarray(pending_points),
        )
        return Partial(_gibbon_with_repulsion_fn, quality, repulsion)

    def __repr__(self) -> str:
        return f"GIBBON({self._mes._search_space!r})"


# ---------------------------------------------------------------------------------
# Multifidelity entropy search (reference entropy.py:634-791)
# ---------------------------------------------------------------------------------


def _mumbo_fn(
    predict: Callable,
    cov_with_top: Callable,
    predict_top: Callable,
    noise_variance: jax.Array,
    min_value_samples: jax.Array,
    x: TensorType,
) -> jax.Array:
    """MUMBO quality (reference ``entropy.py:634-791``) in its information-lower-bound
    form: an observation at fidelity m informs the top-fidelity minimum through the
    correlation ``rho(x) = cov(y_m, f_top) / sqrt(var(y_m) var(f_top))``."""
    xq = jnp.asarray(x)[..., 0, :]  # [..., D+1] (with fidelity column)
    mean_m, var_m = predict(xq)
    var_y = jnp.maximum(var_m, CLAMP_LB) + noise_variance
    cov_mt = cov_with_top(xq)  # [..., 1]
    mean_t, var_t = predict_top(xq)
    var_t = jnp.maximum(var_t, CLAMP_LB)
    rho2 = jnp.clip(jnp.square(cov_mt) / (var_y * var_t), 0.0, 1.0 - CLAMP_LB)
    std_t = jnp.sqrt(var_t)
    gamma = (min_value_samples[:, 0] - mean_t) / std_t  # [..., S]
    minus_cdf = jnp.clip(1.0 - norm.cdf(gamma), CLAMP_LB, 1.0)
    ratio = norm.pdf(gamma) / minus_cdf
    trunc_ratio = jnp.clip(1.0 - ratio * (ratio - gamma), CLAMP_LB, 1.0)
    inner = jnp.clip(1.0 - rho2 * (1.0 - trunc_ratio), CLAMP_LB, 1.0)
    return -0.5 * jnp.mean(jnp.log(inner), axis=-1, keepdims=True)


class MUMBO(SingleModelAcquisitionBuilder):
    """MUlti-task Max-value Bayesian Optimization: multifidelity MES
    (reference ``entropy.py:634-791``). Requires a model exposing
    ``covariance_with_top_fidelity`` and a search space whose trailing coordinate is the
    fidelity."""

    def __init__(
        self,
        search_space: SearchSpace,
        num_samples: int = 5,
        grid_size: int = 1000,
        min_value_sampler: Optional[ThompsonSampler] = None,
        *,
        key: Optional[jax.Array] = None,
    ):
        self._mes = MinValueEntropySearch(
            search_space, num_samples, grid_size, min_value_sampler, key=key
        )

    def prepare_acquisition_function(
        self, model, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        from ...models.interfaces import SupportsCovarianceWithTopFidelity

        if not isinstance(model, SupportsCovarianceWithTopFidelity):
            raise ValueError("MUMBO requires a multifidelity model")
        if dataset is None or len(dataset) == 0:
            raise ValueError("MUMBO requires a non-empty dataset")

        num_fid = model.num_fidelities
        # min-value samples of the TOP fidelity process over a grid at top fidelity
        top_view = _TopFidelityView(model, num_fid - 1)
        self._mes._key, k_grid, k_sample = jax.random.split(self._mes._key, 3)
        grid = self._mes._search_space.sample(k_grid, self._mes._grid_size)
        grid = grid.at[:, -1].set(float(num_fid - 1))
        samples = self._mes._sampler.sample(
            top_view, self._mes._num_samples, grid, key=k_sample
        )
        noise = (
            model.get_observation_noise()
            if hasattr(model, "get_observation_noise")
            else jnp.asarray(0.0)
        )
        return Partial(
            _mumbo_fn,
            Partial(model.predict),
            Partial(model.covariance_with_top_fidelity),
            Partial(top_view.predict),
            jnp.asarray(noise),
            samples,
        )

    def update_acquisition_function(self, function, model, dataset=None):
        return self.prepare_acquisition_function(model, dataset)

    def __repr__(self) -> str:
        return "MUMBO()"


class _TopFidelityView:
    """Expose a multifidelity model as a plain model at its top fidelity."""

    def __init__(self, model, top: int):
        self._model = model
        self._top = float(top)

    def predict(self, x):
        x = jnp.asarray(x)
        x_top = x.at[..., -1].set(self._top)
        return self._model.predict(x_top)

    def sample(self, key, x, num_samples):
        x = jnp.asarray(x)
        x_top = x.at[..., -1].set(self._top)
        return self._model.sample(key, x_top, num_samples)


def _cost_weighted_fn(base: Callable, costs: jax.Array, x: TensorType) -> jax.Array:
    """Divide by the per-fidelity observation cost (reference ``CostWeighting``,
    ``entropy.py:792-850``)."""
    xq = jnp.asarray(x)
    fid = xq[..., 0, -1].astype(jnp.int32)
    return base(x) / costs[fid][..., None]


def _reciprocal_cost_fn(costs: jax.Array, x: TensorType) -> jax.Array:
    xq = jnp.asarray(x)
    fid = xq[..., 0, -1].astype(jnp.int32)
    return 1.0 / costs[fid][..., None]


class CostWeighting(SingleModelAcquisitionBuilder):
    """Reciprocal per-fidelity observation cost (reference ``entropy.py:792-850``).

    Like the reference, it is a standalone builder whose function is ``1/cost(fid)``,
    designed to be combined multiplicatively, e.g.
    ``Product(MUMBO(space).using(OBJECTIVE), CostWeighting(costs).using(OBJECTIVE))``.
    ``apply_to(base_fn)`` is a convenience returning ``base_fn(x)/cost(fid)`` directly.
    """

    def __init__(self, observation_costs: Sequence[float]):
        self._costs = jnp.asarray(observation_costs, dtype=float)

    def prepare_acquisition_function(
        self, model, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        return Partial(_reciprocal_cost_fn, self._costs)

    def update_acquisition_function(
        self, function, model, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        return function

    def apply_to(self, base_fn: AcquisitionFunction) -> AcquisitionFunction:
        return Partial(_cost_weighted_fn, base_fn, self._costs)
