"""Active-learning acquisition functions.

TPU-native rebuild of the reference ``trieste/acquisition/function/active_learning.py``:
predictive-variance maximization, expected feasibility (Bichon/Ranjan criteria) for level
set estimation, integrated variance reduction, and BALD for Bernoulli classifiers.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm
from jax.tree_util import Partial

from ...data import Dataset
from ...models.interfaces import ProbabilisticModel, SupportsPredictJoint
from ...types import TensorType
from ..interface import AcquisitionFunction, SingleModelAcquisitionBuilder
from ..utils import joint_predictor, predictor


def _predictive_variance_fn(predict_joint: Callable, jitter: float, x: TensorType) -> jax.Array:
    """Determinant of the predictive covariance over the batch, diagonal-jittered
    for stability (reference ``predictive_variance``, ``active_learning.py:80-112``)."""
    x = jnp.asarray(x)
    _, cov = predict_joint(x)  # [..., L, B, B]
    cov = cov + jitter * jnp.eye(cov.shape[-1], dtype=cov.dtype)
    sign, logdet = jnp.linalg.slogdet(cov)
    det = sign * jnp.exp(logdet)
    return jnp.sum(det, axis=-1, keepdims=True)  # sum over output dims -> [..., 1]


class PredictiveVariance(SingleModelAcquisitionBuilder):
    """(reference ``active_learning.py:36-112``)"""

    def __init__(self, jitter: float = 1e-6):
        self._jitter = jitter

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        return Partial(_predictive_variance_fn, joint_predictor(model), self._jitter)

    def __repr__(self) -> str:
        return f"PredictiveVariance(jitter={self._jitter!r})"


def _expected_feasibility_bichon_fn(
    predict: Callable, threshold: jax.Array, alpha: jax.Array, x: TensorType
) -> jax.Array:
    """Bichon (delta=1) expected feasibility
    (reference ``bichon_ranjan_criterion``, ``active_learning.py:174-249``)."""
    mean, var = predict(jnp.asarray(x)[..., 0, :])
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    t = (threshold - mean) / std
    t_plus = t + alpha
    t_minus = t - alpha
    G = (
        alpha * (norm.cdf(t_plus) - norm.cdf(t_minus))
        - t * (2.0 * norm.cdf(t) - norm.cdf(t_plus) - norm.cdf(t_minus))
        - (2.0 * norm.pdf(t) - norm.pdf(t_plus) - norm.pdf(t_minus))
    )
    return (std * G)[..., 0:1]


def _expected_feasibility_ranjan_fn(
    predict: Callable, threshold: jax.Array, alpha: jax.Array, x: TensorType
) -> jax.Array:
    """Ranjan (delta=2) expected feasibility (reference ``active_learning.py:174-249``)."""
    mean, var = predict(jnp.asarray(x)[..., 0, :])
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    t = (threshold - mean) / std
    t_plus = t + alpha
    t_minus = t - alpha
    G = (
        (alpha**2 - 1.0 - t**2) * (norm.cdf(t_plus) - norm.cdf(t_minus))
        - 2.0 * t * (norm.pdf(t_plus) - norm.pdf(t_minus))
        + t_plus * norm.pdf(t_plus)
        - t_minus * norm.pdf(t_minus)
    )
    return (var * G)[..., 0:1]


class ExpectedFeasibility(SingleModelAcquisitionBuilder):
    """Level-set active learning via the Bichon/Ranjan criteria
    (reference ``active_learning.py:113-249``)."""

    def __init__(self, threshold: float, alpha: float = 1.0, delta: int = 1):
        if alpha <= 0:
            raise ValueError(f"alpha must be positive, got {alpha}")
        if delta not in (1, 2):
            raise ValueError(f"delta must be 1 or 2, got {delta}")
        self._threshold = threshold
        self._alpha = alpha
        self._delta = delta

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        fn = (
            _expected_feasibility_bichon_fn
            if self._delta == 1
            else _expected_feasibility_ranjan_fn
        )
        return Partial(
            fn, predictor(model), jnp.asarray(self._threshold), jnp.asarray(self._alpha)
        )

    def __repr__(self) -> str:
        return (
            f"ExpectedFeasibility({self._threshold!r}, {self._alpha!r}, {self._delta!r})"
        )


def _integrated_variance_reduction_fn(
    params, cache, integration_points: jax.Array, threshold_weights: jax.Array, x: TensorType
) -> jax.Array:
    """Integrated posterior-variance reduction from adding the batch ``x``
    (reference ``integrated_variance_reduction``, ``active_learning.py:312-417``).

    Uses the exact-GP identity: adding batch points B reduces the variance at integration
    point t by ``k(t,B) (K_BB + sigma^2 I)^{-1} k(B,t)``.
    """
    from ...models.gp import posterior as P
    from ...utils.misc import jitter_for

    x = jnp.asarray(x)  # [..., B, D]
    flat = jnp.reshape(x, (-1,) + x.shape[-2:])  # [R, B, D]

    def single(xb: jax.Array) -> jax.Array:
        _, cov_bb = P.predict_joint(params, cache, xb)  # [L, B, B]
        cov_bb = cov_bb[0]
        B = cov_bb.shape[-1]
        Kn = cov_bb + (params.noise_variance + jitter_for(cov_bb.dtype)) * jnp.eye(
            B, dtype=cov_bb.dtype
        )
        L = jnp.linalg.cholesky(Kn)
        cov_tb = P.covariance_between_points(params, cache, integration_points, xb)  # [T, B]
        v = jax.scipy.linalg.solve_triangular(L, cov_tb.T, lower=True)  # [B, T]
        reduction = jnp.sum(jnp.square(v), axis=0)  # [T]
        return jnp.sum(reduction * threshold_weights)

    vals = jax.vmap(single)(flat)
    return jnp.reshape(vals, x.shape[:-2] + (1,))


class IntegratedVarianceReduction(SingleModelAcquisitionBuilder):
    """(reference ``active_learning.py:250-417``)"""

    def __init__(
        self,
        integration_points: TensorType,
        threshold: Optional[Union[float, Sequence[float]]] = None,
    ):
        self._integration_points = jnp.asarray(integration_points)
        self._threshold = threshold

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        if not hasattr(model, "params") or not hasattr(model, "posterior_cache"):
            raise NotImplementedError(
                "IntegratedVarianceReduction currently requires an exact-GP model"
            )
        if self._threshold is None:
            weights = jnp.ones(self._integration_points.shape[0])
        else:
            t = jnp.atleast_1d(jnp.asarray(self._threshold))
            mean, var = model.predict(self._integration_points)
            std = jnp.sqrt(jnp.maximum(var, 1e-24))
            if t.shape[0] == 1:
                weights = norm.pdf((t[0] - mean[:, 0]) / std[:, 0])
            else:
                upper = norm.cdf((t[1] - mean[:, 0]) / std[:, 0])
                lower = norm.cdf((t[0] - mean[:, 0]) / std[:, 0])
                weights = upper - lower
        return Partial(
            _integrated_variance_reduction_fn,
            model.params,
            model.posterior_cache,
            self._integration_points,
            weights,
        )

    def __repr__(self) -> str:
        return f"IntegratedVarianceReduction(threshold={self._threshold!r})"


_BALD_C = math.sqrt(math.pi * math.log(2.0) / 2.0)


def _binary_entropy(p: jax.Array) -> jax.Array:
    p = jnp.clip(p, 1e-9, 1.0 - 1e-9)
    return -p * jnp.log(p) - (1.0 - p) * jnp.log(1.0 - p)


def _bald_fn(predict: Callable, jitter: float, x: TensorType) -> jax.Array:
    """BALD for a probit-Bernoulli classifier over the latent GP; ``jitter`` floors
    the variance and guards the entropy logs (reference
    ``bayesian_active_learning_by_disagreement``, ``active_learning.py:461-513``)."""
    mean, var = predict(jnp.asarray(x)[..., 0, :])
    mean, var = mean[..., 0], jnp.maximum(var[..., 0], jitter)
    p = norm.cdf(mean / jnp.sqrt(1.0 + var))
    marginal_entropy = _binary_entropy(p)
    conditional_entropy = (
        _BALD_C
        / jnp.sqrt(var + _BALD_C**2)
        * jnp.exp(-(mean**2) / (2.0 * (var + _BALD_C**2)))
        * math.log(2.0)
    )
    return (marginal_entropy - conditional_entropy)[..., None]


class BayesianActiveLearningByDisagreement(SingleModelAcquisitionBuilder):
    """(reference ``active_learning.py:418-513``)"""

    def __init__(self, jitter: float = 1e-6):
        self._jitter = jitter

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        return Partial(_bald_fn, predictor(model), self._jitter)

    def __repr__(self) -> str:
        return f"BayesianActiveLearningByDisagreement({self._jitter!r})"
