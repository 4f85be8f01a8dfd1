"""Function-form acquisition factories.

The reference exposes every acquisition both as a builder class AND as a bare
function-form constructor (``expected_improvement``, ``lower_confidence_bound``,
``gibbon_quality_term``, …) that binds a model plus scalars and returns the callable
acquisition. This module provides the same names for migration parity. Each factory
returns a :class:`jax.tree_util.Partial` over the module-level math kernels — a pytree,
so the returned functions compose with ``jit``/``vmap`` and the no-retrace optimizer
protocol exactly like the builder-produced ones (see :mod:`..interface`).

Sampling-based forms take a *frozen sample callable* ``x -> samples`` (what
``ReparametrizationSampler.sample`` binds to) instead of the reference's sampler
objects — the JAX-native equivalent of a sampler with fixed base draws.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.tree_util import Partial

from ...types import TensorType
from ..utils import predictor
from .function import (
    _aei_fn,
    _analytic_qei_fn,
    _batch_mc_ei_fn,
    _ei_fn,
    _mc_aei_fn,
    _mc_ei_fn,
    _monlcb_fn_spread,
    _poi_fn,
)
from .active_learning import (
    _bald_fn,
    _expected_feasibility_bichon_fn,
    _expected_feasibility_ranjan_fn,
    _predictive_variance_fn,
)
from .entropy import _gibbon_quality_fn, _gibbon_repulsion_fn, _mes_fn, _mumbo_fn
from .greedy_batch import _hard_penalizer_fn, _penalized_fn, _soft_penalizer_fn
from .multi_objective import _batch_ehvi_fn, _ehvi_fn, _hippo_penalty_fn

AcquisitionFunction = Callable[[TensorType], jax.Array]

PenalizedAcquisition = AcquisitionFunction
"""Alias: a base acquisition multiplied by a penalizer (reference
``greedy_batch.py:42-53``)."""


def expected_improvement(model, eta: TensorType) -> AcquisitionFunction:
    """Analytic EI against incumbent ``eta`` (reference ``function.py:190-223``)."""
    return Partial(_ei_fn, predictor(model), jnp.asarray(eta))


def augmented_expected_improvement(model, eta: TensorType) -> AcquisitionFunction:
    """Noise-augmented EI (reference ``function.py:286-327``)."""
    return Partial(_aei_fn, predictor(model), jnp.asarray(eta), model.get_observation_noise())


def probability_below_threshold(model, threshold: TensorType) -> AcquisitionFunction:
    """P(f(x) < threshold) — serves both PoI and PoF (reference ``function.py:47-95``)."""
    return Partial(_poi_fn, predictor(model), jnp.asarray(threshold))


def _lcb_fn(predict: Callable, beta: jax.Array, x: TensorType) -> jax.Array:
    mean, var = predict(jnp.asarray(x)[..., 0, :])
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    return (mean - beta * std)[..., 0:1]


def lower_confidence_bound(model, beta: TensorType) -> AcquisitionFunction:
    """``mean - beta * std`` (reference ``function.py:379-402``; minimize this, or use
    :class:`~.function.NegativeLowerConfidenceBound` for the maximization form)."""
    return Partial(_lcb_fn, predictor(model), jnp.asarray(beta))


def multiple_optimism_lower_confidence_bound(model, search_space_dim: int) -> AcquisitionFunction:
    """Vectorized random-beta negative LCB over V slices
    (reference ``function.py:1884-1911``)."""
    return Partial(_monlcb_fn_spread, predictor(model), search_space_dim)


def monte_carlo_expected_improvement(sample: Callable, eta: TensorType) -> AcquisitionFunction:
    """MC EI from a frozen sample callable (reference ``function.py:786-922``)."""
    return Partial(_mc_ei_fn, sample, jnp.asarray(eta))


def monte_carlo_augmented_expected_improvement(
    sample: Callable, model, eta: TensorType
) -> AcquisitionFunction:
    """MC augmented EI (reference ``function.py:923-1073``)."""
    return Partial(
        _mc_aei_fn, sample, predictor(model), jnp.asarray(eta), model.get_observation_noise()
    )


def batch_monte_carlo_expected_improvement(sample: Callable, eta: TensorType) -> AcquisitionFunction:
    """Reparametrization-trick qEI (reference ``function.py:1074-1188``)."""
    return Partial(_batch_mc_ei_fn, sample, jnp.asarray(eta))


def batch_expected_improvement(
    model, eta: TensorType, qmc_points: jax.Array
) -> AcquisitionFunction:
    """Analytic qEI via Genz MVN CDFs; ``qmc_points`` are the base QMC uniforms for the
    CDF quadrature (reference ``function.py:1189-1806``)."""
    from ..utils import joint_predictor

    return Partial(_analytic_qei_fn, joint_predictor(model), jnp.asarray(eta), qmc_points)


# -- active learning (reference active_learning.py) ---------------------------------


def predictive_variance(model, jitter: float = 0.0) -> AcquisitionFunction:
    """Determinant of the joint predictive covariance, with ``jitter`` added to the
    covariance diagonal for stability (reference ``active_learning.py:84-112``)."""
    from ..utils import joint_predictor

    return Partial(_predictive_variance_fn, joint_predictor(model), jitter)


def bichon_ranjan_criterion(
    model, threshold: TensorType, alpha: TensorType, delta: int
) -> AcquisitionFunction:
    """Expected feasibility, bichon (delta=1) or ranjan (delta=2) flavour
    (reference ``active_learning.py:113-249``)."""
    fn = _expected_feasibility_bichon_fn if delta == 1 else _expected_feasibility_ranjan_fn
    return Partial(fn, predictor(model), jnp.asarray(threshold), jnp.asarray(alpha))


def integrated_variance_reduction(
    model, integration_points: TensorType, threshold=None
) -> AcquisitionFunction:
    """IVR over fixed integration points (reference ``active_learning.py:250-417``);
    delegates to the builder, which owns the threshold-weighting logic."""
    from .active_learning import IntegratedVarianceReduction

    builder = IntegratedVarianceReduction(jnp.asarray(integration_points), threshold)
    return builder.prepare_acquisition_function(model)


def bayesian_active_learning_by_disagreement(model, jitter: float = 1e-6) -> AcquisitionFunction:
    """BALD for Bernoulli-observation models; ``jitter`` floors the latent variance
    (reference ``active_learning.py:418-513``)."""
    return Partial(_bald_fn, predictor(model), jitter)


# -- entropy family (reference entropy.py) ------------------------------------------


def min_value_entropy_search(model, min_value_samples: TensorType) -> AcquisitionFunction:
    """MES against sampled minimum values (reference ``entropy.py:164-235``)."""
    return Partial(_mes_fn, predictor(model), jnp.asarray(min_value_samples))


def gibbon_quality_term(model, min_value_samples: TensorType) -> AcquisitionFunction:
    """GIBBON quality term (reference ``entropy.py:439-502``)."""
    return Partial(
        _gibbon_quality_fn,
        predictor(model),
        model.get_observation_noise(),
        jnp.asarray(min_value_samples),
    )


def gibbon_repulsion_term(model, pending_points: TensorType) -> AcquisitionFunction:
    """GIBBON determinant-based repulsion against pending points
    (reference ``entropy.py:503-621``)."""
    from ..utils import joint_predictor

    return Partial(
        _gibbon_repulsion_fn,
        predictor(model),
        joint_predictor(model),
        model.get_observation_noise(),
        jnp.asarray(pending_points),
    )


def mumbo(model, min_value_samples: TensorType) -> AcquisitionFunction:
    """Multifidelity MES (reference ``entropy.py:634-791``); ``model`` must support
    ``covariance_with_top_fidelity``."""
    from .entropy import _TopFidelityView

    top_view = _TopFidelityView(model, model.num_fidelities - 1)
    return Partial(
        _mumbo_fn,
        Partial(model.predict),
        Partial(model.covariance_with_top_fidelity),
        Partial(top_view.predict),
        model.get_observation_noise(),
        jnp.asarray(min_value_samples),
    )


# -- greedy batch penalizers (reference greedy_batch.py) ----------------------------


def soft_local_penalizer(
    model, pending_points: TensorType, lipschitz_constant: TensorType, eta: TensorType
) -> AcquisitionFunction:
    """Gonzalez et al. soft penalizer (reference ``greedy_batch.py:300-345``)."""
    return Partial(
        _soft_penalizer_fn,
        predictor(model),
        jnp.asarray(lipschitz_constant),
        jnp.asarray(eta),
        jnp.asarray(pending_points),
    )


def hard_local_penalizer(
    model, pending_points: TensorType, lipschitz_constant: TensorType, eta: TensorType
) -> AcquisitionFunction:
    """Alvi et al. hard penalizer (reference ``greedy_batch.py:348-390``)."""
    return Partial(
        _hard_penalizer_fn,
        predictor(model),
        jnp.asarray(lipschitz_constant),
        jnp.asarray(eta),
        jnp.asarray(pending_points),
    )


def local_penalizer(base: AcquisitionFunction, penalizer: AcquisitionFunction) -> AcquisitionFunction:
    """Multiply a base acquisition by a penalizer (reference ``PenalizedAcquisition``)."""
    return Partial(_penalized_fn, base, penalizer)


# -- multi-objective (reference multi_objective.py) ---------------------------------


def expected_hv_improvement(model, partition_bounds) -> AcquisitionFunction:
    """Analytic EHVI over partitioned cells ``(lower [K, M], upper [K, M])``
    (reference ``multi_objective.py:160-252``)."""
    lower, upper = partition_bounds
    return Partial(_ehvi_fn, predictor(model), jnp.asarray(lower), jnp.asarray(upper))


def batch_ehvi(sample: Callable, sampler_jitter: float, partition_bounds) -> AcquisitionFunction:
    """qEHVI from a frozen sample callable (reference ``multi_objective.py:350-414``)."""
    lower, upper = partition_bounds
    from .multi_objective import _subset_masks

    def fn(x: TensorType) -> jax.Array:
        x = jnp.asarray(x)
        masks = _subset_masks(x.shape[-2])
        return _batch_ehvi_fn(sample, jnp.asarray(lower), jnp.asarray(upper), masks, x)

    return fn


def hippo_penalizer(models, pending_points: TensorType) -> AcquisitionFunction:
    """HIPPO correlation penalizer against pending points
    (reference ``multi_objective.py:650-757``); ``models`` is a ModelStack whose members
    expose ``(params, posterior_cache)``."""
    member_states = tuple(
        (m.params, m.posterior_cache) for m in getattr(models, "_models", (models,))
    )
    return Partial(_hippo_penalty_fn, member_states, jnp.asarray(pending_points))
