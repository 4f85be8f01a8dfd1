"""Improvement-based and confidence-bound acquisition functions.

TPU-native rebuild of the reference ``trieste/acquisition/function/function.py`` (1.9k
LoC core family). Every builder returns a ``jax.tree_util.Partial`` binding a module-level
pure function to pytree state, so the downstream jitted optimizer compiles once per
*structure* rather than once per BO step (see :mod:`trieste_tpu.acquisition.interface`).

All functions use the minimization convention, like the reference.
"""
from __future__ import annotations

import math
from typing import Callable, Mapping, Optional, Sequence, cast

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm
from jax.tree_util import Partial

from ...data import Dataset
from ...models.interfaces import (
    HasReparamSampler,
    ProbabilisticModel,
    SupportsPredictJoint,
)
from ...observer import OBJECTIVE
from ...types import Tag, TensorType
from ..interface import (
    AcquisitionFunction,
    AcquisitionFunctionBuilder,
    SingleModelAcquisitionBuilder,
    SingleModelVectorizedAcquisitionBuilder,
)
from ..utils import predictor, joint_predictor


def _validate_dataset(dataset: Optional[Dataset], who: str) -> Dataset:
    if dataset is None or int(dataset.num_points) == 0:
        raise ValueError(f"{who} requires a non-empty dataset")
    return dataset


def _min_posterior_mean(model: ProbabilisticModel, dataset: Dataset) -> jax.Array:
    """eta: the minimum posterior mean at the observed points (reference
    ``function.py:160-186``), mask-aware over padded rows."""
    mean, _ = model.predict(dataset.query_points)
    big = jnp.asarray(jnp.finfo(mean.dtype).max, mean.dtype)
    masked = jnp.where(dataset.mask[:, None], mean, big)
    return jnp.min(masked)


# ---------------------------------------------------------------------------------
# Pure acquisition kernels (bound into Partials)
# ---------------------------------------------------------------------------------


def _normal_pdf_cdf(z: jax.Array) -> tuple[jax.Array, jax.Array]:
    return norm.pdf(z), norm.cdf(z)


def _single_batch(x: TensorType, who: str) -> jax.Array:
    """Trace-time check that ``x`` is ``[..., 1, D]`` — the reference's runtime shape
    assert (e.g. ``function.py:205-208``) as a free static check: non-batch acquisition
    functions silently scoring only the first batch element would be wrong, not slow."""
    x = jnp.asarray(x)
    if x.ndim < 2 or x.shape[-2] != 1:
        raise ValueError(
            f"{who} only supports batch sizes of one, got query shape {x.shape}"
        )
    return x


def _ei_fn(predict: Callable, eta: jax.Array, x: TensorType) -> jax.Array:
    """Analytic expected improvement (reference ``expected_improvement``,
    ``function.py:190-223``). ``x: [..., 1, D] -> [..., 1]``."""
    mean, var = predict(_single_batch(x, "expected_improvement")[..., 0, :])  # [..., L]
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    z = (eta - mean) / std
    pdf, cdf = _normal_pdf_cdf(z)
    return ((eta - mean) * cdf + std * pdf)[..., 0:1].reshape(mean.shape[:-1] + (1,))


def _poi_fn(predict: Callable, eta: jax.Array, x: TensorType) -> jax.Array:
    """Probability of improvement (reference ``probability_below_threshold``,
    ``function.py:47-95``)."""
    mean, var = predict(_single_batch(x, "probability_of_improvement")[..., 0, :])
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    return norm.cdf((eta - mean) / std)[..., 0:1]


def _aei_fn(
    predict: Callable, eta: jax.Array, noise_variance: jax.Array, x: TensorType
) -> jax.Array:
    """Augmented EI for noisy observations (reference ``function.py:226-327``)."""
    mean, var = predict(_single_batch(x, "augmented_expected_improvement")[..., 0, :])
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    z = (eta - mean) / std
    pdf, cdf = _normal_pdf_cdf(z)
    ei = (eta - mean) * cdf + std * pdf
    augmentation = 1.0 - jnp.sqrt(noise_variance) / jnp.sqrt(noise_variance + var)
    return (ei * augmentation)[..., 0:1]


def _neg_lcb_fn(predict: Callable, beta: jax.Array, x: TensorType) -> jax.Array:
    """Negative lower confidence bound (reference ``lower_confidence_bound``,
    ``function.py:379-419``)."""
    mean, var = predict(_single_batch(x, "lower_confidence_bound")[..., 0, :])
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    return -(mean - beta * std)[..., 0:1]


def _pof_fn(predict: Callable, threshold: jax.Array, x: TensorType) -> jax.Array:
    """Probability of feasibility P(f < threshold) (reference ``function.py:421-515``)."""
    mean, var = predict(_single_batch(x, "probability_of_feasibility")[..., 0, :])
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    return norm.cdf((threshold - mean) / std)[..., 0:1]


def _product_fn(fns: Sequence[Callable], x: TensorType) -> jax.Array:
    result = fns[0](x)
    for f in fns[1:]:
        result = result * f(x)
    return result


def _make_positive_fn(base: Callable, x: TensorType) -> jax.Array:
    """Softplus wrap (reference ``MakePositive``, ``function.py:1914-1971``)."""
    return jax.nn.softplus(base(x))


def _mc_ei_fn(sample: Callable, eta: jax.Array, x: TensorType) -> jax.Array:
    """Monte-Carlo EI via frozen reparametrization samples
    (reference ``function.py:786-922``). ``x: [..., 1, D]``."""
    samples = sample(jnp.asarray(x))  # [..., S, 1, L]
    improvement = jnp.maximum(eta - samples[..., 0], 0.0)  # [..., S, L]
    return jnp.mean(improvement, axis=-2)


def _mc_aei_fn(
    sample: Callable, predict: Callable, eta: jax.Array, noise_variance: jax.Array,
    x: TensorType,
) -> jax.Array:
    """Monte-Carlo augmented EI (reference ``MonteCarloAugmentedExpectedImprovement``,
    ``function.py:923-1073``): MC EI times the noise augmentation factor."""
    samples = sample(jnp.asarray(x))  # [..., S, 1, L]
    improvement = jnp.maximum(eta - samples[..., 0], 0.0)
    ei = jnp.mean(improvement, axis=-2)
    _, var = predict(jnp.asarray(x)[..., 0, :])
    augmentation = 1.0 - jnp.sqrt(noise_variance) / jnp.sqrt(noise_variance + var)
    return ei * augmentation[..., 0:1]


def _batch_mc_ei_fn(sample: Callable, eta: jax.Array, x: TensorType) -> jax.Array:
    """Batch Monte-Carlo (q)EI (reference ``BatchMonteCarloExpectedImprovement``,
    ``function.py:1074-1188``). ``x: [..., B, D] -> [..., 1]``."""
    samples = sample(jnp.asarray(x))  # [..., S, B, L]
    min_over_batch = jnp.min(samples[..., 0], axis=-1)  # [..., S]
    improvement = jnp.maximum(eta - min_over_batch, 0.0)
    return jnp.mean(improvement, axis=-1, keepdims=True)


def _monlcb_fn(predict: Callable, betas: jax.Array, x: TensorType) -> jax.Array:
    """Multiple-optimism negative LCB, vectorized over slices
    (reference ``function.py:1808-1912``). ``x: [..., V, D] -> [..., V]``."""
    mean, var = predict(jnp.asarray(x))  # [..., V, L]
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    return -(mean - betas[..., :, None] * std)[..., 0]


# ---------------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------------


class ProbabilityOfImprovement(SingleModelAcquisitionBuilder):
    """(reference ``function.py:47-95``)"""

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        dataset = _validate_dataset(dataset, "ProbabilityOfImprovement")
        eta = _min_posterior_mean(model, dataset)
        return Partial(_poi_fn, predictor(model), eta)

    def __repr__(self) -> str:
        return "ProbabilityOfImprovement()"


class ExpectedImprovement(SingleModelAcquisitionBuilder):
    """Analytic EI with the incumbent eta taken as the minimum posterior mean over the
    observed (optionally feasible) points (reference ``function.py:96-223``)."""

    def __init__(self, search_space: Optional[object] = None):
        # search_space enables the constraint-aware eta of the reference (:117-156)
        self._search_space = search_space

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        dataset = _validate_dataset(dataset, "ExpectedImprovement")
        eta = self._eta(model, dataset)
        return Partial(_ei_fn, predictor(model), eta)

    def update_acquisition_function(
        self,
        function: AcquisitionFunction,
        model: ProbabilisticModel,
        dataset: Optional[Dataset] = None,
    ) -> AcquisitionFunction:
        dataset = _validate_dataset(dataset, "ExpectedImprovement")
        eta = self._eta(model, dataset)
        return Partial(_ei_fn, predictor(model), eta)

    def _eta(self, model: ProbabilisticModel, dataset: Dataset) -> jax.Array:
        space = self._search_space
        if space is not None and getattr(space, "has_constraints", False):
            mean, _ = model.predict(dataset.query_points)
            feasible = space.is_feasible(dataset.query_points) & dataset.mask
            big = jnp.asarray(jnp.finfo(mean.dtype).max, mean.dtype)
            masked = jnp.where(feasible[:, None], mean, big)
            return jnp.min(masked)
        return _min_posterior_mean(model, dataset)

    def __repr__(self) -> str:
        return "ExpectedImprovement()"


class AugmentedExpectedImprovement(SingleModelAcquisitionBuilder):
    """EI scaled for noisy observations (reference ``function.py:226-327``)."""

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        dataset = _validate_dataset(dataset, "AugmentedExpectedImprovement")
        if not hasattr(model, "get_observation_noise"):
            raise NotImplementedError(
                "AugmentedExpectedImprovement requires a model with observation noise"
            )
        eta = _min_posterior_mean(model, dataset)
        return Partial(_aei_fn, predictor(model), eta, model.get_observation_noise())

    def __repr__(self) -> str:
        return "AugmentedExpectedImprovement()"


class NegativeLowerConfidenceBound(SingleModelAcquisitionBuilder):
    """(reference ``function.py:328-377``)"""

    def __init__(self, beta: float = 1.96):
        if beta < 0:
            raise ValueError(f"beta must be non-negative, got {beta}")
        self._beta = beta

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        return Partial(_neg_lcb_fn, predictor(model), jnp.asarray(self._beta))

    def __repr__(self) -> str:
        return f"NegativeLowerConfidenceBound({self._beta!r})"


class NegativePredictiveMean(NegativeLowerConfidenceBound):
    """(reference ``function.py:403-419``)"""

    def __init__(self) -> None:
        super().__init__(beta=0.0)

    def __repr__(self) -> str:
        return "NegativePredictiveMean()"


class ProbabilityOfFeasibility(SingleModelAcquisitionBuilder):
    """(reference ``function.py:421-515``)"""

    def __init__(self, threshold: float):
        self._threshold = threshold

    @property
    def threshold(self) -> float:
        return self._threshold

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        return Partial(_pof_fn, predictor(model), jnp.asarray(self._threshold))

    def __repr__(self) -> str:
        return f"ProbabilityOfFeasibility({self._threshold!r})"


class ExpectedConstrainedImprovement(AcquisitionFunctionBuilder):
    """EI over the feasible region: EI(x | feasible-incumbent) * PoF(x); falls back to the
    constraint function alone while no feasible point exists
    (reference ``function.py:608-784``)."""

    def __init__(
        self,
        objective_tag: Tag,
        constraint_builder: AcquisitionFunctionBuilder,
        min_feasibility_probability: float = 0.5,
        search_space: Optional[object] = None,
    ):
        if not 0 <= min_feasibility_probability <= 1:
            raise ValueError(
                f"min_feasibility_probability must be in [0, 1], got "
                f"{min_feasibility_probability}"
            )
        self._objective_tag = objective_tag
        self._constraint_builder = constraint_builder
        self._min_feasibility_probability = min_feasibility_probability
        self._search_space = search_space

    def prepare_acquisition_function(
        self,
        models: Mapping[Tag, ProbabilisticModel],
        datasets: Optional[Mapping[Tag, Dataset]] = None,
    ) -> AcquisitionFunction:
        if datasets is None or self._objective_tag not in datasets:
            raise ValueError(
                f"ExpectedConstrainedImprovement requires a dataset for tag "
                f"{self._objective_tag!r}"
            )
        objective_dataset = _validate_dataset(
            datasets[self._objective_tag], "ExpectedConstrainedImprovement"
        )
        objective_model = models[self._objective_tag]
        constraint_fn = self._constraint_builder.prepare_acquisition_function(
            models, datasets
        )
        qp = objective_dataset.query_points
        pof = constraint_fn(qp[:, None, :])[..., 0]  # [C]
        is_feasible = (pof >= self._min_feasibility_probability) & objective_dataset.mask
        if not bool(jnp.any(is_feasible)):
            return constraint_fn
        mean, _ = objective_model.predict(qp)
        big = jnp.asarray(jnp.finfo(mean.dtype).max, mean.dtype)
        eta = jnp.min(jnp.where(is_feasible[:, None], mean, big))
        ei = Partial(_ei_fn, predictor(objective_model), eta)
        return Partial(_product_fn, (ei, constraint_fn))

    def __repr__(self) -> str:
        return (
            f"ExpectedConstrainedImprovement({self._objective_tag!r}, "
            f"{self._constraint_builder!r}, {self._min_feasibility_probability!r})"
        )


def fast_constraints_feasibility(
    search_space: object, smoothing_function: Optional[Callable] = None
) -> AcquisitionFunction:
    """Feasibility from the space's own constraint residuals, smoothed by a CDF
    (reference ``FastConstraintsFeasibility``, ``function.py:516-607``)."""
    if not getattr(search_space, "has_constraints", False):
        raise NotImplementedError("search space has no constraints")
    smooth = smoothing_function or (lambda r: norm.cdf(r / 1e-3))

    def _fn(x: TensorType) -> jax.Array:
        residuals = search_space.constraints_residuals(jnp.asarray(x)[..., 0, :])
        return jnp.prod(smooth(residuals), axis=-1, keepdims=True)

    return _fn


class FastConstraintsFeasibility(SingleModelAcquisitionBuilder):
    """(reference ``function.py:516-607``)"""

    def __init__(self, search_space: object, smoothing_function: Optional[Callable] = None):
        self._fn = fast_constraints_feasibility(search_space, smoothing_function)

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        return self._fn

    def update_acquisition_function(
        self, function, model, dataset=None
    ) -> AcquisitionFunction:
        return function


class MakePositive(SingleModelAcquisitionBuilder):
    """Softplus-wrap another acquisition so it can be used where positivity is assumed,
    e.g. as a GIBBON quality term (reference ``function.py:1914-1971``)."""

    def __init__(self, base_builder: SingleModelAcquisitionBuilder):
        self._base = base_builder

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        base_fn = self._base.prepare_acquisition_function(model, dataset)
        return Partial(_make_positive_fn, base_fn)

    def update_acquisition_function(
        self, function, model, dataset=None
    ) -> AcquisitionFunction:
        base_fn = self._base.update_acquisition_function(
            function.args[0] if function.args else function, model, dataset
        )
        return Partial(_make_positive_fn, base_fn)

    def __repr__(self) -> str:
        return f"MakePositive({self._base!r})"


class MonteCarloExpectedImprovement(SingleModelAcquisitionBuilder):
    """MC EI using a reparametrization sampler (reference ``function.py:786-922``)."""

    def __init__(self, sample_size: int, *, key: Optional[jax.Array] = None):
        if sample_size <= 0:
            raise ValueError(f"sample_size must be positive, got {sample_size}")
        self._sample_size = sample_size
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        dataset = _validate_dataset(dataset, "MonteCarloExpectedImprovement")
        eta = _min_posterior_mean(model, dataset)
        sample_fn = _sample_fn_for(model, self._sample_size, self._key, joint=False)
        return Partial(_mc_ei_fn, sample_fn, eta)

    def __repr__(self) -> str:
        return f"MonteCarloExpectedImprovement({self._sample_size!r})"


def _frozen_sample(sampler, key, x):
    return sampler.sample(x, key=key)


def _sample_fn_for(model: ProbabilisticModel, sample_size: int, key: jax.Array, joint: bool):
    """A pytree-friendly frozen-randomness sampling callable for ``model``.

    Models exposing ``sample_joint_partial``/``sample_marginal_partial`` yield pure
    Partials (no retrace across BO steps); others fall back to a reparam-sampler object
    wrapped as a zero-leaf Partial (correct, but retraces per model object).
    """
    import functools

    attr = "sample_joint_partial" if joint else "sample_marginal_partial"
    if hasattr(model, attr):
        return getattr(model, attr)(sample_size, key)
    if not isinstance(model, HasReparamSampler):
        raise ValueError(
            "Monte-Carlo acquisition functions require a reparametrization-samplable model"
        )
    sampler = model.reparam_sampler(sample_size)
    return Partial(functools.partial(_frozen_sample, sampler, key))


class MonteCarloAugmentedExpectedImprovement(SingleModelAcquisitionBuilder):
    """MC augmented EI for noisy problems (reference ``function.py:923-1073``)."""

    def __init__(self, sample_size: int, *, key: Optional[jax.Array] = None):
        if sample_size <= 0:
            raise ValueError(f"sample_size must be positive, got {sample_size}")
        self._sample_size = sample_size
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        dataset = _validate_dataset(dataset, "MonteCarloAugmentedExpectedImprovement")
        if not hasattr(model, "get_observation_noise"):
            raise NotImplementedError(
                "MonteCarloAugmentedExpectedImprovement requires observation noise"
            )
        eta = _min_posterior_mean(model, dataset)
        sample_fn = _sample_fn_for(model, self._sample_size, self._key, joint=False)
        return Partial(
            _mc_aei_fn, sample_fn, predictor(model), eta, model.get_observation_noise()
        )

    def __repr__(self) -> str:
        return f"MonteCarloAugmentedExpectedImprovement({self._sample_size!r})"


class BatchMonteCarloExpectedImprovement(SingleModelAcquisitionBuilder):
    """Reparametrization-trick qEI over joint batch samples
    (reference ``function.py:1074-1188``)."""

    def __init__(self, sample_size: int, *, jitter: float = 1e-6, key: Optional[jax.Array] = None):
        if sample_size <= 0:
            raise ValueError(f"sample_size must be positive, got {sample_size}")
        self._sample_size = sample_size
        self._jitter = jitter
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        dataset = _validate_dataset(dataset, "BatchMonteCarloExpectedImprovement")
        eta = _min_posterior_mean(model, dataset)
        sample_fn = _sample_fn_for(model, self._sample_size, self._key, joint=True)
        return Partial(_batch_mc_ei_fn, sample_fn, eta)

    def __repr__(self) -> str:
        return f"BatchMonteCarloExpectedImprovement({self._sample_size!r})"


def _analytic_qei_fn(
    predict_joint: Callable, eta: jax.Array, qmc_points: jax.Array, x: TensorType
) -> jax.Array:
    """Analytic batch EI via the Chevalier-Ginsbourger decomposition with Genz MVN CDFs
    (reference ``BatchExpectedImprovement``, ``function.py:1189-1806``).

    ``qEI = sum_k E[(eta - Y_k) 1{Y_k <= eta, Y_k = min Y}]``; each term is an affine
    transform of the joint posterior evaluated through Q- and (Q-1)-dimensional normal
    CDFs. ``x: [..., B, D] -> [..., 1]``.
    """
    from .utils import mvn_cdf

    x = jnp.asarray(x)
    mean, cov = predict_joint(x)  # [..., B, L], [..., L, B, B]
    m = mean[..., 0]  # [..., B]
    S = cov[..., 0, :, :]  # [..., B, B]
    Q = m.shape[-1]
    if qmc_points.shape[-1] < max(Q - 1, 1):
        # the builder pre-sizes the QMC set for moderate batches; larger batches (the
        # reference handles general q, ``function.py:1189``) regenerate at trace time
        # since Q is static here
        from ...ops.qmc import sobol_sample

        qmc_points = sobol_sample(qmc_points.shape[0], Q - 1, skip=1).astype(m.dtype)
    dtype = m.dtype
    total = jnp.zeros(m.shape[:-1], dtype)
    for k in range(Q):
        # A: rows j != k give Y_k - Y_j; row k gives Y_k
        A = -jnp.eye(Q, dtype=dtype)
        A = A.at[:, k].add(1.0)
        A = A.at[k, k].set(1.0)
        mk = jnp.einsum("ij,...j->...i", A, m)
        Sk = jnp.einsum("ij,...jl,ml->...im", A, S, A)
        Sk = Sk + 1e-10 * jnp.eye(Q, dtype=dtype)
        bk = jnp.zeros(Q, dtype).at[k].set(1.0) * eta  # zeros except eta at k
        bk = jnp.broadcast_to(bk, mk.shape)
        Pk = mvn_cdf(bk, mk, Sk, qmc_points)  # [...]
        term = (eta - mk[..., k]) * Pk
        # second-order terms: sum_i Sk[k, i] * phi_1(b_i) * Phi_{Q-1}(conditional)
        for i in range(Q):
            Sii = jnp.maximum(Sk[..., i, i], 1e-24)
            std_i = jnp.sqrt(Sii)
            z_i = (bk[..., i] - mk[..., i]) / std_i
            phi_i = jnp.exp(-0.5 * z_i**2) / (std_i * jnp.sqrt(2.0 * jnp.pi))
            if Q == 1:
                cond_cdf = jnp.ones(m.shape[:-1], dtype)
            else:
                rest = [j for j in range(Q) if j != i]
                m_rest = mk[..., rest]
                b_rest = bk[..., rest]
                S_ri = Sk[..., rest, i]  # [..., Q-1]
                S_rr = Sk[..., rest, :][..., :, rest]
                mu_cond = m_rest + S_ri * ((bk[..., i] - mk[..., i]) / Sii)[..., None]
                S_cond = S_rr - jnp.einsum("...i,...j->...ij", S_ri, S_ri) / Sii[..., None, None]
                S_cond = S_cond + 1e-10 * jnp.eye(Q - 1, dtype=dtype)
                cond_cdf = mvn_cdf(b_rest, mu_cond, S_cond, qmc_points[:, : max(Q - 2, 1)])
            term = term + Sk[..., k, i] * phi_i * cond_cdf
        total = total + term
    return jnp.maximum(total, 0.0)[..., None]


class BatchExpectedImprovement(SingleModelAcquisitionBuilder):
    """Analytic (accurate but expensive) batch expected improvement
    (reference ``function.py:1189-1806``)."""

    def __init__(self, sample_size: int = 128):
        if sample_size <= 0:
            raise ValueError(f"sample_size must be positive, got {sample_size}")
        self._sample_size = sample_size

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        from .utils import make_mvn_cdf

        dataset = _validate_dataset(dataset, "BatchExpectedImprovement")
        eta = _min_posterior_mean(model, dataset)
        # QMC points sized for the largest CDF dimension we may see; the per-call slices
        # adapt to the actual batch size
        qmc = make_mvn_cdf(self._sample_size, dimension=16)
        return Partial(_analytic_qei_fn, joint_predictor(model), eta, qmc)

    def update_acquisition_function(
        self, function, model, dataset=None
    ) -> AcquisitionFunction:
        return self.prepare_acquisition_function(model, dataset)

    def __repr__(self) -> str:
        return f"BatchExpectedImprovement({self._sample_size!r})"


class MultipleOptimismNegativeLowerConfidenceBound(
    SingleModelVectorizedAcquisitionBuilder
):
    """Vectorized random-beta LCB fleet (MONLCB) — one optimism level per slice
    (reference ``function.py:1808-1912``)."""

    def __init__(self, search_space: object, *, key: Optional[jax.Array] = None):
        self._search_space = search_space
        self._key = key if key is not None else jax.random.PRNGKey(17)

    def prepare_acquisition_function(
        self, model: ProbabilisticModel, dataset: Optional[Dataset] = None
    ) -> AcquisitionFunction:
        return Partial(
            _monlcb_fn_spread,
            predictor(model),
            jnp.asarray(float(getattr(self._search_space, "dimension", 1))),
        )

    def update_acquisition_function(
        self, function, model, dataset=None
    ) -> AcquisitionFunction:
        return Partial(_monlcb_fn_spread, predictor(model), function.args[1])

    def __repr__(self) -> str:
        return "MultipleOptimismNegativeLowerConfidenceBound()"


def _monlcb_fn_spread(predict, dim, x):
    """Per-slice betas via the CDF-spread method of Torossian et al.: slice v uses the
    normal quantile of ``0.5 + 0.5 v/(V+1)``, scaled by ``5 * dim`` — slice 1 is nearly
    pure exploitation, slice V strongly explores (reference ``function.py:1884-1911``)."""
    from jax.scipy.special import ndtri

    x = jnp.asarray(x)
    V = x.shape[-2]
    spread = 0.5 + 0.5 * jnp.arange(1, V + 1, dtype=x.dtype) / (V + 1.0)
    betas = 5.0 * dim * ndtri(spread)
    return _monlcb_fn(predict, betas, x)
