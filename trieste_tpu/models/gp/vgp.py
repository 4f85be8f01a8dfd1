"""Variational GP for non-conjugate likelihoods.

TPU-native rebuild of the reference's ``VariationalGaussianProcess``
(``models/gpflow/models.py:1109-1383``): a whitened full-rank variational posterior over
the latent function at the training inputs, an arbitrary observation likelihood
(:mod:`trieste_tpu.models.gp.likelihoods` — Bernoulli/Gaussian/Poisson, defaulting to
probit-Bernoulli classification) integrated in closed form or with Gauss-Hermite
quadrature, and training that alternates **natural-gradient steps** on
``(q_mu, q_sqrt)`` with L-BFGS hyperparameter steps (the reference's NaturalGradient
alternation, ``models.py:1276-1319``). The natural-gradient direction is obtained by
autodiff in expectation parameters — a closed-form transformation of the ordinary
gradients, no extra linear solves beyond one Cholesky.

Whitened representation: ``f = mean + L v`` with ``L = chol(K)`` over the padded
(masked) training inputs, ``q(v) = N(q_mu, q_sqrt q_sqrtᵀ)`` and prior ``N(0, I)`` —
structurally an SVGP whose inducing points are the training inputs.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...data import Dataset
from ...types import TensorType
from ...utils.misc import flatten_leading_dims, jitter_for
from ...ops.kernels import Stationary, gram
from ...ops.lbfgs import minimize_lbfgs
from ...ops.linalg import masked_cholesky
from .posterior import _mm
from .training import MIN_VARIANCE

from .likelihoods import BernoulliLikelihood


@struct.dataclass
class VGPParams:
    kernel: Stationary
    mean_constant: jax.Array
    q_mu: jax.Array  # [C, 1] whitened mean
    q_sqrt: jax.Array  # [C, C] whitened lower-tri sqrt
    likelihood: object = struct.field(default_factory=BernoulliLikelihood)


def vgp_variational_expectations(
    mean: jax.Array, var: jax.Array, Y: jax.Array, likelihood=None
) -> jax.Array:
    """``E_{N(f | mean, var)}[log p(y|f)]`` for ``likelihood`` (default probit-Bernoulli),
    closed-form where the likelihood provides one, else Gauss-Hermite, ``[C, 1]``."""
    likelihood = likelihood if likelihood is not None else BernoulliLikelihood()
    return likelihood.variational_expectations(mean, jnp.maximum(var, 1e-24), Y)


def _latent_moments(
    params: VGPParams, L: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Marginal q(f) moments at the training inputs: ``f = mean + L v``."""
    m = mask.astype(L.dtype)
    f_mean = _mm(L, params.q_mu)[:, 0] + params.mean_constant  # [C]
    LS = _mm(L, params.q_sqrt)  # [C, C]
    f_var = jnp.sum(jnp.square(LS), axis=-1)  # [C]
    return f_mean * m + (1 - m) * params.mean_constant, jnp.maximum(f_var, 1e-24)


def vgp_elbo(
    params: VGPParams, X: jax.Array, Y: jax.Array, mask: jax.Array
) -> jax.Array:
    """Whitened ELBO: masked quadrature likelihood minus KL[q(v) || N(0, I)]."""
    m = mask.astype(X.dtype)
    K = gram(params.kernel, X)
    L = masked_cholesky(K, mask)
    f_mean, f_var = _latent_moments(params, L, mask)
    ve = vgp_variational_expectations(
        f_mean[:, None], f_var[:, None], Y, params.likelihood
    )  # [C, 1]
    lik = jnp.sum(ve[:, 0] * m)
    diag = jnp.diagonal(params.q_sqrt)
    n = jnp.sum(m)
    # KL over the valid block; padded rows are pinned at the prior by construction
    kl = 0.5 * (
        jnp.sum(jnp.square(params.q_mu[:, 0]) * m)
        + jnp.sum(jnp.square(params.q_sqrt) * (m[:, None] * m[None, :]))
        - n
        - 2.0 * jnp.sum(jnp.log(jnp.maximum(jnp.abs(diag), 1e-24)) * m)
    )
    return lik - kl


def natural_gradient_step(
    params: VGPParams,
    X: jax.Array,
    Y: jax.Array,
    mask: jax.Array,
    gamma: float = 0.5,
) -> VGPParams:
    """One natural-gradient ascent step on ``(q_mu, q_sqrt)`` in expectation parameters
    (the reference's ``NaturalGradient`` — ``models/gpflow/models.py:1276-1319``).

    With ``eta1 = m``, ``eta2 = S + m mᵀ`` and natural params ``theta1 = S⁻¹m``,
    ``theta2 = -S⁻¹/2``, the update is ``theta += gamma * dL/deta`` where
    ``dL/deta1 = dL/dm - 2 (dL/dS) m`` and ``dL/deta2 = dL/dS``.
    """
    C = params.q_mu.shape[0]
    dtype = X.dtype
    eye = jnp.eye(C, dtype=dtype)
    mvec = params.q_mu[:, 0]
    S = _mm(params.q_sqrt, params.q_sqrt.T) + 1e-10 * eye

    def elbo_of_q(mv: jax.Array, S_in: jax.Array) -> jax.Array:
        S_sym = 0.5 * (S_in + S_in.T)
        q_sqrt = jnp.linalg.cholesky(S_sym + 1e-10 * eye)
        p = params.replace(q_mu=mv[:, None], q_sqrt=q_sqrt)
        return vgp_elbo(p, X, Y, mask)

    dL_dm, dL_dS = jax.grad(elbo_of_q, argnums=(0, 1))(mvec, S)
    dL_dS = 0.5 * (dL_dS + dL_dS.T)
    S_chol = jnp.linalg.cholesky(S)
    S_inv = jax.scipy.linalg.cho_solve((S_chol, True), eye)
    theta1 = S_inv @ mvec
    theta2 = -0.5 * S_inv
    theta1_new = theta1 + gamma * (dL_dm - 2.0 * dL_dS @ mvec)
    theta2_new = theta2 + gamma * dL_dS
    # map back: S' = -0.5 theta2'^{-1} (guard positive-definiteness)
    neg2 = -2.0 * theta2_new
    neg2 = 0.5 * (neg2 + neg2.T) + 1e-8 * eye
    L2 = jnp.linalg.cholesky(neg2)
    ok = jnp.all(jnp.isfinite(jnp.diagonal(L2)))
    S_new = jax.scipy.linalg.cho_solve((L2, True), eye)
    m_new = S_new @ theta1_new
    q_sqrt_new = jnp.linalg.cholesky(0.5 * (S_new + S_new.T) + 1e-10 * eye)
    # reject the step if it left the PD cone
    q_mu_out = jnp.where(ok, m_new[:, None], params.q_mu)
    q_sqrt_out = jnp.where(ok, q_sqrt_new, params.q_sqrt)
    return params.replace(q_mu=q_mu_out, q_sqrt=q_sqrt_out)


def vgp_predict_f(
    params: VGPParams, X: jax.Array, mask: jax.Array, query_points: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Latent predictions at new points (SVGP form with Z = training inputs)."""
    flat, unflatten = flatten_leading_dims(query_points, output_dims=2)
    K = gram(params.kernel, X)
    L = masked_cholesky(K, mask)
    Kxn = gram(params.kernel, flat, X) * mask.astype(flat.dtype)[None, :]  # [N, C]
    A = jax.scipy.linalg.solve_triangular(L, Kxn.T, lower=True)  # [C, N]
    mean = _mm(A.T, params.q_mu) + params.mean_constant  # [N, 1]
    SA = _mm(params.q_sqrt.T, A)  # [C, N]
    var = (
        params.kernel.diag(flat)
        - jnp.sum(jnp.square(A), axis=0)
        + jnp.sum(jnp.square(SA), axis=0)
    )
    var = jnp.maximum(var, 1e-24)[:, None]
    return unflatten(mean), unflatten(jnp.broadcast_to(var, mean.shape))


class VGPTrainingResult(NamedTuple):
    params: VGPParams
    loss: jax.Array


def fit_vgp(
    params: VGPParams,
    X: jax.Array,
    Y: jax.Array,
    mask: jax.Array,
    *,
    num_alternations: int = 10,
    num_natgrad_steps: int = 5,
    gamma: float = 0.5,
    max_hyper_iters: int = 25,
    priors=None,
) -> VGPTrainingResult:
    """Alternate natural-gradient variational steps with hyperparameter L-BFGS (MAP on
    the hyperparameters when ``priors`` is given)."""
    from .priors import log_prior_density

    # likelihoods with a trainable ``variance`` leaf (Gaussian) join the hyper step
    train_lik_var = hasattr(params.likelihood, "variance")

    def hyper_pack(p: VGPParams) -> jax.Array:
        ls = jnp.atleast_1d(p.kernel.lengthscales)
        parts = [
            jnp.log(jnp.maximum(jnp.atleast_1d(p.kernel.variance), MIN_VARIANCE)),
            jnp.log(jnp.maximum(ls, MIN_VARIANCE)),
        ]
        if train_lik_var:
            parts.append(
                jnp.log(jnp.maximum(jnp.atleast_1d(p.likelihood.variance), MIN_VARIANCE))
            )
        return jnp.concatenate(parts)

    def hyper_unpack(u: jax.Array, p: VGPParams) -> VGPParams:
        ls_shape = jnp.shape(p.kernel.lengthscales)
        n_ls = 1 if ls_shape == () else ls_shape[0]
        variance = jnp.exp(u[0])
        ls = jnp.exp(u[1 : 1 + n_ls])
        if ls_shape == ():
            ls = ls[0]
        p = p.replace(kernel=p.kernel.replace(variance=variance, lengthscales=ls))
        if train_lik_var:
            p = p.replace(
                likelihood=p.likelihood.replace(
                    variance=jnp.exp(u[1 + n_ls]).astype(u.dtype)
                )
            )
        return p

    def alternation(p: VGPParams, _):
        def ng(q, _):
            return natural_gradient_step(q, X, Y, mask, gamma), None

        p, _ = jax.lax.scan(ng, p, None, length=num_natgrad_steps)

        def loss_fn(u):
            p_u = hyper_unpack(u, p)
            nll = -vgp_elbo(p_u, X, Y, mask)
            if priors is not None:
                nll = nll - log_prior_density(p_u.kernel, priors)
            return nll

        res = minimize_lbfgs(loss_fn, hyper_pack(p), max_iters=max_hyper_iters)
        return hyper_unpack(res.x, p), None

    p, _ = jax.lax.scan(alternation, params, None, length=num_alternations)

    def ng(q, _):
        return natural_gradient_step(q, X, Y, mask, gamma), None

    p, _ = jax.lax.scan(ng, p, None, length=num_natgrad_steps)
    return VGPTrainingResult(params=p, loss=-vgp_elbo(p, X, Y, mask))


class VariationalGaussianProcess:
    """VGP over an arbitrary likelihood (reference ``models/gpflow/models.py:1109-1383``);
    the default probit-Bernoulli gives the classifier.

    ``predict`` returns latent moments; ``predict_y`` maps them through the
    likelihood (e.g. the probit integral ``Phi(mean / sqrt(1 + var))`` for Bernoulli).
    """

    def __init__(
        self,
        params: VGPParams,
        dataset: Dataset,
        *,
        num_alternations: int = 10,
        optimize_key: Optional[jax.Array] = None,
        priors=None,
    ):
        self._params = params
        self._dataset = dataset
        self._num_alternations = num_alternations
        self._priors = priors

    @property
    def params(self) -> VGPParams:
        return self._params

    def get_kernel(self):
        return self._params.kernel

    def get_internal_data(self) -> Dataset:
        return self._dataset

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return _jit_vgp_predict(
            self._params,
            self._dataset.query_points,
            self._dataset.mask,
            jnp.asarray(query_points),
        )

    def predict_partial(self):
        from jax.tree_util import Partial

        return Partial(
            vgp_predict_f, self._params, self._dataset.query_points, self._dataset.mask
        )

    def predict_y(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        mean, var = self.predict(query_points)
        return self._params.likelihood.predict_y(mean, var)

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        mean, var = self.predict(query_points)
        eps = jax.random.normal(key, (num_samples,) + mean.shape, mean.dtype)
        return mean[None] + jnp.sqrt(var)[None] * eps

    def update(self, dataset: Dataset) -> None:
        """Re-initialize the variational state for the new data size with jitter
        (reference ``models.py:1264-1275``)."""
        C = dataset.capacity
        dtype = dataset.query_points.dtype
        old_C = self._params.q_mu.shape[0]
        if C != old_C:
            q_mu = jnp.zeros((C, 1), dtype).at[:old_C].set(self._params.q_mu[: min(old_C, C)])
            eye = jnp.eye(C, dtype=dtype)
            q_sqrt = eye.at[:old_C, :old_C].set(self._params.q_sqrt[: min(old_C, C), : min(old_C, C)])
            self._params = self._params.replace(q_mu=q_mu, q_sqrt=q_sqrt)
        self._dataset = dataset

    def optimize(self, dataset: Dataset) -> VGPTrainingResult:
        result = _jit_vgp_fit(
            self._params,
            dataset.query_points,
            dataset.observations,
            dataset.mask,
            self._priors,
            self._num_alternations,
        )
        self._params = result.params
        self._dataset = dataset
        return result

    def log(self, dataset: Optional[Dataset] = None) -> None:
        pass

    def __repr__(self) -> str:
        return f"VariationalGaussianProcess(n={len(self._dataset)})"


def build_vgp_classifier(
    dataset: Dataset,
    search_space,
    *,
    kernel_kind: str = "matern52",
    noise_free: bool = False,
    optimize_key: Optional[jax.Array] = None,
) -> VariationalGaussianProcess:
    """Build a VGP Bernoulli classifier (role of reference ``builders.py:282-380``)."""
    from ...ops.kernels import stationary

    import math

    from .priors import default_priors

    dtype = dataset.query_points.dtype
    extent = (search_space.upper - search_space.lower).astype(dtype)
    from .builders import (
        CLASSIFICATION_KERNEL_VARIANCE,
        CLASSIFICATION_KERNEL_VARIANCE_NOISE_FREE,
    )

    variance = (
        CLASSIFICATION_KERNEL_VARIANCE_NOISE_FREE
        if noise_free
        else CLASSIFICATION_KERNEL_VARIANCE
    )
    ls = 0.2 * extent * math.sqrt(search_space.dimension)
    kernel = stationary(kernel_kind, variance=variance, lengthscales=ls, dtype=dtype)
    C = dataset.capacity
    params = VGPParams(
        kernel=kernel,
        mean_constant=jnp.asarray(0.0, dtype),
        q_mu=jnp.zeros((C, 1), dtype),
        q_sqrt=jnp.eye(C, dtype=dtype),
    )
    return VariationalGaussianProcess(params, dataset, priors=default_priors(kernel))


_jit_vgp_predict = jax.jit(vgp_predict_f)


@partial(jax.jit, static_argnames=("num_alternations",))
def _jit_vgp_fit(params, X, Y, mask, priors, num_alternations):
    return fit_vgp(params, X, Y, mask, num_alternations=num_alternations, priors=priors)
