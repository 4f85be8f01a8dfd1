"""Sparse GP models: SGPR (collapsed Titsias bound) and SVGP (variational).

TPU-native rebuild of the reference's sparse surrogates
(``models/gpflow/models.py:528-1108``): same math as GPflow's SGPR/SVGP, rebuilt as pure
mask-aware JAX functions over padded buffers.

* :class:`SparseGaussianProcessRegression`: the collapsed evidence lower bound — the
  optimal ``q(u)`` is analytic, so training is multi-start L-BFGS over hyperparameters
  (and optionally the inducing locations) only.
* :class:`SparseVariational` (SVGP): whitened explicit ``q(v) = N(q_mu, q_sqrt q_sqrtᵀ)``.
  For the Gaussian likelihood the natural-gradient step with unit step size lands exactly
  on the optimal variational distribution given the hyperparameters (the reference runs
  iterative NaturalGradient for this — ``models.py:1276-1319``); training therefore
  alternates {closed-form variational update, hyperparameter L-BFGS}.

Scaling note (SURVEY.md §5.7): these models replace the exact-GP O(n³) Cholesky with
O(n·M²) cross-covariance work — the n axis is a clean shard axis over chips.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...data import Dataset
from ...types import TensorType
from ...utils.misc import flatten_leading_dims, jitter_for
from ...ops.kernels import Stationary, gram
from ...ops.lbfgs import minimize_lbfgs
from ..interfaces import ReparametrizationSampler, TrajectorySampler
from .posterior import _mm
from .training import MIN_VARIANCE, NOISE_FLOOR


@struct.dataclass
class SGPRParams:
    """SGPR hyperparameters: kernel + noise + constant mean + inducing locations."""

    kernel: Stationary
    noise_variance: jax.Array
    mean_constant: jax.Array
    inducing_points: jax.Array  # [M, D]


@struct.dataclass
class SGPRCache:
    """Factorized quantities for O(N·M) predictions."""

    X: jax.Array
    mask: jax.Array
    L: jax.Array  # chol(Kuu) [M, M]
    LB: jax.Array  # chol(I + A Aᵀ) [M, M]
    c: jax.Array  # LB^{-1} A ym / σ [M, P]


def _sgpr_factors(params: SGPRParams, X: jax.Array, Y: jax.Array, mask: jax.Array):
    Z = params.inducing_points
    M = Z.shape[0]
    m = mask.astype(X.dtype)
    sigma = jnp.sqrt(jnp.maximum(params.noise_variance, NOISE_FLOOR))
    Kuu = gram(params.kernel, Z) + jitter_for(X.dtype) * jnp.eye(M, dtype=X.dtype)
    Kuf = gram(params.kernel, Z, X) * m[None, :]  # masked columns
    L = jnp.linalg.cholesky(Kuu)
    A = jax.scipy.linalg.solve_triangular(L, Kuf, lower=True) / sigma  # [M, C]
    AAT = _mm(A, A.T)
    B = AAT + jnp.eye(M, dtype=X.dtype)
    LB = jnp.linalg.cholesky(B)
    ym = (Y - params.mean_constant) * m[:, None]
    Aerr = _mm(A, ym) / sigma  # [M, P]
    c = jax.scipy.linalg.solve_triangular(LB, Aerr, lower=True)  # [M, P]
    return m, sigma, L, A, AAT, LB, ym, c


def sgpr_elbo(params: SGPRParams, X: jax.Array, Y: jax.Array, mask: jax.Array) -> jax.Array:
    """Titsias's collapsed bound (GPflow ``SGPR.elbo`` equivalent), mask-aware."""
    m, sigma, L, A, AAT, LB, ym, c = _sgpr_factors(params, X, Y, mask)
    n = jnp.sum(m)
    P = Y.shape[-1]
    sigma2 = sigma**2
    bound = -0.5 * n * P * jnp.log(2.0 * jnp.pi * sigma2)
    bound -= P * jnp.sum(jnp.log(jnp.diagonal(LB)))
    bound -= 0.5 * jnp.sum(jnp.square(ym)) / sigma2
    bound += 0.5 * jnp.sum(jnp.square(c))
    kdiag_sum = jnp.sum(params.kernel.diag(X) * m)
    bound -= 0.5 * P * (kdiag_sum / sigma2 - jnp.trace(AAT))
    return bound


def sgpr_build_cache(
    params: SGPRParams, X: jax.Array, Y: jax.Array, mask: jax.Array
) -> SGPRCache:
    _, _, L, _, _, LB, _, c = _sgpr_factors(params, X, Y, mask)
    return SGPRCache(X=X, mask=mask, L=L, LB=LB, c=c)


def sgpr_predict_f(
    params: SGPRParams, cache: SGPRCache, query_points: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """``[..., D] -> mean [..., P], var [..., P]`` (GPflow ``SGPR.predict_f``)."""
    flat, unflatten = flatten_leading_dims(query_points, output_dims=2)
    Kux = gram(params.kernel, params.inducing_points, flat)  # [M, N]
    tmp1 = jax.scipy.linalg.solve_triangular(cache.L, Kux, lower=True)  # [M, N]
    tmp2 = jax.scipy.linalg.solve_triangular(cache.LB, tmp1, lower=True)  # [M, N]
    mean = _mm(tmp2.T, cache.c) + params.mean_constant  # [N, P]
    var = (
        params.kernel.diag(flat)
        - jnp.sum(jnp.square(tmp1), axis=0)
        + jnp.sum(jnp.square(tmp2), axis=0)
    )
    var = jnp.maximum(var, 1e-24)
    var = jnp.broadcast_to(var[:, None], mean.shape)
    return unflatten(mean), unflatten(var)


def sgpr_predict_joint(
    params: SGPRParams, cache: SGPRCache, query_points: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    if query_points.ndim == 2:
        mean, cov = sgpr_predict_joint(params, cache, query_points[None])
        return mean[0], cov[0]
    flat = jnp.reshape(query_points, (-1,) + query_points.shape[-2:])

    def single(xb):
        Kux = gram(params.kernel, params.inducing_points, xb)  # [M, B]
        tmp1 = jax.scipy.linalg.solve_triangular(cache.L, Kux, lower=True)
        tmp2 = jax.scipy.linalg.solve_triangular(cache.LB, tmp1, lower=True)
        mean = _mm(tmp2.T, cache.c) + params.mean_constant
        Kxx = gram(params.kernel, xb)
        cov = Kxx - _mm(tmp1.T, tmp1) + _mm(tmp2.T, tmp2)
        cov = jnp.broadcast_to(cov[None], (mean.shape[-1],) + cov.shape)
        return mean, cov

    mean, cov = jax.vmap(single)(flat)
    lead = query_points.shape[:-2]
    return (
        jnp.reshape(mean, lead + mean.shape[1:]),
        jnp.reshape(cov, lead + cov.shape[1:]),
    )


# -- SGPR training ------------------------------------------------------------------


def _sgpr_pack(params: SGPRParams, train_noise: bool, train_inducing: bool) -> jax.Array:
    ls = jnp.atleast_1d(params.kernel.lengthscales)
    parts = [
        jnp.log(jnp.maximum(jnp.atleast_1d(params.kernel.variance), MIN_VARIANCE)),
        jnp.log(jnp.maximum(ls, MIN_VARIANCE)),
        jnp.atleast_1d(params.mean_constant),
    ]
    if train_noise:
        parts.append(
            jnp.log(
                jnp.maximum(jnp.atleast_1d(params.noise_variance) - NOISE_FLOOR, MIN_VARIANCE)
            )
        )
    if train_inducing:
        parts.append(params.inducing_points.reshape(-1))
    return jnp.concatenate(parts)


def _sgpr_unpack(
    u: jax.Array, template: SGPRParams, train_noise: bool, train_inducing: bool
) -> SGPRParams:
    ls_shape = jnp.shape(template.kernel.lengthscales)
    n_ls = 1 if ls_shape == () else ls_shape[0]
    variance = jnp.exp(u[0])
    ls = jnp.exp(u[1 : 1 + n_ls])
    if ls_shape == ():
        ls = ls[0]
    mean_constant = u[1 + n_ls]
    idx = 2 + n_ls
    if train_noise:
        noise = NOISE_FLOOR + jnp.exp(u[idx])
        idx += 1
    else:
        noise = template.noise_variance
    if train_inducing:
        M, D = template.inducing_points.shape
        Z = u[idx : idx + M * D].reshape(M, D)
    else:
        Z = template.inducing_points
    return SGPRParams(
        kernel=template.kernel.replace(variance=variance, lengthscales=ls),
        noise_variance=noise,
        mean_constant=mean_constant,
        inducing_points=Z,
    )


class SGPRTrainingResult(NamedTuple):
    params: SGPRParams
    loss: jax.Array
    all_losses: jax.Array


def fit_sgpr(
    key: jax.Array,
    params: SGPRParams,
    X: jax.Array,
    Y: jax.Array,
    mask: jax.Array,
    *,
    num_starts: int = 5,
    train_noise: bool = True,
    train_inducing: bool = True,
    max_iters: int = 100,
    pool_sharding=None,
    priors=None,
) -> SGPRTrainingResult:
    """Multi-start L-BFGS on the negative collapsed ELBO (MAP when ``priors`` carries
    the builder's LogNormal kernel priors). ``pool_sharding`` shards the restart pool
    over the active mesh (see :mod:`trieste_tpu.parallel`)."""
    from .priors import log_prior_density, sample_log_params, squeeze_kernel

    def loss_fn(u):
        p = _sgpr_unpack(u, params, train_noise, train_inducing)
        nll = -sgpr_elbo(p, X, Y, mask)
        if priors is not None:
            nll = nll - log_prior_density(p.kernel, priors)
        return nll

    u0 = _sgpr_pack(params, train_noise, train_inducing)
    ls_count = 1 if jnp.shape(params.kernel.lengthscales) == () else jnp.shape(params.kernel.lengthscales)[0]
    if priors is not None:
        # restarts drawn from the priors (reference randomize_hyperparameters)
        log_var, log_ls = sample_log_params(key, priors, num_starts - 1, ls_count)
        rest = jnp.broadcast_to(u0[None], (num_starts - 1, u0.shape[0]))
        rest = rest.at[:, 0].set(log_var)
        rest = rest.at[:, 1 : 1 + ls_count].set(log_ls)
        starts = jnp.concatenate([u0[None], rest], axis=0)
    else:
        n_hyper = 2 + ls_count + (1 if train_noise else 0)
        shifts = jax.random.uniform(
            key, (num_starts - 1, u0.shape[0]), dtype=u0.dtype, minval=-1.5, maxval=1.5
        )
        # only perturb the hyperparameters, not the mean constant or inducing locations
        keep = jnp.zeros_like(u0, bool).at[: n_hyper].set(True)
        keep = keep.at[1 + ls_count].set(False)  # mean constant
        starts = jnp.concatenate([u0[None], u0[None] + shifts * keep[None, :]], axis=0)
    if pool_sharding is not None:
        starts = jax.lax.with_sharding_constraint(starts, pool_sharding)
    results = jax.vmap(lambda s: minimize_lbfgs(loss_fn, s, max_iters=max_iters))(starts)
    losses = jnp.where(jnp.isfinite(results.fun), results.fun, jnp.inf)
    best = jnp.argmin(losses)
    best_params = _sgpr_unpack(results.x[best], params, train_noise, train_inducing)
    if priors is not None:
        best_params = best_params.replace(kernel=squeeze_kernel(best_params.kernel, priors))
    return SGPRTrainingResult(
        params=best_params,
        loss=losses[best],
        all_losses=losses,
    )


class SparseGaussianProcessRegression:
    """SGPR model wrapper (reference ``models/gpflow/models.py:528-842``)."""

    def __init__(
        self,
        params: SGPRParams,
        dataset: Dataset,
        *,
        inducing_point_selector: Optional[object] = None,
        num_starts: int = 5,
        train_noise: bool = True,
        train_inducing: bool = True,
        max_optimize_iters: int = 100,
        optimize_key: Optional[jax.Array] = None,
        priors=None,
    ):
        self._params = params
        self._dataset = dataset
        self._selector = inducing_point_selector
        self._num_starts = num_starts
        self._train_noise = train_noise
        self._train_inducing = train_inducing
        self._max_iters = max_optimize_iters
        self._priors = priors
        self._key = optimize_key if optimize_key is not None else jax.random.PRNGKey(0)
        self._refresh()

    def _refresh(self) -> None:
        self._cache = _jit_sgpr_cache(
            self._params,
            self._dataset.query_points,
            self._dataset.observations,
            self._dataset.mask,
        )

    @property
    def params(self) -> SGPRParams:
        return self._params

    @property
    def posterior_cache(self) -> SGPRCache:
        return self._cache

    def get_kernel(self):
        return self._params.kernel

    def get_observation_noise(self) -> jax.Array:
        return self._params.noise_variance

    def get_internal_data(self) -> Dataset:
        return self._dataset

    def get_inducing_variables(self):
        """``(Z, q_mu, q_sqrt, whiten)`` of the (analytic) optimal q(u)
        (reference ``models.py:742-812``)."""
        # q(u) mean = L LB^{-T} c  (c already carries the 1/σ² data scaling)
        LBinvT_c = jax.scipy.linalg.solve_triangular(
            self._cache.LB, self._cache.c, lower=True, trans=1
        )
        q_mu = _mm(self._cache.L, LBinvT_c)
        B_inv = jax.scipy.linalg.cho_solve((self._cache.LB, True), jnp.eye(self._cache.LB.shape[0], dtype=q_mu.dtype))
        q_cov = _mm(self._cache.L, _mm(B_inv, self._cache.L.T))
        q_sqrt = jnp.linalg.cholesky(
            q_cov + jitter_for(q_cov.dtype) * jnp.eye(q_cov.shape[0], dtype=q_cov.dtype)
        )
        return self._params.inducing_points, q_mu, q_sqrt[None], False

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return _jit_sgpr_predict(self._params, self._cache, jnp.asarray(query_points))

    def predict_joint(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return _jit_sgpr_predict_joint(self._params, self._cache, jnp.asarray(query_points))

    def predict_y(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        mean, var = self.predict(query_points)
        return mean, var + self._params.noise_variance

    def predict_partial(self):
        from jax.tree_util import Partial

        return Partial(sgpr_predict_f, self._params, self._cache)

    def predict_joint_partial(self):
        from jax.tree_util import Partial

        return Partial(sgpr_predict_joint, self._params, self._cache)

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        mean, cov = self.predict_joint(query_points)
        B = cov.shape[-1]
        Lc = jnp.linalg.cholesky(cov + jitter_for(cov.dtype) * jnp.eye(B, dtype=cov.dtype))
        eps = jax.random.normal(key, cov.shape[:-2] + (num_samples, B), cov.dtype)
        samp = jnp.einsum("...pij,...psj->...psi", Lc, eps)
        return jnp.moveaxis(samp, -3, -1) + mean[..., None, :, :]

    def sample_joint_partial(self, num_samples: int, key: jax.Array):
        from jax.tree_util import Partial

        s_token = jnp.zeros((num_samples,), self._cache.X.dtype)
        return Partial(_sgpr_pure_sample, self._params, self._cache, key, s_token)

    def update(self, dataset: Dataset) -> None:
        self._dataset = dataset
        if self._selector is not None:
            Z = self._selector.calculate_inducing_points(
                self._params.inducing_points, self, dataset
            )
            self._params = self._params.replace(inducing_points=Z)
        self._refresh()

    def optimize(self, dataset: Dataset) -> SGPRTrainingResult:
        from ...parallel.mesh import current_pool_sharding, round_to_mesh

        self._key, sub = jax.random.split(self._key)
        result = _jit_sgpr_fit(
            sub,
            self._params,
            dataset.query_points,
            dataset.observations,
            dataset.mask,
            self._priors,
            round_to_mesh(self._num_starts),
            self._train_noise,
            self._train_inducing,
            self._max_iters,
            current_pool_sharding(),
        )
        self._params = result.params
        self._dataset = dataset
        self._refresh()
        return result

    def trajectory_sampler(self) -> TrajectorySampler:
        from .sampler import DecoupledInducingTrajectorySampler

        return DecoupledInducingTrajectorySampler(self)

    def reparam_sampler(self, num_samples: int) -> ReparametrizationSampler:
        from .sampler import BatchReparametrizationSampler

        return BatchReparametrizationSampler(num_samples, self)

    def log(self, dataset: Optional[Dataset] = None) -> None:
        pass

    def __repr__(self) -> str:
        return (
            f"SparseGaussianProcessRegression(M={self._params.inducing_points.shape[0]}, "
            f"n={len(self._dataset)})"
        )


def _sgpr_pure_sample(params, cache, key, s_token, x):
    """Key-frozen joint reparam sampling for SGPR (acquisition Partial path)."""
    x = jnp.asarray(x)
    mean, cov = sgpr_predict_joint(params, cache, x)
    B = x.shape[-2]
    S = s_token.shape[0]
    eps = jax.random.normal(key, (mean.shape[-1], B, S), dtype=cov.dtype)
    Lc = jnp.linalg.cholesky(cov + jitter_for(cov.dtype) * jnp.eye(B, dtype=cov.dtype))
    draws = Lc @ eps
    draws = jnp.moveaxis(jnp.moveaxis(draws, -1, -3), -1, -2)
    return mean[..., None, :, :] + draws


_jit_sgpr_cache = jax.jit(sgpr_build_cache)
_jit_sgpr_predict = jax.jit(sgpr_predict_f)
_jit_sgpr_predict_joint = jax.jit(sgpr_predict_joint)


@partial(
    jax.jit,
    static_argnames=("num_starts", "train_noise", "train_inducing", "max_iters", "pool_sharding"),
)
def _jit_sgpr_fit(
    key, params, X, Y, mask, priors, num_starts, train_noise, train_inducing, max_iters,
    pool_sharding
):
    return fit_sgpr(
        key, params, X, Y, mask,
        num_starts=num_starts, train_noise=train_noise,
        train_inducing=train_inducing, max_iters=max_iters,
        pool_sharding=pool_sharding, priors=priors,
    )


# ---------------------------------------------------------------------------------
# SVGP (reference models.py:843-1108)
# ---------------------------------------------------------------------------------


@struct.dataclass
class SVGPParams:
    """Whitened SVGP parameters: hyperparameters + explicit variational state."""

    kernel: Stationary
    noise_variance: jax.Array
    mean_constant: jax.Array
    inducing_points: jax.Array  # [M, D]
    q_mu: jax.Array  # [M, P]
    q_sqrt: jax.Array  # [P, M, M] lower triangular


def svgp_predict_f(
    params: SVGPParams, query_points: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Whitened SVGP predictions: ``mean = A^T q_mu``, ``var = kxx - ||A||^2 +
    ||q_sqrt^T A||^2`` with ``A = L^{-1} Kux`` (GPflow ``SVGP.predict_f``)."""
    flat, unflatten = flatten_leading_dims(query_points, output_dims=2)
    Z = params.inducing_points
    M = Z.shape[0]
    Kuu = gram(params.kernel, Z) + jitter_for(flat.dtype) * jnp.eye(M, dtype=flat.dtype)
    L = jnp.linalg.cholesky(Kuu)
    Kux = gram(params.kernel, Z, flat)  # [M, N]
    A = jax.scipy.linalg.solve_triangular(L, Kux, lower=True)  # [M, N]
    mean = _mm(A.T, params.q_mu) + params.mean_constant  # [N, P]
    SA = jnp.einsum("pmk,mn->pkn", params.q_sqrt, A)  # q_sqrtᵀ A per output
    var = (
        params.kernel.diag(flat)[None, :]
        - jnp.sum(jnp.square(A), axis=0)[None, :]
        + jnp.sum(jnp.square(SA), axis=1)
    )  # [P, N]
    var = jnp.maximum(var.T, 1e-24)
    return unflatten(mean), unflatten(var)


def svgp_elbo(
    params: SVGPParams, X: jax.Array, Y: jax.Array, mask: jax.Array
) -> jax.Array:
    """Full-batch whitened-SVGP ELBO with a Gaussian likelihood, mask-aware."""
    m = mask.astype(X.dtype)
    mean, var = svgp_predict_f(params, X)
    sigma2 = jnp.maximum(params.noise_variance, NOISE_FLOOR)
    ym = Y - params.mean_constant * 0.0  # observations as-is; mean handled in predictions
    lik = (
        -0.5 * jnp.log(2.0 * jnp.pi * sigma2)
        - 0.5 * (jnp.square(Y - mean) + var) / sigma2
    )
    lik_sum = jnp.sum(lik * m[:, None])
    # whitened KL[q(v) || N(0, I)] per output
    P, M, _ = params.q_sqrt.shape
    diag = jnp.diagonal(params.q_sqrt, axis1=-2, axis2=-1)
    kl = 0.5 * (
        jnp.sum(jnp.square(params.q_mu))
        + jnp.sum(jnp.square(params.q_sqrt))
        - M * P
        - 2.0 * jnp.sum(jnp.log(jnp.maximum(jnp.abs(diag), 1e-24)))
    )
    return lik_sum - kl


def svgp_optimal_variational(
    params: SVGPParams, X: jax.Array, Y: jax.Array, mask: jax.Array
) -> SVGPParams:
    """Closed-form optimal whitened ``q(v)`` for the Gaussian likelihood given the
    current hyperparameters — one exact natural-gradient step (the role of the
    reference's NaturalGradient loop for conjugate models)."""
    Z = params.inducing_points
    M = Z.shape[0]
    m = mask.astype(X.dtype)
    sigma2 = jnp.maximum(params.noise_variance, NOISE_FLOOR)
    Kuu = gram(params.kernel, Z) + jitter_for(X.dtype) * jnp.eye(M, dtype=X.dtype)
    L = jnp.linalg.cholesky(Kuu)
    Kuf = gram(params.kernel, Z, X) * m[None, :]
    A = jax.scipy.linalg.solve_triangular(L, Kuf, lower=True)  # [M, C]
    # optimal q(v): cov = (I + A Aᵀ/σ²)^{-1}, mean = cov A ym / σ²
    B = jnp.eye(M, dtype=X.dtype) + _mm(A, A.T) / sigma2
    LBm = jnp.linalg.cholesky(B)
    ym = (Y - params.mean_constant) * m[:, None]
    rhs = _mm(A, ym) / sigma2
    q_mu = jax.scipy.linalg.cho_solve((LBm, True), rhs)  # [M, P]
    Binv = jax.scipy.linalg.cho_solve((LBm, True), jnp.eye(M, dtype=X.dtype))
    q_cov_sqrt = jnp.linalg.cholesky(
        Binv + jitter_for(X.dtype) * jnp.eye(M, dtype=X.dtype)
    )
    P = Y.shape[-1]
    q_sqrt = jnp.broadcast_to(q_cov_sqrt[None], (P, M, M))
    return params.replace(q_mu=q_mu, q_sqrt=q_sqrt)


class SVGPTrainingResult(NamedTuple):
    params: SVGPParams
    loss: jax.Array


def fit_svgp(
    key: jax.Array,
    params: SVGPParams,
    X: jax.Array,
    Y: jax.Array,
    mask: jax.Array,
    *,
    train_noise: bool = True,
    max_iters: int = 100,
    num_alternations: int = 3,
    num_starts: int = 5,
    pool_sharding=None,
    priors=None,
) -> SVGPTrainingResult:
    """Alternate {exact variational update, hyperparameter L-BFGS on the ELBO}; MAP
    when ``priors`` is given. ``pool_sharding`` shards the restart pool over the active
    mesh."""
    from .priors import log_prior_density, sample_log_params, squeeze_kernel

    def hyper_pack(p: SVGPParams) -> jax.Array:
        ls = jnp.atleast_1d(p.kernel.lengthscales)
        parts = [
            jnp.log(jnp.maximum(jnp.atleast_1d(p.kernel.variance), MIN_VARIANCE)),
            jnp.log(jnp.maximum(ls, MIN_VARIANCE)),
            jnp.atleast_1d(p.mean_constant),
        ]
        if train_noise:
            parts.append(
                jnp.log(jnp.maximum(jnp.atleast_1d(p.noise_variance) - NOISE_FLOOR, MIN_VARIANCE))
            )
        return jnp.concatenate(parts)

    def hyper_unpack(u: jax.Array, p: SVGPParams) -> SVGPParams:
        ls_shape = jnp.shape(p.kernel.lengthscales)
        n_ls = 1 if ls_shape == () else ls_shape[0]
        variance = jnp.exp(u[0])
        ls = jnp.exp(u[1 : 1 + n_ls])
        if ls_shape == ():
            ls = ls[0]
        mean_constant = u[1 + n_ls]
        noise = (
            NOISE_FLOOR + jnp.exp(u[2 + n_ls]) if train_noise else p.noise_variance
        )
        return p.replace(
            kernel=p.kernel.replace(variance=variance, lengthscales=ls),
            noise_variance=noise,
            mean_constant=mean_constant,
        )

    # With a Gaussian likelihood the exact variational update makes the hyperparameter
    # objective the collapsed bound, so we optimize hyperparameters straight through the
    # optimal-q map with multi-start L-BFGS (mirroring the exact-GPR trainer), then set
    # the variational state once at the end. (num_alternations is retained for API parity
    # with non-conjugate extensions.)
    def loss_fn(u):
        p_u = hyper_unpack(u, params)
        p_q = svgp_optimal_variational(p_u, X, Y, mask)
        nll = -svgp_elbo(p_q, X, Y, mask)
        if priors is not None:
            nll = nll - log_prior_density(p_u.kernel, priors)
        return nll

    u0 = hyper_pack(params)
    ls_shape = jnp.shape(params.kernel.lengthscales)
    n_ls = 1 if ls_shape == () else ls_shape[0]
    if priors is not None:
        log_var, log_ls = sample_log_params(key, priors, num_starts - 1, n_ls)
        rest = jnp.broadcast_to(u0[None], (num_starts - 1, u0.shape[0]))
        rest = rest.at[:, 0].set(log_var)
        rest = rest.at[:, 1 : 1 + n_ls].set(log_ls)
        starts = jnp.concatenate([u0[None], rest], axis=0)
    else:
        shifts = jax.random.uniform(
            key, (num_starts - 1, u0.shape[0]), dtype=u0.dtype, minval=-1.5, maxval=1.5
        )
        # don't perturb the mean constant
        shifts = shifts.at[:, 1 + n_ls].set(0.0)
        starts = jnp.concatenate([u0[None], u0[None] + shifts], axis=0)
    if pool_sharding is not None:
        starts = jax.lax.with_sharding_constraint(starts, pool_sharding)
    results = jax.vmap(lambda s0: minimize_lbfgs(loss_fn, s0, max_iters=max_iters))(starts)
    losses = jnp.where(jnp.isfinite(results.fun), results.fun, jnp.inf)
    best = jnp.argmin(losses)
    p = hyper_unpack(results.x[best], params)
    if priors is not None:
        p = p.replace(kernel=squeeze_kernel(p.kernel, priors))
    p = svgp_optimal_variational(p, X, Y, mask)
    return SVGPTrainingResult(params=p, loss=-svgp_elbo(p, X, Y, mask))


def fit_svgp_minibatch(
    key: jax.Array,
    params: SVGPParams,
    X: jax.Array,
    Y: jax.Array,
    mask: jax.Array,
    *,
    batch_size: int = 100,
    max_iters: int = 500,
    learning_rate: float = 0.05,
    train_noise: bool = True,
    priors=None,
) -> SVGPTrainingResult:
    """Adam minibatch training of all SVGP parameters (hyperparameters + variational
    state jointly) on the stochastically-estimated uncollapsed ELBO — the TPU-native
    counterpart of the reference's ``BatchOptimizer`` tf.data loop
    (``models/optimizer.py:101-177``), which is its default SVGP path for large data.

    The whole optimization is ONE jitted ``lax.scan`` of ``max_iters`` Adam steps; each
    step gathers a fresh random minibatch from the valid (front-packed) rows and scales
    the batch likelihood by ``n / batch_size`` so the objective is an unbiased ELBO
    estimate. The collapsed-bound L-BFGS path (:func:`fit_svgp`) stays the right choice
    for small ``n``; this one is O(batch · M² + M³) per step independent of ``n``.
    """
    import optax

    from .priors import log_prior_density

    dtype = X.dtype
    n = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    ls_shape = jnp.shape(params.kernel.lengthscales)

    # trainables as a pytree: positives in log space; q_sqrt raw (tril applied at use)
    trainables = {
        "log_kvar": jnp.log(jnp.maximum(params.kernel.variance, MIN_VARIANCE)),
        "log_ls": jnp.log(jnp.maximum(params.kernel.lengthscales, MIN_VARIANCE)),
        "mean_constant": params.mean_constant,
        "inducing_points": params.inducing_points,
        "q_mu": params.q_mu,
        "q_sqrt_raw": params.q_sqrt,
    }
    if train_noise:
        trainables["log_noise"] = jnp.log(
            jnp.maximum(params.noise_variance - NOISE_FLOOR, MIN_VARIANCE)
        )

    def to_params(tr) -> SVGPParams:
        noise = (
            NOISE_FLOOR + jnp.exp(tr["log_noise"]) if train_noise else params.noise_variance
        )
        return params.replace(
            kernel=params.kernel.replace(
                variance=jnp.exp(tr["log_kvar"]),
                lengthscales=jnp.exp(tr["log_ls"]).reshape(ls_shape),
            ),
            noise_variance=noise,
            mean_constant=tr["mean_constant"],
            inducing_points=tr["inducing_points"],
            q_mu=tr["q_mu"],
            q_sqrt=jnp.tril(tr["q_sqrt_raw"]),
        )

    def batch_loss(tr, k) -> jax.Array:
        p = to_params(tr)
        idx = jax.random.randint(k, (batch_size,), 0, n)
        Xb, Yb = X[idx], Y[idx]
        mean, var = svgp_predict_f(p, Xb)
        sigma2 = jnp.maximum(p.noise_variance, NOISE_FLOOR)
        lik = (
            -0.5 * jnp.log(2.0 * jnp.pi * sigma2)
            - 0.5 * (jnp.square(Yb - mean) + var) / sigma2
        )
        lik_sum = jnp.sum(lik) * (n.astype(dtype) / batch_size)
        P, M, _ = p.q_sqrt.shape
        diag = jnp.diagonal(p.q_sqrt, axis1=-2, axis2=-1)
        kl = 0.5 * (
            jnp.sum(jnp.square(p.q_mu))
            + jnp.sum(jnp.square(p.q_sqrt))
            - M * P
            - 2.0 * jnp.sum(jnp.log(jnp.maximum(jnp.abs(diag), 1e-24)))
        )
        loss = kl - lik_sum
        if priors is not None:
            loss = loss - log_prior_density(p.kernel, priors)
        return loss

    opt = optax.adam(learning_rate)

    def step(carry, k):
        tr, opt_state = carry
        loss, grads = jax.value_and_grad(batch_loss)(tr, k)
        updates, opt_state = opt.update(grads, opt_state)
        tr = optax.apply_updates(tr, updates)
        return (tr, opt_state), loss

    keys = jax.random.split(key, max_iters)
    (tr, _), losses = jax.lax.scan(step, (trainables, opt.init(trainables)), keys)
    p = to_params(tr)
    return SVGPTrainingResult(params=p, loss=-svgp_elbo(p, X, Y, mask))


class SparseVariational:
    """SVGP model wrapper (reference ``models/gpflow/models.py:843-1108``)."""

    def __init__(
        self,
        params: SVGPParams,
        dataset: Dataset,
        *,
        inducing_point_selector: Optional[object] = None,
        train_noise: bool = True,
        max_optimize_iters: int = 100,
        optimize_key: Optional[jax.Array] = None,
        priors=None,
        minibatch_size: Optional[int] = None,
        minibatch_iters: int = 500,
        learning_rate: float = 0.05,
    ):
        """``minibatch_size`` switches :meth:`optimize` from the collapsed-bound
        multi-start L-BFGS to Adam minibatch training (:func:`fit_svgp_minibatch`,
        the reference's ``BatchOptimizer`` default path for large data)."""
        self._params = params
        self._dataset = dataset
        self._selector = inducing_point_selector
        self._train_noise = train_noise
        self._max_iters = max_optimize_iters
        self._priors = priors
        self._minibatch_size = minibatch_size
        self._minibatch_iters = minibatch_iters
        self._learning_rate = learning_rate
        self._key = optimize_key if optimize_key is not None else jax.random.PRNGKey(0)

    @property
    def params(self) -> SVGPParams:
        return self._params

    def get_kernel(self):
        return self._params.kernel

    def get_observation_noise(self) -> jax.Array:
        return self._params.noise_variance

    def get_internal_data(self) -> Dataset:
        return self._dataset

    def get_inducing_variables(self):
        return (
            self._params.inducing_points,
            self._params.q_mu,
            self._params.q_sqrt,
            True,
        )

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return _jit_svgp_predict(self._params, jnp.asarray(query_points))

    def predict_partial(self):
        from jax.tree_util import Partial

        return Partial(svgp_predict_f, self._params)

    def predict_y(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        mean, var = self.predict(query_points)
        return mean, var + self._params.noise_variance

    def predict_joint(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return _jit_svgp_predict_joint(self._params, jnp.asarray(query_points))

    def predict_joint_partial(self):
        from jax.tree_util import Partial

        return Partial(svgp_predict_joint, self._params)

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        mean, cov = self.predict_joint(query_points)
        B = cov.shape[-1]
        Lc = jnp.linalg.cholesky(cov + jitter_for(cov.dtype) * jnp.eye(B, dtype=cov.dtype))
        eps = jax.random.normal(key, cov.shape[:-2] + (num_samples, B), cov.dtype)
        samp = jnp.einsum("...pij,...psj->...psi", Lc, eps)
        return jnp.moveaxis(samp, -3, -1) + mean[..., None, :, :]

    def update(self, dataset: Dataset) -> None:
        self._dataset = dataset
        if self._selector is not None:
            Z = self._selector.calculate_inducing_points(
                self._params.inducing_points, self, dataset
            )
            self._params = self._params.replace(inducing_points=Z)

    def optimize(self, dataset: Dataset) -> SVGPTrainingResult:
        from ...parallel.mesh import current_pool_sharding, round_to_mesh

        if self._minibatch_size is not None:
            self._key, sub = jax.random.split(self._key)
            result = _jit_svgp_fit_minibatch(
                sub,
                self._params,
                dataset.query_points,
                dataset.observations,
                dataset.mask,
                self._priors,
                self._minibatch_size,
                self._minibatch_iters,
                self._learning_rate,
                self._train_noise,
            )
            self._params = result.params
            self._dataset = dataset
            return result
        result = _jit_svgp_fit(
            self._params,
            dataset.query_points,
            dataset.observations,
            dataset.mask,
            self._priors,
            self._train_noise,
            self._max_iters,
            round_to_mesh(5),
            current_pool_sharding(),
        )
        self._params = result.params
        self._dataset = dataset
        return result

    def trajectory_sampler(self) -> TrajectorySampler:
        from .sampler import DecoupledInducingTrajectorySampler

        return DecoupledInducingTrajectorySampler(self)

    def reparam_sampler(self, num_samples: int) -> ReparametrizationSampler:
        from .sampler import BatchReparametrizationSampler

        return BatchReparametrizationSampler(num_samples, self)

    def log(self, dataset: Optional[Dataset] = None) -> None:
        pass

    def __repr__(self) -> str:
        return f"SparseVariational(M={self._params.inducing_points.shape[0]})"


def svgp_predict_joint(
    params: SVGPParams, query_points: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    if query_points.ndim == 2:
        mean, cov = svgp_predict_joint(params, query_points[None])
        return mean[0], cov[0]
    flat = jnp.reshape(query_points, (-1,) + query_points.shape[-2:])
    Z = params.inducing_points
    M = Z.shape[0]
    Kuu = gram(params.kernel, Z) + jitter_for(flat.dtype) * jnp.eye(M, dtype=flat.dtype)
    L = jnp.linalg.cholesky(Kuu)

    def single(xb):
        Kux = gram(params.kernel, Z, xb)  # [M, B]
        A = jax.scipy.linalg.solve_triangular(L, Kux, lower=True)
        mean = _mm(A.T, params.q_mu) + params.mean_constant
        SA = jnp.einsum("pmk,mn->pkn", params.q_sqrt, A)
        Kxx = gram(params.kernel, xb)
        cov = (
            Kxx[None] - _mm(A.T, A)[None] + jnp.einsum("pkn,pkm->pnm", SA, SA)
        )
        return mean, cov

    mean, cov = jax.vmap(single)(flat)
    lead = query_points.shape[:-2]
    return (
        jnp.reshape(mean, lead + mean.shape[1:]),
        jnp.reshape(cov, lead + cov.shape[1:]),
    )


_jit_svgp_predict = jax.jit(svgp_predict_f)
_jit_svgp_predict_joint = jax.jit(svgp_predict_joint)


@partial(jax.jit, static_argnames=("train_noise", "max_iters", "num_starts", "pool_sharding"))
def _jit_svgp_fit(params, X, Y, mask, priors, train_noise, max_iters, num_starts, pool_sharding):
    return fit_svgp(
        jax.random.PRNGKey(0), params, X, Y, mask,
        train_noise=train_noise, max_iters=max_iters,
        num_starts=num_starts, pool_sharding=pool_sharding, priors=priors,
    )


@partial(
    jax.jit,
    static_argnames=("batch_size", "max_iters", "learning_rate", "train_noise"),
)
def _jit_svgp_fit_minibatch(
    key, params, X, Y, mask, priors, batch_size, max_iters, learning_rate, train_noise
):
    return fit_svgp_minibatch(
        key, params, X, Y, mask,
        batch_size=batch_size, max_iters=max_iters, learning_rate=learning_rate,
        train_noise=train_noise, priors=priors,
    )
