"""Exact-GP posterior numerics: pure, jittable, mask-aware functions.

This is the TPU-native replacement for GPflow's ``GPR`` internals used by the reference
(``models/gpflow/models.py:69-527``): log marginal likelihood, a posterior cache of
``(L, alpha)`` (the analogue of the reference's ``create_posterior_cache`` /
``update_posterior_cache`` — ``models/gpflow/interface.py:89-112``), marginal and joint
predictions, joint sampling, and closed-form conditioning on extra ("fantasized") data
(reference ``conditional_predict_f/joint/f_sample/y`` — ``models.py:355-527``).

Everything operates on fixed-capacity padded buffers with a validity mask so dataset
growth never recompiles (see :mod:`trieste_tpu.ops.linalg`); all functions are rank
polymorphic in the query points' leading dims.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...ops.kernels import Stationary, gram
from ...ops.linalg import cho_solve, masked_cholesky, solve_lower
from ...utils.misc import flatten_leading_dims, jitter_for


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matmul at full fp32 accumulation (TPU default precision is bf16-grade)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


@struct.dataclass
class GPRParams:
    """Exact-GPR hyperparameters: kernel + Gaussian likelihood + constant mean."""

    kernel: Stationary
    noise_variance: jax.Array  # scalar
    mean_constant: jax.Array  # scalar


@struct.dataclass
class GPRCache:
    """Posterior cache: everything needed for O(N·C) predictions after an O(C³) factorize.

    ``X``/``Y_centered``/``mask`` are the padded training buffers; ``L`` is the masked
    Cholesky of ``K(X,X) + σ²I`` (identity on padded rows); ``alpha = (LLᵀ)⁻¹ (Y - m)``
    has zero padded rows. ``LinvT = (L⁻¹)ᵀ`` (zero on padded rows/columns) lets the fused
    marginal-variance path (:mod:`trieste_tpu.ops.fused_predict`) replace the per-query
    triangular solve by the MXU matmul ``v = K·L⁻ᵀ`` — elementwise identical math to the
    reference's ``v = L⁻¹ k``; it is optional — ``None`` disables the fast path.
    """

    X: jax.Array  # [C, D]
    mask: jax.Array  # [C] bool
    L: jax.Array  # [C, C]
    alpha: jax.Array  # [C, P]
    LinvT: Optional[jax.Array] = None  # [C, C]


def build_cache(
    params: GPRParams, X: jax.Array, Y: jax.Array, mask: jax.Array, *,
    with_linvt: bool = True,
) -> GPRCache:
    """Factorize the training covariance (reference ``create_posterior_cache``).

    ``with_linvt=False`` skips the extra O(C³) dense triangular inverse (and its O(C²)
    memory) used only by the fused Pallas prediction path — pass it on code paths that
    can never dispatch there, e.g. caches vmapped over hyperparameter samples (the MCMC
    posterior mixture predicts via ``predict_f_reference``)."""
    m = mask.astype(X.dtype)
    K = gram(params.kernel, X)
    Kn = K + params.noise_variance * jnp.eye(X.shape[0], dtype=X.dtype)
    L = masked_cholesky(Kn, mask)
    ym = (Y - params.mean_constant) * m[:, None]
    alpha = cho_solve(L, ym)
    if not with_linvt:
        return GPRCache(X=X, mask=mask, L=L, alpha=alpha, LinvT=None)
    # masked triangular inverse for the fused prediction kernel: the padded block of L
    # is the identity, so zeroing its rows/cols removes the padded contribution exactly
    Linv = solve_lower(L, jnp.eye(X.shape[0], dtype=X.dtype)) * (m[:, None] * m[None, :])
    return GPRCache(X=X, mask=mask, L=L, alpha=alpha, LinvT=Linv.T)


def log_marginal_likelihood(
    params: GPRParams, X: jax.Array, Y: jax.Array, mask: jax.Array
) -> jax.Array:
    """Exact GPR log marginal likelihood of the valid rows (GPflow ``GPR.maximum_log_likelihood_objective`` equivalent)."""
    m = mask.astype(X.dtype)
    n = jnp.sum(m)
    num_outputs = Y.shape[-1]
    K = gram(params.kernel, X)
    Kn = K + params.noise_variance * jnp.eye(X.shape[0], dtype=X.dtype)
    L = masked_cholesky(Kn, mask)
    ym = (Y - params.mean_constant) * m[:, None]
    alpha = cho_solve(L, ym)
    quad = jnp.sum(ym * alpha)
    # padded diag entries of L are exactly 1 -> contribute log 1 = 0
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    const = n * num_outputs * jnp.log(2.0 * jnp.pi).astype(X.dtype)
    return -0.5 * (quad + num_outputs * logdet + const)


def _masked_cross_cov(
    params: GPRParams, cache: GPRCache, x: jax.Array
) -> jax.Array:
    """``K(x, X)`` with padded training columns zeroed, ``[N, C]``."""
    Kxn = gram(params.kernel, x, cache.X)
    return Kxn * cache.mask.astype(Kxn.dtype)[None, :]


def _predict_f_flat_reference(
    params: GPRParams, cache: GPRCache, flat: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Pure-XLA marginal posterior over flattened queries: ``[N, D] -> ([N, P], [N, P])``."""
    Kxn = _masked_cross_cov(params, cache, flat)  # [N, C]
    mean = _mm(Kxn, cache.alpha) + params.mean_constant  # [N, P]
    v = solve_lower(cache.L, Kxn.T)  # [C, N]
    var = params.kernel.diag(flat) - jnp.sum(jnp.square(v), axis=0)  # [N]
    var = jnp.maximum(var, 1e-24)
    var = jnp.broadcast_to(var[:, None], mean.shape)
    return mean, var


def _predict_f_flat_impl(
    params: GPRParams, cache: GPRCache, flat: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Marginal posterior with a fused Pallas forward on TPU for large candidate pools
    (:mod:`trieste_tpu.ops.fused_predict`); gradients always flow through the pure-XLA
    reference math (the fused kernel is forward-only)."""
    from ...ops import fused_predict

    if fused_predict.can_fuse(params, cache, flat):
        return fused_predict.fused_predict_f(params, cache, flat)
    return _predict_f_flat_reference(params, cache, flat)


_predict_f_flat = jax.custom_vjp(_predict_f_flat_impl)


def _predict_f_flat_fwd(params, cache, flat):
    return _predict_f_flat_impl(params, cache, flat), (params, cache, flat)


def _predict_f_flat_bwd(res, cotangents):
    params, cache, flat = res
    _, vjp = jax.vjp(_predict_f_flat_reference, params, cache, flat)
    return vjp(cotangents)


_predict_f_flat.defvjp(_predict_f_flat_fwd, _predict_f_flat_bwd)


def predict_f(
    params: GPRParams, cache: GPRCache, query_points: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Marginal posterior: ``[..., D] -> mean [..., P], var [..., P]``."""
    flat, unflatten = flatten_leading_dims(query_points, output_dims=2)
    mean, var = _predict_f_flat(params, cache, flat)
    return unflatten(mean), unflatten(var)


def predict_f_reference(
    params: GPRParams, cache: GPRCache, query_points: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Pure-XLA :func:`predict_f` (no Pallas dispatch) — safe to ``vmap`` over stacked
    model states (fully-Bayesian posterior mixtures)."""
    flat, unflatten = flatten_leading_dims(query_points, output_dims=2)
    mean, var = _predict_f_flat_reference(params, cache, flat)
    return unflatten(mean), unflatten(var)


def predict_joint(
    params: GPRParams, cache: GPRCache, query_points: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Joint posterior over a batch: ``[..., B, D] -> mean [..., B, P], cov [..., P, B, B]``."""
    if query_points.ndim == 2:
        mean, cov = predict_joint(params, cache, query_points[None])
        return mean[0], cov[0]
    flat = jnp.reshape(query_points, (-1,) + query_points.shape[-2:])  # [R, B, D]

    def single(xb: jax.Array) -> Tuple[jax.Array, jax.Array]:
        Kxn = _masked_cross_cov(params, cache, xb)  # [B, C]
        mean = _mm(Kxn, cache.alpha) + params.mean_constant  # [B, P]
        v = solve_lower(cache.L, Kxn.T)  # [C, B]
        Kxx = gram(params.kernel, xb)  # [B, B]
        cov = Kxx - _mm(v.T, v)  # [B, B]
        cov = jnp.broadcast_to(cov[None], (mean.shape[-1],) + cov.shape)
        return mean, cov

    mean, cov = jax.vmap(single)(flat)
    lead = query_points.shape[:-2]
    mean = jnp.reshape(mean, lead + mean.shape[1:])
    cov = jnp.reshape(cov, lead + cov.shape[1:])
    return mean, cov


def predict_y(
    params: GPRParams, cache: GPRCache, query_points: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    mean, var = predict_f(params, cache, query_points)
    return mean, var + params.noise_variance


def sample_joint(
    key: jax.Array,
    params: GPRParams,
    cache: GPRCache,
    query_points: jax.Array,
    num_samples: int,
) -> jax.Array:
    """Joint posterior samples ``[..., S, B, P]`` at ``[..., B, D]``."""
    mean, cov = predict_joint(params, cache, query_points)  # [..., B, P], [..., P, B, B]
    jitter = jitter_for(cov.dtype)
    B = cov.shape[-1]
    Lc = jnp.linalg.cholesky(cov + jitter * jnp.eye(B, dtype=cov.dtype))
    eps = jax.random.normal(
        key, cov.shape[:-2] + (num_samples, B), dtype=cov.dtype
    )  # [..., P, S, B]
    samp = jnp.einsum("...pij,...psj->...psi", Lc, eps)  # [..., P, S, B]
    samp = jnp.moveaxis(samp, -3, -1)  # [..., S, B, P]
    return samp + mean[..., None, :, :]


def covariance_between_points(
    params: GPRParams, cache: GPRCache, x1: jax.Array, x2: jax.Array
) -> jax.Array:
    """Posterior covariance between two point sets (reference ``models.py:188-226``):
    ``K12 - K1n (Knn+σ²I)⁻¹ Kn2``, shape ``[..., N1, N2]``."""
    flat1, unflatten1 = flatten_leading_dims(x1, output_dims=2)
    K1n = _masked_cross_cov(params, cache, flat1)  # [N1, C]
    K2n = _masked_cross_cov(params, cache, jnp.reshape(x2, (-1, x2.shape[-1])))  # [N2, C]
    v1 = solve_lower(cache.L, K1n.T)  # [C, N1]
    v2 = solve_lower(cache.L, K2n.T)  # [C, N2]
    K12 = gram(params.kernel, flat1, jnp.reshape(x2, (-1, x2.shape[-1])))
    cov = K12 - _mm(v1.T, v2)
    return jnp.reshape(cov, x1.shape[:-1] + x2.shape[:-2] + (x2.shape[-2],))


# ---------------------------------------------------------------------------------
# Closed-form conditioning on extra data (fantasizing)
# ---------------------------------------------------------------------------------


def conditional_predict_joint(
    params: GPRParams,
    cache: GPRCache,
    query_points: jax.Array,
    extra_X: jax.Array,
    extra_Y: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Joint prediction conditioned on extra observations (reference ``models.py:392-460``).

    ``extra_X: [..., M, D]``, ``extra_Y: [..., M, P]``, ``query_points: [B, D]`` or
    ``[..., B, D]`` → mean ``[..., B, P]``, cov ``[..., P, B, B]``. Uses the block-update
    identity on the joint prior over (extra ∪ query) rather than refactorizing the full
    training system.
    """
    if extra_X.ndim == 2:
        extra_X = extra_X[None]
        extra_Y = extra_Y[None]
        squeeze = True
    else:
        squeeze = False
    lead = extra_X.shape[:-2]
    M = extra_X.shape[-2]
    flat_extra_X = jnp.reshape(extra_X, (-1, M, extra_X.shape[-1]))
    flat_extra_Y = jnp.reshape(extra_Y, (-1, M, extra_Y.shape[-1]))
    if query_points.ndim == 2:
        qp = jnp.broadcast_to(
            query_points[None], (flat_extra_X.shape[0],) + query_points.shape
        )
    else:
        qp = jnp.reshape(query_points, (-1,) + query_points.shape[-2:])

    def single(ex: jax.Array, ey: jax.Array, xb: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # joint posterior over [extra; query] given training data
        z = jnp.concatenate([ex, xb], axis=0)  # [M+B, D]
        mean_z, cov_z = predict_joint(params, cache, z)  # [M+B, P], [P, M+B, M+B]
        mean_e, mean_q = mean_z[:M], mean_z[M:]
        cov_ee = cov_z[..., :M, :M]
        cov_eq = cov_z[..., :M, M:]
        cov_qq = cov_z[..., M:, M:]
        jitter = jitter_for(cov_z.dtype)
        Le = jnp.linalg.cholesky(
            cov_ee + (params.noise_variance + jitter) * jnp.eye(M, dtype=cov_z.dtype)
        )  # [P, M, M]
        resid = (ey - mean_e).T[..., None]  # [P, M, 1]
        w = cho_solve_batched(Le, cov_eq)  # [P, M, B]
        mean_q_new = mean_q + jnp.moveaxis(
            jnp.squeeze(jnp.swapaxes(cov_eq, -1, -2) @ cho_solve_batched(Le, resid), -1),
            0, -1,
        )
        cov_q_new = cov_qq - jnp.swapaxes(cov_eq, -1, -2) @ w
        return mean_q_new, cov_q_new

    mean, cov = jax.vmap(single)(flat_extra_X, flat_extra_Y, qp)
    if squeeze:
        return mean[0], cov[0]
    mean = jnp.reshape(mean, lead + mean.shape[1:])
    cov = jnp.reshape(cov, lead + cov.shape[1:])
    return mean, cov


def cho_solve_batched(L: jax.Array, b: jax.Array) -> jax.Array:
    """Batched ``(LLᵀ)⁻¹ b`` where ``L: [..., M, M]``, ``b: [..., M, K]``."""
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1)


def conditional_predict_f(
    params: GPRParams,
    cache: GPRCache,
    query_points: jax.Array,
    extra_X: jax.Array,
    extra_Y: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Marginal version of :func:`conditional_predict_joint` (reference ``models.py:355-390``)."""
    mean, cov = conditional_predict_joint(params, cache, query_points, extra_X, extra_Y)
    var = jnp.diagonal(cov, axis1=-2, axis2=-1)  # [..., P, B]
    return mean, jnp.moveaxis(var, -2, -1)


def conditional_predict_y(
    params: GPRParams,
    cache: GPRCache,
    query_points: jax.Array,
    extra_X: jax.Array,
    extra_Y: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    mean, var = conditional_predict_f(params, cache, query_points, extra_X, extra_Y)
    return mean, var + params.noise_variance


def conditional_predict_f_sample(
    key: jax.Array,
    params: GPRParams,
    cache: GPRCache,
    query_points: jax.Array,
    extra_X: jax.Array,
    extra_Y: jax.Array,
    num_samples: int,
) -> jax.Array:
    """Joint samples from the conditioned posterior (reference ``models.py:462-492``)."""
    mean, cov = conditional_predict_joint(params, cache, query_points, extra_X, extra_Y)
    jitter = jitter_for(cov.dtype)
    B = cov.shape[-1]
    Lc = jnp.linalg.cholesky(cov + jitter * jnp.eye(B, dtype=cov.dtype))
    eps = jax.random.normal(key, cov.shape[:-2] + (num_samples, B), dtype=cov.dtype)
    samp = jnp.einsum("...pij,...psj->...psi", Lc, eps)
    samp = jnp.moveaxis(samp, -3, -1)
    return samp + mean[..., None, :, :]
