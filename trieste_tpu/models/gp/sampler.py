"""Posterior samplers for exact GPs.

TPU-native rebuild of the reference ``trieste/models/gpflow/sampler.py`` (953 LoC):

* :class:`IndependentReparametrizationSampler` (``sampler.py:82-166``) and
  :class:`BatchReparametrizationSampler` (``sampler.py:167-287``): reparametrization-trick
  samplers with base normal samples frozen at first use so acquisition surfaces stay
  deterministic across optimizer evaluations.
* :class:`RandomFourierFeatureTrajectorySampler` (``sampler.py:452-593``) and
  :class:`DecoupledTrajectorySampler` (``sampler.py:594-740``): function-draw ("trajectory")
  samplers. The decoupled sampler implements Matheron's rule — a random-Fourier prior draw
  pathwise-updated through the cached training Cholesky — giving cheap trajectories whose
  evaluation is one feature matmul plus one ``[N, C]`` kernel matmul (all MXU work).

Trajectories carry an independent draw per batch column ``b`` of their ``[N, B, D]``
input, matching the vectorized-batch semantics the reference's trajectories implement with
lazily-resized ``tf.Variable`` state (``sampler.py:858-953``); here the draw state is an
explicit pytree created per ``(key, batch_size)``.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...data import Dataset
from ...types import TensorType
from ..interfaces import (
    ReparametrizationSampler,
    TrajectoryFunction,
    TrajectoryFunctionClass,
    TrajectorySampler,
)
from ...ops.kernels import MATERN12, MATERN32, MATERN52, RBF, Stationary, gram
from ...ops.linalg import cho_solve
from .posterior import GPRCache, GPRParams

_MATERN_DF = {MATERN12: 1.0, MATERN32: 3.0, MATERN52: 5.0}


def pure_batch_reparam_sample(params, cache, key, s_token, x):
    """Pure joint reparametrization sampling for acquisition Partials.

    ``s_token`` is a dummy ``[S]`` array whose (static) shape carries the sample count;
    the base normal draws are regenerated deterministically from ``key`` each call, which
    realizes the reference's "frozen eps" semantics (``sampler.py:167-287``) without any
    object state — the whole sampler is a pytree and never retraces the optimizer.

    ``x: [..., B, D]`` -> samples ``[..., S, B, L]``.
    """
    from .posterior import predict_joint
    from ...utils.misc import jitter_for

    from ...parallel.mesh import current_axis_sharding

    x = jnp.asarray(x)
    mean, cov = predict_joint(params, cache, x)  # [..., B, L], [..., L, B, B]
    B = x.shape[-2]
    S = s_token.shape[0]
    L_out = mean.shape[-1]
    eps = jax.random.normal(key, (L_out, B, S), dtype=cov.dtype)
    if x.ndim == 2:
        # single-batch evaluation (no pool-sharded candidate axis): shard the MC-sample
        # axis S over the mesh instead; the downstream mean over samples becomes an XLA
        # psum (SURVEY.md §5.7 scaling axis S)
        sharding = current_axis_sharding(-1, eps.ndim)
        if sharding is not None:
            eps = jax.lax.with_sharding_constraint(eps, sharding)
    Lc = jnp.linalg.cholesky(cov + jitter_for(cov.dtype) * jnp.eye(B, dtype=cov.dtype))
    draws = Lc @ eps  # [..., L, B, S]
    draws = jnp.moveaxis(jnp.moveaxis(draws, -1, -3), -1, -2)  # [..., S, B, L]
    return mean[..., None, :, :] + draws


def pure_marginal_reparam_sample(params, cache, key, s_token, x):
    """Pure marginal reparametrization sampling (reference ``sampler.py:82-166``).

    ``x: [..., B, D]`` -> samples ``[..., S, B, L]`` with one independent draw per point.
    """
    from .posterior import predict_f

    from ...parallel.mesh import current_axis_sharding

    x = jnp.asarray(x)
    mean, var = predict_f(params, cache, x)  # [..., B, L]
    S = s_token.shape[0]
    eps = jax.random.normal(key, (S, 1, mean.shape[-1]), dtype=mean.dtype)
    if x.ndim == 2:
        sharding = current_axis_sharding(0, eps.ndim)
        if sharding is not None:
            eps = jax.lax.with_sharding_constraint(eps, sharding)
    return mean[..., None, :, :] + jnp.sqrt(var)[..., None, :, :] * eps


class IndependentReparametrizationSampler(ReparametrizationSampler):
    """Marginal reparametrization sampler: ``f = mean + sqrt(var) * eps`` with frozen
    ``eps [S, 1, L]`` (reference ``sampler.py:82-166``)."""

    def __init__(self, sample_size: int, model):
        super().__init__(sample_size, model)
        self._eps: Optional[jax.Array] = None

    def sample(self, at: TensorType, *, key: Optional[jax.Array] = None) -> jax.Array:
        at = jnp.asarray(at)
        mean, var = self._model.predict(at[..., None, :, :])  # [..., 1, B, L]
        if self._eps is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            self._eps = jax.random.normal(
                key, (self._sample_size, 1, mean.shape[-1]), dtype=mean.dtype
            )
            self._initialized = True
        return mean + jnp.sqrt(var) * self._eps  # [..., S, B, L]


class BatchReparametrizationSampler(ReparametrizationSampler):
    """Joint-over-batch reparametrization sampler: ``f = mean + L_cov eps`` with frozen
    ``eps [L, B, S]`` (reference ``sampler.py:167-287``)."""

    def __init__(self, sample_size: int, model):
        super().__init__(sample_size, model)
        self._eps: Optional[jax.Array] = None

    def sample(
        self, at: TensorType, *, key: Optional[jax.Array] = None, jitter: float = 1e-6
    ) -> jax.Array:
        at = jnp.asarray(at)
        batch_size = at.shape[-2]
        mean, cov = self._model.predict_joint(at)  # [..., B, L], [..., L, B, B]
        if self._eps is not None and self._eps.shape[-2] != batch_size:
            raise ValueError(
                f"this sampler is initialized for batches of size {self._eps.shape[-2]}, "
                f"got {batch_size}"
            )
        if self._eps is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            self._eps = jax.random.normal(
                key, (mean.shape[-1], batch_size, self._sample_size), dtype=mean.dtype
            )
            self._initialized = True
        L = jnp.linalg.cholesky(
            cov + jitter * jnp.eye(batch_size, dtype=cov.dtype)
        )  # [..., L, B, B]
        draws = L @ self._eps  # [..., L, B, S]
        draws = jnp.moveaxis(jnp.moveaxis(draws, -1, -3), -1, -2)
        # ^ [..., S, L, B] -> wait: moveaxis twice gives [..., S, B, L]
        return mean[..., None, :, :] + draws


def sample_spectral_frequencies(
    key: jax.Array, kernel: Stationary, num_features: int, dimension: int
) -> jax.Array:
    """Sample ``[m, D]`` frequencies from the kernel's spectral density: Gaussian for RBF,
    multivariate-t (via scaled inverse-chi²) for Matérn-ν (reference delegates to
    gpflux RFF; ``sampler.py:741-807``)."""
    k_norm, k_chi = jax.random.split(key)
    ls = jnp.broadcast_to(kernel.lengthscales, (dimension,))
    z = jax.random.normal(k_norm, (num_features, dimension), dtype=ls.dtype)
    if kernel.kind == RBF:
        w = z
    else:
        df = _MATERN_DF[kernel.kind]
        g = 2.0 * jax.random.gamma(k_chi, df / 2.0, (num_features, 1), dtype=ls.dtype)
        w = z * jnp.sqrt(df / g)
    return w / ls


@struct.dataclass
class FourierFeatures:
    """Random Fourier feature map ``phi(x) = sqrt(2 sigma^2 / m) cos(x W^T + b)``."""

    W: jax.Array  # [m, D]
    b: jax.Array  # [m]
    variance: jax.Array  # kernel signal variance (scalar)

    def __call__(self, x: jax.Array) -> jax.Array:
        m = self.W.shape[0]
        proj = jnp.einsum("...d,md->...m", x, self.W) + self.b
        return jnp.sqrt(2.0 * self.variance / m) * jnp.cos(proj)


def make_fourier_features(
    key: jax.Array, kernel: Stationary, num_features: int, dimension: int
) -> FourierFeatures:
    k_w, k_b = jax.random.split(key)
    W = sample_spectral_frequencies(k_w, kernel, num_features, dimension)
    b = jax.random.uniform(
        k_b, (num_features,), dtype=W.dtype, minval=0.0, maxval=2.0 * math.pi
    )
    return FourierFeatures(W=W, b=b, variance=kernel.variance)


@struct.dataclass
class DecoupledTrajectory(TrajectoryFunctionClass):
    """A Matheron-rule posterior function draw, one independent draw per batch column.

    ``f_b(x) = mean + phi(x) w_b + k(x, X) v_b`` where ``w_b ~ N(0, I_m)`` and
    ``v_b = (K + sigma^2 I)^{-1} (y - phi(X) w_b - eps_b)``, ``eps_b ~ N(0, sigma^2 I)``
    (reference ``sampler.py:594-740``).
    """

    params: GPRParams
    cache: GPRCache
    features: FourierFeatures
    w: jax.Array  # [B, m] prior weights
    v: jax.Array  # [B, C] pathwise-update weights

    def __call__(self, x: TensorType) -> jax.Array:
        x = jnp.asarray(x)  # [N, B, D]
        phi = self.features(x)  # [N, B, m]
        prior = jnp.einsum("nbm,bm->nb", phi, self.w)
        kxn = gram(self.params.kernel, x, self.cache.X)  # [N, B, C]
        kxn = kxn * self.cache.mask.astype(kxn.dtype)
        update = jnp.einsum("nbc,bc->nb", kxn, self.v)
        return (self.params.mean_constant + prior + update)[..., None]


class DecoupledTrajectorySampler(TrajectorySampler):
    """Builds :class:`DecoupledTrajectory` draws from a GPR model
    (reference ``sampler.py:594-740``)."""

    def __init__(self, model, num_features: int = 1000):
        super().__init__(model)
        self._num_features = num_features

    def get_trajectory(self, key: jax.Array, batch_size: int = 1) -> TrajectoryFunction:
        params: GPRParams = self._model.params
        cache: GPRCache = self._model.posterior_cache
        dataset: Dataset = self._model.get_internal_data()
        D = cache.X.shape[-1]
        k_feat, k_w, k_noise = jax.random.split(key, 3)
        features = make_fourier_features(k_feat, params.kernel, self._num_features, D)
        w = jax.random.normal(
            k_w, (batch_size, self._num_features), dtype=cache.X.dtype
        )
        phi_X = features(cache.X)  # [C, m]
        prior_at_X = w @ phi_X.T  # [B, C]
        noise = jnp.sqrt(params.noise_variance) * jax.random.normal(
            k_noise, (batch_size, cache.X.shape[0]), dtype=cache.X.dtype
        )
        y_centered = (
            dataset.observations[:, 0] - params.mean_constant
        )  # [C] (single-output trajectories)
        resid = (y_centered[None, :] - prior_at_X - noise) * cache.mask.astype(w.dtype)
        v = cho_solve(cache.L, resid.T).T  # [B, C]
        return DecoupledTrajectory(params=params, cache=cache, features=features, w=w, v=v)

    def update_trajectory(self, trajectory: TrajectoryFunction) -> TrajectoryFunction:
        # Rebuild against the current model state with fresh randomness.
        assert isinstance(trajectory, DecoupledTrajectory)
        key = jax.random.PRNGKey(int(jnp.sum(trajectory.w * 1e3)) & 0x7FFFFFFF)
        return self.get_trajectory(key, trajectory.w.shape[0])


@struct.dataclass
class RFFTrajectory(TrajectoryFunctionClass):
    """A weight-space posterior draw ``f_b(x) = mean + phi(x) theta_b``
    (reference ``sampler.py:452-593``)."""

    mean_constant: jax.Array
    features: FourierFeatures
    theta: jax.Array  # [B, m]

    def __call__(self, x: TensorType) -> jax.Array:
        x = jnp.asarray(x)  # [N, B, D]
        phi = self.features(x)  # [N, B, m]
        return (self.mean_constant + jnp.einsum("nbm,bm->nb", phi, self.theta))[..., None]


class RandomFourierFeatureTrajectorySampler(TrajectorySampler):
    """Weight-space trajectory sampler: exact Bayesian linear-model posterior over the RFF
    weights (reference ``sampler.py:452-593``, the m³ design-matrix route)."""

    def __init__(self, model, num_features: int = 1000):
        super().__init__(model)
        self._num_features = num_features

    def get_trajectory(self, key: jax.Array, batch_size: int = 1) -> TrajectoryFunction:
        """Two routes, as in the reference (``sampler.py:471-495``): the C³ kernel
        trick when the (padded) data capacity is below the feature count — the common
        BO regime — else the m³ design-matrix posterior.

        The kernel-trick route is REQUIRED for TPU correctness, not just speed: the
        design-matrix normal equations ``ΦᵀΦ/σ² + I`` have conditioning ~‖Φ‖²/σ²,
        and at the envelope configuration (σ² = 1e-7, f32) their Cholesky collapses
        to NaN on TPU, whose blocked factorization runs internal matmuls at
        bf16-grade default precision (found by the on-chip f32 envelope sweep,
        round 5 — CPU f32 LAPACK survives the same matrix). The kernel-trick system
        ``ΦΦᵀ + σ²I`` conditions like the GP's own jittered Gram, which the model
        Cholesky already survives on TPU. Sampling uses the weight-space Matheron
        identity: ``θ = ε + Φᵀ (ΦΦᵀ + σ²I)⁻¹ (y − Φε − ε_n)`` with ``ε ~ N(0, I_m)``,
        ``ε_n ~ N(0, σ²I)``, whose mean/covariance equal the design-matrix posterior
        by push-through/Woodbury.
        """
        params: GPRParams = self._model.params
        cache: GPRCache = self._model.posterior_cache
        dataset: Dataset = self._model.get_internal_data()
        D = cache.X.shape[-1]
        m = self._num_features
        C = cache.X.shape[0]
        k_feat, k_theta, k_noise = jax.random.split(key, 3)
        features = make_fourier_features(k_feat, params.kernel, m, D)
        mask = cache.mask.astype(cache.X.dtype)
        phi_X = features(cache.X) * mask[:, None]  # [C, m]
        y = (dataset.observations[:, 0] - params.mean_constant) * mask  # [C]
        sigma2 = params.noise_variance
        if C <= m:
            # kernel-trick route: factor the C×C system (same conditioning as the GP)
            from ...ops.linalg import masked_cholesky

            B = phi_X @ phi_X.T + sigma2 * jnp.eye(C, dtype=phi_X.dtype)
            L_B = masked_cholesky(B, cache.mask)  # adds the dtype jitter; padding inert
            eps = jax.random.normal(k_theta, (batch_size, m), dtype=phi_X.dtype)
            eps_n = jnp.sqrt(sigma2) * jax.random.normal(
                k_noise, (batch_size, C), dtype=phi_X.dtype
            )
            f_prior = eps @ phi_X.T  # [B, C]
            resid = (y[None, :] - f_prior - eps_n) * mask[None, :]
            v = cho_solve(L_B, resid.T).T  # [B, C]
            theta = eps + v @ phi_X  # [B, m]
        else:
            # design-matrix route, in the σ²-scaled (not 1/σ²) form with the same
            # dtype jitter the model Cholesky uses
            from ...utils.misc import jitter_for

            A = (
                phi_X.T @ phi_X
                + (sigma2 + jitter_for(phi_X.dtype)) * jnp.eye(m, dtype=phi_X.dtype)
            )
            L_A = jnp.linalg.cholesky(A)
            theta_mean = cho_solve(L_A, phi_X.T @ y)  # [m]
            eps = jax.random.normal(k_theta, (batch_size, m), dtype=phi_X.dtype)
            theta = theta_mean[None, :] + jnp.sqrt(sigma2) * jax.scipy.linalg.solve_triangular(
                L_A, eps.T, lower=True, trans=1
            ).T
        return RFFTrajectory(
            mean_constant=params.mean_constant, features=features, theta=theta
        )


@struct.dataclass
class DecoupledInducingTrajectory(TrajectoryFunctionClass):
    """Matheron-rule draw through inducing variables (Wilson et al.; reference decoupled
    sampling for SGPR/SVGP, ``sampler.py:594-740``):
    ``f_b(x) = mean + phi(x) w_b + k(x, Z) Kuu^{-1} (u_b - phi(Z) w_b)`` with
    ``u_b ~ q(u)``."""

    mean_constant: jax.Array
    kernel: Stationary
    Z: jax.Array  # [M, D]
    L_uu: jax.Array  # chol(Kuu) [M, M]
    features: FourierFeatures
    w: jax.Array  # [B, m]
    v: jax.Array  # [B, M] -- Kuu^{-1}(u_b - phi(Z) w_b)

    def __call__(self, x: TensorType) -> jax.Array:
        x = jnp.asarray(x)  # [N, B, D]
        phi = self.features(x)  # [N, B, m]
        prior = jnp.einsum("nbm,bm->nb", phi, self.w)
        kxz = gram(self.kernel, x, self.Z)  # [N, B, M]
        update = jnp.einsum("nbk,bk->nb", kxz, self.v)
        return (self.mean_constant + prior + update)[..., None]


class DecoupledInducingTrajectorySampler(TrajectorySampler):
    """Decoupled trajectory sampling for models exposing ``get_inducing_variables``
    (SGPR / SVGP)."""

    def __init__(self, model, num_features: int = 1000):
        super().__init__(model)
        self._num_features = num_features

    def get_trajectory(self, key: jax.Array, batch_size: int = 1) -> TrajectoryFunction:
        params = self._model.params
        Z, q_mu, q_sqrt, whiten = self._model.get_inducing_variables()
        M, D = Z.shape
        dtype = Z.dtype
        k_feat, k_w, k_u = jax.random.split(key, 3)
        features = make_fourier_features(k_feat, params.kernel, self._num_features, D)
        w = jax.random.normal(k_w, (batch_size, self._num_features), dtype=dtype)
        Kuu = gram(params.kernel, Z) + 1e-6 * jnp.eye(M, dtype=dtype)
        L_uu = jnp.linalg.cholesky(Kuu)
        # sample u_b ~ q(u) (first output dim)
        eps = jax.random.normal(k_u, (batch_size, M), dtype=dtype)
        qs = q_sqrt[0]
        v_sample = q_mu[:, 0][None, :] + jnp.einsum("mk,bk->bm", qs, eps)
        u_sample = (
            jnp.einsum("mk,bk->bm", L_uu, v_sample) if whiten else v_sample
        )
        phi_Z = features(Z)  # [M, m]
        resid = u_sample - w @ phi_Z.T  # [B, M]
        v = jax.scipy.linalg.cho_solve((L_uu, True), resid.T).T  # [B, M]
        return DecoupledInducingTrajectory(
            mean_constant=params.mean_constant,
            kernel=params.kernel,
            Z=Z,
            L_uu=L_uu,
            features=features,
            w=w,
            v=v,
        )
