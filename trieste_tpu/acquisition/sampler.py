"""Thompson samplers.

TPU-native rebuild of the reference ``trieste/acquisition/sampler.py`` (273 LoC). All
samplers take explicit PRNG keys and run fully on device; the O(S·N) argmin scans that the
reference does via TF ops become single fused XLA programs.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.interfaces import HasTrajectorySampler, ProbabilisticModel
from ..types import TensorType


class ThompsonSampler(ABC):
    """Samples either minimizer locations or minimum values from a model's posterior at a
    finite candidate set (reference ``sampler.py:34-77``)."""

    def __init__(self, sample_min_value: bool = False):
        self._sample_min_value = sample_min_value

    @property
    def sample_min_value(self) -> bool:
        return self._sample_min_value

    @abstractmethod
    def sample(
        self,
        model: ProbabilisticModel,
        sample_size: int,
        at: TensorType,
        *,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """``at: [N, D]`` candidates → ``[S, D]`` minimizers or ``[S, 1]`` min-values."""

    def __repr__(self) -> str:
        return f"{type(self).__name__}(sample_min_value={self._sample_min_value!r})"


class ExactThompsonSampler(ThompsonSampler):
    """Joint posterior draws over all candidates — exact but O(N³)
    (reference ``sampler.py:79-125``)."""

    def sample(
        self,
        model: ProbabilisticModel,
        sample_size: int,
        at: TensorType,
        *,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        if sample_size <= 0:
            raise ValueError(f"sample_size must be positive, got {sample_size}")
        at = jnp.asarray(at)
        key = key if key is not None else jax.random.PRNGKey(0)
        samples = model.sample(key, at, sample_size)[..., 0]  # [S, N]
        if self._sample_min_value:
            return jnp.min(samples, axis=-1, keepdims=True)  # [S, 1]
        idx = jnp.argmin(samples, axis=-1)  # [S]
        return at[idx]

    def __repr__(self) -> str:
        return f"ExactThompsonSampler(sample_min_value={self._sample_min_value!r})"


class GumbelSampler(ThompsonSampler):
    """Gumbel-trick min-value samples: match the CDF of the posterior minimum via its
    marginals, then perturb (reference ``sampler.py:126-212``). Only supports
    ``sample_min_value=True``."""

    def __init__(self, sample_min_value: bool = True):
        if not sample_min_value:
            raise ValueError("GumbelSampler only supports sample_min_value=True")
        super().__init__(True)

    def sample(
        self,
        model: ProbabilisticModel,
        sample_size: int,
        at: TensorType,
        *,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        if sample_size <= 0:
            raise ValueError(f"sample_size must be positive, got {sample_size}")
        at = jnp.asarray(at)
        key = key if key is not None else jax.random.PRNGKey(0)
        mean, var = model.predict(at)  # [N, 1]
        std = jnp.sqrt(jnp.maximum(var, 1e-24))
        from jax.scipy.stats import norm

        # binary-search the quantiles of min f via the independence approximation:
        # P(min f < y) ~= 1 - prod_i Phi((mean_i - y)/std_i)
        def log_p_min_below(y: jax.Array) -> jax.Array:
            # log(1 - prod Phi((mean - y)/std)) computed stably
            logcdf = norm.logcdf((mean - y) / std)  # P(f_i > y) for minimization
            return jnp.log1p(-jnp.exp(jnp.minimum(jnp.sum(logcdf), -1e-12)))

        lo = jnp.min(mean - 5.0 * std)
        hi = jnp.min(mean + 1.0 * std)

        def cdf_min(y):
            # P(min f <= y) = 1 - prod_i P(f_i > y) = 1 - prod_i (1 - Phi((y - m)/s))
            log_sf = norm.logcdf((mean - y) / std)  # log P(f_i > y)
            return 1.0 - jnp.exp(jnp.sum(log_sf))

        # quantiles via bisection for q in {0.25, 0.5, 0.75}
        def bisect(q):
            def body(_, ab):
                a, b = ab
                m = 0.5 * (a + b)
                below = cdf_min(m) < q
                return jnp.where(below, m, a), jnp.where(below, b, m)

            a, b = jax.lax.fori_loop(0, 50, body, (lo, hi))
            return 0.5 * (a + b)

        y25, y50, y75 = bisect(0.25), bisect(0.5), bisect(0.75)
        # fit Gumbel(min) location/scale from quartiles (reference :186-200)
        b = (y75 - y25) / (jnp.log(jnp.log(4.0)) - jnp.log(jnp.log(4.0 / 3.0)))
        a = y50 + b * jnp.log(jnp.log(2.0))
        u = jax.random.uniform(
            key, (sample_size, 1), dtype=mean.dtype, minval=1e-12, maxval=1.0 - 1e-12
        )
        samples = a + b * jnp.log(-jnp.log(1.0 - u))  # Gumbel-min draws
        return jnp.minimum(samples, jnp.min(mean))  # [S, 1]


class ThompsonSamplerFromTrajectory(ThompsonSampler):
    """Approximate Thompson sampling via decoupled trajectory draws — O(N) per sample
    (reference ``sampler.py:215-273``)."""

    def sample(
        self,
        model: ProbabilisticModel,
        sample_size: int,
        at: TensorType,
        *,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        if sample_size <= 0:
            raise ValueError(f"sample_size must be positive, got {sample_size}")
        if not isinstance(model, HasTrajectorySampler):
            raise ValueError("ThompsonSamplerFromTrajectory requires HasTrajectorySampler")
        at = jnp.asarray(at)
        key = key if key is not None else jax.random.PRNGKey(0)
        sampler = model.trajectory_sampler()
        trajectory = sampler.get_trajectory(key, batch_size=sample_size)
        xb = jnp.tile(at[:, None, :], (1, sample_size, 1))  # [N, S, D]
        vals = trajectory(xb)[..., 0]  # [N, S]
        if self._sample_min_value:
            return jnp.min(vals, axis=0)[:, None]  # [S, 1]
        idx = jnp.argmin(vals, axis=0)  # [S]
        return at[idx]
