"""Analytic fake models implementing the model protocols — the key fixture strategy of the
reference (``tests/util/models/gpflow/models.py``): no mocking library, instead hand-built
models with closed-form posteriors so acquisition values can be asserted analytically.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.tree_util import Partial

from trieste_tpu.data import Dataset
from trieste_tpu.models.interfaces import (
    ProbabilisticModel,
    ReparametrizationSampler,
)
from trieste_tpu.ops.kernels import Stationary, gram, stationary
from trieste_tpu.utils.misc import jitter_for


def _pure_gp_predict(mean_fns, kernels, x):
    means = jnp.stack([f(x) for f in mean_fns], axis=-1)  # [..., L]
    variances = jnp.stack([k.diag(x) for k in kernels], axis=-1)
    return means, variances


class GaussianProcess:
    """A (prior) GP with explicit mean functions and kernels — exact joint predictions
    (role of reference ``tests/util/models/gpflow/models.py:84-127``)."""

    def __init__(
        self,
        mean_functions: Sequence[Callable[[jax.Array], jax.Array]],
        kernels: Sequence[Stationary],
        noise_variance: float = 1.0,
    ):
        self._mean_functions = list(mean_functions)
        self._kernels = list(kernels)
        self._noise_variance = jnp.asarray(noise_variance)

    def predict(self, query_points) -> Tuple[jax.Array, jax.Array]:
        x = jnp.asarray(query_points)
        return _pure_gp_predict(self._mean_functions, self._kernels, x)

    def predict_partial(self):
        return Partial(
            Partial(_pure_gp_predict, tuple(self._mean_functions)), tuple(self._kernels)
        )

    def predict_joint(self, query_points) -> Tuple[jax.Array, jax.Array]:
        x = jnp.asarray(query_points)  # [..., B, D]
        means = jnp.stack([f(x) for f in self._mean_functions], axis=-1)
        covs = jnp.stack([gram(k, x, x) for k in self._kernels], axis=-3)
        return means, covs

    def predict_y(self, query_points) -> Tuple[jax.Array, jax.Array]:
        mean, var = self.predict(query_points)
        return mean, var + self._noise_variance

    def get_observation_noise(self) -> jax.Array:
        return self._noise_variance

    def get_kernel(self) -> Stationary:
        return self._kernels[0]

    def get_mean_function(self):
        return lambda x: jnp.stack([f(x) for f in self._mean_functions], axis=-1)

    def sample(self, key, query_points, num_samples: int) -> jax.Array:
        mean, cov = self.predict_joint(query_points)  # [..., B, L], [..., L, B, B]
        B = cov.shape[-1]
        L = jnp.linalg.cholesky(cov + jitter_for(cov.dtype) * jnp.eye(B, dtype=cov.dtype))
        eps = jax.random.normal(key, cov.shape[:-2] + (num_samples, B), cov.dtype)
        samp = jnp.einsum("...pij,...psj->...psi", L, eps)
        samp = jnp.moveaxis(samp, -3, -1)
        return samp + mean[..., None, :, :]

    def log(self, dataset: Optional[Dataset] = None) -> None:
        pass

    def reparam_sampler(self, num_samples: int) -> ReparametrizationSampler:
        from trieste_tpu.models.gp.sampler import BatchReparametrizationSampler

        return BatchReparametrizationSampler(num_samples, self)


class PseudoTrainableProbModel:
    """Mixin making a model trivially trainable (reference ``tests/util/.../models.py:63``)."""

    def update(self, dataset: Dataset) -> None:
        pass

    def optimize(self, dataset: Dataset) -> None:
        pass


def _norm2_mean(x: jax.Array) -> jax.Array:
    return jnp.sum(x**2, axis=-1)


class QuadraticMeanAndRBFKernel(GaussianProcess, PseudoTrainableProbModel):
    """``mean = ||x||², RBF kernel`` — closed-form acquisition assertions
    (reference ``tests/util/models/gpflow/models.py:189-212``)."""

    def __init__(
        self,
        kernel_amplitude: float = 1.0,
        noise_variance: float = 1.0,
    ):
        kernel = stationary("rbf", variance=kernel_amplitude, lengthscales=1.0)
        super().__init__([_norm2_mean], [kernel], noise_variance)

    def __repr__(self) -> str:
        return "QuadraticMeanAndRBFKernel()"
