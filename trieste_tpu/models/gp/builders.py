"""Model builders with sensible defaults.

TPU-native counterpart of the reference's ``trieste/models/gpflow/builders.py:85-657``
(``build_gpr`` etc.): constructs a GPR whose kernel hyperparameters are scaled to the
search space and the observed data, so optimization starts from a reasonable basin.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...data import Dataset
from ...space import SearchSpace
from ...ops.kernels import MATERN52, stationary
from .gpr import GaussianProcessRegression
from .posterior import GPRParams

SIGNAL_NOISE_RATIO_LIKELIHOOD = 10.0
"""Default signal-to-noise ratio used to initialize the likelihood variance
(role of reference ``builders.py:75-83``)."""

LENGTHSCALE_FRACTION = 0.2
"""Initial lengthscales as a fraction of the search-space extent per dimension."""


def default_gpr_params(
    dataset: Dataset,
    search_space: SearchSpace,
    *,
    kernel_kind: str = MATERN52,
    likelihood_variance: Optional[float] = None,
) -> GPRParams:
    """Data- and space-scaled initial hyperparameters (reference ``builders.py:85-200``)."""
    y = dataset.trimmed_observations
    dtype = dataset.query_points.dtype
    y_var = jnp.maximum(jnp.var(y), 1e-6) if y.shape[0] > 1 else jnp.asarray(1.0, dtype)
    y_mean = jnp.mean(y) if y.shape[0] > 0 else jnp.asarray(0.0, dtype)
    extent = (search_space.upper - search_space.lower).astype(dtype)
    lengthscales = LENGTHSCALE_FRACTION * extent
    if likelihood_variance is None:
        noise = y_var / (SIGNAL_NOISE_RATIO_LIKELIHOOD**2)
    else:
        noise = jnp.asarray(likelihood_variance, dtype)
    kernel = stationary(kernel_kind, variance=float(y_var), lengthscales=lengthscales, dtype=dtype)
    return GPRParams(
        kernel=kernel,
        noise_variance=jnp.asarray(noise, dtype),
        mean_constant=jnp.asarray(y_mean, dtype),
    )


def build_gpr(
    dataset: Dataset,
    search_space: SearchSpace,
    *,
    kernel_kind: str = MATERN52,
    likelihood_variance: Optional[float] = None,
    trainable_likelihood: bool = True,
    num_kernel_samples: int = 10,
    num_rff_features: int = 1000,
    optimize_key: Optional[jax.Array] = None,
) -> GaussianProcessRegression:
    """Build a :class:`GaussianProcessRegression` with defaults matching the role of the
    reference's ``build_gpr`` (``builders.py:85-176``): Matérn-5/2 ARD kernel scaled to the
    space, likelihood variance from a 10:1 signal-to-noise prior (or fixed if given)."""
    params = default_gpr_params(
        dataset, search_space, kernel_kind=kernel_kind, likelihood_variance=likelihood_variance
    )
    return GaussianProcessRegression(
        params,
        dataset,
        num_kernel_samples=num_kernel_samples,
        train_noise=trainable_likelihood,
        num_rff_features=num_rff_features,
        optimize_key=optimize_key,
    )
