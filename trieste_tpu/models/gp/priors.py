"""Kernel hyperparameter priors for MAP training.

TPU-native counterpart of the reference's prior scheme
(``trieste/models/gpflow/builders.py:391-424``): LogNormal priors on kernel
lengthscales (loc = log of the space-scaled initial lengthscales) and signal variance
(loc = log of the empirical observation variance), both with scale
``KERNEL_PRIOR_SCALE``. The reference attaches these as gpflow parameter priors so that
its Scipy L-BFGS maximizes the log *posterior* density and its restart randomization
samples from them (``models/gpflow/utils.py:54-86``); here the same three roles are pure
functions over a :class:`GPPriors` pytree:

- :func:`log_prior_density` — added to the marginal likelihood / ELBO to make every
  ``fit_*`` trainer a MAP fit. This is the stabilizer that keeps lengthscales O(space
  extent) instead of diverging along flat likelihood ridges.
- :func:`sample_start_vectors` — prior-sampled multi-start initializations (the role of
  ``randomize_hyperparameters``).
- :func:`squeeze_kernel` — post-fit clipping of the fitted kernel parameters to a wide
  log-window around the prior locs (the role of ``squeeze_hyperparameters``,
  ``models/gpflow/utils.py:88-127``) as a numerical backstop; with the priors active the
  MAP essentially never reaches the clip boundary.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ...ops.kernels import Stationary

KERNEL_PRIOR_SCALE = 1.0
"""LogNormal prior scale (reference ``builders.py:47``)."""

SQUEEZE_LOG_RANGE = math.log(1e3)
"""Post-fit clip window: fitted log-params stay within ``loc ± log(1e3)``."""


@struct.dataclass
class GPPriors:
    """LogNormal priors over the stationary-kernel hyperparameters.

    ``ls_loc``/``var_loc`` are the locs of the LogNormal (i.e. the *log* of the
    prior-median lengthscales/variance); ``scale`` is shared.
    """

    ls_loc: jax.Array  # [D] or scalar
    var_loc: jax.Array  # scalar
    scale: jax.Array  # scalar


def default_priors(kernel: Stationary, scale: float = KERNEL_PRIOR_SCALE) -> GPPriors:
    """Priors centered at the kernel's current (initial) hyperparameters
    (reference ``_get_kernel``, ``builders.py:392-409``)."""
    dtype = jnp.asarray(kernel.variance).dtype
    return GPPriors(
        ls_loc=jnp.log(jnp.maximum(jnp.asarray(kernel.lengthscales, dtype), 1e-12)),
        var_loc=jnp.log(jnp.maximum(jnp.asarray(kernel.variance, dtype), 1e-12)),
        scale=jnp.asarray(scale, dtype),
    )


def log_prior_density(kernel: Stationary, priors: Optional[GPPriors]) -> jax.Array:
    """Sum of LogNormal log-densities of the kernel hyperparameters (constants dropped).

    ``LogNormal(loc, s).log_prob(x) = -log x - ((log x - loc)/s)²/2 + const`` — the
    quadratic term in log-space is what makes runaway lengthscales pay an unbounded
    penalty on otherwise-flat likelihood ridges.
    """
    if priors is None:
        return jnp.asarray(0.0, jnp.asarray(kernel.variance).dtype)
    log_ls = jnp.log(jnp.maximum(jnp.atleast_1d(kernel.lengthscales), 1e-30))
    log_var = jnp.log(jnp.maximum(kernel.variance, 1e-30))
    ls_loc = jnp.broadcast_to(jnp.atleast_1d(priors.ls_loc), log_ls.shape)
    s = priors.scale
    ls_term = jnp.sum(-log_ls - 0.5 * jnp.square((log_ls - ls_loc) / s))
    var_term = -log_var - 0.5 * jnp.square((log_var - priors.var_loc) / s)
    return ls_term + var_term


def sample_log_params(
    key: jax.Array, priors: GPPriors, num_samples: int, n_ls: int
) -> tuple[jax.Array, jax.Array]:
    """Sample ``(log_variance [R], log_lengthscales [R, n_ls])`` from the priors."""
    k_var, k_ls = jax.random.split(key)
    dtype = jnp.asarray(priors.var_loc).dtype
    log_var = priors.var_loc + priors.scale * jax.random.normal(
        k_var, (num_samples,), dtype
    )
    ls_loc = jnp.broadcast_to(jnp.atleast_1d(priors.ls_loc), (n_ls,))
    log_ls = ls_loc[None, :] + priors.scale * jax.random.normal(
        k_ls, (num_samples, n_ls), dtype
    )
    return log_var, log_ls


def squeeze_kernel(kernel: Stationary, priors: Optional[GPPriors]) -> Stationary:
    """Clip fitted kernel hyperparameters to ``exp(loc ± SQUEEZE_LOG_RANGE)``."""
    if priors is None:
        return kernel
    log_ls = jnp.log(jnp.maximum(kernel.lengthscales, 1e-30))
    ls_loc = jnp.broadcast_to(priors.ls_loc, jnp.shape(log_ls))
    log_ls = jnp.clip(log_ls, ls_loc - SQUEEZE_LOG_RANGE, ls_loc + SQUEEZE_LOG_RANGE)
    log_var = jnp.log(jnp.maximum(kernel.variance, 1e-30))
    log_var = jnp.clip(
        log_var, priors.var_loc - SQUEEZE_LOG_RANGE, priors.var_loc + SQUEEZE_LOG_RANGE
    )
    return kernel.replace(lengthscales=jnp.exp(log_ls), variance=jnp.exp(log_var))
