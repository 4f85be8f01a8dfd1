"""Observation likelihoods for variational GP models.

The reference's ``VariationalGaussianProcess`` wraps any GPflow likelihood
(``models/gpflow/models.py:1109-1383``); here the likelihood is a pytree value carried
inside the variational model's parameter dataclass, so it jits cleanly (the class is
static in the treedef, trainable fields — e.g. the Gaussian noise — are array leaves).

Each likelihood provides:

- ``log_prob(f, y)`` — pointwise ``log p(y | f)``,
- ``variational_expectations(mean, var, y)`` — ``E_{N(f | mean, var)}[log p(y|f)]``,
  closed-form where available, 20-point Gauss-Hermite quadrature otherwise (the
  reference's GPflow default, ``gpflow.likelihoods.Likelihood``),
- ``predict_y(mean, var)`` — observation-space moments from latent moments.

Shapes: ``mean``/``var``/``y`` are ``[..., 1]`` column vectors; the returned
expectations match.

Examples:

>>> import jax.numpy as jnp
>>> from trieste_tpu.models.gp.likelihoods import (
...     BernoulliLikelihood, GaussianLikelihood, PoissonLikelihood)
>>> g = GaussianLikelihood(variance=jnp.asarray(0.25))
>>> mean, var = g.predict_y(jnp.array([[1.0]]), jnp.array([[0.1]]))
>>> float(var[0, 0])  # latent variance plus observation noise
0.35
>>> p = PoissonLikelihood()
>>> rate, _ = p.predict_y(jnp.array([[0.0]]), jnp.array([[0.0]]))
>>> float(rate[0, 0])  # rate = exp(mean + var/2)
1.0
>>> b = BernoulliLikelihood()
>>> prob, _ = b.predict_y(jnp.array([[0.0]]), jnp.array([[1.0]]))
>>> float(prob[0, 0])  # Phi(0 / sqrt(2)) = 0.5
0.5
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.scipy.stats import norm

# probabilists' Gauss-Hermite nodes/weights for N(mu, var) expectations
_GH_X, _GH_W = np.polynomial.hermite_e.hermegauss(20)
_GH_W = _GH_W / np.sqrt(2.0 * np.pi)


def gauss_hermite_expectation(log_prob, mean: jax.Array, var: jax.Array, y: jax.Array) -> jax.Array:
    """``E_{N(f | mean, var)}[log_prob(f, y)]`` by 20-point Gauss-Hermite quadrature."""
    std = jnp.sqrt(jnp.maximum(var, 1e-24))
    nodes = mean[..., None] + std[..., None] * _GH_X  # [..., 1, Q]
    return jnp.sum(log_prob(nodes, y[..., None]) * _GH_W, axis=-1)


@struct.dataclass
class BernoulliLikelihood:
    """Probit-Bernoulli: ``p(y=1 | f) = Phi(f)`` (reference ``gpflow.likelihoods.Bernoulli``)."""

    def log_prob(self, f: jax.Array, y: jax.Array) -> jax.Array:
        sign = 2.0 * y - 1.0
        return jnp.clip(norm.logcdf(sign * f), -1e3, 0.0)

    def variational_expectations(self, mean, var, y) -> jax.Array:
        return gauss_hermite_expectation(self.log_prob, mean, var, y)

    def predict_y(self, mean: jax.Array, var: jax.Array) -> Tuple[jax.Array, jax.Array]:
        p = norm.cdf(mean / jnp.sqrt(1.0 + var))
        return p, p * (1.0 - p)


@struct.dataclass
class GaussianLikelihood:
    """Conjugate Gaussian observation noise with trainable ``variance`` (reference
    ``gpflow.likelihoods.Gaussian``); closed-form variational expectations."""

    variance: jax.Array

    def log_prob(self, f: jax.Array, y: jax.Array) -> jax.Array:
        return norm.logpdf(y, loc=f, scale=jnp.sqrt(self.variance))

    def variational_expectations(self, mean, var, y) -> jax.Array:
        s2 = self.variance
        return -0.5 * (
            jnp.log(2.0 * jnp.pi * s2) + (jnp.square(y - mean) + var) / s2
        )

    def predict_y(self, mean: jax.Array, var: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return mean, var + self.variance


@struct.dataclass
class PoissonLikelihood:
    """Poisson counts with log link ``rate = exp(f)`` (reference
    ``gpflow.likelihoods.Poisson``); closed-form variational expectations
    ``y·m − exp(m + v/2) − log y!``."""

    def log_prob(self, f: jax.Array, y: jax.Array) -> jax.Array:
        return y * f - jnp.exp(f) - jax.scipy.special.gammaln(y + 1.0)

    def variational_expectations(self, mean, var, y) -> jax.Array:
        return (
            y * mean
            - jnp.exp(mean + 0.5 * var)
            - jax.scipy.special.gammaln(y + 1.0)
        )

    def predict_y(self, mean: jax.Array, var: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # moments of a log-Gaussian-mixed Poisson
        rate = jnp.exp(mean + 0.5 * var)
        return rate, rate + (jnp.exp(var) - 1.0) * jnp.exp(2.0 * mean + var)
