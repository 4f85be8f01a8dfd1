"""On-device GP hyperparameter training.

Replaces the reference's two-stage scheme — prior-randomized initialization scoring
(``find_best_model_initialization``, ``models/gpflow/models.py:294-322`` /
``randomize_hyperparameters`` ``models/gpflow/utils.py:54-127``) followed by a single
host-side ``gpflow.optimizers.Scipy`` L-BFGS run — with something strictly stronger and
TPU-shaped: **all** randomized restarts are optimized to convergence simultaneously by a
vmapped pure-JAX L-BFGS (one compiled program, R parallel runs on device), and the best
final (not initial) loss wins.

Positive hyperparameters are trained in log space (the bijector role of GPflow's
softplus); the observation noise keeps a small floor for numerical safety.

With ``priors`` (a :class:`~trieste_tpu.models.gp.priors.GPPriors`, set by
:func:`~trieste_tpu.models.gp.builders.build_gpr` by default) the fit is MAP instead of
raw MLE — the reference's stabilization scheme (``models/gpflow/builders.py:391-424``):
restarts are sampled from the priors, the loss carries the log prior density, and the
winning parameters are squeezed to a wide log-window around the prior locs.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.lbfgs import minimize_lbfgs
from .posterior import GPRParams, log_marginal_likelihood
from .priors import GPPriors, log_prior_density, sample_log_params, squeeze_kernel

NOISE_FLOOR = 1e-8
MIN_VARIANCE = 1e-12


class GPRTrainingResult(NamedTuple):
    params: GPRParams
    loss: jax.Array  # best negative log marginal likelihood
    all_losses: jax.Array  # [R] per-restart final losses


def pack_params(params: GPRParams, train_noise: bool = True) -> jax.Array:
    """Flatten trainable hyperparameters into an unconstrained vector."""
    ls = jnp.atleast_1d(params.kernel.lengthscales)
    parts = [
        jnp.log(jnp.maximum(jnp.atleast_1d(params.kernel.variance), MIN_VARIANCE)),
        jnp.log(jnp.maximum(ls, MIN_VARIANCE)),
        jnp.atleast_1d(params.mean_constant),
    ]
    if train_noise:
        parts.append(
            jnp.log(jnp.maximum(jnp.atleast_1d(params.noise_variance) - NOISE_FLOOR, MIN_VARIANCE))
        )
    return jnp.concatenate(parts)


def unpack_params(u: jax.Array, template: GPRParams, train_noise: bool = True) -> GPRParams:
    """Inverse of :func:`pack_params`."""
    ls_shape = jnp.shape(template.kernel.lengthscales)
    n_ls = 1 if ls_shape == () else ls_shape[0]
    variance = jnp.exp(u[0])
    ls = jnp.exp(u[1 : 1 + n_ls])
    if ls_shape == ():
        ls = ls[0]
    mean_constant = u[1 + n_ls]
    if train_noise:
        noise = NOISE_FLOOR + jnp.exp(u[2 + n_ls])
    else:
        noise = template.noise_variance
    return GPRParams(
        kernel=template.kernel.replace(variance=variance, lengthscales=ls),
        noise_variance=noise,
        mean_constant=mean_constant,
    )


def randomize_starts(
    key: jax.Array,
    params: GPRParams,
    num_starts: int,
    train_noise: bool = True,
    log_spread: float = 2.302585092994046,  # ln(10)
    priors: Optional[GPPriors] = None,
) -> jax.Array:
    """``[R, P]`` initial vectors: the current parameters plus ``R-1`` randomized
    restarts (the TPU analogue of the reference's prior/uniform randomization,
    ``models/gpflow/utils.py:54-86``).

    With ``priors`` the kernel entries of the restarts are sampled from the LogNormal
    priors (reference ``randomize_hyperparameters``: parameters with priors draw from
    them; the noise, which has none, stays at its initial value). Without priors they
    are log-uniform perturbations of the current values.
    """
    u0 = pack_params(params, train_noise)
    P = u0.shape[0]
    ls_shape = jnp.shape(params.kernel.lengthscales)
    n_ls = 1 if ls_shape == () else ls_shape[0]
    if priors is not None:
        log_var, log_ls = sample_log_params(key, priors, num_starts - 1, n_ls)
        rest = jnp.broadcast_to(u0[None], (num_starts - 1, P))
        rest = rest.at[:, 0].set(log_var)
        rest = rest.at[:, 1 : 1 + n_ls].set(log_ls)
        return jnp.concatenate([u0[None], rest], axis=0)
    shifts = jax.random.uniform(
        key, (num_starts - 1, P), dtype=u0.dtype, minval=-log_spread, maxval=log_spread
    )
    # don't perturb the constant mean (index 1 + n_ls) multiplicatively in log space
    shifts = shifts.at[:, 1 + n_ls].set(0.0)
    return jnp.concatenate([u0[None], u0[None] + shifts], axis=0)


def fit_gpr(
    key: jax.Array,
    params: GPRParams,
    X: jax.Array,
    Y: jax.Array,
    mask: jax.Array,
    *,
    num_starts: int = 10,
    train_noise: bool = True,
    max_iters: int = 100,
    pool_sharding=None,
    priors: Optional[GPPriors] = None,
) -> GPRTrainingResult:
    """Train GPR hyperparameters by multi-start L-BFGS on the negative log marginal
    likelihood (MAP when ``priors`` is given — negative unnormalized log posterior);
    jittable end to end.

    ``pool_sharding`` (a leading-axis ``NamedSharding``, threaded through automatically
    by the model wrappers when a global mesh is active — see
    :mod:`trieste_tpu.parallel`) shards the restart pool across devices; the final
    ``argmin`` is an XLA collective."""

    def loss_fn(u: jax.Array) -> jax.Array:
        p = unpack_params(u, params, train_noise)
        nll = -log_marginal_likelihood(p, X, Y, mask)
        if priors is not None:
            nll = nll - log_prior_density(p.kernel, priors)
        return nll

    starts = randomize_starts(key, params, num_starts, train_noise, priors=priors)
    if pool_sharding is not None:
        starts = jax.lax.with_sharding_constraint(starts, pool_sharding)
    results = jax.vmap(
        lambda u0: minimize_lbfgs(loss_fn, u0, max_iters=max_iters)
    )(starts)
    finite = jnp.isfinite(results.fun)
    losses = jnp.where(finite, results.fun, jnp.inf)
    best = jnp.argmin(losses)
    best_u = results.x[best]
    best_params = unpack_params(best_u, params, train_noise)
    if priors is not None:
        best_params = best_params.replace(
            kernel=squeeze_kernel(best_params.kernel, priors)
        )
    return GPRTrainingResult(params=best_params, loss=losses[best], all_losses=losses)
