"""Sharded BO step: multi-chip GP training + acquisition optimization.

This is the TPU-native replacement for the reference's single-host concurrency story
(greenlet multi-start L-BFGS, ``acquisition/optimizer.py:566-745``): the three hot pools
of a BO step are laid out on the ``"pool"`` mesh axis —

* GP hyperparameter restarts (vmapped L-BFGS) — sharded over restarts,
* acquisition seed candidates — sharded over the candidate pool,
* acquisition multi-start L-BFGS runs — sharded over runs,

with the final ``top_k``/``argmin`` selections crossing devices as XLA collectives. All
functions are pure and jitted with explicit ``NamedSharding`` constraints so they compile
for any mesh size (including a virtual CPU mesh for testing).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..models.gp.posterior import GPRParams, build_cache, log_marginal_likelihood
from ..models.gp.training import GPRTrainingResult, pack_params, randomize_starts, unpack_params
from ..ops.lbfgs import minimize_lbfgs
from .mesh import POOL_AXIS, pool_sharding, replicated


def distributed_fit(
    mesh: Mesh,
    key: jax.Array,
    params: GPRParams,
    X: jax.Array,
    Y: jax.Array,
    mask: jax.Array,
    *,
    num_starts: int = 16,
    train_noise: bool = True,
    max_iters: int = 100,
) -> GPRTrainingResult:
    """Multi-start GP hyperparameter training with restarts sharded over the mesh."""
    starts = randomize_starts(key, params, num_starts, train_noise)
    starts = jax.device_put(starts, pool_sharding(mesh))
    data = jax.device_put((X, Y, mask), replicated(mesh))

    @partial(jax.jit, static_argnames=("tn", "mi"))
    def fit(starts, X, Y, mask, tn, mi):
        def loss_fn(u):
            p = unpack_params(u, params, tn)
            return -log_marginal_likelihood(p, X, Y, mask)

        results = jax.vmap(lambda u0: minimize_lbfgs(loss_fn, u0, max_iters=mi))(starts)
        losses = jnp.where(jnp.isfinite(results.fun), results.fun, jnp.inf)
        best = jnp.argmin(losses)
        return results.x[best], losses[best], losses

    best_u, best_loss, losses = fit(starts, *data, train_noise, max_iters)
    return GPRTrainingResult(
        params=unpack_params(best_u, params, train_noise), loss=best_loss, all_losses=losses
    )


def distributed_acquisition_step(
    mesh: Mesh,
    acq: Callable[[jax.Array], jax.Array],
    seeds: jax.Array,  # [N, V, D]
    lower: jax.Array,  # [V, D]
    upper: jax.Array,  # [V, D]
    *,
    num_runs: int = 8,
    max_iters: int = 40,
) -> Tuple[jax.Array, jax.Array]:
    """Acquisition maximization with the candidate pool and the L-BFGS runs sharded
    over the mesh. Returns ``(points [V, D], values [V])``."""
    N, V, D = seeds.shape
    num_runs = min(num_runs, N)
    seeds = jax.device_put(seeds, NamedSharding(mesh, PartitionSpec(POOL_AXIS)))
    bounds = jax.device_put((lower, upper), replicated(mesh))

    @partial(jax.jit, static_argnames=("R", "mi"))
    def step(acq, seeds, lower, upper, R, mi):
        seed_vals = acq(seeds)  # [N, V] — evaluated sharded over N
        seed_vals = jnp.where(jnp.isfinite(seed_vals), seed_vals, -jnp.inf)
        top_vals, top_idx = jax.lax.top_k(seed_vals.T, R)  # gathers across devices
        starts = jnp.take_along_axis(
            seeds.transpose(1, 0, 2), top_idx[..., None], axis=1
        ).transpose(1, 0, 2)  # [R, V, D]
        # shard the runs over the pool axis for the lockstep multi-start solve
        starts = jax.lax.with_sharding_constraint(
            starts, NamedSharding(mesh, PartitionSpec(POOL_AXIS))
        )

        def neg_sum(xflat):
            return -jnp.sum(acq(xflat.reshape(V, D)[None])[0])

        def one_run(s0):
            res = minimize_lbfgs(
                neg_sum, s0.reshape(-1), lower=lower.reshape(-1),
                upper=upper.reshape(-1), max_iters=mi,
            )
            return res.x.reshape(V, D)

        opt_points = jax.vmap(one_run)(starts)  # [R, V, D]
        opt_vals = acq(opt_points)
        opt_vals = jnp.where(jnp.isfinite(opt_vals), opt_vals, -jnp.inf)
        best_run = jnp.argmax(opt_vals, axis=0)
        pts = opt_points[best_run, jnp.arange(V)]
        vals = opt_vals[best_run, jnp.arange(V)]
        seed_best = jnp.max(seed_vals, axis=0)
        seed_pts = seeds[jnp.argmax(seed_vals, axis=0), jnp.arange(V)]
        use_run = vals >= seed_best
        return (
            jnp.where(use_run[:, None], pts, seed_pts),
            jnp.where(use_run, vals, seed_best),
        )

    return step(acq, seeds, *bounds, num_runs, max_iters)


def _vectorize_scalar_acq(fn, x):
    """[N, V, D] -> [N, V] wrapper as a pytree Partial (jit-arg friendly)."""
    return jnp.reshape(fn(x), jnp.shape(x)[:-1])


def distributed_bo_step(
    mesh: Mesh,
    key: jax.Array,
    params: GPRParams,
    X: jax.Array,
    Y: jax.Array,
    mask: jax.Array,
    lower: jax.Array,  # [D] box bounds
    upper: jax.Array,
    *,
    num_fit_starts: int = 16,
    num_seeds: int = 256,
    num_runs: int = 8,
) -> Tuple[GPRParams, jax.Array]:
    """One full sharded BO iteration: fit hyperparameters (restart pool sharded) →
    rebuild the posterior cache → maximize EI (candidate + run pools sharded).

    Returns the trained parameters and the chosen query point ``[1, D]``.
    """
    from jax.tree_util import Partial

    from ..acquisition.function.function import _ei_fn
    from ..models.gp.posterior import predict_f

    k_fit, k_seed = jax.random.split(key)
    fit = distributed_fit(mesh, k_fit, params, X, Y, mask, num_starts=num_fit_starts)
    new_params = fit.params
    cache = build_cache(new_params, X, Y, mask)

    mean, _ = predict_f(new_params, cache, X)
    big = jnp.asarray(jnp.finfo(mean.dtype).max, mean.dtype)
    eta = jnp.min(jnp.where(mask[:, None], mean, big))
    ei = Partial(_ei_fn, Partial(predict_f, new_params, cache), eta)
    vec_ei = Partial(_vectorize_scalar_acq, ei)

    D = X.shape[-1]
    u = jax.random.uniform(k_seed, (num_seeds, 1, D), dtype=X.dtype)
    seeds = lower + u * (upper - lower)
    pts, _ = distributed_acquisition_step(
        mesh, vec_ei, seeds, lower[None], upper[None], num_runs=num_runs
    )
    return new_params, pts
