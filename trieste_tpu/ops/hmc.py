"""Hamiltonian Monte Carlo, vmappable and device-resident.

The BASELINE north star adds NUTS/HMC over GP hyperparameters to the reference's
capabilities (the reference trains point estimates only). This module implements
adaptive-step HMC with dual-averaging warmup: chains advance in lockstep under ``vmap``
(a shard axis under pjit), the whole sampler is one ``lax.scan`` program.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class HMCResults(NamedTuple):
    samples: jax.Array  # [num_samples, D]
    accept_rate: jax.Array  # scalar
    step_size: jax.Array  # adapted step size


def _leapfrog(grad_fn, q, p, step_size, num_steps):
    def body(carry, _):
        q, p = carry
        p = p + 0.5 * step_size * grad_fn(q)
        q = q + step_size * p
        p = p + 0.5 * step_size * grad_fn(q)
        return (q, p), None

    (q, p), _ = jax.lax.scan(body, (q, p), None, length=num_steps)
    return q, p


def hmc_sample(
    key: jax.Array,
    log_prob: Callable[[jax.Array], jax.Array],
    initial: jax.Array,
    *,
    num_samples: int = 100,
    num_warmup: int = 100,
    num_leapfrog: int = 12,
    initial_step_size: float = 0.1,
    target_accept: float = 0.75,
) -> HMCResults:
    """Sample from ``exp(log_prob)`` starting at ``initial [D]``.

    Warmup adapts the step size by dual averaging towards ``target_accept``; sampling
    keeps it fixed. Fully jittable; vmap over ``(key, initial)`` for parallel chains.
    """
    D = initial.shape[-1]
    grad_fn = jax.grad(log_prob)

    def safe_log_prob(q):
        lp = log_prob(q)
        return jnp.where(jnp.isfinite(lp), lp, -jnp.inf)

    def transition(carry, inp):
        q, log_eps, log_eps_bar, h_bar, t = carry
        k, warmup_flag = inp
        k_mom, k_acc = jax.random.split(k)
        step = jnp.exp(jnp.where(warmup_flag, log_eps, log_eps_bar))
        p0 = jax.random.normal(k_mom, (D,), initial.dtype)
        q_new, p_new = _leapfrog(grad_fn, q, p0, step, num_leapfrog)
        h0 = safe_log_prob(q) - 0.5 * jnp.sum(p0**2)
        h1 = safe_log_prob(q_new) - 0.5 * jnp.sum(p_new**2)
        log_alpha = jnp.minimum(h1 - h0, 0.0)
        alpha = jnp.where(jnp.isfinite(log_alpha), jnp.exp(log_alpha), 0.0)
        accept = jax.random.uniform(k_acc, dtype=initial.dtype) < alpha
        q = jnp.where(accept, q_new, q)

        # dual averaging (Hoffman & Gelman 2014) during warmup
        t_new = t + warmup_flag.astype(t.dtype)
        eta = 1.0 / (t_new + 10.0)
        h_bar_new = jnp.where(
            warmup_flag, (1.0 - eta) * h_bar + eta * (target_accept - alpha), h_bar
        )
        mu = jnp.log(10.0 * initial_step_size)
        log_eps_new = jnp.where(
            warmup_flag, mu - jnp.sqrt(t_new) / 0.05 * h_bar_new, log_eps
        )
        weight = jnp.where(warmup_flag, t_new ** (-0.75), 0.0)
        log_eps_bar_new = weight * log_eps_new + (1.0 - weight) * log_eps_bar
        return (q, log_eps_new, log_eps_bar_new, h_bar_new, t_new), (q, alpha)

    total = num_warmup + num_samples
    keys = jax.random.split(key, total)
    warmup_flags = jnp.arange(total) < num_warmup
    init = (
        initial,
        jnp.log(jnp.asarray(initial_step_size, initial.dtype)),
        jnp.log(jnp.asarray(initial_step_size, initial.dtype)),
        jnp.asarray(0.0, initial.dtype),
        jnp.asarray(0.0, initial.dtype),
    )
    (_, _, log_eps_bar, _, _), (qs, alphas) = jax.lax.scan(
        transition, init, (keys, warmup_flags)
    )
    return HMCResults(
        samples=qs[num_warmup:],
        accept_rate=jnp.mean(alphas[num_warmup:]),
        step_size=jnp.exp(log_eps_bar),
    )
