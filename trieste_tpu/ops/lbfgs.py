"""Pure-JAX box-constrained L-BFGS, vmappable and shardable.

This replaces the reference's acquisition-optimization engine — greenlet-coordinated
multi-start ``scipy.optimize.minimize(L-BFGS-B)`` with function/gradient evaluations
batched across runs in single TF calls (``acquisition/optimizer.py:566-745``) — with a
device-resident equivalent: a fixed-memory L-BFGS two-loop recursion under
``lax.while_loop``, projected onto box bounds, with Armijo backtracking line search. The
whole optimizer is a pure function of arrays, so multi-start parallelism is a ``vmap``
axis (and a ``pjit`` shard axis across chips) instead of a host greenlet pool.

It is also the engine for GP hyperparameter training (replacing
``gpflow.optimizers.Scipy`` — reference ``models/gpflow/interface.py:69-70``), run over
unconstrained (log-transformed) hyperparameters.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class LBFGSResults(NamedTuple):
    """Result of an L-BFGS run."""

    x: jax.Array  # [..., D] final iterate
    fun: jax.Array  # [...] final objective value
    converged: jax.Array  # [...] bool: gradient/ftol convergence reached
    num_iters: jax.Array  # [...] iterations taken
    num_fun_evals: jax.Array  # [...] objective evaluations (incl. line search)


class _State(NamedTuple):
    it: jax.Array
    x: jax.Array
    f: jax.Array
    g: jax.Array
    s_hist: jax.Array  # [m, D]
    y_hist: jax.Array  # [m, D]
    rho: jax.Array  # [m]
    hk: jax.Array  # history write pointer (number of accepted pairs ever)
    gamma: jax.Array
    evals: jax.Array
    done: jax.Array
    converged: jax.Array


def _two_loop(
    g: jax.Array,
    s_hist: jax.Array,
    y_hist: jax.Array,
    rho: jax.Array,
    hk: jax.Array,
    gamma: jax.Array,
) -> jax.Array:
    """L-BFGS two-loop recursion over a circular history buffer. Invalid/empty slots carry
    ``rho == 0`` so their contributions vanish without explicit masking."""
    m = rho.shape[0]
    num_pairs = jnp.minimum(hk, m)

    def body1(i, carry):
        q, alphas = carry
        idx = jnp.mod(hk - 1 - i, m)
        a = rho[idx] * jnp.dot(s_hist[idx], q)
        q = q - a * y_hist[idx]
        return q, alphas.at[idx].set(a)

    q, alphas = lax.fori_loop(0, m, body1, (g, jnp.zeros_like(rho)))
    r = gamma * q

    def body2(j, r):
        idx = jnp.mod(hk - num_pairs + j, m)
        b = rho[idx] * jnp.dot(y_hist[idx], r)
        return r + (alphas[idx] - b) * s_hist[idx]

    return lax.fori_loop(0, m, body2, r)


def minimize_lbfgs(
    fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    lower: Optional[jax.Array] = None,
    upper: Optional[jax.Array] = None,
    *,
    memory: int = 10,
    max_iters: int = 100,
    gtol: float = 1e-6,
    ftol: float = 1e-10,
    max_line_search: int = 25,
    armijo_c1: float = 1e-4,
) -> LBFGSResults:
    """Minimize ``fn: [D] -> scalar`` from ``x0`` with optional box bounds.

    Box handling is gradient projection: search directions are projected onto the feasible
    box inside the line search and convergence is measured on the projected gradient
    ``x - clip(x - g, lower, upper)`` (matching scipy L-BFGS-B's criterion).
    """
    dtype = x0.dtype
    has_bounds = lower is not None or upper is not None
    lo = -jnp.inf if lower is None else lower
    hi = jnp.inf if upper is None else upper

    def project(x: jax.Array) -> jax.Array:
        return jnp.clip(x, lo, hi) if has_bounds else x

    def proj_grad_norm(x: jax.Array, g: jax.Array) -> jax.Array:
        return jnp.max(jnp.abs(x - project(x - g)))

    vg = jax.value_and_grad(fn)

    def safe_vg(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        f, g = vg(x)
        bad = ~jnp.isfinite(f)
        f = jnp.where(bad, jnp.asarray(jnp.inf, f.dtype), f)
        g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
        return f, g

    def line_search(x, f, g, d):
        """Backtracking Armijo over the projected path ``project(x + a*d)``."""
        # directional derivative proxy at full step; recomputed per trial via g.(xn - x)
        def cond(c):
            a, ls_it, x_best, f_best, ok = c
            return (~ok) & (ls_it < max_line_search)

        def body(c):
            a, ls_it, x_best, f_best, ok = c
            xn = project(x + a * d)
            fn_val, _ = safe_vg(xn)
            decrease = fn_val <= f + armijo_c1 * jnp.dot(g, xn - x)
            moved = jnp.max(jnp.abs(xn - x)) > 0
            good = decrease & moved
            x_best = jnp.where(good, xn, x_best)
            f_best = jnp.where(good, fn_val, f_best)
            return a * 0.5, ls_it + 1, x_best, f_best, good

        a0 = jnp.asarray(1.0, dtype)
        init = (a0, jnp.asarray(0, jnp.int32), x, f, jnp.asarray(False))
        _, ls_evals, x_new, f_new, ok = lax.while_loop(cond, body, init)
        return x_new, f_new, ls_evals, ok

    def cond_fn(s: _State) -> jax.Array:
        return ~s.done

    def body_fn(s: _State) -> _State:
        d = -_two_loop(s.g, s.s_hist, s.y_hist, s.rho, s.hk, s.gamma)
        # fall back to steepest descent if d is not a descent direction
        descent = jnp.dot(d, s.g) < 0
        d = jnp.where(descent, d, -s.g)
        x_new, f_new, ls_evals, ls_ok = line_search(s.x, s.f, s.g, d)
        f2, g_new = safe_vg(x_new)
        sk = x_new - s.x
        yk = g_new - s.g
        sy = jnp.dot(sk, yk)
        accept = ls_ok & (sy > 1e-10)
        slot = jnp.mod(s.hk, memory)
        s_hist = jnp.where(accept, s.s_hist.at[slot].set(sk), s.s_hist)
        y_hist = jnp.where(accept, s.y_hist.at[slot].set(yk), s.y_hist)
        rho = jnp.where(accept, s.rho.at[slot].set(1.0 / jnp.maximum(sy, 1e-30)), s.rho)
        hk = jnp.where(accept, s.hk + 1, s.hk)
        gamma = jnp.where(
            accept, sy / jnp.maximum(jnp.dot(yk, yk), 1e-30), s.gamma
        )
        x = jnp.where(ls_ok, x_new, s.x)
        f = jnp.where(ls_ok, f_new, s.f)
        g = jnp.where(ls_ok, g_new, s.g)
        pg = proj_grad_norm(x, g)
        f_rel = jnp.abs(s.f - f) / jnp.maximum(jnp.maximum(jnp.abs(f), jnp.abs(s.f)), 1.0)
        converged = (pg <= gtol) | (ls_ok & (f_rel <= ftol))
        it = s.it + 1
        done = converged | (~ls_ok) | (it >= max_iters)
        return _State(
            it, x, f, g, s_hist, y_hist, rho, hk, gamma,
            s.evals + ls_evals + 1, done, converged,
        )

    x0 = project(x0.astype(dtype))
    f0, g0 = safe_vg(x0)
    D = x0.shape[-1]
    init = _State(
        it=jnp.asarray(0, jnp.int32),
        x=x0,
        f=f0,
        g=g0,
        s_hist=jnp.zeros((memory, D), dtype),
        y_hist=jnp.zeros((memory, D), dtype),
        rho=jnp.zeros((memory,), dtype),
        hk=jnp.asarray(0, jnp.int32),
        gamma=jnp.asarray(1.0, dtype),
        evals=jnp.asarray(1, jnp.int32),
        done=proj_grad_norm(x0, g0) <= gtol,
        converged=proj_grad_norm(x0, g0) <= gtol,
    )
    final = lax.while_loop(cond_fn, body_fn, init)
    return LBFGSResults(final.x, final.f, final.converged, final.it, final.evals)


def vmapped_minimize_lbfgs(
    fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    lower: Optional[jax.Array] = None,
    upper: Optional[jax.Array] = None,
    **kwargs: object,
) -> LBFGSResults:
    """Run :func:`minimize_lbfgs` over a batch of starts ``x0: [R, D]`` in parallel.

    This is the TPU-native multi-start engine (reference greenlet pool,
    ``acquisition/optimizer.py:566-745``): all R runs advance in lockstep on device; the
    bounds may be per-run ``[R, D]`` (vectorized spaces) or shared ``[D]``.
    """
    in_axes_bounds = 0 if (lower is not None and jnp.asarray(lower).ndim == 2) else None
    solver = partial(minimize_lbfgs, fn, **kwargs)
    return jax.vmap(solver, in_axes=(0, in_axes_bounds, in_axes_bounds))(x0, lower, upper)
