"""Measured per-unit time breakdown of the fused prediction kernel (round-5 ask #4).

Attributes the C=1024 fused call's time to its hardware units by timing ablated kernel
variants INTERLEAVED in one process (the axon tunnel's dispatch rate drifts several-fold
over tens of minutes, so A/B comparisons must interleave — see
``.claude/skills/verify/SKILL.md``):

* ``full``        — production kernel (6-pass r², VPU mean, 3-pass bf16-split v)
* ``v2pass``      — variance contraction at 2 MXU passes (drops lo·hi)
* ``v1pass``      — variance contraction at 1 MXU pass (bf16-only)
* ``noexp``       — stationary kernel replaced by a polynomial (no transcendentals):
                    isolates the VPU exp/sqrt tail
* ``nomean``      — mean reduction ablated: isolates the P-column VPU reduction

Differences against ``full`` give the measured cost of each unit; the residual after
subtracting the v-passes' marginal cost and the transcendental tail from the total is
scheduling/DMA overhead. Timings are BOTH standalone fused calls and the chained-EI
throughput (the dispatch-amortized arbiter — standalone and pipelined timings are known
to disagree when MXU/VPU overlap across calls).

Writes ``KERNEL_BREAKDOWN.json`` at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import Partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _state(dtype=jnp.float32, D=6, n_train=1024):
    from trieste_tpu.data import Dataset
    from trieste_tpu.models.gp.posterior import GPRParams, build_cache
    from trieste_tpu.objectives import Hartmann6
    from trieste_tpu.ops.kernels import stationary

    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    Xtr = jax.random.uniform(k1, (n_train, D), dtype=dtype)
    Ytr = Hartmann6.objective(Xtr).astype(dtype)
    ds = Dataset.from_arrays(Xtr, Ytr)
    params = GPRParams(
        kernel=stationary("matern52", 1.0, [0.3] * D, dtype=dtype),
        noise_variance=jnp.asarray(1e-4, dtype),
        mean_constant=jnp.asarray(0.0, dtype),
    )
    cache = build_cache(params, ds.query_points, ds.observations, ds.mask)
    x = jax.random.uniform(k2, (1 << 17, D), dtype=dtype)
    return params, cache, x


def _timed_call(fn, out_reduce, reps=20):
    """Fetch-forced steady-state ms/call (bench.py methodology)."""
    out = fn()
    float(out_reduce(out))
    t0 = time.perf_counter()
    float(out_reduce(out))
    fetch_rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    float(out_reduce(out))
    return (time.perf_counter() - t0 - fetch_rt) / reps * 1e3


def _variant_patches(name: str, fused):
    """Returns (apply, restore) closures mutating fused_predict module knobs."""
    orig_stationary = fused._stationary
    orig_passes = fused._V_PASSES

    def restore():
        fused._stationary = orig_stationary
        fused._V_PASSES = orig_passes

    if name == "full":
        return (lambda: None), restore
    if name == "v2pass":
        def apply():
            fused._V_PASSES = 2
        return apply, restore
    if name == "v1pass":
        def apply():
            fused._V_PASSES = 1
        return apply, restore
    if name == "noexp":
        def apply():
            # polynomial stand-in with the same operand flow, no exp/sqrt
            fused._stationary = lambda kind, r2: 1.0 / (1.0 + r2)
        return apply, restore
    if name == "nomean":
        raise AssertionError("handled inline")
    raise ValueError(name)


def main() -> None:
    from trieste_tpu.ops import fused_predict as fused

    params, cache, x = _state()
    total2 = jax.jit(lambda mv: jnp.sum(mv[0]) + jnp.sum(mv[1]))
    variants = ["full", "v2pass", "v1pass", "noexp"]
    results: dict = {name: [] for name in variants}
    ROUNDS = 4

    for r in range(ROUNDS):
        for name in variants:
            apply, restore = _variant_patches(name, fused)
            apply()
            try:
                jax.clear_caches()
                call = jax.jit(Partial(fused.fused_predict_f, params, cache))
                ms = _timed_call(lambda: call(x), total2)
                results[name].append(ms)
                print(f"[round {r}] {name}: {ms:.3f} ms", flush=True)
            finally:
                restore()

    med = {name: float(np.median(v)) for name, v in results.items()}
    D, P = x.shape[-1], 1
    Cp = 1024
    N = x.shape[0]
    bf16_peak = 197.0
    per_pass_bound_ms = 2.0 * N * Cp * Cp / (bf16_peak * 1e12) * 1e3

    breakdown = {
        "shape": {"N": N, "Cp": Cp, "D": D, "P": P},
        "median_ms": med,
        "marginal_cost_ms": {
            "v_pass_3_minus_2": round(med["full"] - med["v2pass"], 3),
            "v_pass_2_minus_1": round(med["v2pass"] - med["v1pass"], 3),
            "transcendental_tail (full - noexp)": round(med["full"] - med["noexp"], 3),
        },
        "theory": {
            "mxu_bound_per_v_pass_ms": round(per_pass_bound_ms, 3),
            "mxu_bound_3pass_plus_r2_ms": round(
                (3 * Cp + 6 * D) * 2.0 * N * Cp / (bf16_peak * 1e12) * 1e3, 3
            ),
            "transcendentals_per_call": N * Cp,
        },
        "raw_ms": results,
        "methodology": (
            "interleaved rounds (tunnel rate drift), fetch-forced steady-state, "
            "20 async reps per measurement, jax.clear_caches between variants"
        ),
    }
    out = os.path.join(REPO, "KERNEL_BREAKDOWN.json")
    with open(out, "w") as f:
        json.dump(breakdown, f, indent=1)
    print(json.dumps(breakdown["median_ms"]))
    print(json.dumps(breakdown["marginal_cost_ms"]))


if __name__ == "__main__":
    main()
    os._exit(0)
