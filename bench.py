"""Benchmark: acquisition-function evaluation throughput on one chip.

Measures the innermost hot path of every BO step — exact-GP posterior prediction fused
with analytic expected improvement over a large candidate pool (Hartmann6 geometry:
D=6, n=100 training points) — and compares against a NumPy/BLAS float64 implementation
of the identical math on the host CPU (a proxy for the reference's TF-CPU execution of
the same computation; gpflow is not installed in this image, and the reference publishes
no throughput numbers of its own — SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def _numpy_baseline(Xtr, L, alpha, ls, kvar, mean_const, eta, candidates, reps=5):
    """Reference-equivalent EI evaluation in float64 NumPy (BLAS on host CPU)."""
    from scipy.stats import norm as snorm
    from scipy.linalg import solve_triangular

    t0 = time.perf_counter()
    for _ in range(reps):
        a = candidates / ls
        b = Xtr / ls
        r2 = (
            (a * a).sum(-1)[:, None] + (b * b).sum(-1)[None, :] - 2.0 * a @ b.T
        )
        r2 = np.maximum(r2, 0.0)
        z = np.sqrt(5.0 * r2)
        K = kvar * (1.0 + z + z * z / 3.0) * np.exp(-z)
        mean = K @ alpha + mean_const
        v = solve_triangular(L, K.T, lower=True)
        var = np.maximum(kvar - (v * v).sum(0), 1e-24)
        std = np.sqrt(var)
        zz = (eta - mean[:, 0]) / std
        ei = (eta - mean[:, 0]) * snorm.cdf(zz) + std * snorm.pdf(zz)
    dt = (time.perf_counter() - t0) / reps
    return ei, dt


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.tree_util import Partial

    from trieste_tpu.acquisition.function.function import _ei_fn
    from trieste_tpu.data import Dataset
    from trieste_tpu.models.gp.posterior import GPRParams, build_cache, predict_f
    from trieste_tpu.objectives import Hartmann6
    from trieste_tpu.ops.kernels import stationary

    dtype = jnp.float32
    key = jax.random.PRNGKey(0)
    D = 6
    n_train = 100
    n_eval = 1 << 17  # 131072 candidates per call

    k1, k2 = jax.random.split(key)
    Xtr = jax.random.uniform(k1, (n_train, D), dtype=dtype)
    Ytr = Hartmann6.objective(Xtr).astype(dtype)
    ds = Dataset.from_arrays(Xtr, Ytr)
    params = GPRParams(
        kernel=stationary("matern52", 1.0, [0.3] * D, dtype=dtype),
        noise_variance=jnp.asarray(1e-4, dtype),
        mean_constant=jnp.asarray(0.0, dtype),
    )
    cache = build_cache(params, ds.query_points, ds.observations, ds.mask)
    eta = jnp.asarray(float(jnp.min(Ytr)), dtype)
    ei = jax.jit(Partial(_ei_fn, Partial(predict_f, params, cache), eta))

    candidates = jax.random.uniform(k2, (n_eval, 1, D), dtype=dtype)
    # warm up (compile) and measure in steady state: calls are dispatched asynchronously
    # and pipeline on the device, amortizing the host->device dispatch latency (the
    # tunnel adds ~25 ms per synchronous round trip, which is NOT device compute)
    ei(candidates).block_until_ready()
    reps = 150
    t0 = time.perf_counter()
    for _ in range(reps):
        out = ei(candidates)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    evals_per_s = n_eval / dt

    # NumPy float64 baseline of the identical math on host CPU
    mask = np.asarray(ds.mask)
    base_ei, base_dt = _numpy_baseline(
        np.asarray(Xtr, np.float64),
        np.asarray(cache.L, np.float64)[: n_train, : n_train],
        np.asarray(cache.alpha, np.float64)[: n_train],
        np.asarray(params.kernel.lengthscales, np.float64),
        float(params.kernel.variance),
        float(params.mean_constant),
        float(eta),
        np.asarray(candidates[:, 0, :], np.float64),
        reps=3,
    )
    base_evals_per_s = n_eval / base_dt

    # correctness guard: TPU f32 result must match the f64 reference math
    ours = np.asarray(out[:, 0], np.float64)
    err = np.max(np.abs(ours - base_ei)) / max(base_ei.max(), 1e-12)
    assert err < 5e-2, f"EI mismatch vs reference math: {err}"

    print(
        json.dumps(
            {
                "metric": "acquisition_evals_per_s_per_chip",
                "value": round(evals_per_s, 1),
                "unit": "EI evals/s (GPR n=100, Hartmann6 D=6, f32)",
                "vs_baseline": round(evals_per_s / base_evals_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
    # the axon TPU tunnel can hang interpreter teardown; exit hard after the one line
    os._exit(0)
