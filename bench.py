"""Benchmark: acquisition throughput, BO-step wall-clock, and regret parity on one chip.

Three measurements (BASELINE.json metrics):

1. **Headline**: EI-evaluation throughput over a 131072-candidate pool (Hartmann6
   geometry, n=100 training points) vs a NumPy/BLAS float64 implementation of the
   identical math on the host CPU (a proxy for the reference's TF-CPU execution; gpflow
   is not installed in this image and the reference publishes no throughput numbers —
   SURVEY.md §6).
2. **wallclock_per_bo_step_s**: steady-state wall-clock of a REAL BO step (Hartmann6,
   GPR + EI via EGO at the reference's full optimizer budget, 5 initial points) — model
   refit + acquisition maximization + observation, median of the last 5 of 10 steps.
3. **production-shape fused predict**: ms/call at the large-capacity shape
   (n_train=1024 → C=1024, pool=131072) where the Pallas kernel's fusion win is
   largest (see ``trieste_tpu/ops/fused_predict.py`` docstring).

Also writes ``BENCH_regret.json``: the best-observed-value curve for ScaledBranin
GPR+EI (5 init + 15 steps, seed 0) for regret-parity checking against the reference
envelope (best_y within rtol 0.005 of -1.047393 — BASELINE.md row 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
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
    # Steady-state timing, fetch-forced AND dispatch-amortized: each dispatch runs a
    # lax.scan CHAIN of chain_len dependent evaluations (a single small evaluation is
    # dominated by the tunnel's per-dispatch cost, whose rate fluctuates several-fold
    # over time); completion is forced by a host fetch of a scalar reduction of the
    # LAST output (``block_until_ready`` is unreliable over the axon tunnel for
    # shallow queues), and the measured one-off fetch round-trip is subtracted.
    chain_len = 10

    def _chained(x):
        def body(c, _):
            out = ei(x * (1.0 + 1e-12 * c))  # carry-dependence defeats hoisting
            return jnp.max(out) * 1e-12, ()

        c, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=chain_len)
        return c

    ei_chain = jax.jit(_chained)
    total = jax.jit(lambda a: jnp.sum(a))
    out = ei_chain(candidates)
    float(total(out))  # compile reducer + drain the queue
    t0 = time.perf_counter()
    float(total(out))  # already computed: this times the pure fetch round trip
    fetch_rt = time.perf_counter() - t0
    reps = 30
    t0 = time.perf_counter()
    for _ in range(reps):
        out = ei_chain(candidates)
    float(total(out))
    dt = (time.perf_counter() - t0 - fetch_rt) / (reps * chain_len)
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
    ours = np.asarray(ei(candidates)[:, 0], np.float64)
    err = np.max(np.abs(ours - base_ei)) / max(base_ei.max(), 1e-12)
    assert err < 5e-2, f"EI mismatch vs reference math: {err}"

    extra = {}
    # pinned baseline methodology (comparable field-for-field across rounds):
    extra["baseline_method"] = (
        "NumPy/scipy float64 BLAS on host CPU, identical Matern-5/2 EI math, "
        "3 sequential reps, no pipelining; TPU side: 30 async dispatches of a 10-deep "
        "lax.scan evaluation chain (dispatch-amortized), n_eval=131072 per link, "
        "completion forced by "
        "a host scalar fetch with the one-off fetch round-trip subtracted "
        "(block_until_ready is unreliable over the tunnel)"
    )
    extra.update(_production_shape_ms(key, D, dtype))
    extra["wallclock_per_bo_step_s"] = _bo_step_wallclock()
    extra["regret_curve"] = _regret_curve()

    print(
        json.dumps(
            {
                "metric": "acquisition_evals_per_s_per_chip",
                "value": round(evals_per_s, 1),
                "unit": "EI evals/s (GPR n=100, Hartmann6 D=6, f32)",
                "vs_baseline": round(evals_per_s / base_evals_per_s, 2),
                "extra": extra,
            }
        )
    )


def _production_shape_ms(key, D, dtype):
    """Fused-predict at the production shape (C=1024 training, pool 131072): ms/call,
    achieved TFLOP/s, and a roofline giving the *attainable* peak for this kernel.

    FLOP model (useful FLOPs, the number a user's math needs): cross-covariance
    distance matmul (2·N·C·D), mean matvec (2·N·C·P) and variance matmul v = K·L⁻ᵀ
    (2·N·C²) → ``2·N·C·(C + D + P)`` with P=1 output.

    Roofline (why achieved < chip peak is physics, not headroom):
    - **MXU bound**: the kernel's precision scheme multiplies the executed MXU work —
      the variance contraction runs as a 3-pass bf16-split and the r² matmul as a
      manual 3-pass bf16 split (the mean is a VPU reduction, off the MXU entirely),
      so the MXU executes ``2·N·Cp·(3·Cp + 3·D)`` MACs-worth of bf16 work. Dividing
      by the chip bf16 peak (TPU v5e: **197 TFLOP/s** — 394 is the int8 figure)
      gives the MXU-bound time.
    - **HBM bound**: per call only the candidate tile streams in and (mean, var) out
      (all training-side operands are VMEM-resident across the grid): ``4·N·(D+2)``
      bytes at ~819 GB/s (v5e).
    The attainable time is the max of the two; at this shape the kernel is ~1000×
    MXU-bound. The measured per-unit breakdown (``KERNEL_BREAKDOWN.json``,
    ``scripts/kernel_breakdown.py``) shows the marginal MXU v-passes run at
    **96-100% of this bound** (1.41/1.46 ms vs 1.395 ms); the residual ~1.4 ms of
    the call is the per-tile *serialized VPU phase* (kernel evaluation, bf16 hi/lo
    splits, mean/variance reductions — ~8 VPU ops per K element, itself near VPU
    speed of light; the exp alone is only 0.056 ms of it). Sub-tile interleaving
    and r²-pass reduction were measured to move the C=1024 call ≤1.3%, so against
    the two-unit serialized roofline (MXU passes + VPU phase) the kernel achieves
    ~93% — the gap to the MXU-only number below is the dependent VPU chain, not
    scheduling slack."""
    import jax
    import jax.numpy as jnp
    from jax.tree_util import Partial

    from trieste_tpu.data import Dataset
    from trieste_tpu.models.gp.posterior import GPRParams, build_cache, predict_f
    from trieste_tpu.objectives import Hartmann6
    from trieste_tpu.ops.kernels import stationary

    k1, k2 = jax.random.split(jax.random.PRNGKey(42))
    n_train, n_eval = 1024, 1 << 17
    Xtr = jax.random.uniform(k1, (n_train, D), dtype=dtype)
    Ytr = Hartmann6.objective(Xtr).astype(dtype)
    ds = Dataset.from_arrays(Xtr, Ytr)
    params = GPRParams(
        kernel=stationary("matern52", 1.0, [0.3] * D, dtype=dtype),
        noise_variance=jnp.asarray(1e-4, dtype),
        mean_constant=jnp.asarray(0.0, dtype),
    )
    cache = build_cache(params, ds.query_points, ds.observations, ds.mask)
    predict = jax.jit(Partial(predict_f, params, cache))
    x = jax.random.uniform(k2, (n_eval, 1, D), dtype=dtype)
    # fetch-forced steady-state timing (see headline comment)
    total = jax.jit(lambda mv: jnp.sum(mv[0]) + jnp.sum(mv[1]))
    out = predict(x)
    float(total(out))
    t0 = time.perf_counter()
    float(total(out))
    fetch_rt = time.perf_counter() - t0
    reps = 30
    t0 = time.perf_counter()
    for _ in range(reps):
        out = predict(x)
    float(total(out))
    ms = (time.perf_counter() - t0 - fetch_rt) / reps * 1e3

    P = 1
    Cp = -(-n_train // 128) * 128  # lane-aligned capacity actually launched
    useful_flops = 2.0 * n_eval * n_train * (n_train + D + P)
    mxu_flops = 2.0 * n_eval * Cp * (3 * Cp + 3 * D)
    bf16_peak_tflops = 197.0  # TPU v5e bf16 peak (394 TOPS is the int8 figure)
    hbm_gb_per_s = 819.0  # TPU v5e HBM bandwidth
    hbm_bytes = 4.0 * n_eval * (D + P + 1)  # candidates in, (mean, var) out
    mxu_bound_ms = mxu_flops / (bf16_peak_tflops * 1e12) * 1e3
    hbm_bound_ms = hbm_bytes / (hbm_gb_per_s * 1e9) * 1e3
    attainable_ms = max(mxu_bound_ms, hbm_bound_ms)
    achieved_tflops = useful_flops / (ms / 1e3) / 1e12
    return {
        "fused_c1024_ms_per_call": round(ms, 3),
        "fused_c1024_achieved_tflops": round(achieved_tflops, 2),
        "fused_c1024_mfu_pct_of_bf16_peak": round(
            100.0 * achieved_tflops / bf16_peak_tflops, 2
        ),
        "fused_c1024_roofline": {
            "useful_flops_per_call": useful_flops,
            "mxu_executed_flops_per_call": mxu_flops,
            "hbm_bytes_per_call": hbm_bytes,
            "mxu_bound_ms": round(mxu_bound_ms, 3),
            "hbm_bound_ms": round(hbm_bound_ms, 5),
            "bound_by": "mxu" if mxu_bound_ms >= hbm_bound_ms else "hbm",
            "attainable_tflops": round(useful_flops / (attainable_ms / 1e3) / 1e12, 2),
            "pct_of_attainable": round(100.0 * attainable_ms / ms, 1),
            "bf16_peak_tflops": bf16_peak_tflops,
            "hbm_gb_per_s": hbm_gb_per_s,
            "per_unit_breakdown": "KERNEL_BREAKDOWN.json (measured: marginal MXU "
            "v-passes at 96-100% of bound; residual = serialized VPU phase)",
        },
    }


def _bo_step_wallclock() -> float:
    """Median steady-state wall-clock of a real Hartmann6 GPR+EI BO step (full
    reference optimizer budget: 6000 seeds, 60 L-BFGS runs)."""
    import jax
    import jax.numpy as jnp

    from trieste_tpu.ask_tell_optimization import AskTellOptimizer
    from trieste_tpu.models.gp import build_gpr
    from trieste_tpu.objectives import Hartmann6, mk_observer

    problem = Hartmann6
    space = problem.search_space
    observer = mk_observer(problem.objective)
    k_init, k_loop = jax.random.split(jax.random.PRNGKey(0))
    initial_data = observer(space.sample(k_init, 5))
    model = build_gpr(initial_data, space, likelihood_variance=1e-6)
    opt = AskTellOptimizer(space, initial_data, model, key=k_loop)
    from trieste_tpu.observer import OBJECTIVE

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        points = opt.ask()
        opt.tell(observer(points))
        # force the dispatched model refit to complete inside the timed region
        float(jnp.sum(opt.models[OBJECTIVE].params.kernel.lengthscales))
        times.append(time.perf_counter() - t0)
    return round(float(np.median(times[-5:])), 3)


def _regret_curve() -> dict:
    """ScaledBranin GPR+EI regret curve (BASELINE config 1), written to
    BENCH_regret.json next to this file."""
    import jax
    import jax.numpy as jnp

    from trieste_tpu.ask_tell_optimization import AskTellOptimizer
    from trieste_tpu.models.gp import build_gpr
    from trieste_tpu.objectives import ScaledBranin, mk_observer

    problem = ScaledBranin
    space = problem.search_space
    observer = mk_observer(problem.objective)
    k_init, k_loop = jax.random.split(jax.random.PRNGKey(0))
    data = observer(space.sample(k_init, 5))
    model = build_gpr(data, space, likelihood_variance=1e-7, trainable_likelihood=False)
    opt = AskTellOptimizer(space, data, model, key=k_loop)
    best = [float(jnp.min(data.trimmed_observations))]
    for _ in range(15):
        points = opt.ask()
        new = observer(points)
        opt.tell(new)
        best.append(min(best[-1], float(jnp.min(new.trimmed_observations))))
    true_min = float(problem.minimum[0])
    curve = {
        "problem": "ScaledBranin",
        "rule": "GPR+EI (EGO, default budgets)",
        "true_minimum": true_min,
        "best_observed_per_step": [round(b, 6) for b in best],
        "final_rel_err": round(abs(best[-1] - true_min) / abs(true_min), 6),
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_regret.json")
    with open(out_path, "w") as f:
        json.dump(curve, f, indent=1)
    return {"final_rel_err": curve["final_rel_err"], "file": "BENCH_regret.json"}


if __name__ == "__main__":
    main()
    # the axon TPU tunnel can hang interpreter teardown; exit hard after the one line
    os._exit(0)
