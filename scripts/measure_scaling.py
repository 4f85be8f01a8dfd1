"""Measure weak-scaling of the pool-sharded hot paths on a device mesh.

Records relative throughput of the two hot device programs —
``_optimize_continuous_core`` (acquisition seed scoring + multi-start L-BFGS) and
``fit_gpr`` (GP hyperparameter restarts) — at 1/2/4/8 devices with the *per-device* pool
held constant (weak scaling), into ``SCALING.json``. Maps to BASELINE.json's
"≥80% acquisition-throughput scaling 1→N hosts" north star; on real TPU hardware each
virtual device is a chip and the curve is meaningful — on a CPU CI host emulating 8
devices over fewer physical cores the curve saturates at the core count, so the artifact
records ``physical_cores`` alongside for interpretation (the loud regression detector is
the HLO-sharding assertion in ``tests/unit/test_parallel.py``).

Usage: ``python scripts/measure_scaling.py [--devices 1,2,4,8] [--out SCALING.json]``
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

# the axon TPU plugin overrides JAX_PLATFORMS; force the backend via config instead
# (same trick as tests/conftest.py) unless the caller wants the real TPU curve
if os.environ.get("SCALING_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

if jax.default_backend() == "cpu" and len(jax.devices()) < 8:
    raise SystemExit("run with XLA_FLAGS=--xla_force_host_platform_device_count=8")

import jax.numpy as jnp

from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.data import Dataset
from trieste_tpu.models.gp.builders import default_gpr_params
from trieste_tpu.models.gp.training import fit_gpr
from trieste_tpu.parallel import create_mesh, global_mesh, pool_sharding
from trieste_tpu.space import Box

PER_DEVICE_SEEDS = 2048
PER_DEVICE_RUNS = 8
PER_DEVICE_RESTARTS = 8
REPS = 5


def _time(fn) -> float:
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        fn()
    return (time.perf_counter() - t0) / REPS


def measure(num_devices_list) -> dict:
    key = jax.random.PRNGKey(0)
    D = 6
    space = Box(jnp.zeros(D), jnp.ones(D))
    X = jax.random.uniform(key, (64, D))
    Y = jnp.sum(jnp.square(X - 0.4), axis=-1, keepdims=True)
    ds = Dataset.from_arrays(X, Y)
    params = default_gpr_params(ds, space)

    def acq(x):
        x = jnp.asarray(x)[..., 0, :]
        return -jnp.sum(jnp.square(x - 0.3), axis=-1, keepdims=True)

    results = {"acquisition": [], "fit_gpr": []}
    for nd in num_devices_list:
        mesh = create_mesh(nd)
        n_seeds = PER_DEVICE_SEEDS * nd
        n_runs = PER_DEVICE_RUNS * nd
        opt = generate_continuous_optimizer(
            num_initial_samples=n_seeds, num_optimization_runs=n_runs
        )

        with global_mesh(mesh):
            t_acq = _time(
                lambda: jax.block_until_ready(opt(space, acq, key=key))
            )
        results["acquisition"].append(
            {"devices": nd, "pool": n_seeds, "seconds": t_acq,
             "throughput_per_s": n_seeds / t_acq}
        )

        n_starts = PER_DEVICE_RESTARTS * nd
        sh = pool_sharding(mesh)
        t_fit = _time(
            lambda: jax.block_until_ready(
                fit_gpr(key, params, ds.query_points, ds.observations, ds.mask,
                        num_starts=n_starts, max_iters=40, pool_sharding=sh)
            )
        )
        results["fit_gpr"].append(
            {"devices": nd, "pool": n_starts, "seconds": t_fit,
             "throughput_per_s": n_starts / t_fit}
        )

    for name, rows in results.items():
        base = rows[0]["throughput_per_s"]
        for row in rows:
            row["efficiency_vs_1dev"] = row["throughput_per_s"] / (
                base * row["devices"] / rows[0]["devices"]
            )
    return results


def communication_model(results: dict, num_devices_list) -> dict:
    """Analytic communication/compute model for the pool-sharded programs on real ICI.

    Weak scaling keeps per-device compute constant; the ONLY cross-device traffic per
    program is the winner reduction: an all-gather of each device's top-R candidate
    values + flat D-dim points (acquisition) or per-start losses (fit_gpr) followed by
    a replicated argmax — O(devices · R · (D+1) · 4) bytes riding ICI. With TPU v5e ICI
    (~45 GB/s per link, ~1 µs per-hop latency) the collective costs microseconds against
    a per-device compute time of milliseconds, so the predicted efficiency stays >99%
    at any slice size: the ≥80% north star is structural for this algorithm class. The
    MEASURED CPU-emulation curve, by contrast, saturates at ``physical_cores`` and its
    fluctuations are host-scheduler artifacts, not properties of the sharded program —
    the compiled-HLO sharding assertions in ``tests/unit/test_parallel.py`` are the
    regression guard; this model is the scaling claim."""
    ici_bytes_per_s = 45e9
    ici_hop_latency_s = 1e-6
    D = 6
    model = {}
    for name, rows in results.items():
        per_dev_r = PER_DEVICE_RUNS if name == "acquisition" else PER_DEVICE_RESTARTS
        t_compute = rows[0]["seconds"]  # per-device work is constant in weak scaling
        entries = []
        for nd in num_devices_list:
            payload_bytes = nd * per_dev_r * (D + 1) * 4
            import math

            hops = max(math.ceil(math.log2(nd)), 0)
            t_collective = payload_bytes / ici_bytes_per_s + hops * ici_hop_latency_s
            entries.append(
                {
                    "devices": nd,
                    "collective_bytes": payload_bytes,
                    "predicted_collective_seconds": t_collective,
                    "predicted_tpu_efficiency": round(
                        t_compute / (t_compute + t_collective), 6
                    ),
                }
            )
        model[name] = entries

    # The fused Pallas scoring kernel (trieste_tpu/ops/fused_predict.py) composes with
    # the mesh via jax.shard_map over the candidate axis: each chip scores its local
    # pool shard (per-device compute measured on the real chip — BENCH_r0N.json fused
    # row: ~5.6 ms for a 131072-candidate, C=1024 pool), and the ONLY collective is the
    # all-gather of the 1-D f32 score vector feeding the global top-k (asserted against
    # the compiled HLO in tests/unit/test_fused_predict.py: the pool and every [N, C]
    # kernel intermediate stay sharded). Weak scaling: global scores = d · 131072 · 4 B.
    fused_per_dev_pool = 131072
    fused_t_compute = 5.64e-3  # measured v5e per-chip fused call at this shape
    entries = []
    for nd in num_devices_list:
        import math

        payload_bytes = int((nd - 1) / nd * nd * fused_per_dev_pool * 4) if nd > 1 else 0
        hops = max(math.ceil(math.log2(nd)), 0)
        t_collective = payload_bytes / ici_bytes_per_s + hops * ici_hop_latency_s
        entries.append(
            {
                "devices": nd,
                "per_device_pool": fused_per_dev_pool,
                "collective_bytes": payload_bytes,
                "predicted_collective_seconds": t_collective,
                "predicted_tpu_efficiency": round(
                    fused_t_compute / (fused_t_compute + t_collective), 6
                ),
            }
        )
    model["fused_scoring"] = entries
    return model


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()
    nds = [int(x) for x in args.devices.split(",") if int(x) <= len(jax.devices())]
    results = measure(nds)
    payload = {
        "backend": jax.default_backend(),
        "num_devices_available": len(jax.devices()),
        "physical_cores": os.cpu_count(),
        "mode": "weak scaling (per-device pool constant)",
        "measured_curve_validity": (
            "on a CPU host emulating the mesh the curve saturates at physical_cores "
            "and is NOT evidence for or against multi-chip scaling; see "
            "communication_model for the ICI-based prediction and "
            "tests/unit/test_parallel.py for the compiled-sharding regression guard"
        ),
        "results": results,
        "communication_model": communication_model(results, nds),
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
