"""One-off experiment: sweep fused-predict candidate-tile sizes on the real chip.

The roofline in bench.py says the C=1024 production shape is MXU-bound at ~4.2 ms
attainable vs ~7 ms measured (~60% of attainable). The free parameter is the candidate
tile: ``_tile_for`` currently lands on 256 at Cp=1024 under its 24.5 B/element VMEM
model. This sweeps the tile size (monkeypatching ``_tile_for``) with fetch-forced
timing to see whether a different shape closes any of the gap, and prints a table.

Usage: ``python scripts/kernel_tile_experiment.py`` (quiet host CPU required —
dispatch-thread contention distorts the numbers).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.tree_util import Partial

from trieste_tpu.data import Dataset
from trieste_tpu.models.gp.posterior import GPRParams, build_cache, predict_f
from trieste_tpu.objectives import Hartmann6
from trieste_tpu.ops import fused_predict
from trieste_tpu.ops.kernels import stationary


def measure(tile: int, n_train: int = 1024, n_eval: int = 1 << 17, reps: int = 30):
    fused_predict._tile_for = lambda Cp: tile
    dtype = jnp.float32
    D = 6
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
    predict = jax.jit(Partial(predict_f, params, cache), backend="tpu")
    x = jax.random.uniform(k2, (n_eval, 1, D), dtype=dtype)
    total = jax.jit(lambda mv: jnp.sum(mv[0]) + jnp.sum(mv[1]))
    try:
        out = predict(x)
        float(total(out))
    except Exception as exc:  # VMEM OOM etc.
        return None, f"{type(exc).__name__}: {str(exc)[:120]}"
    t0 = time.perf_counter()
    float(total(out))
    fetch_rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = predict(x)
    float(total(out))
    ms = (time.perf_counter() - t0 - fetch_rt) / reps * 1e3
    return ms, None


def main() -> None:
    baseline = fused_predict._tile_for(1024)
    print(f"default tile at Cp=1024: {baseline}")
    for tile in (128, 256, 512, 1024, 2048):
        ms, err = measure(tile)
        if err:
            print(f"tile {tile:5d}: FAILED ({err})")
        else:
            print(f"tile {tile:5d}: {ms:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
