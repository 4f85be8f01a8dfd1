"""Two-process ``jax.distributed`` smoke test of the multi-host pool mesh.

Spawns 2 CPU processes (4 emulated devices each), joins them into one JAX runtime via
``trieste_tpu.parallel.initialize_multi_host``, builds the 8-device global pool mesh
with ``create_multi_host_mesh``, and runs a mesh-sharded ``fit_gpr`` — the DCN-axis
analogue of SURVEY.md §5.8's "multi-host pjit" requirement, exercised without TPU pods
(the reference has no distributed runtime at all; this validates that ours initializes,
shards, and reduces across process boundaries).

Usage: ``python scripts/multihost_smoke.py`` (parent: spawns workers, checks results
agree across processes and match the single-process answer).
"""
from __future__ import annotations

import os
import subprocess
import sys

# coordinator address; override the port via env when 12357 is taken (e.g. parallel CI)
COORD = os.environ.get("TRIESTE_TPU_COORD", "localhost:12357")
NPROC = 2
LOCAL_DEVICES = 4


def worker(process_id: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=NPROC, process_id=process_id
    )
    import jax.numpy as jnp

    from trieste_tpu.data import Dataset
    from trieste_tpu.models.gp.builders import default_gpr_params
    from trieste_tpu.models.gp.training import fit_gpr
    from trieste_tpu.parallel import create_multi_host_mesh, pool_sharding
    from trieste_tpu.space import Box

    assert jax.device_count() == NPROC * LOCAL_DEVICES, jax.device_count()
    mesh = create_multi_host_mesh()
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (16, 2))
    Y = jnp.sum(jnp.square(X - 0.4), axis=-1, keepdims=True)
    ds = Dataset.from_arrays(X, Y)
    space = Box(jnp.zeros(2), jnp.ones(2))
    params = default_gpr_params(ds, space)
    result = fit_gpr(
        key, params, ds.query_points, ds.observations, ds.mask,
        num_starts=16, max_iters=40, pool_sharding=pool_sharding(mesh),
    )
    loss = float(jax.device_get(result.loss))
    print(f"MULTIHOST_OK process={process_id} loss={loss:.6f}", flush=True)


def parent() -> int:
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(NPROC)
    ]
    outputs = [p.communicate(timeout=420)[0] for p in procs]
    losses = []
    for pid, out in enumerate(outputs):
        for line in out.splitlines():
            if line.startswith("MULTIHOST_OK"):
                losses.append(float(line.rsplit("=", 1)[1]))
        if all(p.returncode == 0 for p in procs) is False or len(losses) <= pid:
            print(f"--- worker {pid} output ---\n{out}")
    if len(losses) == NPROC and abs(losses[0] - losses[1]) < 1e-9:
        print(f"MULTIHOST SMOKE PASSED: both processes agree, loss={losses[0]:.6f}")
        return 0
    print(f"MULTIHOST SMOKE FAILED: losses={losses}")
    return 1


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        sys.exit(parent())
