"""Run the full slow ScaledBranin envelope matrix and write ``ENVELOPES_r{N}.json``.

Per-round evidence artifact (reference anchor
``tests/integration/test_bayesian_optimization.py:103-290``): for every rule family in
the slow envelope list, run the seeded ScaledBranin convergence test at the reference's
full optimizer budget and record {budget steps, steps used, final rel err, passed at
rtol 0.005}. The same ``_rules``/``_solve`` definitions as the pytest suite are used,
so this is exactly the ``--runslow only`` evidence in machine-readable form.

Usage: ``python scripts/run_envelopes.py [round_number] [rule ...]``
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SLOW_BUDGETS = [
    ("ei", 20), ("nlcb", 25), ("qei", 20), ("monlcb", 30), ("dts", 25),
    ("async", 20), ("mes", 25), ("gibbon", 20), ("lp", 25), ("fantasizer", 20),
    ("pcts", 20), ("trego", 25), ("turbo", 30), ("batch-tr", 15),
]

RTOL = 0.005


def run_one(rule_name: str, num_steps: int) -> dict:
    import jax.numpy as jnp

    import trieste_tpu as tt
    from tests.integration.test_bayesian_optimization import FULL_OPT, _rules
    from trieste_tpu.bayesian_optimizer import stop_at_minimum
    from trieste_tpu.models.gp import build_gpr
    from trieste_tpu.objectives import ScaledBranin, mk_observer

    np.random.seed(0)  # same determinism pin as the suite's autouse fixture
    problem = ScaledBranin
    observer = mk_observer(problem.objective)
    space = problem.search_space
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial = observer(space.sample(k_init, 5))
    model = build_gpr(initial, space, likelihood_variance=1e-7, trainable_likelihood=False)
    bo = tt.BayesianOptimizer(observer, space)
    t0 = time.time()
    result = bo.optimize(
        num_steps,
        initial,
        model,
        _rules(FULL_OPT)[rule_name](space),
        key=k_opt,
        track_state=True,
        early_stop_callback=stop_at_minimum(
            problem.minimum, problem.minimizers, minimum_rtol=RTOL
        ),
    )
    elapsed = time.time() - t0
    if not result.is_ok:
        return {
            "rule": rule_name, "budget_steps": num_steps, "passed": False,
            "error": repr(result.final_result), "seconds": round(elapsed, 1),
        }
    _, obs, _ = result.try_get_optimal_point()
    rel_err = abs(float(obs[0]) - float(problem.minimum[0])) / abs(float(problem.minimum[0]))
    return {
        "rule": rule_name,
        "budget_steps": num_steps,
        "steps_used": len(result.history),
        "final_best": round(float(obs[0]), 6),
        "final_rel_err": round(rel_err, 6),
        "passed": bool(rel_err < RTOL),
        "seconds": round(elapsed, 1),
    }


def main() -> int:
    args = sys.argv[1:]
    round_no = int(args[0]) if args and args[0].isdigit() else 4
    only = set(args[1:]) if len(args) > 1 else None
    out_path = os.path.join(REPO, f"ENVELOPES_r{round_no:02d}.json")
    rows = []
    # resume support: keep rows already recorded (the matrix takes a while on CPU)
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = json.load(f).get("rules", [])
    done = {r["rule"] for r in rows}
    for rule_name, budget in SLOW_BUDGETS:
        if rule_name in done or (only and rule_name not in only):
            continue
        print(f"[envelopes] {rule_name} (budget {budget})...", flush=True)
        row = run_one(rule_name, budget)
        print(f"[envelopes] -> {row}", flush=True)
        rows.append(row)
        with open(out_path, "w") as f:
            json.dump(
                {
                    "problem": "ScaledBranin",
                    "seed": 0,
                    "rtol": RTOL,
                    "backend": "cpu-x64 (the suite's --runslow configuration)",
                    "rules": rows,
                },
                f,
                indent=1,
            )
    failed = [r["rule"] for r in rows if not r.get("passed")]
    print(f"[envelopes] done: {len(rows)} rules, failed: {failed or 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
