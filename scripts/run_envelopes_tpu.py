"""On-TPU float32 envelope sweep → ``ENVELOPES_TPU_r{N}.json`` (round-5 ask #2).

Runs representative acquisition-rule families END-TO-END on the real TPU chip in the
framework's production dtype (f32, fused Pallas scoring engaged for the full-budget
seed pools), against the reference's convergence budgets
(``/root/reference/tests/integration/test_bayesian_optimization.py:103-290``). This is
the "actually works, on the actual hardware" evidence for families whose envelopes are
otherwise verified at cpu-x64: f32 Cholesky jitter, MXU bf16-grade matmuls, and the
fused scoring path are exactly where this framework differs from its CPU test config.

Families: the VERDICT-named representatives (qei, pcts, gibbon, trego) on ScaledBranin
plus EHVI on VLMOP2 (budget/threshold from the reference MO envelope), and ei as the
anchor already evidenced by BENCH_regret.json.

Usage: ``python scripts/run_envelopes_tpu.py [round_number] [rule ...]``
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (rule, budget_steps) — ScaledBranin rules at the reference budgets
# (the same 14 families as the CPU-f64 slow-envelope artifact ENVELOPES_r04.json)
SB_BUDGETS = [
    ("ei", 20), ("qei", 20), ("pcts", 20), ("gibbon", 20), ("trego", 25),
    ("turbo", 30), ("fantasizer", 20), ("mes", 25),
    ("nlcb", 25), ("monlcb", 30), ("dts", 25), ("async", 20), ("lp", 25),
    ("batch-tr", 15),
]
RTOL = 0.005
EHVI_STEPS = 20
EHVI_THRESHOLD = -3.65  # reference log-hypervolume-difference envelope


def run_scaled_branin(rule_name: str, num_steps: int) -> dict:
    import jax.numpy as jnp

    import trieste_tpu as tt
    from tests.integration.test_bayesian_optimization import FULL_OPT, _rules
    from trieste_tpu.bayesian_optimizer import stop_at_minimum
    from trieste_tpu.models.gp import build_gpr
    from trieste_tpu.objectives import ScaledBranin, mk_observer

    np.random.seed(0)
    problem = ScaledBranin
    observer = mk_observer(problem.objective)
    space = problem.search_space
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(0))
    initial = observer(space.sample(k_init, 5))
    model = build_gpr(initial, space, likelihood_variance=1e-7, trainable_likelihood=False)
    t0 = time.time()
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial, model, _rules(FULL_OPT)[rule_name](space),
        key=k_opt, track_state=True,
        early_stop_callback=stop_at_minimum(
            problem.minimum, problem.minimizers, minimum_rtol=RTOL
        ),
    )
    elapsed = time.time() - t0
    if not result.is_ok:
        return {
            "rule": rule_name, "problem": "ScaledBranin", "budget_steps": num_steps,
            "passed": False, "error": repr(result.final_result),
            "seconds": round(elapsed, 1),
        }
    _, obs, _ = result.try_get_optimal_point()
    rel = abs(float(obs[0]) - float(problem.minimum[0])) / abs(float(problem.minimum[0]))
    return {
        "rule": rule_name,
        "problem": "ScaledBranin",
        "budget_steps": num_steps,
        "steps_used": len(result.history),
        "final_best": round(float(obs[0]), 6),
        "final_rel_err": round(rel, 6),
        "passed": bool(rel < RTOL),
        "seconds": round(elapsed, 1),
    }


def run_ehvi() -> dict:
    from tests.integration.test_multi_objective_bayesian_optimization import _run_vlmop2
    from trieste_tpu.acquisition.function.multi_objective import (
        ExpectedHypervolumeImprovement,
    )
    from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
    from trieste_tpu.observer import OBJECTIVE

    np.random.seed(0)
    rule = EfficientGlobalOptimization(
        ExpectedHypervolumeImprovement().using(OBJECTIVE)
    )
    t0 = time.time()
    log_hv_diff = _run_vlmop2(rule, num_steps=EHVI_STEPS)
    return {
        "rule": "ehvi",
        "problem": "VLMOP2",
        "budget_steps": EHVI_STEPS,
        "log_hv_diff": round(log_hv_diff, 4),
        "threshold": EHVI_THRESHOLD,
        "passed": bool(log_hv_diff < EHVI_THRESHOLD),
        "seconds": round(time.time() - t0, 1),
    }


def main() -> int:
    args = sys.argv[1:]
    round_no = int(args[0]) if args and args[0].isdigit() else 5
    only = set(args[1:]) if len(args) > 1 else None
    out_path = os.path.join(REPO, f"ENVELOPES_TPU_r{round_no:02d}.json")
    rows = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = json.load(f).get("rules", [])
    done = {r["rule"] for r in rows}
    backend = jax.default_backend()
    for rule_name, budget in SB_BUDGETS + [("ehvi", EHVI_STEPS)]:
        if rule_name in done or (only and rule_name not in only):
            continue
        print(f"[tpu-envelopes] {rule_name} (budget {budget})...", flush=True)
        row = run_ehvi() if rule_name == "ehvi" else run_scaled_branin(rule_name, budget)
        print(f"[tpu-envelopes] -> {row}", flush=True)
        rows.append(row)
        with open(out_path, "w") as f:
            json.dump(
                {
                    "backend": f"{backend}-f32 (production dtype, fused scoring engaged)",
                    "seed": 0,
                    "rtol": RTOL,
                    "rules": rows,
                },
                f,
                indent=1,
            )
        jax.clear_caches()
    failed = [r["rule"] for r in rows if not r.get("passed")]
    print(f"[tpu-envelopes] done: {len(rows)} rules on {backend}, failed: {failed or 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
