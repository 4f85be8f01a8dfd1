"""Run the full slow ScaledBranin envelope matrix and write ``ENVELOPES_r{N}.json``.

Per-round evidence artifact (reference anchor
``tests/integration/test_bayesian_optimization.py:103-290``): for every rule family in
the slow envelope list, run the seeded ScaledBranin convergence test at the reference's
full optimizer budget and record {budget steps, steps used, final rel err, passed at
rtol 0.005}. The same ``_rules``/``_solve`` definitions as the pytest suite are used,
so this is exactly the ``--runslow only`` evidence in machine-readable form.

Usage: ``python scripts/run_envelopes.py [round_number] [rule ...]``
       ``python scripts/run_envelopes.py --seeds N [round_number] [rule ...]``

With ``--seeds N`` every rule family is run over seeds ``0..N-1`` and the artifact
(``ENVELOPES_MULTISEED_r{N}.json``) records per-seed rel-err/steps plus pass-rate and
median steps — the seed-robustness evidence that a single pinned-seed row cannot give
(no envelope in the suite may depend on a seed with a <80% pass rate). The model-family
envelopes (SGPR etc., ``tests/integration/test_model_bayesian_optimization.py``) are
included alongside the 14 acquisition-rule families.
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
    # families beyond the reference's per-rule budget list (its envelope table stops at
    # the 14 above); budgets chosen at the same generosity level
    ("aei", 25), ("mcei", 25), ("gcts", 25),
]

RTOL = 0.005


# model-family envelope rows (tests/integration/test_model_bayesian_optimization.py);
# budgets match the suite's slow parametrization
MODEL_BUDGETS = [("sgpr", 14)]


def run_one(rule_name: str, num_steps: int, seed: int = 0) -> dict:
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
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(seed))
    if rule_name in dict(MODEL_BUDGETS):
        from tests.integration.test_model_bayesian_optimization import (
            FULL_OPT as M_OPT,
            _models,
            _rule_for,
        )

        initial = observer(space.sample(k_init, 6))
        model = _models()[rule_name](initial, space)
        rule = _rule_for(rule_name, space, M_OPT)
        bo = tt.BayesianOptimizer(observer, space)
        t0 = time.time()
        result = bo.optimize(
            num_steps, initial, model, rule, key=k_opt, track_state=True,
            early_stop_callback=stop_at_minimum(
                problem.minimum, problem.minimizers, minimum_rtol=RTOL
            ),
        )
        return _row(rule_name, num_steps, result, problem, time.time() - t0, seed)
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
    return _row(rule_name, num_steps, result, problem, time.time() - t0, seed)


def _row(rule_name, num_steps, result, problem, elapsed, seed) -> dict:
    if not result.is_ok:
        return {
            "rule": rule_name, "budget_steps": num_steps, "seed": seed, "passed": False,
            "error": repr(result.final_result), "seconds": round(elapsed, 1),
        }
    _, obs, _ = result.try_get_optimal_point()
    rel_err = abs(float(obs[0]) - float(problem.minimum[0])) / abs(float(problem.minimum[0]))
    return {
        "rule": rule_name,
        "budget_steps": num_steps,
        "seed": seed,
        "steps_used": len(result.history),
        "final_best": round(float(obs[0]), 6),
        "final_rel_err": round(rel_err, 6),
        "passed": bool(rel_err < RTOL),
        "seconds": round(elapsed, 1),
    }


def main() -> int:
    args = sys.argv[1:]
    num_seeds = 1
    if args and args[0] == "--seeds":
        num_seeds = int(args[1])
        args = args[2:]
    round_no = int(args[0]) if args and args[0].isdigit() else 4
    only = set(args[1:]) if len(args) > 1 else None
    budgets = SLOW_BUDGETS + MODEL_BUDGETS if num_seeds > 1 else SLOW_BUDGETS
    suffix = "MULTISEED_" if num_seeds > 1 else ""
    out_path = os.path.join(REPO, f"ENVELOPES_{suffix}r{round_no:02d}.json")
    rows = []
    # resume support: keep rows already recorded (the matrix takes a while on CPU)
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = json.load(f).get("rules", [])
    done = {(r["rule"], r.get("seed", 0)) for r in rows}
    for rule_name, budget in budgets:
        for seed in range(num_seeds):
            if (rule_name, seed) in done or (only and rule_name not in only):
                continue
            print(f"[envelopes] {rule_name} seed {seed} (budget {budget})...", flush=True)
            row = run_one(rule_name, budget, seed)
            print(f"[envelopes] -> {row}", flush=True)
            rows.append(row)
            _write(out_path, rows, num_seeds)
            # long matrices accumulate XLA-CPU executables until LLVM OOMs (same
            # failure mode the suite's per-module cache-clear fixture guards); drop
            # the compile caches between runs
            jax.clear_caches()
    failed = [
        (r["rule"], r.get("seed", 0)) for r in rows if not r.get("passed")
    ]
    print(f"[envelopes] done: {len(rows)} rows, failed: {failed or 'none'}")
    if num_seeds > 1:
        # with multiple seeds the bar is the pass-rate, not every row
        by_rule = {}
        for r in rows:
            by_rule.setdefault(r["rule"], []).append(r)
        bad = [
            name
            for name, rs in by_rule.items()
            if sum(x.get("passed", False) for x in rs) / len(rs) < 0.8
        ]
        print(f"[envelopes] rules under 80% pass rate: {bad or 'none'}")
        return 1 if bad else 0
    return 1 if failed else 0


def _write(out_path: str, rows, num_seeds: int) -> None:
    payload = {
        "problem": "ScaledBranin",
        "rtol": RTOL,
        "backend": "cpu-x64 (the suite's --runslow configuration)",
        "rules": rows,
    }
    if num_seeds > 1:
        by_rule = {}
        for r in rows:
            by_rule.setdefault(r["rule"], []).append(r)
        payload["num_seeds"] = num_seeds
        payload["summary"] = {
            name: {
                "pass_rate": round(
                    sum(x.get("passed", False) for x in rs) / len(rs), 3
                ),
                "median_steps_used": float(
                    np.median([x["steps_used"] for x in rs if "steps_used" in x])
                )
                if any("steps_used" in x for x in rs)
                else None,
                "max_rel_err": max(
                    (x.get("final_rel_err", float("nan")) for x in rs), default=None
                ),
            }
            for name, rs in sorted(by_rule.items())
        }
    else:
        payload["seed"] = 0
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)


if __name__ == "__main__":
    sys.exit(main())
