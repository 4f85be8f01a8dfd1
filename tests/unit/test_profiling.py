"""Compile-count invariants (the TPU analogue of the reference's retrace assertions,
``tests/integration/test_bayesian_optimization.py:805-812``): after the first Ask/Tell
step compiles one executable per capacity bucket, subsequent steps must be pure cache
hits on the hot jitted entry points."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.ask_tell_optimization import AskTellOptimizer
from trieste_tpu.data import Dataset
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import SimpleQuadratic, mk_observer
from trieste_tpu.profiling import assert_no_recompiles, compile_cache_sizes


def test_no_recompiles_across_bo_steps():
    problem = SimpleQuadratic
    space = problem.search_space
    observer = mk_observer(problem.objective)
    k_init, k_loop = jax.random.split(jax.random.PRNGKey(0))
    data = observer(space.sample(k_init, 5))
    model = build_gpr(data, space, likelihood_variance=1e-6)
    rule = EfficientGlobalOptimization(
        optimizer=generate_continuous_optimizer(
            num_initial_samples=128, num_optimization_runs=4
        )
    )
    opt = AskTellOptimizer(space, data, model, rule, key=k_loop)

    # step 1 compiles (fit + acquisition optimizer executables for this bucket)
    pts = opt.ask()
    opt.tell(Dataset.from_arrays(pts, problem.objective(pts)))
    sizes = compile_cache_sizes()
    assert sizes["optimize_continuous_core"] >= 1
    assert sizes["gpr_fit"] >= 1

    # steps 2..3 must not add executables (padded datasets keep shapes static and
    # Partial-pytree acquisition functions keep trace keys stable)
    with assert_no_recompiles():
        for _ in range(2):
            pts = opt.ask()
            opt.tell(Dataset.from_arrays(pts, problem.objective(pts)))


def test_assert_no_recompiles_detects_growth():
    f = jax.jit(lambda x: x * 2)
    f(jnp.ones(3))
    with pytest.raises(AssertionError, match="unexpected recompilations"):
        with assert_no_recompiles(f):
            f(jnp.ones(7))  # new shape -> new executable
