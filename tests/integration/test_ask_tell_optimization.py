"""End-to-end Ask/Tell with a mid-run state save/restore (reference
``tests/integration/test_ask_tell_optimization.py``): the externally-driven loop solves
the problem, and restarting from ``to_state -> from_state`` halfway through changes
nothing about convergence.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.acquisition.trust_region import BatchTrustRegionBox, TREGOBox
from trieste_tpu.ask_tell_optimization import AskTellOptimizer
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin, SimpleQuadratic, mk_observer
from trieste_tpu.observer import OBJECTIVE

FAST_OPT = generate_continuous_optimizer(num_initial_samples=512, num_optimization_runs=8)


def _rules():
    return {
        "ei": lambda space: EfficientGlobalOptimization(optimizer=FAST_OPT),
        "trego": lambda space: BatchTrustRegionBox(
            init_subspaces=[TREGOBox(space)],
            rule=EfficientGlobalOptimization(optimizer=FAST_OPT),
        ),
    }


def _drive(problem, rule_factory, num_steps, restart_at=None, seed=0):
    """Run Ask/Tell; optionally serialize at ``restart_at`` and continue from a fresh
    optimizer built via ``from_state`` (reference state-restart test)."""
    space = problem.search_space
    observer = mk_observer(problem.objective)
    k_init, k_loop = jax.random.split(jax.random.PRNGKey(seed))
    initial_data = observer(space.sample(k_init, 5))
    model = build_gpr(initial_data, space, likelihood_variance=1e-7, trainable_likelihood=False)
    optimizer = AskTellOptimizer(space, initial_data, model, rule_factory(space), key=k_loop)

    for step in range(num_steps):
        if restart_at is not None and step == restart_at:
            state = optimizer.to_state(copy=True)
            optimizer = AskTellOptimizer.from_state(state, space, rule_factory(space))
        points = optimizer.ask()
        if points.ndim == 3:  # trust-region rules return [B, V, D]
            points = jnp.reshape(points, (-1, points.shape[-1]))
        optimizer.tell(observer(points))

    ds = optimizer.to_record().datasets[OBJECTIVE]
    return float(jnp.min(ds.trimmed_observations))


@pytest.mark.parametrize("rule_name", sorted(_rules()))
def test_ask_tell_solves_simple_quadratic(rule_name):
    best = _drive(SimpleQuadratic, _rules()[rule_name], num_steps=6)
    rel = abs(best - float(SimpleQuadratic.minimum[0])) / abs(
        float(SimpleQuadratic.minimum[0])
    )
    assert rel < 0.05, f"best {best}"


@pytest.mark.parametrize("rule_name", sorted(_rules()))
def test_ask_tell_state_restart_preserves_convergence(rule_name):
    """Serializing to a state pytree mid-run and resuming from it must still solve the
    problem (reference ``test_ask_tell_optimization.py`` restart envelope)."""
    best = _drive(SimpleQuadratic, _rules()[rule_name], num_steps=6, restart_at=3)
    rel = abs(best - float(SimpleQuadratic.minimum[0])) / abs(
        float(SimpleQuadratic.minimum[0])
    )
    assert rel < 0.05, f"best {best}"


@pytest.mark.slow
@pytest.mark.parametrize("rule_name", sorted(_rules()))
def test_ask_tell_state_restart_solves_scaled_branin(rule_name):
    best = _drive(ScaledBranin, _rules()[rule_name], num_steps=20, restart_at=10)
    rel = abs(best - float(ScaledBranin.minimum[0])) / abs(float(ScaledBranin.minimum[0]))
    assert rel < 0.005, f"best {best}"
