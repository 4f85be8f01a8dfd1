"""End-to-end BO over mixed discrete x continuous spaces (reference
``tests/integration/test_mixed_space_bayesian_optimization.py``): EGO and
BatchTrustRegionProduct solve ScaledBranin with its first dimension discretized to a
grid containing the minimizers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.acquisition.trust_region import (
    BatchTrustRegionProduct,
    FixedPointTrustRegionDiscrete,
    SingleObjectiveTrustRegionBox,
    UpdatableTrustRegionProduct,
)
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin, mk_observer
from trieste_tpu.space import Box, DiscreteSearchSpace, TaggedProductSearchSpace

FAST_OPT = generate_continuous_optimizer(num_initial_samples=512, num_optimization_runs=8)


def _mixed_branin_space() -> TaggedProductSearchSpace:
    """Discretize dim 0 on an even grid through the three Branin minimizers
    (reference ``test_mixed_space_bayesian_optimization.py:57-80``)."""
    minimizers0 = np.asarray(ScaledBranin.minimizers)[:, 0]
    step = (minimizers0[1] - minimizers0[0]) / 4
    points = np.concatenate(
        [
            np.flip(np.arange(minimizers0[1], 0.0, -step))[:-1],
            np.arange(minimizers0[1], 1.0, step),
        ]
    )
    return TaggedProductSearchSpace(
        [DiscreteSearchSpace(points[:, None]), Box([0.0], [1.0])],
        ["discrete", "continuous"],
    )


def _solve(rule_factory, num_steps, rtol, seed=1):
    # seed pinned: like the reference's @random_seed regression envelopes, the budget is
    # 'the current best for the given number of optimization steps' on a fixed seed
    space = _mixed_branin_space()
    observer = mk_observer(ScaledBranin.objective)
    k_init, k_opt = jax.random.split(jax.random.PRNGKey(seed))
    initial_data = observer(space.sample(k_init, 5))
    model = build_gpr(initial_data, space, likelihood_variance=1e-7, trainable_likelihood=False)
    result = tt.BayesianOptimizer(observer, space).optimize(
        num_steps, initial_data, model, rule_factory(space), key=k_opt, track_state=False
    )
    assert result.is_ok
    _, obs, _ = result.try_get_optimal_point()
    rel_err = abs(float(obs.reshape(())) - float(ScaledBranin.minimum[0])) / abs(
        float(ScaledBranin.minimum[0])
    )
    assert rel_err < rtol, f"best {float(obs.reshape(()))} rel err {rel_err}"


def _tr_product_rule(space, num_regions=10, optimizer=None):
    """Reference configuration (``test_mixed_space_bayesian_optimization.py:110-134``):
    a LARGE fleet of regions (10) with a vectorized PCTS base rule — the fixed-point
    discrete component of each region is randomly chosen and never updated, so the
    fleet must be big enough that some region lands on a minimizer's grid column."""
    from trieste_tpu.acquisition.function.continuous_thompson_sampling import (
        ParallelContinuousThompsonSampling,
    )

    def mk_region():
        return UpdatableTrustRegionProduct(
            [
                FixedPointTrustRegionDiscrete(space.get_subspace("discrete")),
                SingleObjectiveTrustRegionBox(space.get_subspace("continuous")),
            ],
            tags=["discrete", "continuous"],
        )

    return BatchTrustRegionProduct(
        init_subspaces=[mk_region() for _ in range(num_regions)],
        rule=EfficientGlobalOptimization(
            ParallelContinuousThompsonSampling(),
            num_query_points=num_regions,
            optimizer=optimizer,
        ),
    )


def test_ego_solves_mixed_scaled_branin_fast():
    _solve(
        lambda space: EfficientGlobalOptimization(optimizer=FAST_OPT),
        num_steps=15,
        rtol=0.05,
    )


def test_trust_region_product_runs_on_mixed_space_fast():
    """BatchTrustRegionProduct over {discrete fixed-point x continuous box} regions
    makes progress on the mixed problem (reference ``:83-160``)."""
    _solve(
        lambda space: _tr_product_rule(space, num_regions=5, optimizer=FAST_OPT),
        num_steps=5,
        rtol=0.35,
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "rule_factory, num_steps, rtol",
    [
        pytest.param(
            lambda space: EfficientGlobalOptimization(), 20, 0.005, id="EGO"
        ),
        # reference envelope: 8 steps x 10 regions, rtol 0.005 (``:88-134,211``)
        pytest.param(_tr_product_rule, 8, 0.005, id="BatchTrustRegionProduct"),
    ],
)
def test_mixed_space_rules_solve_scaled_branin(rule_factory, num_steps, rtol):
    _solve(rule_factory, num_steps=num_steps, rtol=rtol)
