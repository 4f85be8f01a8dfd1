"""End-to-end BO convergence tests.

Mirrors the reference's central integration test
(``tests/integration/test_bayesian_optimization.py:605-830``): every rule must actually
solve SimpleQuadratic in <= 6 steps (fast) and ScaledBranin within its per-rule budget
(slow, ``--runslow yes``), with the reference's tolerances (rtol 0.05 fast / 0.005 slow).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from trieste_tpu.acquisition.function.function import (
    AugmentedExpectedImprovement,
    BatchMonteCarloExpectedImprovement,
    ExpectedImprovement,
    MonteCarloExpectedImprovement,
    MultipleOptimismNegativeLowerConfidenceBound,
    NegativeLowerConfidenceBound,
)
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.function.continuous_thompson_sampling import (
    GreedyContinuousThompsonSampling,
    ParallelContinuousThompsonSampling,
)
from trieste_tpu.acquisition.function.entropy import GIBBON, MinValueEntropySearch
from trieste_tpu.acquisition.function.greedy_batch import Fantasizer, LocalPenalization
from trieste_tpu.acquisition.rule import (
    AsynchronousOptimization,
    BatchHypervolumeSharpeRatioIndicator,
    DiscreteThompsonSampling,
    EfficientGlobalOptimization,
)
from trieste_tpu.acquisition.trust_region import BatchTrustRegionBox, TREGOBox, TURBOBox
from trieste_tpu.bayesian_optimizer import stop_at_minimum
from trieste_tpu.models.gp import build_gpr
from trieste_tpu.objectives import ScaledBranin, SimpleQuadratic, mk_observer

FAST_OPT = generate_continuous_optimizer(num_initial_samples=512, num_optimization_runs=8)
# slow (ScaledBranin) runs use the reference's full optimizer budgets
FULL_OPT = generate_continuous_optimizer()


def _rules(opt=FAST_OPT):
    return {
        "ei": lambda space: EfficientGlobalOptimization(optimizer=opt),
        "aei": lambda space: EfficientGlobalOptimization(
            AugmentedExpectedImprovement(), optimizer=opt
        ),
        "nlcb": lambda space: EfficientGlobalOptimization(
            NegativeLowerConfidenceBound(1.96), optimizer=opt
        ),
        "mcei": lambda space: EfficientGlobalOptimization(
            MonteCarloExpectedImprovement(2000), optimizer=opt
        ),
        "qei": lambda space: EfficientGlobalOptimization(
            BatchMonteCarloExpectedImprovement(2000),
            optimizer=opt,
            num_query_points=3,
        ),
        "monlcb": lambda space: EfficientGlobalOptimization(
            MultipleOptimismNegativeLowerConfidenceBound(space),
            optimizer=opt,
            num_query_points=3,
        ),
        "dts": lambda space: DiscreteThompsonSampling(1000, 5),
        "async": lambda space: AsynchronousOptimization(
            BatchMonteCarloExpectedImprovement(1000),
            optimizer=opt,
            num_query_points=2,
        ),
        "mes": lambda space: EfficientGlobalOptimization(
            MinValueEntropySearch(space), optimizer=opt
        ),
        "gibbon": lambda space: EfficientGlobalOptimization(
            GIBBON(space), optimizer=opt, num_query_points=2
        ),
        "lp": lambda space: EfficientGlobalOptimization(
            LocalPenalization(space), optimizer=opt, num_query_points=3
        ),
        "fantasizer": lambda space: EfficientGlobalOptimization(
            Fantasizer(), optimizer=opt, num_query_points=3
        ),
        "pcts": lambda space: EfficientGlobalOptimization(
            ParallelContinuousThompsonSampling(), optimizer=opt, num_query_points=4
        ),
        "gcts": lambda space: EfficientGlobalOptimization(
            GreedyContinuousThompsonSampling(), optimizer=opt, num_query_points=2
        ),
        "trego": lambda space: BatchTrustRegionBox(
            init_subspaces=[TREGOBox(space)],
            rule=EfficientGlobalOptimization(optimizer=opt),
        ),
        "turbo": lambda space: BatchTrustRegionBox(
            init_subspaces=[TURBOBox(space)],
            rule=[EfficientGlobalOptimization(optimizer=opt)],
        ),
        "batch-tr": lambda space: BatchTrustRegionBox(init_subspaces=3),
        "qhsri": lambda space: BatchHypervolumeSharpeRatioIndicator(
            num_query_points=3, ga_population_size=50, ga_n_generations=15
        ),
    }


def _solve(problem, rule_factory, num_steps, seed, rtol, num_initial=5):
    observer = mk_observer(problem.objective)
    space = problem.search_space
    key = jax.random.PRNGKey(seed)
    k_init, k_opt = jax.random.split(key)
    initial = observer(space.sample(k_init, num_initial))
    model = build_gpr(initial, space, likelihood_variance=1e-7, trainable_likelihood=False)
    bo = tt.BayesianOptimizer(observer, space)
    result = bo.optimize(
        num_steps,
        initial,
        model,
        rule_factory(space),
        key=k_opt,
        track_state=False,
        early_stop_callback=stop_at_minimum(
            problem.minimum, problem.minimizers, minimum_rtol=rtol
        ),
    )
    assert result.is_ok, f"BO run errored: {result.final_result}"
    _, obs, _ = result.try_get_optimal_point()
    rel_err = abs(float(obs[0]) - float(problem.minimum[0])) / abs(
        float(problem.minimum[0])
    )
    assert rel_err < rtol, (
        f"{problem.name} not solved: best {float(obs[0])} vs "
        f"{float(problem.minimum[0])} (rel err {rel_err})"
    )


@pytest.mark.parametrize("rule_name", sorted(_rules()))
def test_all_rules_solve_simple_quadratic(rule_name):
    """Reference envelope: every rule solves SimpleQuadratic in <= 6 steps, rtol 0.05
    (``test_bayesian_optimization.py:325-330,629-633``)."""
    _solve(SimpleQuadratic, _rules()[rule_name], num_steps=6, seed=0, rtol=0.05)


@pytest.mark.slow
@pytest.mark.parametrize(
    "rule_name,num_steps",
    [
        ("ei", 20), ("nlcb", 25), ("qei", 20), ("monlcb", 30), ("dts", 25),
        ("async", 20), ("mes", 25), ("gibbon", 20), ("lp", 25), ("fantasizer", 20),
        ("pcts", 20), ("trego", 25), ("turbo", 30), ("batch-tr", 15),
    ],
)
def test_rules_solve_scaled_branin(rule_name, num_steps):
    """Reference envelope: ScaledBranin solved within per-rule budgets, rtol 0.005
    (``test_bayesian_optimization.py:103-290,795-800``)."""
    _solve(ScaledBranin, _rules(FULL_OPT)[rule_name], num_steps=num_steps, seed=0, rtol=0.005)
