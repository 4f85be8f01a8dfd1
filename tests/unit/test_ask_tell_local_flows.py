"""Ask/Tell local-dataset flows (role of reference
``tests/unit/test_ask_tell_optimization.py`` local-data sections, 982 LoC): construction
with LocalDatasetsAcquisitionRule, explicit local_data_ixs, global-only tells under
local rules, and state restoration mid-run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu as tt
from tests.util.misc import mk_dataset, quadratic
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.optimizer import generate_continuous_optimizer
from trieste_tpu.acquisition.rule import EfficientGlobalOptimization
from trieste_tpu.acquisition.trust_region import BatchTrustRegionBox
from trieste_tpu.ask_tell_optimization import AskTellOptimizer, AskTellOptimizerNoTraining
from trieste_tpu.data import Dataset
from trieste_tpu.objectives import mk_observer
from trieste_tpu.observer import OBJECTIVE
from trieste_tpu.space import Box
from trieste_tpu.utils.misc import LocalizedTag

FAST_OPT = generate_continuous_optimizer(num_initial_samples=64, num_optimization_runs=4)


@pytest.fixture
def space():
    return Box([0.0, 0.0], [1.0, 1.0])


@pytest.fixture
def initial(space):
    observer = mk_observer(quadratic)
    return observer(space.sample(jax.random.PRNGKey(0), 8))


def _tr_rule(n):
    return BatchTrustRegionBox(
        init_subspaces=n,
        rule=[EfficientGlobalOptimization(optimizer=FAST_OPT) for _ in range(n)],
    )


def test_local_rule_creates_local_datasets(space, initial):
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: initial}, {OBJECTIVE: QuadraticMeanAndRBFKernel()},
        acquisition_rule=_tr_rule(2), key=jax.random.PRNGKey(1),
    )
    tags = set(opt.datasets.keys())
    assert tags == {OBJECTIVE, LocalizedTag(OBJECTIVE, 0), LocalizedTag(OBJECTIVE, 1)}


def test_local_rule_ask_tell_cycle_grows_global(space, initial):
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: initial}, {OBJECTIVE: QuadraticMeanAndRBFKernel()},
        acquisition_rule=_tr_rule(2), key=jax.random.PRNGKey(1),
    )
    points = opt.ask()
    assert points.shape == (1, 2, 2)
    flat = points.reshape(-1, 2)
    observer = mk_observer(quadratic)
    opt.tell({OBJECTIVE: observer(flat)})
    assert len(opt.datasets[OBJECTIVE]) == 8 + 2


def test_local_data_ixs_constructor_subsets(space, initial):
    ixs = [jnp.array([0, 1, 2]), jnp.array([3, 4])]
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: initial}, {OBJECTIVE: QuadraticMeanAndRBFKernel()},
        acquisition_rule=_tr_rule(2), local_data_ixs=ixs, key=jax.random.PRNGKey(1),
    )
    assert len(opt.datasets[LocalizedTag(OBJECTIVE, 0)]) == 3
    assert len(opt.datasets[LocalizedTag(OBJECTIVE, 1)]) == 2


def test_local_state_roundtrip_resumes_ask(space, initial):
    """to_state → from_state restores a local-rule optimizer that can keep asking."""
    rule = _tr_rule(2)
    opt = AskTellOptimizerNoTraining(
        space, {OBJECTIVE: initial}, {OBJECTIVE: QuadraticMeanAndRBFKernel()},
        acquisition_rule=rule, key=jax.random.PRNGKey(1),
    )
    opt.ask()
    state = opt.to_state(copy=True)
    resumed = AskTellOptimizerNoTraining.from_state(
        state, space, acquisition_rule=_tr_rule(2)
    )
    pts = resumed.ask()
    assert pts.shape == (1, 2, 2)
    assert bool(jnp.all(space.contains(pts.reshape(-1, 2))))


def test_real_model_ask_tell_trains_on_local_data(space):
    """Full AskTellOptimizer (training variant) over a trust-region rule: models are
    refit after tell without error and the dataset bookkeeping stays consistent."""
    observer = mk_observer(quadratic)
    initial = observer(space.sample(jax.random.PRNGKey(2), 6))
    from trieste_tpu.models.gp import build_gpr

    model = build_gpr(initial, space, likelihood_variance=1e-6)
    opt = AskTellOptimizer(
        space, {OBJECTIVE: initial}, {OBJECTIVE: model},
        acquisition_rule=_tr_rule(1), key=jax.random.PRNGKey(3),
    )
    for _ in range(2):
        pts = opt.ask()
        opt.tell({OBJECTIVE: observer(pts.reshape(-1, 2))})
    assert len(opt.datasets[OBJECTIVE]) == 6 + 2


def test_fit_model_false_skips_initial_training(space, initial):
    calls = []

    class CountingModel(QuadraticMeanAndRBFKernel):
        def optimize(self, dataset):
            calls.append(len(dataset))

        def update(self, dataset):
            pass

    AskTellOptimizer(
        space, {OBJECTIVE: initial}, {OBJECTIVE: CountingModel()},
        acquisition_rule=None, fit_model=False, key=jax.random.PRNGKey(0),
    )
    assert calls == []
    AskTellOptimizer(
        space, {OBJECTIVE: initial}, {OBJECTIVE: CountingModel()},
        acquisition_rule=None, fit_model=True, key=jax.random.PRNGKey(0),
    )
    assert calls == [8]
