"""Remaining component tests: the pure-NumPy NSGA-II, greedy-builder interface
plumbing, the public API surface guard, and version metadata."""
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trieste_tpu
from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.observer import OBJECTIVE


# ------------------------------------------------------------------ NSGA-II


def test_nsga2_recovers_biobjective_front():
    """On min(x², (x−1)²) over [−1, 2] the Pareto set is x ∈ [0, 1]; the final front
    must live there and span it."""
    from trieste_tpu.acquisition.multi_objective.nsga2 import nsga2

    def objective(X):
        x = X[:, 0]
        return np.stack([x**2, (x - 1.0) ** 2], axis=-1)

    pts, vals = nsga2(
        objective,
        np.array([-1.0]),
        np.array([2.0]),
        population_size=60,
        num_generations=40,
        rng=np.random.default_rng(0),
    )
    assert pts.shape[1] == 1 and vals.shape[1] == 2
    assert np.all(pts[:, 0] > -0.05) and np.all(pts[:, 0] < 1.05)
    assert pts[:, 0].min() < 0.2 and pts[:, 0].max() > 0.8  # spans the front
    # returned values actually are the objective at the points
    np.testing.assert_allclose(vals, objective(pts), atol=1e-12)


def test_nsga2_front_is_mutually_non_dominated():
    from trieste_tpu.acquisition.multi_objective.dominance import non_dominated_mask
    from trieste_tpu.acquisition.multi_objective.nsga2 import nsga2

    def objective(X):
        return np.stack([X[:, 0], 1.0 - X[:, 0] + X[:, 1] ** 2], axis=-1)

    _, vals = nsga2(
        objective, np.zeros(2), np.ones(2), population_size=40, num_generations=30
    )
    assert bool(jnp.all(non_dominated_mask(jnp.asarray(vals))))


def test_nsga2_deterministic_given_rng():
    from trieste_tpu.acquisition.multi_objective.nsga2 import nsga2

    def objective(X):
        return np.stack([X[:, 0], 1.0 - X[:, 0]], axis=-1)

    a = nsga2(objective, np.zeros(1), np.ones(1), population_size=20,
              num_generations=10, rng=np.random.default_rng(7))
    b = nsga2(objective, np.zeros(1), np.ones(1), population_size=20,
              num_generations=10, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(a[0], b[0])


# ------------------------------------------------------------------ greedy interface plumbing


def test_greedy_builder_using_routes_pending_points():
    """SingleModelGreedyAcquisitionBuilder.using() forwards pending points to the
    wrapped builder (reference ``interface.py:160-309``)."""
    from trieste_tpu.acquisition.function.greedy_batch import LocalPenalization
    from trieste_tpu.space import Box

    space = Box([-1.0], [1.0])
    model = QuadraticMeanAndRBFKernel(noise_variance=1.0)
    ds = mk_dataset([[-0.5], [0.5]], [[0.26], [0.24]])
    tagged = LocalPenalization(space, num_samples=32, key=jax.random.PRNGKey(0)).using(
        OBJECTIVE
    )
    fn = tagged.prepare_acquisition_function({OBJECTIVE: model}, {OBJECTIVE: ds})
    x = jnp.array([[[0.3]]])
    free = float(fn(x)[0, 0])
    fn2 = tagged.update_acquisition_function(
        fn, {OBJECTIVE: model}, {OBJECTIVE: ds}, pending_points=jnp.array([[0.3]])
    )
    assert float(fn2(x)[0, 0]) < free


# ------------------------------------------------------------------ API surface


def test_top_level_exports_resolve():
    for name in trieste_tpu.__all__:
        assert getattr(trieste_tpu, name, None) is not None, name


@pytest.mark.parametrize(
    "module_name",
    [
        "trieste_tpu.acquisition",
        "trieste_tpu.acquisition.function",
        "trieste_tpu.acquisition.multi_objective",
        "trieste_tpu.models",
        "trieste_tpu.models.gp",
        "trieste_tpu.objectives",
        "trieste_tpu.parallel",
        "trieste_tpu.utils",
        "trieste_tpu.experimental.plotting",
    ],
)
def test_submodule_exports_resolve(module_name):
    module = importlib.import_module(module_name)
    for name in getattr(module, "__all__", []):
        assert getattr(module, name, None) is not None, f"{module_name}.{name}"


def test_version_metadata():
    assert isinstance(trieste_tpu.__version__, str)
    assert trieste_tpu.__version__.count(".") == 2
