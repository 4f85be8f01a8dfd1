"""Value-level multi-objective tests (role of reference
``tests/unit/acquisition/multi_objective/test_pareto.py`` / ``test_partition.py`` and the
EHVI analytic checks in ``test_multi_objective.py``): hypervolume vs brute-force grid
integration, partition validity vs exhaustive dominance, analytic EHVI vs Monte Carlo.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.function.multi_objective import (
    ExpectedHypervolumeImprovement,
)
from trieste_tpu.acquisition.multi_objective.dominance import non_dominated
from trieste_tpu.acquisition.multi_objective.pareto import Pareto, get_reference_point
from trieste_tpu.acquisition.multi_objective.partition import (
    prepare_default_non_dominated_partition_bounds,
)


def _brute_force_hv(front: np.ndarray, ref: np.ndarray, n_grid: int = 400) -> float:
    """Grid integration of the dominated volume in 2d."""
    ideal = front.min(axis=0)
    xs = np.linspace(ideal[0], ref[0], n_grid)
    ys = np.linspace(ideal[1], ref[1], n_grid)
    X, Y = np.meshgrid(xs, ys)
    pts = np.stack([X.ravel(), Y.ravel()], axis=-1)
    dominated = np.zeros(len(pts), bool)
    for f in front:
        dominated |= np.all(pts >= f, axis=-1)
    cell = (ref[0] - ideal[0]) * (ref[1] - ideal[1]) / (n_grid - 1) ** 2
    # count strictly interior grid cells via midpoint rule approximation
    return dominated.mean() * (ref[0] - ideal[0]) * (ref[1] - ideal[1])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hypervolume_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    obs = rng.uniform(0.0, 1.0, size=(12, 2))
    ref = np.array([1.2, 1.2])
    hv = float(Pareto(jnp.asarray(obs)).hypervolume_indicator(jnp.asarray(ref)))
    approx = _brute_force_hv(np.asarray(non_dominated(jnp.asarray(obs))[0]), ref, 500)
    np.testing.assert_allclose(hv, approx, rtol=2e-2)


def test_hypervolume_known_value():
    """Two staircase points with a unit reference: HV = 0.25 + 0.25 + 0.25 = analytic."""
    front = jnp.array([[0.0, 0.5], [0.5, 0.0]])
    ref = jnp.array([1.0, 1.0])
    # dominated region: union of [0,1]x[.5,1] and [.5,1]x[0,1] shifted... compute direct:
    # area dominated by (0,.5): (1-0)*(1-.5)=0.5; by (.5,0): (1-.5)*(1-0)=0.5;
    # intersection: (1-.5)*(1-.5)=0.25 -> union 0.75
    np.testing.assert_allclose(float(Pareto(front).hypervolume_indicator(ref)), 0.75, rtol=1e-6)


@pytest.mark.parametrize("seed", [3, 4])
@pytest.mark.parametrize("n_obj", [2, 3])
def test_partition_cells_cover_exactly_the_non_dominated_region(seed, n_obj):
    """Every partition cell point must be non-dominated w.r.t. the front; the cells must
    tile the non-dominated part of [ideal, ref] (checked by MC sampling)."""
    rng = np.random.default_rng(seed)
    front = np.asarray(
        non_dominated(jnp.asarray(rng.uniform(0.2, 0.8, size=(8, n_obj))))[0]
    )
    ref = np.full(n_obj, 1.0)
    lower, upper = prepare_default_non_dominated_partition_bounds(
        jnp.asarray(ref), jnp.asarray(front)
    )
    lower, upper = np.asarray(lower), np.asarray(upper)
    assert np.all(upper >= lower)
    pts = rng.uniform(-0.2, 1.0, size=(4000, n_obj))
    pts = pts[np.all(pts <= ref, axis=-1)]
    dominated = np.zeros(len(pts), bool)
    for f in front:
        dominated |= np.all(pts >= f, axis=-1)
    in_cell = np.zeros(len(pts), int)
    for lo, hi in zip(lower, upper):
        in_cell += np.all((pts >= lo) & (pts < hi), axis=-1).astype(int)
    # non-dominated points lie in EXACTLY one cell; dominated points in none
    np.testing.assert_array_equal(in_cell[dominated], 0)
    np.testing.assert_array_equal(in_cell[~dominated], 1)


def test_non_dominated_matches_naive():
    rng = np.random.default_rng(7)
    obs = rng.uniform(size=(40, 3))
    nd, mask = non_dominated(jnp.asarray(obs))
    naive = []
    for i in range(len(obs)):
        dominated = any(
            np.all(obs[j] <= obs[i]) and np.any(obs[j] < obs[i]) for j in range(len(obs))
        )
        naive.append(not dominated)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(naive))
    assert nd.shape[0] == sum(naive)


def test_ehvi_matches_monte_carlo():
    """Analytic EHVI on the closed-form fake vs MC estimate with the same marginals."""
    model = QuadraticMeanAndRBFKernel(noise_variance=1.0)

    class TwoObj:
        def predict(self, x):
            m, v = model.predict(x)
            return jnp.concatenate([m, 1.0 - m], -1), jnp.concatenate([v, v], -1)

        def predict_partial(self):
            from jax.tree_util import Partial

            return Partial(self.predict)

    two = TwoObj()
    x_train = jnp.array([[-0.8], [0.0], [0.9]])
    ds = mk_dataset(x_train, jnp.concatenate([x_train**2, 1 - x_train**2], -1))
    ehvi = ExpectedHypervolumeImprovement().prepare_acquisition_function(two, ds)

    mean_tr, _ = two.predict(x_train)
    front = np.asarray(non_dominated(mean_tr)[0])
    ref = np.asarray(get_reference_point(mean_tr))

    def hv(front_pts):
        return float(
            Pareto(jnp.asarray(front_pts)).hypervolume_indicator(jnp.asarray(ref))
        )

    base_hv = hv(front)
    rng = np.random.default_rng(0)
    for xq in (np.array([[0.3]]), np.array([[-1.2]])):
        analytic = float(ehvi(jnp.asarray(xq)[:, None, :])[0, 0])
        m, v = two.predict(jnp.asarray(xq))
        m, s = np.asarray(m)[0], np.sqrt(np.asarray(v))[0]
        ys = rng.normal(m, s, size=(20000, 2))
        ys = np.minimum(ys, ref - 1e-9)  # clip outside-reference samples contribute 0
        imps = []
        # 1500 host-side hypervolume evaluations: the 5·SE tolerance below adapts to
        # the sample count, so this only trades tightness for suite wall-clock
        for y in ys[:1500]:
            imps.append(max(hv(np.vstack([front, y])) - base_hv, 0.0))
        mc = float(np.mean(imps))
        se = float(np.std(imps) / np.sqrt(len(imps)))
        assert abs(analytic - mc) < max(5 * se, 0.01 * max(mc, 1e-3)), (
            f"x={xq}: analytic {analytic} vs MC {mc} +- {se}"
        )
