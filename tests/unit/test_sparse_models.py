"""Sparse-model tests (role of reference ``tests/unit/models/gpflow/test_models.py``
SGPR/SVGP sections)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import Dataset
from trieste_tpu.models.gp import build_gpr, build_sgpr, build_svgp
from trieste_tpu.models.gp.inducing_points import (
    ConditionalImprovementReduction,
    ConditionalVarianceReduction,
    KMeansInducingPointSelector,
    RandomSubSampleInducingPointSelector,
    UniformInducingPointSelector,
)
from trieste_tpu.models.gp.posterior import log_marginal_likelihood
from trieste_tpu.models.gp.sparse import SGPRParams, sgpr_elbo
from trieste_tpu.space import Box


@pytest.fixture(scope="module")
def problem():
    key = jax.random.PRNGKey(0)
    space = Box([0.0] * 2, [1.0] * 2)
    X = jax.random.uniform(key, (60, 2), dtype=jnp.float64)
    Y = jnp.sin(5 * X[:, :1]) + X[:, 1:] ** 2 + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (60, 1), dtype=jnp.float64
    )
    return space, Dataset.from_arrays(X, Y)


@pytest.fixture(scope="module")
def fitted(problem):
    space, ds = problem
    gpr = build_gpr(ds, space)
    gpr.optimize(ds)
    sgpr = build_sgpr(ds, space, num_inducing_points=30)
    sgpr.optimize(ds)
    svgp = build_svgp(ds, space, num_inducing_points=30)
    svgp.optimize(ds)
    return gpr, sgpr, svgp


def test_sgpr_close_to_exact_gpr(problem, fitted, key):
    space, ds = problem
    gpr, sgpr, _ = fitted
    xq = jax.random.uniform(key, (20, 2), dtype=jnp.float64)
    gm, gv = gpr.predict(xq)
    sm, sv = sgpr.predict(xq)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(gm), atol=0.05)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(gv), atol=0.05)


def test_sgpr_elbo_lower_bounds_mll(problem, fitted):
    space, ds = problem
    gpr, sgpr, _ = fitted
    mll = log_marginal_likelihood(gpr.params, ds.query_points, ds.observations, ds.mask)
    p = SGPRParams(
        kernel=gpr.params.kernel,
        noise_variance=gpr.params.noise_variance,
        mean_constant=gpr.params.mean_constant,
        inducing_points=sgpr.params.inducing_points,
    )
    elbo = sgpr_elbo(p, ds.query_points, ds.observations, ds.mask)
    assert float(elbo) <= float(mll) + 1e-6


def test_sgpr_elbo_padding_invariant(problem, fitted):
    space, ds = problem
    _, sgpr, _ = fitted
    qp, obs = ds.astuple()
    exact = Dataset.from_arrays(qp, obs, capacity=qp.shape[0])
    padded = Dataset.from_arrays(qp, obs, capacity=128)
    e1 = sgpr_elbo(sgpr.params, exact.query_points, exact.observations, exact.mask)
    e2 = sgpr_elbo(sgpr.params, padded.query_points, padded.observations, padded.mask)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-10)


def test_svgp_close_to_exact_gpr(problem, fitted, key):
    space, ds = problem
    gpr, _, svgp = fitted
    xq = jax.random.uniform(key, (20, 2), dtype=jnp.float64)
    gm, _ = gpr.predict(xq)
    vm, vv = svgp.predict(xq)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(gm), atol=0.15)
    assert bool(jnp.all(vv > 0))


def test_svgp_joint_consistent(problem, fitted, key):
    space, ds = problem
    _, _, svgp = fitted
    xq = jax.random.uniform(key, (6, 2), dtype=jnp.float64)
    m, v = svgp.predict(xq)
    mj, cj = svgp.predict_joint(xq)
    np.testing.assert_allclose(np.asarray(mj), np.asarray(m), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(cj[0])), np.asarray(v[:, 0]), atol=1e-8
    )


def test_sparse_trajectory_samplers(problem, fitted, key):
    space, ds = problem
    _, sgpr, svgp = fitted
    for model in (sgpr, svgp):
        traj = model.trajectory_sampler().get_trajectory(key, batch_size=3)
        x = jax.random.uniform(key, (5, 3, 2), dtype=jnp.float64)
        assert traj(x).shape == (5, 3, 1)


def test_inducing_point_selectors(problem):
    space, ds = problem
    gpr = build_gpr(ds, space)
    Z0 = jnp.zeros((10, 2))
    for selector in (
        UniformInducingPointSelector(space),
        RandomSubSampleInducingPointSelector(),
        KMeansInducingPointSelector(),
        ConditionalVarianceReduction(),
        ConditionalImprovementReduction(),
    ):
        Z = selector.calculate_inducing_points(Z0, gpr, ds)
        assert Z.shape == (10, 2)
        assert bool(jnp.all(jnp.isfinite(Z)))


def test_dpp_selector_is_diverse(problem):
    """Greedy conditional-variance selection must not pick duplicate points."""
    space, ds = problem
    gpr = build_gpr(ds, space)
    Z = ConditionalVarianceReduction().calculate_inducing_points(
        jnp.zeros((15, 2)), gpr, ds
    )
    d = np.linalg.norm(np.asarray(Z)[:, None] - np.asarray(Z)[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 1e-6


def test_dpp_quality_function_biases_selection(problem):
    """The quality-diversity decomposition (reference
    ``inducing_point_selectors.py:247-400``): with an improvement quality function the
    greedy DPP must allocate more inducing points near low-mean regions than the
    unit-quality (pure variance) selector, and a huge-quality point must be picked
    first."""
    from trieste_tpu.models.gp.inducing_points import (
        DPPInducingPointSelector,
        ModelBasedImprovementQualityFunction,
        QualityFunction,
        UnitQualityFunction,
    )

    space, ds = problem
    gpr = build_gpr(ds, space)

    class SpikeQuality(QualityFunction):
        def __call__(self, model, dataset):
            qp = dataset.trimmed_query_points
            q = jnp.full((qp.shape[0],), 1e-6, qp.dtype)
            return q.at[7].set(1e6)

    Z = DPPInducingPointSelector(SpikeQuality()).calculate_inducing_points(
        jnp.zeros((5, 2)), gpr, ds
    )
    spike = ds.trimmed_query_points[7]
    np.testing.assert_allclose(np.asarray(Z[0]), np.asarray(spike))

    # improvement-weighted selection concentrates nearer the low-observation region
    Z_unit = DPPInducingPointSelector(UnitQualityFunction()).calculate_inducing_points(
        jnp.zeros((8, 2)), gpr, ds
    )
    Z_impr = DPPInducingPointSelector(
        ModelBasedImprovementQualityFunction()
    ).calculate_inducing_points(jnp.zeros((8, 2)), gpr, ds)
    obs = np.asarray(ds.trimmed_observations[:, 0])
    best = np.asarray(ds.trimmed_query_points[np.argmin(obs)])

    def mean_dist_to_best(Z):
        return float(np.mean(np.linalg.norm(np.asarray(Z) - best, axis=-1)))

    assert mean_dist_to_best(Z_impr) <= mean_dist_to_best(Z_unit) + 0.35


def test_svgp_minibatch_converges_on_large_dataset():
    """Adam minibatch SVGP (reference ``BatchOptimizer``, ``models/optimizer.py:101-177``)
    on n=10k: per-step cost is independent of n, and the fit must recover the
    generative function and noise level."""
    key = jax.random.PRNGKey(0)
    kx, kn = jax.random.split(key)
    n = 10_000
    X = jax.random.uniform(kx, (n, 1), dtype=jnp.float64)
    f_true = jnp.sin(6.0 * X)
    noise = 0.05
    Y = f_true + jnp.sqrt(noise) * jax.random.normal(kn, (n, 1), dtype=jnp.float64)
    ds = Dataset.from_arrays(X, Y)

    space = Box([0.0], [1.0])
    model = build_svgp(
        ds,
        space,
        num_inducing_points=30,
        trainable_likelihood=True,
        likelihood_variance=1.0,  # start far from the generative 0.05
        kernel_priors=False,
        minibatch_size=128,
        minibatch_iters=600,
        learning_rate=0.05,
        optimize_key=jax.random.PRNGKey(3),
    )
    result = model.optimize(ds)
    assert bool(jnp.isfinite(result.loss))

    xs = jnp.linspace(0.0, 1.0, 200, dtype=jnp.float64)[:, None]
    mean, var = model.predict(xs)
    rmse = float(jnp.sqrt(jnp.mean(jnp.square(mean - jnp.sin(6.0 * xs)))))
    assert rmse < 0.1, f"minibatch SVGP did not fit: rmse={rmse}"
    fitted_noise = float(model.get_observation_noise())
    assert 0.02 < fitted_noise < 0.15, f"noise not recovered: {fitted_noise}"


def test_svgp_minibatch_matches_collapsed_fit_on_small_data(problem):
    """On small data the minibatch path must land near the collapsed-bound optimum
    (same model family, same ELBO): predictions agree to a few percent."""
    space, ds = problem
    exact = build_svgp(ds, space, num_inducing_points=30, kernel_priors=False)
    exact.optimize(ds)
    mini = build_svgp(
        ds,
        space,
        num_inducing_points=30,
        kernel_priors=False,
        minibatch_size=32,
        minibatch_iters=1500,
        learning_rate=0.02,
        optimize_key=jax.random.PRNGKey(4),
    )
    mini.optimize(ds)
    xs = space.sample(jax.random.PRNGKey(11), 50)
    m_exact, _ = exact.predict(xs)
    m_mini, _ = mini.predict(xs)
    scale = float(jnp.std(ds.trimmed_observations))
    err = float(jnp.max(jnp.abs(m_exact - m_mini))) / scale
    assert err < 0.15, f"minibatch fit far from collapsed optimum: {err}"
