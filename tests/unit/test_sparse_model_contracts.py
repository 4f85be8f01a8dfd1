"""Deeper sparse-model contracts (role of the SGPR/SVGP sections of reference
``tests/unit/models/gpflow/test_models.py``, 2138 LoC): Titsias tightness at Z=X,
conjugate SVGP == SGPR identity, selector hook wiring, whitened variational
invariants, predict_y noise offsets, and sampler moment checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import Dataset
from trieste_tpu.models.gp import build_gpr, build_sgpr, build_svgp
from trieste_tpu.models.gp.posterior import log_marginal_likelihood
from trieste_tpu.models.gp.sparse import (
    SGPRParams,
    SVGPParams,
    sgpr_build_cache,
    sgpr_elbo,
    sgpr_predict_f,
    svgp_elbo,
    svgp_optimal_variational,
    svgp_predict_f,
)
from trieste_tpu.ops.kernels import stationary
from trieste_tpu.space import Box


@pytest.fixture(scope="module")
def toy():
    key = jax.random.PRNGKey(0)
    space = Box([0.0], [1.0])
    X = space.sample(key, 24)
    Y = jnp.sin(6 * X) + 0.05 * jax.random.normal(jax.random.PRNGKey(1), X.shape)
    return space, Dataset.from_arrays(X, Y)


def _sgpr_params(ds, Z):
    return SGPRParams(
        kernel=stationary("rbf", 1.0, 0.3),
        noise_variance=jnp.asarray(0.01),
        mean_constant=jnp.asarray(0.0),
        inducing_points=Z,
    )


def test_titsias_bound_tight_when_inducing_equals_data(toy):
    """With Z = X the collapsed bound equals the exact log marginal likelihood."""
    space, ds = toy
    qp = ds.trimmed_query_points
    p = _sgpr_params(ds, qp)
    elbo = float(sgpr_elbo(p, ds.query_points, ds.observations, ds.mask))
    from trieste_tpu.models.gp.posterior import GPRParams

    gpr = GPRParams(
        kernel=p.kernel, noise_variance=p.noise_variance, mean_constant=p.mean_constant
    )
    mll = float(log_marginal_likelihood(gpr, ds.query_points, ds.observations, ds.mask))
    # equality holds to Cholesky-jitter precision (both sides add ~1e-6 jitter in
    # different factorizations)
    np.testing.assert_allclose(elbo, mll, rtol=1e-4)


def test_sgpr_predictions_exact_when_inducing_equals_data(toy):
    space, ds = toy
    qp = ds.trimmed_query_points
    p = _sgpr_params(ds, qp)
    cache = sgpr_build_cache(p, ds.query_points, ds.observations, ds.mask)
    xs = jnp.linspace(0.0, 1.0, 9)[:, None]
    sm, sv = sgpr_predict_f(p, cache, xs)
    from trieste_tpu.models.gp.posterior import GPRParams, build_cache, predict_f

    gpr = GPRParams(
        kernel=p.kernel, noise_variance=p.noise_variance, mean_constant=p.mean_constant
    )
    gcache = build_cache(gpr, ds.query_points, ds.observations, ds.mask)
    gm, gv = predict_f(gpr, gcache, xs)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(gm), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(gv), atol=1e-4)


def test_svgp_optimal_variational_matches_sgpr(toy):
    """At the optimal whitened q(v), SVGP predictions equal SGPR's collapsed posterior
    for the same hyperparameters and inducing points (conjugate identity)."""
    space, ds = toy
    Z = ds.trimmed_query_points[::3]
    sg = _sgpr_params(ds, Z)
    cache = sgpr_build_cache(sg, ds.query_points, ds.observations, ds.mask)
    M = Z.shape[0]
    sv = SVGPParams(
        kernel=sg.kernel,
        noise_variance=sg.noise_variance,
        mean_constant=sg.mean_constant,
        inducing_points=Z,
        q_mu=jnp.zeros((M, 1)),
        q_sqrt=jnp.eye(M)[None],
    )
    sv = svgp_optimal_variational(sv, ds.query_points, ds.observations, ds.mask)
    xs = jnp.linspace(0.0, 1.0, 7)[:, None]
    vm, vv = svgp_predict_f(sv, xs)
    sm, s_var = sgpr_predict_f(sg, cache, xs)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(sm), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vv), np.asarray(s_var), atol=1e-6)


def test_svgp_elbo_at_optimal_q_equals_titsias(toy):
    space, ds = toy
    Z = ds.trimmed_query_points[::3]
    sg = _sgpr_params(ds, Z)
    M = Z.shape[0]
    sv = SVGPParams(
        kernel=sg.kernel, noise_variance=sg.noise_variance,
        mean_constant=sg.mean_constant, inducing_points=Z,
        q_mu=jnp.zeros((M, 1)), q_sqrt=jnp.eye(M)[None],
    )
    sv = svgp_optimal_variational(sv, ds.query_points, ds.observations, ds.mask)
    np.testing.assert_allclose(
        float(svgp_elbo(sv, ds.query_points, ds.observations, ds.mask)),
        float(sgpr_elbo(sg, ds.query_points, ds.observations, ds.mask)),
        rtol=1e-5,
    )


def test_svgp_elbo_suboptimal_q_is_lower(toy):
    space, ds = toy
    Z = ds.trimmed_query_points[::3]
    M = Z.shape[0]
    sv0 = SVGPParams(
        kernel=stationary("rbf", 1.0, 0.3), noise_variance=jnp.asarray(0.01),
        mean_constant=jnp.asarray(0.0), inducing_points=Z,
        q_mu=jnp.zeros((M, 1)), q_sqrt=jnp.eye(M)[None],
    )
    opt = svgp_optimal_variational(sv0, ds.query_points, ds.observations, ds.mask)
    args = (ds.query_points, ds.observations, ds.mask)
    assert float(svgp_elbo(sv0, *args)) < float(svgp_elbo(opt, *args))


def test_sparse_predict_y_adds_observation_noise(toy):
    space, ds = toy
    for build in (build_sgpr, build_svgp):
        model = build(ds, space, num_inducing_points=8, kernel_priors=False)
        xs = jnp.array([[0.4]])
        _, vf = model.predict(xs)
        _, vy = model.predict_y(xs)
        np.testing.assert_allclose(
            float(vy[0, 0] - vf[0, 0]), float(model.get_observation_noise()), rtol=1e-6
        )


def test_get_inducing_variables_contract(toy):
    space, ds = toy
    svgp = build_svgp(ds, space, num_inducing_points=8, kernel_priors=False)
    Z, q_mu, q_sqrt, whitened = svgp.get_inducing_variables()
    assert Z.shape[0] == 8 and q_mu.shape == (8, 1)
    assert q_sqrt.shape == (1, 8, 8)
    assert whitened is True
    # q_sqrt stays lower-triangular after optimization
    svgp.optimize(ds)
    _, _, q_sqrt2, _ = svgp.get_inducing_variables()
    np.testing.assert_allclose(
        np.asarray(q_sqrt2[0]), np.tril(np.asarray(q_sqrt2[0])), atol=1e-12
    )


def test_selector_hook_runs_on_update(toy):
    """An attached inducing-point selector with recalc=True moves Z on update
    (reference ``models.py:655-741``)."""
    from trieste_tpu.models.gp.inducing_points import KMeansInducingPointSelector

    space, ds = toy
    svgp = build_svgp(
        ds, space, num_inducing_points=6, kernel_priors=False,
        inducing_point_selector=KMeansInducingPointSelector(
            key=jax.random.PRNGKey(5)
        ),
    )
    Z0 = np.asarray(svgp.params.inducing_points).copy()
    grown = ds + Dataset.from_arrays(
        jnp.array([[0.111], [0.999]]), jnp.array([[0.2], [0.3]])
    )
    svgp.update(grown)
    Z1 = np.asarray(svgp.params.inducing_points)
    assert not np.allclose(Z0, Z1)


def test_sgpr_sample_moments(toy, key):
    space, ds = toy
    sgpr = build_sgpr(ds, space, num_inducing_points=12, kernel_priors=False)
    sgpr.optimize(ds)
    xs = jnp.array([[0.3], [0.7]])
    samples = sgpr.sample(key, xs, 8000)  # [S, B, 1]
    mean, var = sgpr.predict(xs)
    np.testing.assert_allclose(
        np.asarray(samples.mean(0)), np.asarray(mean), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(samples.var(0)), np.asarray(var), rtol=0.2, atol=2e-3
    )


def test_minibatch_elbo_estimate_is_unbiased(toy, key):
    """Averaged minibatch ELBO estimates converge to the full-batch ELBO."""
    import optax  # noqa: F401  (presence gate for the minibatch path)

    space, ds = toy
    Z = ds.trimmed_query_points[::3]
    M = Z.shape[0]
    sv = SVGPParams(
        kernel=stationary("rbf", 1.0, 0.3), noise_variance=jnp.asarray(0.01),
        mean_constant=jnp.asarray(0.0), inducing_points=Z,
        q_mu=jnp.zeros((M, 1)), q_sqrt=jnp.eye(M)[None],
    )
    sv = svgp_optimal_variational(sv, ds.query_points, ds.observations, ds.mask)
    full = float(svgp_elbo(sv, ds.query_points, ds.observations, ds.mask))

    n = len(ds)
    b = 6
    qp, obs = ds.astuple()
    estimates = []
    for k in jax.random.split(key, 400):
        idx = jax.random.randint(k, (b,), 0, n)
        Xb, Yb = qp[idx], obs[idx]
        mean, var = svgp_predict_f(sv, Xb)
        s2 = float(sv.noise_variance)
        lik = -0.5 * jnp.log(2 * jnp.pi * s2) - 0.5 * (jnp.square(Yb - mean) + var) / s2
        P, M_, _ = sv.q_sqrt.shape
        diag = jnp.diagonal(sv.q_sqrt, axis1=-2, axis2=-1)
        kl = 0.5 * (
            jnp.sum(jnp.square(sv.q_mu)) + jnp.sum(jnp.square(sv.q_sqrt))
            - M_ * P - 2.0 * jnp.sum(jnp.log(jnp.abs(diag)))
        )
        estimates.append(float(jnp.sum(lik) * n / b - kl))
    np.testing.assert_allclose(np.mean(estimates), full, rtol=0.05)
