"""Closed-form value tests for the active-learning acquisition family, matching the
reference's analytic assertions
(``/root/reference/tests/unit/acquisition/function/test_active_learning.py``):
PredictiveVariance against the joint-covariance determinant, the Bichon/Ranjan
criteria against scipy formulas, IntegratedVarianceReduction against a from-scratch
numpy conditioning, and BALD against Gauss-Hermite numerical integration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.function.active_learning import (
    BayesianActiveLearningByDisagreement,
    ExpectedFeasibility,
    IntegratedVarianceReduction,
    PredictiveVariance,
)
from trieste_tpu.data import Dataset
from trieste_tpu.models.gp import GaussianProcessRegression
from trieste_tpu.models.gp import posterior as P
from trieste_tpu.ops.kernels import gram, stationary


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=0.25)


@pytest.fixture
def gpr():
    key = jax.random.PRNGKey(3)
    X = jax.random.uniform(key, (7, 1), dtype=jnp.float64, minval=-2.0, maxval=2.0)
    Y = jnp.sin(2.0 * X)
    params = P.GPRParams(
        kernel=stationary("rbf", 1.1, [0.7]),
        noise_variance=jnp.asarray(0.01),
        mean_constant=jnp.asarray(0.0),
    )
    return GaussianProcessRegression(params, Dataset.from_arrays(X, Y)), X, Y, params


def test_predictive_variance_equals_joint_covariance_determinant(model):
    fn = PredictiveVariance(jitter=0.0).prepare_acquisition_function(model)
    x = jnp.asarray([[[0.1, 0.3], [0.6, -0.2], [-0.4, 0.5]]])  # [1, B=3, D]
    got = np.asarray(fn(x))
    _, cov = model.predict_joint(x)
    want = np.linalg.det(np.asarray(cov[0, 0]))
    np.testing.assert_allclose(got, [[want]], rtol=1e-10)


def test_predictive_variance_single_point_is_prior_variance(model):
    fn = PredictiveVariance(jitter=0.0).prepare_acquisition_function(model)
    x = jnp.asarray([[[0.2, 0.2]]])
    # the fake GP is a prior with unit-amplitude RBF kernel: var == 1 everywhere
    np.testing.assert_allclose(np.asarray(fn(x)), [[1.0]], rtol=1e-12)


def test_predictive_variance_prefers_diverse_batches(model):
    fn = PredictiveVariance(jitter=0.0).prepare_acquisition_function(model)
    clumped = jnp.asarray([[[0.0, 0.0], [0.01, 0.0]]])
    spread = jnp.asarray([[[0.0, 0.0], [2.0, 2.0]]])
    assert float(fn(spread)[0, 0]) > float(fn(clumped)[0, 0])


@pytest.mark.parametrize("threshold", [-0.5, 0.0, 0.7])
@pytest.mark.parametrize("alpha", [0.5, 1.0, 2.0])
def test_bichon_criterion_matches_scipy_formula(model, threshold, alpha):
    fn = ExpectedFeasibility(threshold, alpha=alpha, delta=1).prepare_acquisition_function(
        model
    )
    x = jnp.asarray([[[0.3, -0.2]]])
    mean, var = model.predict(x[:, 0, :])
    m, s = float(mean[0, 0]), float(np.sqrt(var[0, 0]))
    t = (threshold - m) / s
    norm = scipy.stats.norm
    want = s * (
        alpha * (norm.cdf(t + alpha) - norm.cdf(t - alpha))
        - t * (2 * norm.cdf(t) - norm.cdf(t + alpha) - norm.cdf(t - alpha))
        - (2 * norm.pdf(t) - norm.pdf(t + alpha) - norm.pdf(t - alpha))
    )
    np.testing.assert_allclose(np.asarray(fn(x)), [[want]], rtol=1e-6)


@pytest.mark.parametrize("threshold", [0.0, 0.7])
@pytest.mark.parametrize("alpha", [1.0, 2.0])
def test_ranjan_criterion_matches_scipy_formula(model, threshold, alpha):
    fn = ExpectedFeasibility(threshold, alpha=alpha, delta=2).prepare_acquisition_function(
        model
    )
    x = jnp.asarray([[[0.3, -0.2]]])
    mean, var = model.predict(x[:, 0, :])
    m, v = float(mean[0, 0]), float(var[0, 0])
    s = np.sqrt(v)
    t = (threshold - m) / s
    norm = scipy.stats.norm
    want = v * (
        (alpha**2 - 1 - t**2) * (norm.cdf(t + alpha) - norm.cdf(t - alpha))
        - 2 * t * (norm.pdf(t + alpha) - norm.pdf(t - alpha))
        + (t + alpha) * norm.pdf(t + alpha)
        - (t - alpha) * norm.pdf(t - alpha)
    )
    np.testing.assert_allclose(np.asarray(fn(x)), [[want]], rtol=1e-6)


def test_expected_feasibility_maximal_at_threshold_contour(model):
    # mean is ||x||²; on the circle ||x||² == threshold the uncertainty about the
    # level set is greatest
    fn = ExpectedFeasibility(0.5, delta=1).prepare_acquisition_function(model)
    on = jnp.asarray([[[np.sqrt(0.5), 0.0]]])
    off = jnp.asarray([[[1.5, 0.0]]])
    assert float(fn(on)[0, 0]) > float(fn(off)[0, 0])


def _naive_variance_reduction(params, X, xq, t):
    """Reduction of posterior variance at t from adding batch xq, by direct numpy
    conditioning of the exact GP (independent of the framework linalgebra)."""
    jitter = 1e-6
    noise = float(params.noise_variance) + jitter

    def post_cov(a, b, X):
        K = np.asarray(gram(params.kernel, jnp.asarray(X)))
        Kn = K + noise * np.eye(len(X))
        Ka = np.asarray(gram(params.kernel, jnp.asarray(a), jnp.asarray(X)))
        Kb = np.asarray(gram(params.kernel, jnp.asarray(b), jnp.asarray(X)))
        Kab = np.asarray(gram(params.kernel, jnp.asarray(a), jnp.asarray(b)))
        return Kab - Ka @ np.linalg.solve(Kn, Kb.T)

    var_before = np.diagonal(post_cov(t, t, X))
    X_aug = np.concatenate([np.asarray(X), np.asarray(xq)], axis=0)
    var_after = np.diagonal(post_cov(t, t, X_aug))
    return var_before - var_after


def test_integrated_variance_reduction_matches_naive_conditioning(gpr):
    model, X, Y, params = gpr
    t = jnp.linspace(-2.0, 2.0, 9)[:, None]
    xq = jnp.asarray([[0.33], [-1.1]])  # batch of 2
    fn = IntegratedVarianceReduction(t).prepare_acquisition_function(model)
    got = float(fn(xq[None])[0, 0])
    want = float(np.sum(_naive_variance_reduction(params, X, np.asarray(xq), np.asarray(t))))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_integrated_variance_reduction_threshold_weighting(gpr):
    model, X, Y, params = gpr
    t = jnp.linspace(-2.0, 2.0, 9)[:, None]
    xq = jnp.asarray([[[0.33]]])
    fn_flat = IntegratedVarianceReduction(t).prepare_acquisition_function(model)
    fn_weighted = IntegratedVarianceReduction(t, threshold=0.0).prepare_acquisition_function(
        model
    )
    # weights are the pdf of the threshold under the current posterior — bounded by
    # the standard normal's mode, so the weighted value is strictly smaller
    assert 0.0 < float(fn_weighted(xq)[0, 0]) < scipy.stats.norm.pdf(0) * float(fn_flat(xq)[0, 0]) + 1e-12


def test_integrated_variance_reduction_interval_threshold(gpr):
    model, X, Y, params = gpr
    t = jnp.linspace(-2.0, 2.0, 9)[:, None]
    xq = jnp.asarray([[[0.33]]])
    fn_interval = IntegratedVarianceReduction(
        t, threshold=[-10.0, 10.0]
    ).prepare_acquisition_function(model)
    fn_flat = IntegratedVarianceReduction(t).prepare_acquisition_function(model)
    # a huge interval has cdf-difference weights ~1 -> matches the unweighted value
    np.testing.assert_allclose(float(fn_interval(xq)[0, 0]), float(fn_flat(xq)[0, 0]), rtol=1e-6)


def test_bald_matches_gauss_hermite_integration(model):
    fn = BayesianActiveLearningByDisagreement(jitter=1e-12).prepare_acquisition_function(
        model
    )
    x = jnp.asarray([[[0.4, 0.1]]])
    mean, var = model.predict(x[:, 0, :])
    m, v = float(mean[0, 0]), float(var[0, 0])
    norm = scipy.stats.norm
    # marginal entropy of p = Phi(m / sqrt(1+v))
    p = norm.cdf(m / np.sqrt(1 + v))
    H_marg = -p * np.log(p) - (1 - p) * np.log(1 - p)
    # E_f[H(Phi(f))] by Gauss-Hermite
    nodes, weights = np.polynomial.hermite_e.hermegauss(120)
    f = m + np.sqrt(v) * nodes
    pf = np.clip(norm.cdf(f), 1e-12, 1 - 1e-12)
    H = -pf * np.log(pf) - (1 - pf) * np.log(1 - pf)
    H_cond = float(np.sum(weights * H) / np.sqrt(2 * np.pi))
    want = H_marg - H_cond
    # the C' = sqrt(pi ln2 / 2) exponential approximation of the conditional entropy
    # (Houlsby et al. 2011) is accurate to ~1e-2 in nats
    np.testing.assert_allclose(float(fn(x)[0, 0]), want, atol=2e-2)
    assert float(fn(x)[0, 0]) > 0.0


def test_bald_is_maximal_at_decision_boundary(model):
    fn = BayesianActiveLearningByDisagreement().prepare_acquisition_function(model)
    at_boundary = jnp.asarray([[[0.0, 0.0]]])  # mean ||x||² = 0
    away = jnp.asarray([[[1.3, 1.3]]])
    assert float(fn(at_boundary)[0, 0]) > float(fn(away)[0, 0])
