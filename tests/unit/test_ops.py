"""Numerics-layer tests: L-BFGS, masked linear algebra, kernels, QMC."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.spatial.distance

from trieste_tpu.ops.kernels import gram, scaled_squared_distance, stationary
from trieste_tpu.ops.lbfgs import minimize_lbfgs, vmapped_minimize_lbfgs
from trieste_tpu.ops.linalg import masked_cholesky, masked_gram, cho_solve
from trieste_tpu.ops.qmc import halton_sample, qmc_normal_samples, sobol_sample


class TestLBFGS:
    def test_quadratic_exact(self):
        res = minimize_lbfgs(lambda x: jnp.sum((x - 2.0) ** 2), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(res.x), 2.0, atol=1e-8)
        assert bool(res.converged)

    def test_rosenbrock(self):
        def rosen(x):
            return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

        res = minimize_lbfgs(rosen, jnp.zeros(6), max_iters=400)
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-5)

    def test_active_box_constraint(self):
        res = minimize_lbfgs(
            lambda x: jnp.sum((x - 2.0) ** 2),
            jnp.full(3, 0.3),
            lower=jnp.zeros(3),
            upper=jnp.ones(3),
        )
        np.testing.assert_allclose(np.asarray(res.x), 1.0, atol=1e-8)

    def test_matches_scipy_on_smooth_problem(self):
        from scipy.optimize import minimize as scipy_minimize

        def f_np(x):
            return float(np.sum(np.sin(x) + 0.1 * x**2))

        def f_jx(x):
            return jnp.sum(jnp.sin(x) + 0.1 * x**2)

        x0 = np.full(4, 2.0)
        ours = minimize_lbfgs(f_jx, jnp.asarray(x0), max_iters=200)
        theirs = scipy_minimize(f_np, x0, method="L-BFGS-B")
        np.testing.assert_allclose(float(ours.fun), theirs.fun, rtol=1e-6)

    def test_vmapped_multistart(self, key):
        def f(x):
            return jnp.sum((x - 0.7) ** 2)

        x0 = jax.random.uniform(key, (16, 5))
        res = vmapped_minimize_lbfgs(f, x0, lower=jnp.zeros(5), upper=jnp.ones(5))
        assert res.x.shape == (16, 5)
        np.testing.assert_allclose(np.asarray(res.x), 0.7, atol=1e-6)

    def test_nan_objective_safe(self):
        def f(x):
            return jnp.where(x[0] > 0.5, jnp.nan, jnp.sum(x**2))

        res = minimize_lbfgs(f, jnp.full(2, 0.4))
        assert bool(jnp.all(jnp.isfinite(res.x)))


class TestMaskedLinalg:
    def test_masked_cholesky_equals_trimmed(self, key):
        X = jax.random.normal(key, (10, 3))
        K = X @ X.T + 0.5 * jnp.eye(10)
        Kp = jnp.zeros((16, 16)).at[:10, :10].set(K)
        mask = jnp.arange(16) < 10
        Lp = masked_cholesky(Kp, mask, jitter=0.0)
        L = jnp.linalg.cholesky(K)
        np.testing.assert_allclose(np.asarray(Lp[:10, :10]), np.asarray(L), atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(jnp.diagonal(Lp)[10:]), 1.0, atol=1e-12
        )

    def test_masked_solve_zero_padded_rhs(self, key):
        X = jax.random.normal(key, (6, 2))
        K = X @ X.T + jnp.eye(6)
        Kp = jnp.zeros((8, 8)).at[:6, :6].set(K)
        mask = jnp.arange(8) < 6
        b = jax.random.normal(jax.random.split(key)[0], (6, 1))
        bp = jnp.zeros((8, 1)).at[:6].set(b)
        Lp = masked_cholesky(Kp, mask, jitter=0.0)
        xp = cho_solve(Lp, bp)
        x = jnp.linalg.solve(K, b)
        np.testing.assert_allclose(np.asarray(xp[:6]), np.asarray(x), atol=1e-8)
        np.testing.assert_allclose(np.asarray(xp[6:]), 0.0, atol=1e-12)


class TestKernels:
    def test_scaled_squared_distance_vs_scipy(self, key):
        a = jax.random.normal(key, (7, 3))
        b = jax.random.normal(jax.random.split(key)[0], (5, 3))
        ls = jnp.array([0.5, 1.0, 2.0])
        r2 = scaled_squared_distance(a, b, ls)
        expected = scipy.spatial.distance.cdist(
            np.asarray(a / ls), np.asarray(b / ls), "sqeuclidean"
        )
        np.testing.assert_allclose(np.asarray(r2), expected, atol=1e-10)

    @pytest.mark.parametrize("kind", ["rbf", "matern12", "matern32", "matern52"])
    def test_gram_diag_is_variance(self, kind, key):
        k = stationary(kind, variance=2.5, lengthscales=0.7)
        x = jax.random.normal(key, (6, 2))
        K = gram(k, x)
        np.testing.assert_allclose(np.asarray(jnp.diagonal(K)), 2.5, atol=1e-8)
        # symmetric PSD
        np.testing.assert_allclose(np.asarray(K), np.asarray(K.T), atol=1e-10)
        evals = np.linalg.eigvalsh(np.asarray(K))
        assert evals.min() > -1e-8

    def test_rbf_analytic_value(self):
        k = stationary("rbf", variance=1.0, lengthscales=1.0)
        K = gram(k, jnp.array([[0.0]]), jnp.array([[1.0]]))
        np.testing.assert_allclose(float(K[0, 0]), np.exp(-0.5), atol=1e-10)

    def test_matern12_analytic_value(self):
        k = stationary("matern12", variance=1.0, lengthscales=2.0)
        K = gram(k, jnp.array([[0.0]]), jnp.array([[1.0]]))
        np.testing.assert_allclose(float(K[0, 0]), np.exp(-0.5), rtol=1e-6)

    def test_kernel_gradients_finite_at_zero_distance(self):
        k = stationary("matern52", variance=1.0, lengthscales=1.0)

        def f(x):
            return gram(k, x[None], jnp.zeros((1, 2)))[0, 0]

        g = jax.grad(f)(jnp.zeros(2))
        assert bool(jnp.all(jnp.isfinite(g)))


class TestQMC:
    def test_halton_in_unit_cube(self, key):
        pts = halton_sample(key, 200, 5)
        assert pts.shape == (200, 5)
        assert float(pts.min()) >= 0.0 and float(pts.max()) < 1.0
        np.testing.assert_allclose(np.asarray(pts.mean(0)), 0.5, atol=0.07)

    def test_halton_deterministic_without_key(self):
        a = halton_sample(None, 8, 2)
        b = halton_sample(None, 8, 2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # first base-2 radical inverses: 1/2, 1/4, 3/4, ...
        np.testing.assert_allclose(
            np.asarray(a[:3, 0]), [0.5, 0.25, 0.75], atol=1e-12
        )

    def test_sobol_uniformity(self):
        pts = sobol_sample(128, 3)
        assert pts.shape == (128, 3)
        np.testing.assert_allclose(np.asarray(pts.mean(0)), 0.5, atol=0.05)

    def test_qmc_normal_moments(self):
        s = qmc_normal_samples(512, 4)
        assert s.shape == (512, 4)
        assert bool(jnp.all(jnp.isfinite(s)))
        np.testing.assert_allclose(np.asarray(s.mean(0)), 0.0, atol=0.05)
        np.testing.assert_allclose(np.asarray(s.std(0)), 1.0, atol=0.1)
