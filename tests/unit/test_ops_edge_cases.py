"""Numerics-ops edge cases (role of the remaining reference numeric-kernel tests):
masked-linalg identities on degenerate masks, L-BFGS convergence contracts across
shapes and bounds, kernel-family math (ARD, dtype, cross-gram), and jitter policy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from trieste_tpu.ops.kernels import Stationary, gram, scaled_squared_distance, stationary
from trieste_tpu.ops.lbfgs import minimize_lbfgs, vmapped_minimize_lbfgs
from trieste_tpu.ops.linalg import (
    add_jitter,
    cho_solve,
    masked_cholesky,
    masked_gram,
    masked_logdet_from_chol,
    solve_lower,
    solve_upper,
)
from trieste_tpu.utils.misc import jitter_for


# ------------------------------------------------------------------ masked linalg


def test_masked_gram_all_valid_is_identity_transform(key):
    K = jnp.eye(4) * 2.0
    mask = jnp.ones(4, bool)
    np.testing.assert_allclose(np.asarray(masked_gram(K, mask)), np.asarray(K))


def test_masked_gram_all_padding_is_identity_matrix():
    K = jnp.full((3, 3), 7.0)
    mask = jnp.zeros(3, bool)
    np.testing.assert_allclose(np.asarray(masked_gram(K, mask)), np.eye(3))


def test_masked_cholesky_single_valid_row(key):
    """A 1-valid-point system factorizes exactly; padded block stays identity."""
    K = jnp.full((3, 3), 0.5) + 2.0 * jnp.eye(3)
    mask = jnp.array([True, False, False])
    L = masked_cholesky(K, mask, jitter=0.0)
    np.testing.assert_allclose(float(L[0, 0]), np.sqrt(2.5), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(L[1:, 1:]), np.eye(2), atol=1e-12)


def test_masked_logdet_counts_only_valid_rows(key):
    A = jax.random.normal(key, (5, 5))
    K = A @ A.T + 5.0 * jnp.eye(5)
    mask = jnp.array([True, True, True, False, False])
    L = masked_cholesky(K, mask, jitter=0.0)
    got = float(masked_logdet_from_chol(L, mask))
    want = np.linalg.slogdet(np.asarray(K[:3, :3]))[1]
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_solve_roundtrip(key):
    A = jax.random.normal(key, (4, 4))
    K = A @ A.T + 4.0 * jnp.eye(4)
    L = jnp.linalg.cholesky(K)
    b = jax.random.normal(jax.random.PRNGKey(1), (4, 2))
    x = cho_solve(L, b)
    np.testing.assert_allclose(np.asarray(K @ x), np.asarray(b), atol=1e-10)
    # lower/upper split agrees with the combined solve
    y = solve_lower(L, b)
    x2 = solve_upper(L, y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-10)


def test_add_jitter_default_scales_with_dtype():
    K32 = jnp.zeros((2, 2), jnp.float32)
    K64 = jnp.zeros((2, 2), jnp.float64)
    j32 = float(add_jitter(K32)[0, 0])
    j64 = float(add_jitter(K64)[0, 0])
    assert j32 == pytest.approx(jitter_for(jnp.float32))
    assert j64 == pytest.approx(jitter_for(jnp.float64))
    assert j32 > j64  # f32 needs a larger floor


# ------------------------------------------------------------------ L-BFGS


def test_lbfgs_handles_1d_and_highdim():
    res1 = minimize_lbfgs(lambda x: jnp.sum((x - 3.0) ** 2), jnp.zeros(1), max_iters=50)
    np.testing.assert_allclose(np.asarray(res1.x), [3.0], atol=1e-6)
    res20 = minimize_lbfgs(
        lambda x: jnp.sum((x - jnp.arange(20.0)) ** 2), jnp.zeros(20), max_iters=100
    )
    np.testing.assert_allclose(np.asarray(res20.x), np.arange(20.0), atol=1e-5)


def test_lbfgs_start_at_optimum_stays():
    res = minimize_lbfgs(lambda x: jnp.sum(x**2), jnp.zeros(3), max_iters=20)
    np.testing.assert_allclose(np.asarray(res.x), 0.0, atol=1e-12)
    assert float(res.fun) == pytest.approx(0.0, abs=1e-12)


def test_lbfgs_respects_bound_corner():
    """Unconstrained optimum outside the box on both dims -> lands on the corner."""
    res = minimize_lbfgs(
        lambda x: jnp.sum((x - 5.0) ** 2),
        jnp.zeros(2),
        lower=jnp.zeros(2),
        upper=jnp.ones(2),
        max_iters=50,
    )
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-9)


def test_lbfgs_bound_start_outside_is_projected():
    res = minimize_lbfgs(
        lambda x: jnp.sum(x**2),
        jnp.array([5.0]),  # outside [−1, 1]
        lower=jnp.array([-1.0]),
        upper=jnp.array([1.0]),
        max_iters=50,
    )
    assert -1.0 <= float(res.x[0]) <= 1.0
    np.testing.assert_allclose(np.asarray(res.x), [0.0], atol=1e-8)


def test_lbfgs_is_jittable_and_gradable_free():
    """The whole optimizer jits (pure lax control flow, no host callbacks)."""
    f = lambda x: jnp.sum((x - 1.5) ** 2) + jnp.sum(jnp.sin(x))
    jitted = jax.jit(lambda x0: minimize_lbfgs(f, x0, max_iters=60).x)
    out = jitted(jnp.zeros(3))
    grad_norm = float(jnp.linalg.norm(jax.grad(lambda x: f(x))(out)))
    assert grad_norm < 1e-5


def test_vmapped_lbfgs_matches_individual_runs(key):
    starts = jax.random.normal(key, (6, 2))
    f = lambda x: jnp.sum((x - jnp.array([0.3, -0.7])) ** 2)
    batch = vmapped_minimize_lbfgs(f, starts, max_iters=60)
    for i in range(6):
        single = minimize_lbfgs(f, starts[i], max_iters=60)
        np.testing.assert_allclose(
            np.asarray(batch.x[i]), np.asarray(single.x), atol=1e-8
        )


def test_lbfgs_nonfinite_start_does_not_poison():
    """A NaN objective at the start point yields a finite-flagged failure, not a hang."""
    f = lambda x: jnp.where(jnp.any(x > 10.0), jnp.nan, jnp.sum(x**2))
    res = minimize_lbfgs(f, jnp.array([0.5]), max_iters=30)
    np.testing.assert_allclose(np.asarray(res.x), [0.0], atol=1e-8)


# ------------------------------------------------------------------ kernels


@pytest.mark.parametrize("kind", ["rbf", "matern12", "matern32", "matern52"])
def test_gram_is_psd_and_unit_diagonal(kind, key):
    k = stationary(kind, variance=1.0, lengthscales=0.5)
    x = jax.random.uniform(key, (10, 2))
    K = np.asarray(gram(k, x))
    np.testing.assert_allclose(np.diag(K), 1.0, rtol=1e-6)
    eigs = np.linalg.eigvalsh(K + 1e-10 * np.eye(10))
    assert np.all(eigs > -1e-8)


def test_cross_gram_matches_pairwise(key):
    k = stationary("rbf", variance=2.0, lengthscales=[0.5, 1.0])
    a = jax.random.uniform(key, (4, 2))
    b = jax.random.uniform(jax.random.PRNGKey(1), (3, 2))
    K = np.asarray(gram(k, a, b))
    assert K.shape == (4, 3)
    for i in range(4):
        for j in range(3):
            d2 = np.sum((np.asarray(a[i]) - np.asarray(b[j])) ** 2 / np.array([0.25, 1.0]))
            np.testing.assert_allclose(K[i, j], 2.0 * np.exp(-0.5 * d2), rtol=1e-6)


def test_ard_lengthscales_broadcast_scalar_equivalence(key):
    x = jax.random.uniform(key, (6, 3))
    scalar_k = stationary("matern52", 1.0, 0.7)
    vector_k = stationary("matern52", 1.0, [0.7, 0.7, 0.7])
    np.testing.assert_allclose(
        np.asarray(gram(scalar_k, x)), np.asarray(gram(vector_k, x)), rtol=1e-12
    )


def test_kernel_dtype_follows_request():
    k32 = stationary("rbf", 1.0, 0.5, dtype=jnp.float32)
    assert k32.variance.dtype == jnp.float32
    x = jnp.zeros((2, 1), jnp.float32)
    assert gram(k32, x).dtype == jnp.float32


def test_scaled_squared_distance_nonnegative_under_cancellation(key):
    """The |a|^2+|b|^2-2ab form must clamp tiny negative cancellation residues."""
    x = jnp.broadcast_to(jax.random.uniform(key, (1, 3)), (5, 3)) + 1e3
    d2 = scaled_squared_distance(x, x, jnp.ones(3))
    assert bool(jnp.all(d2 >= 0.0))


def test_unknown_kernel_kind_raises():
    with pytest.raises(ValueError):
        k = stationary("banana", 1.0, 0.5)
        gram(k, jnp.zeros((2, 1)))


def test_stationary_kernel_is_a_pytree():
    k = stationary("rbf", 1.0, [0.5, 0.7])
    leaves = jax.tree_util.tree_leaves(k)
    assert len(leaves) == 2  # variance + lengthscales; kind is static metadata
    k2 = jax.tree_util.tree_map(lambda a: a * 2, k)
    assert isinstance(k2, Stationary)
    assert k2.kind == "rbf"
