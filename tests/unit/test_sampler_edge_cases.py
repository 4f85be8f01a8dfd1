"""Sampler edge-case / distribution matrix (role of reference
``tests/unit/acquisition/test_sampler.py`` + ``models/gpflow/test_sampler.py`` raise and
moment families): constructor validation, frozen-base-sample semantics, empirical-moment
assertions for the reparametrization samplers, and Thompson sampler contracts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util.misc import mk_dataset
from tests.util.models import QuadraticMeanAndRBFKernel
from trieste_tpu.acquisition.sampler import (
    ExactThompsonSampler,
    GumbelSampler,
    ThompsonSamplerFromTrajectory,
)
from trieste_tpu.data import Dataset
from trieste_tpu.models.gp.gpr import GaussianProcessRegression
from trieste_tpu.models.gp.posterior import GPRParams
from trieste_tpu.models.gp.sampler import (
    BatchReparametrizationSampler,
    IndependentReparametrizationSampler,
)
from trieste_tpu.ops.kernels import stationary
from trieste_tpu.ops.qmc import qmc_normal_samples


@pytest.fixture(scope="module")
def gpr():
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (10, 1), minval=-1.0, maxval=1.0)
    Y = jnp.sin(3.0 * X)
    ds = Dataset.from_arrays(X, Y)
    params = GPRParams(
        kernel=stationary("rbf", 1.0, 0.4),
        noise_variance=jnp.asarray(1e-3),
        mean_constant=jnp.asarray(0.0),
    )
    return GaussianProcessRegression(params, ds, num_rff_features=512)


@pytest.fixture
def model():
    return QuadraticMeanAndRBFKernel(noise_variance=1.0)


@pytest.fixture
def dataset():
    return mk_dataset([[-0.5], [0.0], [0.5]], [[0.26], [0.01], [0.24]])


# ------------------------------------------------------------------ construction


@pytest.mark.parametrize("cls", [IndependentReparametrizationSampler, BatchReparametrizationSampler])
@pytest.mark.parametrize("bad", [0, -1])
def test_reparam_sampler_sample_size_validation(cls, model, bad):
    with pytest.raises(ValueError):
        cls(bad, model)


def test_reparam_sampler_exposes_sample_size(model):
    assert IndependentReparametrizationSampler(13, model).sample_size == 13


# ------------------------------------------------------------------ frozen-eps semantics


def test_independent_sampler_repeated_calls_identical(model):
    sampler = IndependentReparametrizationSampler(32, model)
    x = jnp.array([[0.3]])
    a = sampler.sample(x, key=jax.random.PRNGKey(0))
    b = sampler.sample(x)  # eps frozen after the first call
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_independent_sampler_continuous_in_x(model):
    """Frozen base samples make the sample paths continuous in x (reference
    ``sampler.py:120-135``): nearby inputs give nearby samples."""
    sampler = IndependentReparametrizationSampler(16, model)
    a = sampler.sample(jnp.array([[0.3]]), key=jax.random.PRNGKey(0))
    b = sampler.sample(jnp.array([[0.3 + 1e-6]]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_batch_sampler_continuous_in_x(model):
    sampler = BatchReparametrizationSampler(16, model)
    a = sampler.sample(jnp.array([[0.3], [0.6]]), key=jax.random.PRNGKey(0))
    b = sampler.sample(jnp.array([[0.3 + 1e-6], [0.6]]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_reset_sampler_redraws(model):
    sampler = IndependentReparametrizationSampler(16, model)
    x = jnp.array([[0.3]])
    a = sampler.sample(x, key=jax.random.PRNGKey(0))
    sampler.reset_sampler()
    c = sampler.sample(x, key=jax.random.PRNGKey(99))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


# ------------------------------------------------------------------ moments


def test_independent_sampler_moments(gpr):
    """Empirical mean/var over S samples match the exact posterior marginals."""
    sampler = IndependentReparametrizationSampler(20_000, gpr)
    x = jnp.linspace(-1.0, 1.0, 7)[:, None]
    samples = np.asarray(sampler.sample(x[:, None, :], key=jax.random.PRNGKey(1)))
    # [N, S, 1, L] -> [N, S]
    samples = samples[:, :, 0, 0]
    mean, var = gpr.predict(x)
    np.testing.assert_allclose(samples.mean(1), np.asarray(mean)[:, 0], atol=0.03)
    np.testing.assert_allclose(samples.var(1), np.asarray(var)[:, 0], rtol=0.1, atol=5e-3)


def test_batch_sampler_joint_covariance(gpr):
    """The joint sampler reproduces cross-point covariance, not just marginals."""
    sampler = BatchReparametrizationSampler(20_000, gpr)
    x = jnp.array([[0.1], [0.15]])  # nearby -> strongly correlated
    samples = np.asarray(sampler.sample(x, key=jax.random.PRNGKey(2)))  # [S, B, L]
    emp_cov = np.cov(samples[:, 0, 0], samples[:, 1, 0])
    _, want_cov = gpr.predict_joint(x)
    np.testing.assert_allclose(emp_cov, np.asarray(want_cov)[0], atol=0.02)


def test_qmc_normal_moments():
    samples = np.asarray(qmc_normal_samples(4096, 2))
    assert samples.shape == (4096, 2)
    np.testing.assert_allclose(samples.mean(0), 0.0, atol=0.05)
    np.testing.assert_allclose(samples.std(0), 1.0, atol=0.05)


def test_qmc_normal_better_uniformity_than_iid():
    """QMC + inverse CDF should estimate E[X^2]=1 with lower error than iid normals."""
    qmc = np.asarray(qmc_normal_samples(1024, 1))[:, 0]
    iid = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (1024,)))
    assert abs((qmc**2).mean() - 1.0) <= abs((iid**2).mean() - 1.0) + 1e-3


def test_qmc_normal_deterministic_and_skippable():
    a = np.asarray(qmc_normal_samples(64, 2))
    b = np.asarray(qmc_normal_samples(64, 2))
    np.testing.assert_array_equal(a, b)
    shifted = np.asarray(qmc_normal_samples(64, 2, skip=64))
    assert not np.array_equal(a, shifted)


# ------------------------------------------------------------------ Thompson samplers


def test_exact_thompson_sampler_shapes_and_membership(gpr, key):
    candidates = jnp.linspace(-1.0, 1.0, 50)[:, None]
    got = ExactThompsonSampler().sample(gpr, 5, candidates, key=key)
    assert got.shape == (5, 1)
    member = (got[:, None, 0] == candidates[None, :, 0]).any(axis=-1)
    assert bool(jnp.all(member))


def test_exact_thompson_sample_min_values(gpr, key):
    """With sample_min_value=True the sampler returns function VALUES near the minimum,
    not locations (reference ``sampler.py:79-124``)."""
    candidates = jnp.linspace(-1.0, 1.0, 50)[:, None]
    sampler = ExactThompsonSampler(sample_min_value=True)
    got = np.asarray(sampler.sample(gpr, 20, candidates, key=key))
    assert got.shape == (20, 1)
    mean, _ = gpr.predict(candidates)
    assert got.mean() <= float(np.asarray(mean).min()) + 0.2


def test_gumbel_sampler_returns_low_values(gpr, key):
    candidates = jnp.linspace(-1.0, 1.0, 50)[:, None]
    got = np.asarray(GumbelSampler().sample(gpr, 20, candidates, key=key))
    assert got.shape == (20, 1)
    mean, _ = gpr.predict(candidates)
    # gumbel min-value samples sit at or below the posterior-mean minimum
    assert np.median(got) <= float(np.asarray(mean).min()) + 0.1


def test_trajectory_thompson_sampler_samples_minimizers(gpr, key):
    candidates = jnp.linspace(-1.0, 1.0, 30)[:, None]
    got = ThompsonSamplerFromTrajectory().sample(gpr, 4, candidates, key=key)
    assert got.shape == (4, 1)
    # locations live in the candidate hull
    assert bool(jnp.all((got >= -1.0) & (got <= 1.0)))


def test_thompson_sampler_repr():
    assert "ExactThompsonSampler" in repr(ExactThompsonSampler())
    assert "GumbelSampler" in repr(GumbelSampler())


# ------------------------------------------------------------------ trajectory samplers


def test_trajectory_is_deterministic_function(gpr, key):
    from trieste_tpu.models.gp.sampler import DecoupledTrajectorySampler

    sampler = DecoupledTrajectorySampler(gpr, 256)
    traj = sampler.get_trajectory(key, batch_size=1)
    x = jnp.linspace(-1.0, 1.0, 9)[:, None, None]
    np.testing.assert_array_equal(np.asarray(traj(x)), np.asarray(traj(x)))


def test_trajectory_update_returns_valid_resample(gpr, key):
    """Reference ``update_trajectory`` semantics (``models/gpflow/sampler.py:405-427``):
    updating resamples against the current model — the result must be a deterministic
    trajectory of the same batch size, still consistent with the posterior."""
    from trieste_tpu.models.gp.sampler import DecoupledTrajectorySampler

    sampler = DecoupledTrajectorySampler(gpr, 256)
    traj = sampler.get_trajectory(key, batch_size=2)
    updated = sampler.update_trajectory(traj)
    x = jnp.linspace(-1.0, 1.0, 9)[:, None, None]
    xb = jnp.broadcast_to(x, (9, 2, 1))
    out = updated(xb)
    assert out.shape[:2] == (9, 2)
    np.testing.assert_array_equal(np.asarray(updated(xb)), np.asarray(out))
    mean, var = gpr.predict(x[:, 0, :])
    # a posterior draw stays within a generous credible band of the posterior
    band = np.asarray(mean)[:, 0] + 6 * np.sqrt(np.asarray(var)[:, 0])
    assert np.all(np.asarray(out[:, 0, 0]) <= band)


def test_trajectory_batch_dimension(gpr, key):
    from trieste_tpu.models.gp.sampler import DecoupledTrajectorySampler

    sampler = DecoupledTrajectorySampler(gpr, 256)
    traj = sampler.get_trajectory(key, batch_size=3)
    x = jnp.zeros((5, 3, 1))
    out = traj(x)
    assert out.shape[:2] == (5, 3)
    # distinct batch slots carry independent draws
    vals = np.asarray(out)[0]
    assert not np.allclose(vals[0], vals[1])
