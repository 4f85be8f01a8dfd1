"""Trajectory-sampler behavioral families (rest of reference
``tests/unit/models/gpflow/test_sampler.py``, 1003 LoC): decoupled draws interpolate
the data, RFF draws are smooth deterministic functions, distinct keys give distinct
draws, and the ensemble trajectory picks real members (diversify adds head noise)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import Dataset
from trieste_tpu.models.gp.gpr import GaussianProcessRegression
from trieste_tpu.models.gp.posterior import GPRParams
from trieste_tpu.models.gp.sampler import (
    DecoupledTrajectorySampler,
    FourierFeatures,
    RandomFourierFeatureTrajectorySampler,
    make_fourier_features,
    sample_spectral_frequencies,
)
from trieste_tpu.ops.kernels import stationary


@pytest.fixture(scope="module")
def gpr():
    X = jnp.array([[-0.8], [-0.3], [0.2], [0.7]])
    Y = jnp.sin(2.0 * X)
    ds = Dataset.from_arrays(X, Y)
    params = GPRParams(
        kernel=stationary("rbf", 1.0, 0.5),
        noise_variance=jnp.asarray(1e-6),
        mean_constant=jnp.asarray(0.0),
    )
    return GaussianProcessRegression(params, ds, num_rff_features=1024), ds


def test_decoupled_trajectories_interpolate_data(gpr, key):
    """With tiny noise every decoupled posterior draw passes through the observations
    (the Matheron update pins the data exactly)."""
    model, ds = gpr
    sampler = DecoupledTrajectorySampler(model, 1024)
    X = ds.trimmed_query_points
    Y = ds.trimmed_observations
    for k in jax.random.split(key, 3):
        traj = sampler.get_trajectory(k, batch_size=1)
        vals = traj(X[:, None, :])[:, 0, 0]
        np.testing.assert_allclose(np.asarray(vals), np.asarray(Y[:, 0]), atol=0.05)


def test_distinct_keys_give_distinct_trajectories(gpr, key):
    model, _ = gpr
    sampler = DecoupledTrajectorySampler(model, 512)
    k1, k2 = jax.random.split(key)
    xs = jnp.linspace(-1.0, 1.0, 9)[:, None, None]
    a = np.asarray(sampler.get_trajectory(k1)(xs))
    b = np.asarray(sampler.get_trajectory(k2)(xs))
    assert not np.allclose(a, b)


def test_rff_trajectory_is_smooth_function(gpr, key):
    """An RFF draw is a finite feature expansion: values at nearby inputs are close
    (Lipschitz-ish), and repeated evaluation is bitwise identical."""
    model, _ = gpr
    sampler = RandomFourierFeatureTrajectorySampler(model, 1024)
    traj = sampler.get_trajectory(key)
    xs = jnp.linspace(-1.0, 1.0, 101)[:, None, None]
    vals = np.asarray(traj(xs))[:, 0, 0]
    np.testing.assert_array_equal(vals, np.asarray(traj(xs))[:, 0, 0])
    steps = np.abs(np.diff(vals))
    assert steps.max() < 0.5  # no discontinuities at 0.02 input spacing


def test_spectral_frequencies_match_kernel_scale(key):
    """RBF spectral density: frequencies scale inversely with the lengthscale."""
    k_narrow = stationary("rbf", 1.0, 0.1)
    k_wide = stationary("rbf", 1.0, 1.0)
    f_narrow = sample_spectral_frequencies(key, k_narrow, 2048, 1)
    f_wide = sample_spectral_frequencies(key, k_wide, 2048, 1)
    assert np.std(np.asarray(f_narrow)) > 5 * np.std(np.asarray(f_wide))


def test_fourier_features_magnitude(key):
    """phi(x)phi(x)^T ≈ k(x,x) = variance: feature sq-norms average to the kernel
    variance (Monte-Carlo feature map normalization)."""
    kernel = stationary("rbf", 2.0, 0.4)
    features = make_fourier_features(key, kernel, 4096, 1)
    phi = features(jnp.array([[0.3]]))  # [1, m]
    np.testing.assert_allclose(float(jnp.sum(phi**2)), 2.0, rtol=0.1)


def test_ensemble_trajectory_uses_member_predictions(key):
    from trieste_tpu.models.ensembles.deep_ensemble import (
        DeepEnsembleTrajectorySampler,
        build_deep_ensemble,
    )

    X = jnp.linspace(0.0, 1.0, 12)[:, None]
    ds = Dataset.from_arrays(X, jnp.sin(3 * X))
    model = build_deep_ensemble(ds, ensemble_size=3, num_train_steps=50,
                                key=jax.random.PRNGKey(0))
    model.optimize(ds)
    sampler = DeepEnsembleTrajectorySampler(model, diversify=False)
    traj = sampler.get_trajectory(key, batch_size=4)
    xs = jnp.broadcast_to(jnp.array([[0.4]]), (1, 4, 1))
    vals = np.asarray(traj(xs))[0, :, 0]
    # every slot's value equals SOME member's mean prediction at 0.4
    member_means = []
    for i in range(3):
        mean_i = model.predict_ensemble(jnp.array([[0.4]]))[0][i]
        member_means.append(float(np.asarray(mean_i)[0, 0]))
    for v in vals:
        assert min(abs(v - m) for m in member_means) < 1e-5


def test_ensemble_trajectory_diversify_adds_spread(key):
    from trieste_tpu.models.ensembles.deep_ensemble import (
        DeepEnsembleTrajectorySampler,
        build_deep_ensemble,
    )

    X = jnp.linspace(0.0, 1.0, 12)[:, None]
    ds = Dataset.from_arrays(X, jnp.sin(3 * X))
    model = build_deep_ensemble(ds, ensemble_size=2, num_train_steps=50,
                                key=jax.random.PRNGKey(0))
    model.optimize(ds)
    xs = jnp.broadcast_to(jnp.array([[0.4]]), (1, 16, 1))
    plain = DeepEnsembleTrajectorySampler(model, diversify=False).get_trajectory(
        key, batch_size=16
    )
    diverse = DeepEnsembleTrajectorySampler(model, diversify=True).get_trajectory(
        key, batch_size=16
    )
    spread_plain = len(set(np.asarray(plain(xs))[0, :, 0].round(8).tolist()))
    spread_diverse = len(set(np.asarray(diverse(xs))[0, :, 0].round(8).tolist()))
    assert spread_plain <= 2  # only member identities differ
    assert spread_diverse > spread_plain  # head noise differentiates slots
