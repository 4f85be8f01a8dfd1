"""Analytic contracts for the deep-ensemble model (VERDICT r4 Weak #2 / ask #5).

Reference anchor: ``trieste/models/keras/models.py:253-418`` (mixture fusion, bootstrap
resampling) and the density bar of the reference's keras ``test_models.py``. Mirrors
``test_sparse_model_contracts.py``: identities first, then a seeded known-Gaussian
recovery.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import Dataset
from trieste_tpu.models.ensembles.deep_ensemble import (
    DeepEnsemble,
    _nll_loss,
    build_deep_ensemble,
    ensemble_predict,
    fit_deep_ensemble,
)


def _dataset(n=60, key=0, noise=0.05):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    X = jax.random.uniform(k1, (n, 1), minval=-1.0, maxval=1.0)
    f = jnp.sin(3.0 * X)
    Y = f + noise * jax.random.normal(k2, f.shape)
    return Dataset.from_arrays(X, Y), f


@pytest.fixture(scope="module")
def trained_model():
    ds, _ = _dataset()
    model = build_deep_ensemble(ds, ensemble_size=5, num_train_steps=800)
    model.optimize(ds)
    return model, ds


def test_mixture_fusion_identity(trained_model):
    """predict() must equal the law-of-total-variance fusion of the per-member
    predictions exposed by predict_ensemble (reference ``models.py:253-321``)."""
    model, ds = trained_model
    x = jnp.linspace(-1.0, 1.0, 17)[:, None]
    mean, var = model.predict(x)
    means, vars_ = model.predict_ensemble(x)  # [E, N, 1]
    mix_mean = jnp.mean(means, axis=0)
    mix_var = jnp.mean(vars_ + jnp.square(means), axis=0) - jnp.square(mix_mean)
    np.testing.assert_allclose(mean, mix_mean, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(var, jnp.maximum(mix_var, 1e-12), rtol=1e-6, atol=1e-8)
    # the mixture variance dominates the mean member variance (Var[mean] >= 0)
    assert bool(jnp.all(var >= jnp.mean(vars_, axis=0) - 1e-9))


def test_predict_y_adds_no_noise_term(trained_model):
    """DeepEnsemble's variance is already a predictive (aleatoric+epistemic) variance;
    predict_y must equal predict (reference keras wrapper semantics)."""
    model, ds = trained_model
    x = jnp.linspace(-1.0, 1.0, 9)[:, None]
    mean, var = model.predict(x)
    mean_y, var_y = model.predict_y(x)
    np.testing.assert_allclose(mean, mean_y, atol=1e-9)
    np.testing.assert_allclose(var, var_y, atol=1e-9)


def test_known_gaussian_recovery(trained_model):
    """Trained on y = sin(3x) + N(0, 0.05^2): the ensemble mean recovers the function
    to a few noise SDs and the predictive variance brackets the aleatoric floor."""
    model, ds = trained_model
    x = jnp.linspace(-0.9, 0.9, 25)[:, None]
    f_true = jnp.sin(3.0 * x)
    mean, var = model.predict(x)
    err = float(jnp.max(jnp.abs(mean - f_true)))
    assert err < 0.15, f"ensemble mean misfit {err}"
    # aleatoric noise is 0.05^2 = 2.5e-3; the NLL head may underfit the noise by a
    # factor ~2 at n=60, but the predictive variance must not collapse more than an
    # order of magnitude below the floor, nor blow past 100x
    assert float(jnp.min(var)) > 2.5e-4, float(jnp.min(var))
    assert float(jnp.max(var)) < 0.25, float(jnp.max(var))


def test_epistemic_variance_grows_off_data(trained_model):
    """Outside the training region member disagreement must raise the variance."""
    model, ds = trained_model
    inside = jnp.zeros((1, 1))
    outside = jnp.full((1, 1), 2.5)
    _, var_in = model.predict(inside)
    _, var_out = model.predict(outside)
    assert float(var_out[0, 0]) > 2.0 * float(var_in[0, 0])


def test_nll_loss_analytic_value_and_masking():
    """Closed-form check of the masked Gaussian NLL (reference ``utils.py:125``)."""
    mean = jnp.array([[0.0], [1.0], [5.0]])
    var = jnp.array([[1.0], [4.0], [1.0]])
    y = jnp.array([[1.0], [1.0], [0.0]])
    w = jnp.array([1.0, 2.0, 0.0])  # third row masked out
    got = float(_nll_loss(mean, var, y, w))
    nll0 = 0.5 * (np.log(2 * np.pi * 1.0) + 1.0)
    nll1 = 0.5 * (np.log(2 * np.pi * 4.0) + 0.0)
    expected = (1.0 * nll0 + 2.0 * nll1) / 3.0
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_bootstrap_changes_member_fits_but_not_without():
    """bootstrap=True trains members on different resamples (distinct parameters);
    bootstrap=False with identical inits would keep them in lockstep — the builder
    must therefore diversify inits, and either way the members must end distinct."""
    ds, _ = _dataset(n=30)
    model = build_deep_ensemble(ds, ensemble_size=3, num_train_steps=200)
    model.optimize(ds)
    leaves = jax.tree_util.tree_leaves(model.params.member_params)
    # member parameters differ pairwise (leading axis E)
    assert any(
        not np.allclose(leaf[0], leaf[1]) or not np.allclose(leaf[1], leaf[2])
        for leaf in leaves
    ), "ensemble members are identical after training"


def test_sample_moments_match_predict(trained_model):
    """sample() draws from the member mixture: moments over many draws approach the
    fused predict moments."""
    model, ds = trained_model
    x = jnp.array([[0.3], [-0.5]])
    S = 4000
    samples = model.sample(jax.random.PRNGKey(9), x, S)  # [S, N, 1]
    mean, var = model.predict(x)
    np.testing.assert_allclose(jnp.mean(samples, axis=0), mean, atol=0.05)
    np.testing.assert_allclose(jnp.var(samples, axis=0), var, rtol=0.25, atol=5e-3)


def test_masked_rows_do_not_affect_training():
    """Padded (masked-out) rows with junk values must not change the fit: compare a
    padded dataset against its trimmed equivalent under bootstrap=False."""
    ds, _ = _dataset(n=24)
    X = ds.trimmed_query_points
    Y = ds.trimmed_observations
    padded = Dataset.from_arrays(X, Y, capacity=40)
    # poison the padded region to catch any leakage
    qp = padded.query_points.at[24:].set(1e6)
    obs = padded.observations.at[24:].set(-1e6)
    poisoned = padded.replace(query_points=qp, observations=obs)

    from trieste_tpu.models.ensembles.deep_ensemble import GaussianMLP

    network = GaussianMLP(hidden_units=(32, 32), output_dim=1)
    k = jax.random.PRNGKey(3)
    init = jax.vmap(
        lambda kk: network.init(kk, jnp.zeros((1, 1)))["params"]
    )(jax.random.split(k, 3))
    from trieste_tpu.models.ensembles.deep_ensemble import DeepEnsembleParams

    def fit(dataset):
        params = DeepEnsembleParams(
            member_params=init,
            x_mean=jnp.zeros(1), x_std=jnp.ones(1),
            y_mean=jnp.zeros(1), y_std=jnp.ones(1),
        )
        return fit_deep_ensemble(
            jax.random.PRNGKey(5), network, params,
            dataset.query_points, dataset.observations, dataset.mask,
            ensemble_size=3, num_steps=150, bootstrap=False,
        )

    r_trim = fit(Dataset.from_arrays(X, Y, capacity=24))
    r_pad = fit(poisoned)
    np.testing.assert_allclose(float(r_trim.loss), float(r_pad.loss), rtol=1e-5)
    x = jnp.array([[0.2], [-0.7]])
    m1, v1 = ensemble_predict(network, r_trim.params, x)
    m2, v2 = ensemble_predict(network, r_pad.params, x)
    np.testing.assert_allclose(m1, m2, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(v1, v2, rtol=1e-3, atol=1e-6)
