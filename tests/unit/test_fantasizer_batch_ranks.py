"""Batch-rank fantasizing: fantasy data with leading batch dimensions and queries with
arbitrary leading dimensions, mirroring the reference's
``test_fantasize_allows_query_points_with_leading_dimensions``
(``tests/unit/acquisition/function/test_greedy_batch.py:300-364``; machinery
``trieste/acquisition/function/greedy_batch.py:714-826``).

The shape contract: fantasy ``[F..., M, D]`` + query ``[Q..., N, D]`` → predictions
``[Q..., F..., N, P]`` — each fantasy batch is an independently conditioned posterior,
all evaluated in one vmapped device program. This is what lets fantasized acquisitions
compose with vectorized (``batchify_vectorize``) optimization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.acquisition.function.greedy_batch import _FantasizedModel
from trieste_tpu.data import Dataset
from trieste_tpu.models.gp.gpr import GaussianProcessRegression
from trieste_tpu.models.gp.posterior import (
    GPRParams,
    conditional_predict_f,
    conditional_predict_joint,
)
from trieste_tpu.ops.kernels import stationary


@pytest.fixture
def model():
    x = jnp.arange(1.0, 24.0)[:, None] / 8.0  # [23, 1]
    y = jnp.sin(2.0 * x / 3.0)
    params = GPRParams(
        kernel=stationary("rbf", 1.0, [0.6]),
        noise_variance=jnp.asarray(1e-4, x.dtype),
        mean_constant=jnp.asarray(0.0, x.dtype),
    )
    ds = Dataset.from_arrays(x[:5], y[:5])
    return GaussianProcessRegression(params, ds), x, y


def test_fantasize_allows_batch_fantasy_and_query_leading_dims(model):
    model5, x, y = model
    # fantasy data with leading batch dim [3, 6, 1]
    fx = jnp.reshape(x[5:], (3, 6, 1))
    fy = jnp.reshape(jnp.sin(2.0 * x[5:] / 3.0), (3, 6, 1))
    qp = jnp.reshape(jnp.arange(1.0, 21.0)[:, None] / 20.0, (4, 5, 1))  # [4, 5, 1]

    fmodel = _FantasizedModel(model5, fantasy_X=fx, fantasy_Y=fy)

    mean_f, var_f = fmodel.predict(qp)
    mean_j, cov_j = fmodel.predict_joint(qp)
    mean_y, var_y = fmodel.predict_y(qp)
    samples = fmodel.sample(jax.random.PRNGKey(0), qp, 7)

    assert mean_f.shape == (4, 3, 5, 1)
    assert var_f.shape == (4, 3, 5, 1)
    assert cov_j.shape == (4, 3, 1, 5, 5)
    assert mean_y.shape == (4, 3, 5, 1)
    assert samples.shape == (4, 3, 7, 5, 1)

    np.testing.assert_allclose(mean_f, mean_j, atol=1e-7)
    np.testing.assert_allclose(mean_f, mean_y, atol=1e-7)
    np.testing.assert_allclose(
        var_f[..., 0], jnp.diagonal(cov_j[..., 0, :, :], axis1=-2, axis2=-1), atol=1e-7
    )
    noise = model5.get_observation_noise()
    np.testing.assert_allclose(var_y, var_f + noise, atol=1e-9)

    # every (query-slice, fantasy-batch) pair matches a direct conditional prediction
    for j in range(4):
        mean_d, var_d = conditional_predict_f(
            model5.params, model5.posterior_cache, qp[j], fx, fy
        )  # [3, 5, 1]
        np.testing.assert_allclose(mean_f[j], mean_d, atol=1e-7)
        np.testing.assert_allclose(var_f[j], var_d, atol=1e-7)
        mean_jd, cov_jd = conditional_predict_joint(
            model5.params, model5.posterior_cache, qp[j], fx, fy
        )
        np.testing.assert_allclose(cov_j[j], cov_jd, atol=1e-7)


def test_batch_fantasy_conditioning_matches_refit(model):
    """Fantasy batch b's posterior equals a fresh GPR trained on data ∪ fantasy_b."""
    model5, x, y = model
    fx = jnp.reshape(x[5:17], (2, 6, 1))
    fy = jnp.reshape(y[5:17], (2, 6, 1))
    q = jnp.linspace(0.1, 2.5, 9)[:, None]

    fmodel = _FantasizedModel(model5, fantasy_X=fx, fantasy_Y=fy)
    mean_b, var_b = fmodel.predict(q)  # [2, 9, 1]

    for b in range(2):
        full = Dataset.from_arrays(
            jnp.concatenate([x[:5], fx[b]], axis=0),
            jnp.concatenate([y[:5], fy[b]], axis=0),
        )
        refit = GaussianProcessRegression(model5.params, full)
        mean_r, var_r = refit.predict(q)
        np.testing.assert_allclose(mean_b[b], mean_r, atol=1e-5)
        np.testing.assert_allclose(var_b[b], var_r, atol=1e-5)


def test_fantasized_acquisition_composes_with_vectorized_queries(model):
    """A vectorized acquisition over V fantasy batches: query ``[N, V, D]`` where slice
    v is scored under fantasy batch v — the ``batchify_vectorize`` composition the
    reference enables via its broadcast machinery (``greedy_batch.py:479-516``)."""
    model5, x, y = model
    V, M = 3, 4
    fx = jnp.reshape(x[5 : 5 + V * M], (V, M, 1))
    fy = jnp.reshape(y[5 : 5 + V * M], (V, M, 1))
    fmodel = _FantasizedModel(model5, fantasy_X=fx, fantasy_Y=fy)

    def vectorized_nlcb(x_nvd: jax.Array) -> jax.Array:
        # [N, V, D] -> [N, V]: slice v under fantasy posterior v
        mean, var = fmodel.predict(x_nvd[:, :, None, :])  # [N, V, V, 1, 1]
        idx = jnp.arange(V)
        m = mean[:, idx, idx, 0, 0]  # align query slice v with fantasy batch v
        s = jnp.sqrt(var[:, idx, idx, 0, 0])
        return -(m - 1.96 * s)

    xs = jnp.linspace(0.0, 3.0, 8)[:, None]
    x_nvd = jnp.broadcast_to(xs[:, None, :], (8, V, 1))
    vals = vectorized_nlcb(x_nvd)
    assert vals.shape == (8, V)

    # cross-check slice v against the flat fantasized model for batch v
    for v in range(V):
        flat = _FantasizedModel(model5, fantasy_X=fx[v], fantasy_Y=fy[v])
        mean, var = flat.predict(xs)
        expected = -(mean[:, 0] - 1.96 * jnp.sqrt(var[:, 0]))
        np.testing.assert_allclose(vals[:, v], expected, atol=1e-6)


def test_flat_fantasy_model_unchanged_semantics(model):
    """Rank-2 fantasy data keeps the original (Dataset-backed) behavior."""
    model5, x, y = model
    fds = Dataset.from_arrays(x[5:11], y[5:11], capacity=6)
    via_dataset = _FantasizedModel(model5, fds)
    via_arrays = _FantasizedModel(model5, fantasy_X=x[5:11], fantasy_Y=y[5:11])
    q = jnp.linspace(0.2, 2.0, 6)[:, None]
    m1, v1 = via_dataset.predict(q)
    m2, v2 = via_arrays.predict(q)
    np.testing.assert_allclose(m1, m2, atol=1e-9)
    np.testing.assert_allclose(v1, v2, atol=1e-9)


def test_fantasized_model_requires_fantasy_inputs(model):
    model5, _, _ = model
    with pytest.raises(ValueError, match="fantasy"):
        _FantasizedModel(model5)
