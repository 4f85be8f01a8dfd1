"""The fused Pallas prediction kernel must match the pure-XLA reference to the
3-pass bf16-split contract (~2**-16 of the contraction operand norms).

Runs the kernel through the Pallas interpreter on CPU (the driver's bench exercises the
compiled path on the real chip). Mirrors the reference's closed-form prediction tests
(``tests/unit/models/gpflow/test_models.py``) at the fused-kernel level.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trieste_tpu.data import Dataset
from trieste_tpu.models.gp.posterior import (
    GPRParams,
    build_cache,
    predict_f,
    predict_f_reference,
)
from trieste_tpu.ops import fused_predict
from trieste_tpu.ops.kernels import stationary


@pytest.fixture()
def interpreted_pallas(monkeypatch):
    monkeypatch.setattr(fused_predict, "FORCE_INTERPRET", True)
    monkeypatch.setattr(fused_predict, "MIN_POINTS", 8)


def _state(kind: str, n: int = 37, d: int = 3, p: int = 2):
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (n, d), dtype=jnp.float32)
    Y = jnp.stack(
        [jnp.sum(jnp.square(X - 0.3), -1), jnp.sum(X, -1)], axis=-1
    ).astype(jnp.float32)[:, :p]
    ds = Dataset.from_arrays(X, Y)
    params = GPRParams(
        kernel=stationary(kind, 1.7, [0.4, 0.6, 0.5][:d], dtype=jnp.float32),
        noise_variance=jnp.asarray(1e-3, jnp.float32),
        mean_constant=jnp.asarray(0.25, jnp.float32),
    )
    cache = build_cache(params, ds.query_points, ds.observations, ds.mask)
    return params, cache


@pytest.mark.parametrize("kind", ["rbf", "matern12", "matern32", "matern52"])
def test_fused_matches_reference(interpreted_pallas, kind):
    params, cache = _state(kind)
    x = jax.random.uniform(jax.random.PRNGKey(7), (130, 3), dtype=jnp.float32)
    assert fused_predict.can_fuse(params, cache, x)
    mean_f, var_f = fused_predict.fused_predict_f(params, cache, x)
    mean_r, var_r = predict_f_reference(params, cache, x)
    np.testing.assert_allclose(mean_f, mean_r, rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(var_f, var_r, rtol=5e-3, atol=3e-4)


def test_dispatch_uses_fused_and_grads_flow(interpreted_pallas):
    params, cache = _state("matern52", p=1)
    x = jax.random.uniform(jax.random.PRNGKey(3), (64, 3), dtype=jnp.float32)
    mean, var = predict_f(params, cache, x)
    mean_r, var_r = predict_f_reference(params, cache, x)
    np.testing.assert_allclose(mean, mean_r, rtol=1e-3, atol=3e-4)
    np.testing.assert_allclose(var, var_r, rtol=5e-3, atol=3e-4)

    # gradients must route through the pure-XLA backward even when the forward fuses
    def summary(q):
        m, v = predict_f(params, cache, q)
        return jnp.sum(m) + jnp.sum(jnp.sqrt(v))

    def summary_ref(q):
        m, v = predict_f_reference(params, cache, q)
        return jnp.sum(m) + jnp.sum(jnp.sqrt(v))

    g = jax.grad(summary)(x)
    g_ref = jax.grad(summary_ref)(x)
    np.testing.assert_allclose(g, g_ref, rtol=5e-3, atol=1e-4)


def test_small_pools_and_f64_fall_back(interpreted_pallas):
    params, cache = _state("rbf")
    # positive control FIRST: with the interpreter forced and the pool large enough,
    # the gate is open — so each negative below exercises its own condition
    x = jnp.zeros((4096, 3), jnp.float32)
    assert fused_predict.can_fuse(params, cache, x)
    x_small = jnp.zeros((4, 3), jnp.float32)
    assert not fused_predict.can_fuse(params, cache, x_small)
    x64 = jnp.zeros((4096, 3), jnp.float64)
    assert not fused_predict.can_fuse(params, cache, x64)
    # missing LinvT disables the fast path
    cache_no_inv = cache.replace(LinvT=None)
    assert not fused_predict.can_fuse(params, cache_no_inv, x)
    # capacity beyond the VMEM budget disables it
    big = jnp.zeros((fused_predict._MAX_TRAIN + 1, 3), jnp.float32)
    cache_big = cache.replace(
        X=big, mask=jnp.zeros(big.shape[0], bool), L=jnp.eye(big.shape[0], dtype=jnp.float32),
        alpha=jnp.zeros((big.shape[0], 2), jnp.float32),
        LinvT=jnp.eye(big.shape[0], dtype=jnp.float32),
    )
    assert not fused_predict.can_fuse(params, cache_big, x)


def test_low_noise_conditioning_falls_back(interpreted_pallas):
    """The bf16-split variance contract is meaningless below ~2^-16 of the signal; a
    concrete noise/signal ratio under 1e-5 must take the exact XLA path."""
    params, cache = _state("rbf")
    x = jnp.zeros((4096, 3), jnp.float32)
    assert fused_predict.can_fuse(params, cache, x)  # noise 1e-3 / signal 1.7 is fine
    low_noise = params.replace(noise_variance=jnp.asarray(1e-7, jnp.float32))
    assert not fused_predict.can_fuse(low_noise, cache, x)


def test_vmapped_model_state_falls_back(interpreted_pallas):
    """Under vmap over stacked params/caches the per-example ndim looks unbatched; the
    batch-tracer detection must still route to the XLA reference (no Pallas batching)."""
    params, cache = _state("rbf", p=1)
    stack = lambda t: jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), t)
    params2, cache2 = stack(params), stack(cache)
    x = jax.random.uniform(jax.random.PRNGKey(5), (4096, 3), dtype=jnp.float32)

    calls = {"fused": 0}
    orig = fused_predict.fused_predict_f

    def counting(*args):
        calls["fused"] += 1
        return orig(*args)

    fused_predict.fused_predict_f = counting
    try:
        mean, var = jax.vmap(predict_f, in_axes=(0, 0, None))(params2, cache2, x)
    finally:
        fused_predict.fused_predict_f = orig
    assert calls["fused"] == 0
    mean_r, var_r = predict_f_reference(params, cache, x)
    np.testing.assert_allclose(mean[0], mean_r, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(var[0], var_r, rtol=1e-5, atol=1e-7)


def test_padding_independence(interpreted_pallas):
    """Tile/capacity padding must not change results: compare two capacities."""
    key = jax.random.PRNGKey(1)
    X = jax.random.uniform(key, (20, 2), dtype=jnp.float32)
    Y = jnp.sum(jnp.square(X), -1, keepdims=True).astype(jnp.float32)
    params = GPRParams(
        kernel=stationary("matern32", 1.0, [0.5, 0.5], dtype=jnp.float32),
        noise_variance=jnp.asarray(1e-4, jnp.float32),
        mean_constant=jnp.asarray(0.0, jnp.float32),
    )
    x = jax.random.uniform(jax.random.PRNGKey(9), (33, 2), dtype=jnp.float32)
    outs = []
    for cap in (32, 256):
        ds = Dataset.from_arrays(X, Y, capacity=cap)
        cache = build_cache(params, ds.query_points, ds.observations, ds.mask)
        outs.append(fused_predict.fused_predict_f(params, cache, x))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-3, atol=1e-6)
