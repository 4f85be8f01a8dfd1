"""Model diagnostics summaries.

TPU-native counterpart of the reference ``trieste/models/utils.py:33-109``: prediction
accuracy / calibration metrics computed from a model over its data and written through
:mod:`trieste_tpu.logging`. The kernel/likelihood-parameter writers of the reference
(``write_summary_kernel_parameters`` / ``write_summary_likelihood_parameters``) map to
the models' own ``log`` methods here, which know their pytree parameter layout.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..data import Dataset
from ..logging import (
    deferred_histogram,
    deferred_scalar,
    deferred_scalar_vector,
    get_tensorboard_writer,
)
from .interfaces import ProbabilisticModel


def write_summary_data_based_metrics(
    dataset: Dataset,
    model: ProbabilisticModel,
    prefix: str = "",
) -> None:
    """Write accuracy/calibration summaries of ``model`` evaluated on ``dataset``:
    prediction mean/variance histograms, RMSE, MAE, z-residual spread, and
    variance-calibration error (reference ``models/utils.py:33-74``)."""
    if get_tensorboard_writer() is None:
        return
    name = prefix + "accuracy"
    qp = dataset.trimmed_query_points
    obs = dataset.trimmed_observations
    if qp.shape[0] == 0:
        return
    # one jitted device program for ALL metrics (the model's predict closure rides in
    # as a Partial pytree argument, so different models / data shapes each compile
    # once); eagerly dispatching the ~16 small ops individually costs a round trip
    # per op on a remote dispatch link
    predict = (
        model.predict_partial() if hasattr(model, "predict_partial") else model.predict
    )
    try:
        outs = _jit_metrics(predict, qp, obs)
    except Exception:  # noqa: BLE001 — unjittable predict closure: fall back to eager
        outs = _metrics_impl(predict, qp, obs)
    (mean, var, scalars, abs_diffs, z_residuals, variance_error) = outs

    deferred_histogram(f"{name}/predict_mean", mean)
    deferred_histogram(f"{name}/predict_variance", var)
    deferred_histogram(f"{name}/observations", obs)
    deferred_histogram(f"{name}/absolute_error", abs_diffs)
    deferred_histogram(f"{name}/z_residuals", z_residuals)
    deferred_histogram(f"{name}/variance_error", variance_error)
    deferred_scalar_vector(
        [
            f"{name}/predict_mean__mean",
            f"{name}/predict_variance__mean",
            f"{name}/observations_mean",
            f"{name}/observations_variance",
            f"{name}/root_mean_square_error",
            f"{name}/mean_absolute_error",
            f"{name}/z_residuals_std",
            f"{name}/root_mean_variance_error",
        ],
        scalars,
    )


def _metrics_impl(predict, qp, obs):
    mean, var = predict(qp)
    diffs = obs.astype(mean.dtype) - mean
    z_residuals = diffs / jnp.sqrt(jnp.maximum(var, 1e-24))
    variance_error = var - diffs**2
    scalars = jnp.stack(
        [
            jnp.mean(mean),
            jnp.mean(var),
            jnp.mean(obs),
            jnp.var(obs),
            jnp.sqrt(jnp.mean(diffs**2)),
            jnp.mean(jnp.abs(diffs)),
            jnp.std(z_residuals),
            jnp.sqrt(jnp.mean(variance_error**2)),
        ]
    )
    return mean, var, scalars, jnp.abs(diffs), z_residuals, variance_error


import jax as _jax

_jit_metrics = _jax.jit(_metrics_impl)


def write_summary_kernel_parameters(kernel, prefix: str = "") -> None:
    """Write per-parameter summaries of a stationary kernel: scalar variance and each
    ARD lengthscale (reference ``models/utils.py:76-94``)."""
    if get_tensorboard_writer() is None:
        return
    deferred_scalar(f"{prefix}kernel.variance", kernel.variance)
    ls = jnp.atleast_1d(kernel.lengthscales)
    if ls.shape[0] == 1:
        deferred_scalar(f"{prefix}kernel.lengthscales", ls[0])
    else:
        for i in range(ls.shape[0]):
            deferred_scalar(f"{prefix}kernel.lengthscales[{i}]", ls[i])


def write_summary_likelihood_parameters(noise_variance, prefix: str = "") -> None:
    """Write the likelihood (observation noise) variance summary
    (reference ``models/utils.py:96-109``)."""
    if get_tensorboard_writer() is None:
        return
    deferred_scalar(f"{prefix}likelihood.variance", jnp.asarray(noise_variance))
