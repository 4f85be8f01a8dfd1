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
from ..logging import get_tensorboard_writer, histogram, scalar
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
    mean, var = model.predict(qp)

    histogram(f"{name}/predict_mean", mean)
    scalar(f"{name}/predict_mean__mean", float(jnp.mean(mean)))
    histogram(f"{name}/predict_variance", var)
    scalar(f"{name}/predict_variance__mean", float(jnp.mean(var)))
    histogram(f"{name}/observations", obs)
    scalar(f"{name}/observations_mean", float(jnp.mean(obs)))
    scalar(f"{name}/observations_variance", float(jnp.var(obs)))

    diffs = obs.astype(mean.dtype) - mean
    z_residuals = diffs / jnp.sqrt(jnp.maximum(var, 1e-24))
    histogram(f"{name}/absolute_error", jnp.abs(diffs))
    histogram(f"{name}/z_residuals", z_residuals)
    scalar(f"{name}/root_mean_square_error", float(jnp.sqrt(jnp.mean(diffs**2))))
    scalar(f"{name}/mean_absolute_error", float(jnp.mean(jnp.abs(diffs))))
    scalar(f"{name}/z_residuals_std", float(jnp.std(z_residuals)))

    variance_error = var - diffs**2
    histogram(f"{name}/variance_error", variance_error)
    scalar(
        f"{name}/root_mean_variance_error",
        float(jnp.sqrt(jnp.mean(variance_error**2))),
    )


def write_summary_kernel_parameters(kernel, prefix: str = "") -> None:
    """Write per-parameter summaries of a stationary kernel: scalar variance and each
    ARD lengthscale (reference ``models/utils.py:76-94``)."""
    if get_tensorboard_writer() is None:
        return
    scalar(f"{prefix}kernel.variance", float(kernel.variance))
    ls = jnp.atleast_1d(kernel.lengthscales)
    if ls.shape[0] == 1:
        scalar(f"{prefix}kernel.lengthscales", float(ls[0]))
    else:
        for i in range(ls.shape[0]):
            scalar(f"{prefix}kernel.lengthscales[{i}]", float(ls[i]))


def write_summary_likelihood_parameters(noise_variance, prefix: str = "") -> None:
    """Write the likelihood (observation noise) variance summary
    (reference ``models/utils.py:96-109``)."""
    if get_tensorboard_writer() is None:
        return
    scalar(f"{prefix}likelihood.variance", float(noise_variance))
