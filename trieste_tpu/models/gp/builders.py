"""Model builders with sensible defaults.

TPU-native counterpart of the reference's ``trieste/models/gpflow/builders.py:85-657``
(``build_gpr`` etc.): constructs a GPR whose kernel hyperparameters are scaled to the
search space and the observed data, so optimization starts from a reasonable basin.

Examples:

>>> import jax, jax.numpy as jnp
>>> from trieste_tpu.data import Dataset
>>> from trieste_tpu.models.gp import build_gpr
>>> from trieste_tpu.space import Box
>>> X = jnp.array([[0.1, 0.2], [0.5, 0.6], [0.9, 0.3]])
>>> ds = Dataset.from_arrays(X, jnp.sum(X, axis=-1, keepdims=True))
>>> model = build_gpr(ds, Box([0.0, 0.0], [1.0, 1.0]))
>>> mean, var = model.predict(jnp.array([[0.4, 0.4]]))
>>> mean.shape, var.shape
((1, 1), (1, 1))
>>> bool(jnp.all(var > 0))
True
>>> model.get_kernel().lengthscales.shape  # per-dimension ARD lengthscales
(2,)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...data import Dataset
from ...space import SearchSpace
from ...ops.kernels import MATERN52, stationary
from .gpr import GaussianProcessRegression
from .posterior import GPRParams
from .priors import KERNEL_PRIOR_SCALE, GPPriors, default_priors

NUM_INDUCING_POINTS_PER_DIM = 25
"""Default inducing points per input dimension (role of reference ``builders.py:66-73``)."""

SIGNAL_NOISE_RATIO_LIKELIHOOD = 10.0
"""Default signal-to-noise ratio used to initialize the likelihood variance
(role of reference ``builders.py:75-83``)."""

KERNEL_LENGTHSCALE = 0.2
"""Initial lengthscales: ``0.2 · extent · √D`` per dimension (reference
``_get_lengthscales``, ``builders.py:413-424``)."""

MAX_NUM_INDUCING_POINTS = 500
"""Cap on the default inducing-point count (reference ``builders.py:65``)."""

CLASSIFICATION_KERNEL_VARIANCE_NOISE_FREE = 100.0
"""Default classification kernel variance, noise-free case (reference ``builders.py:53``)."""

CLASSIFICATION_KERNEL_VARIANCE = 1.0
"""Default classification kernel variance (reference ``builders.py:59``)."""


def default_gpr_params(
    dataset: Dataset,
    search_space: SearchSpace,
    *,
    kernel_kind: str = MATERN52,
    likelihood_variance: Optional[float] = None,
) -> GPRParams:
    """Data- and space-scaled initial hyperparameters (reference ``builders.py:85-200``)."""
    import math

    y = dataset.trimmed_observations
    dtype = dataset.query_points.dtype
    y_var = jnp.maximum(jnp.var(y), 1e-6) if y.shape[0] > 1 else jnp.asarray(1.0, dtype)
    y_mean = jnp.mean(y) if y.shape[0] > 0 else jnp.asarray(0.0, dtype)
    extent = (search_space.upper - search_space.lower).astype(dtype)
    lengthscales = KERNEL_LENGTHSCALE * extent * math.sqrt(search_space.dimension)
    # collapsed dimensions get a unit lengthscale (reference builders.py:418-423)
    lengthscales = jnp.where(extent == 0.0, jnp.asarray(1.0, dtype), lengthscales)
    if likelihood_variance is None:
        noise = y_var / (SIGNAL_NOISE_RATIO_LIKELIHOOD**2)
    else:
        noise = jnp.asarray(likelihood_variance, dtype)
    kernel = stationary(kernel_kind, variance=float(y_var), lengthscales=lengthscales, dtype=dtype)
    return GPRParams(
        kernel=kernel,
        noise_variance=jnp.asarray(noise, dtype),
        mean_constant=jnp.asarray(y_mean, dtype),
    )


def build_gpr(
    dataset: Dataset,
    search_space: SearchSpace,
    *,
    kernel_kind: str = MATERN52,
    kernel_priors: bool = True,
    likelihood_variance: Optional[float] = None,
    trainable_likelihood: bool = False,
    num_kernel_samples: int = 10,
    num_rff_features: int = 1000,
    optimize_key: Optional[jax.Array] = None,
) -> GaussianProcessRegression:
    """Build a :class:`GaussianProcessRegression` with defaults matching the role of the
    reference's ``build_gpr`` (``builders.py:85-155``): Matérn-5/2 ARD kernel scaled to
    the space, LogNormal MAP priors on the kernel hyperparameters (``kernel_priors=True``,
    the fit stabilizer — reference ``builders.py:391-411``), likelihood variance from a
    10:1 signal-to-noise ratio (or fixed if given) and, like the reference,
    **non-trainable by default** (``builders.py:90``)."""
    params = default_gpr_params(
        dataset, search_space, kernel_kind=kernel_kind, likelihood_variance=likelihood_variance
    )
    priors = default_priors(params.kernel, KERNEL_PRIOR_SCALE) if kernel_priors else None
    return GaussianProcessRegression(
        params,
        dataset,
        num_kernel_samples=num_kernel_samples,
        train_noise=trainable_likelihood,
        num_rff_features=num_rff_features,
        optimize_key=optimize_key,
        priors=priors,
    )


def build_sgpr(
    dataset: Dataset,
    search_space: SearchSpace,
    *,
    kernel_kind: str = MATERN52,
    kernel_priors: bool = True,
    likelihood_variance: Optional[float] = None,
    trainable_likelihood: bool = False,
    num_inducing_points: Optional[int] = None,
    trainable_inducing: bool = True,
    inducing_point_selector: Optional[object] = None,
    optimize_key: Optional[jax.Array] = None,
):
    """Build a :class:`SparseGaussianProcessRegression` (role of reference
    ``builders.py:158-279``): Matérn-5/2 ARD kernel with MAP priors, inducing points
    initialized by k-means over the data (uniform if too few points)."""
    from .inducing_points import KMeansInducingPointSelector
    from .sparse import SGPRParams, SparseGaussianProcessRegression

    base = default_gpr_params(
        dataset, search_space, kernel_kind=kernel_kind, likelihood_variance=likelihood_variance
    )
    priors = default_priors(base.kernel, KERNEL_PRIOR_SCALE) if kernel_priors else None
    M = num_inducing_points or min(
        NUM_INDUCING_POINTS_PER_DIM * search_space.dimension, MAX_NUM_INDUCING_POINTS
    )
    selector = inducing_point_selector
    Z0 = KMeansInducingPointSelector(key=jax.random.PRNGKey(7))._recalculate_inducing_points(
        M, None, dataset
    )
    params = SGPRParams(
        kernel=base.kernel,
        noise_variance=base.noise_variance,
        mean_constant=base.mean_constant,
        inducing_points=Z0,
    )
    return SparseGaussianProcessRegression(
        params,
        dataset,
        inducing_point_selector=selector,
        train_noise=trainable_likelihood,
        train_inducing=trainable_inducing,
        optimize_key=optimize_key,
        priors=priors,
    )


def build_svgp(
    dataset: Dataset,
    search_space: SearchSpace,
    *,
    kernel_kind: str = MATERN52,
    kernel_priors: bool = True,
    likelihood_variance: Optional[float] = None,
    trainable_likelihood: bool = False,
    num_inducing_points: Optional[int] = None,
    inducing_point_selector: Optional[object] = None,
    optimize_key: Optional[jax.Array] = None,
    minibatch_size: Optional[int] = None,
    minibatch_iters: int = 500,
    learning_rate: float = 0.05,
):
    """Build a :class:`SparseVariational` SVGP (role of reference ``builders.py:282-381``).

    ``minibatch_size`` selects Adam minibatch training (the reference's
    ``BatchOptimizer`` path, ``models/optimizer.py:101-177``) for large datasets."""
    import jax.numpy as jnp

    from .inducing_points import KMeansInducingPointSelector
    from .sparse import SVGPParams, SparseVariational

    base = default_gpr_params(
        dataset, search_space, kernel_kind=kernel_kind, likelihood_variance=likelihood_variance
    )
    priors = default_priors(base.kernel, KERNEL_PRIOR_SCALE) if kernel_priors else None
    M = num_inducing_points or min(
        NUM_INDUCING_POINTS_PER_DIM * search_space.dimension, MAX_NUM_INDUCING_POINTS
    )
    Z0 = KMeansInducingPointSelector(key=jax.random.PRNGKey(9))._recalculate_inducing_points(
        M, None, dataset
    )
    P = dataset.num_outputs
    dtype = dataset.query_points.dtype
    params = SVGPParams(
        kernel=base.kernel,
        noise_variance=base.noise_variance,
        mean_constant=base.mean_constant,
        inducing_points=Z0,
        q_mu=jnp.zeros((Z0.shape[0], P), dtype),
        q_sqrt=jnp.broadcast_to(jnp.eye(Z0.shape[0], dtype=dtype)[None], (P, Z0.shape[0], Z0.shape[0])),
    )
    return SparseVariational(
        params,
        dataset,
        inducing_point_selector=inducing_point_selector,
        train_noise=trainable_likelihood,
        optimize_key=optimize_key,
        priors=priors,
        minibatch_size=minibatch_size,
        minibatch_iters=minibatch_iters,
        learning_rate=learning_rate,
    )
