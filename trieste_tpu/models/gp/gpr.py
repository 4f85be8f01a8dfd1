"""Exact Gaussian-process-regression model.

TPU-native counterpart of the reference's ``GaussianProcessRegression`` wrapper
(``models/gpflow/models.py:69-527``). The object is a thin mutable shell over immutable
pytree state (``GPRParams`` + padded data + ``GPRCache``); every numeric method calls a
jitted pure function, so repeated BO steps at the same data capacity never recompile (the
role of the reference's dynamic-shape ``tf.Variable`` trick, ``models.py:146-166``).

``optimize`` runs vmapped multi-start L-BFGS on device (see
:mod:`trieste_tpu.models.gp.training`) instead of scipy, covering the reference's
``find_best_model_initialization(num_kernel_samples)`` + Scipy L-BFGS pipeline
(``models.py:256-322``).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ...data import Dataset
from ...types import TensorType
from ..interfaces import (
    FastUpdateModel,
    HasReparamSampler,
    HasTrajectorySampler,
    ProbabilisticModel,
    ReparametrizationSampler,
    TrajectorySampler,
)
from . import posterior as P
from .priors import GPPriors
from .training import GPRTrainingResult, fit_gpr


@partial(jax.jit, static_argnames=("num_starts", "train_noise", "max_iters", "pool_sharding"))
def _jit_fit(key, params, X, Y, mask, priors, num_starts, train_noise, max_iters, pool_sharding):
    return fit_gpr(
        key, params, X, Y, mask,
        num_starts=num_starts, train_noise=train_noise, max_iters=max_iters,
        pool_sharding=pool_sharding, priors=priors,
    )


def _linvt_ok(params) -> bool:
    """Eager tiny-noise gate for the fused-path triangular inverse.

    The fused Pallas kernel's bf16-split variance is a ~2⁻¹⁶·‖K‖‖L⁻ᵀ‖ ABSOLUTE
    contract (``ops/fused_predict.py``): with a noise/signal ratio below 1e-5 the true
    posterior variance near data is smaller than that error, collapsing e.g. LCB-family
    acquisitions onto already-observed points (observed as monlcb's NaN death spiral on
    TPU). ``can_fuse`` can only check this when values are concrete — under ``jit`` the
    noise is a tracer — so the decision is made HERE, eagerly at cache-build time where
    the fitted hyperparameters are always concrete: skip ``LinvT`` entirely (also
    skipping its O(C³) build) and prediction dispatches to the exact XLA path."""
    try:
        noise = float(params.noise_variance)
        variance = float(params.kernel.variance)
    except (TypeError, jax.errors.TracerArrayConversionError):
        return False  # traced params: no eager information, take the exact path
    return noise / max(variance, 1e-30) >= 1e-5


@partial(jax.jit, static_argnames="with_linvt")
def _jit_cache(params, X, Y, mask, with_linvt=True):
    return P.build_cache(params, X, Y, mask, with_linvt=with_linvt)


class GaussianProcessRegression:
    """Exact GPR with a Gaussian likelihood and constant mean function.

    Implements ``TrainableProbabilisticModel``, ``SupportsPredictJoint``,
    ``SupportsPredictY``, ``SupportsGetKernel/ObservationNoise/InternalData/MeanFunction``,
    ``SupportsCovarianceBetweenPoints``, ``FastUpdateModel``, ``HasTrajectorySampler`` and
    ``HasReparamSampler`` (reference capability set of ``models/gpflow/models.py:69``).
    """

    def __init__(
        self,
        params: P.GPRParams,
        dataset: Dataset,
        *,
        num_kernel_samples: int = 10,
        train_noise: bool = True,
        max_optimize_iters: int = 100,
        num_rff_features: int = 1000,
        optimize_key: Optional[jax.Array] = None,
        priors: Optional["GPPriors"] = None,
    ):
        self._params = params
        self._dataset = dataset
        self._num_kernel_samples = num_kernel_samples
        self._train_noise = train_noise
        self._max_optimize_iters = max_optimize_iters
        self._num_rff_features = num_rff_features
        self._priors = priors
        self._key = optimize_key if optimize_key is not None else jax.random.PRNGKey(0)
        self._cache = _jit_cache(
            params, dataset.query_points, dataset.observations, dataset.mask,
            with_linvt=_linvt_ok(params),
        )

    # -- state accessors ------------------------------------------------------------

    @property
    def params(self) -> P.GPRParams:
        return self._params

    @property
    def posterior_cache(self) -> P.GPRCache:
        return self._cache

    def get_kernel(self) -> Any:
        return self._params.kernel

    def get_observation_noise(self) -> jax.Array:
        return self._params.noise_variance

    def get_internal_data(self) -> Dataset:
        return self._dataset

    def get_mean_function(self) -> Callable[[TensorType], jax.Array]:
        c = self._params.mean_constant

        def mean_fn(x: TensorType) -> jax.Array:
            x = jnp.asarray(x)
            return jnp.broadcast_to(c, x.shape[:-1] + (1,))

        return mean_fn

    @property
    def num_rff_features(self) -> int:
        return self._num_rff_features

    # -- predictions ----------------------------------------------------------------

    def predict_partial(self):
        """Marginal prediction as a pytree ``Partial`` (pure fn + current state): lets
        acquisition Partials rebind new model state each BO step without retracing."""
        from jax.tree_util import Partial

        return Partial(P.predict_f, self._params, self._cache)

    def predict_joint_partial(self):
        from jax.tree_util import Partial

        return Partial(P.predict_joint, self._params, self._cache)

    def sample_joint_partial(self, num_samples: int, key: jax.Array):
        """Joint reparametrization sampling as a pure pytree Partial with frozen base
        randomness (see ``pure_batch_reparam_sample``)."""
        from jax.tree_util import Partial

        from .sampler import pure_batch_reparam_sample

        s_token = jnp.zeros((num_samples,), self._cache.X.dtype)
        return Partial(pure_batch_reparam_sample, self._params, self._cache, key, s_token)

    def sample_marginal_partial(self, num_samples: int, key: jax.Array):
        from jax.tree_util import Partial

        from .sampler import pure_marginal_reparam_sample

        s_token = jnp.zeros((num_samples,), self._cache.X.dtype)
        return Partial(
            pure_marginal_reparam_sample, self._params, self._cache, key, s_token
        )

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return _predict_f(self._params, self._cache, jnp.asarray(query_points))

    def predict_joint(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return _predict_joint(self._params, self._cache, jnp.asarray(query_points))

    def predict_y(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return _predict_y(self._params, self._cache, jnp.asarray(query_points))

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        return _sample(
            key, self._params, self._cache, jnp.asarray(query_points), num_samples
        )

    def covariance_between_points(
        self, query_points_1: TensorType, query_points_2: TensorType
    ) -> jax.Array:
        return _cov_between(
            self._params, self._cache, jnp.asarray(query_points_1), jnp.asarray(query_points_2)
        )

    # -- fast updates (fantasizing) ---------------------------------------------------

    def conditional_predict_f(
        self, query_points: TensorType, additional_data: Dataset
    ) -> Tuple[jax.Array, jax.Array]:
        return _cond_predict_f(
            self._params, self._cache, jnp.asarray(query_points),
            additional_data.trimmed_query_points, additional_data.trimmed_observations,
        )

    def conditional_predict_joint(
        self, query_points: TensorType, additional_data: Dataset
    ) -> Tuple[jax.Array, jax.Array]:
        return _cond_predict_joint(
            self._params, self._cache, jnp.asarray(query_points),
            additional_data.trimmed_query_points, additional_data.trimmed_observations,
        )

    def conditional_predict_y(
        self, query_points: TensorType, additional_data: Dataset
    ) -> Tuple[jax.Array, jax.Array]:
        return _cond_predict_y(
            self._params, self._cache, jnp.asarray(query_points),
            additional_data.trimmed_query_points, additional_data.trimmed_observations,
        )

    def conditional_predict_f_sample(
        self,
        key: jax.Array,
        query_points: TensorType,
        additional_data: Dataset,
        num_samples: int,
    ) -> jax.Array:
        return _cond_sample(
            key, self._params, self._cache, jnp.asarray(query_points),
            additional_data.trimmed_query_points, additional_data.trimmed_observations,
            num_samples,
        )

    # -- training ---------------------------------------------------------------------

    def update(self, dataset: Dataset) -> None:
        """Set the data and refresh the posterior cache (reference ``models.py:228-254``)."""
        if dataset.dimension != self._dataset.dimension:
            raise ValueError(
                f"dataset dimension {dataset.dimension} != model dimension "
                f"{self._dataset.dimension}"
            )
        if dataset.num_outputs != self._dataset.num_outputs:
            raise ValueError(
                f"dataset has {dataset.num_outputs} outputs, model has "
                f"{self._dataset.num_outputs}"
            )
        self._dataset = dataset
        self._cache = _jit_cache(
            self._params, dataset.query_points, dataset.observations, dataset.mask,
            with_linvt=_linvt_ok(self._params),
        )

    def optimize(self, dataset: Dataset) -> GPRTrainingResult:
        """Multi-start maximum-likelihood training (reference ``models.py:256-322``).

        When a global mesh is active (:mod:`trieste_tpu.parallel`) the restart pool is
        rounded up to the mesh size and sharded across devices."""
        from ...parallel.mesh import current_pool_sharding, round_to_mesh

        self._key, subkey = jax.random.split(self._key)
        result = _jit_fit(
            subkey,
            self._params,
            dataset.query_points,
            dataset.observations,
            dataset.mask,
            self._priors,
            round_to_mesh(self._num_kernel_samples),
            self._train_noise,
            self._max_optimize_iters,
            current_pool_sharding(),
        )
        self._params = result.params
        self._dataset = dataset
        self._cache = _jit_cache(
            result.params, dataset.query_points, dataset.observations, dataset.mask,
            with_linvt=_linvt_ok(result.params),
        )
        return result

    # -- samplers ----------------------------------------------------------------------

    def reparam_sampler(self, num_samples: int) -> ReparametrizationSampler:
        from .sampler import BatchReparametrizationSampler

        return BatchReparametrizationSampler(num_samples, self)

    def trajectory_sampler(self) -> TrajectorySampler:
        from .sampler import RandomFourierFeatureTrajectorySampler

        return RandomFourierFeatureTrajectorySampler(self, self._num_rff_features)

    # -- misc --------------------------------------------------------------------------

    def log(self, dataset: Optional[Dataset] = None) -> None:
        from ...logging import deferred_scalar, get_tensorboard_writer

        if get_tensorboard_writer() is None:
            return
        # device values queued for the loop's per-step flush (one packed fetch);
        # the vector form avoids even the per-lengthscale slice dispatches
        from ...logging import deferred_scalar_vector

        deferred_scalar("kernel.variance", self._params.kernel.variance)
        ls = self._params.kernel.lengthscales
        if ls.ndim == 0:
            deferred_scalar("kernel.lengthscale[0]", ls)
        else:
            deferred_scalar_vector(
                [f"kernel.lengthscale[{i}]" for i in range(ls.shape[0])], ls
            )
        deferred_scalar("likelihood.variance", self._params.noise_variance)
        if dataset is not None:
            from ..utils import write_summary_data_based_metrics

            write_summary_data_based_metrics(dataset, self)

    def __repr__(self) -> str:
        return (
            f"GaussianProcessRegression(kernel={self._params.kernel.kind}, "
            f"n={len(self._dataset)})"
        )


# Module-level jitted kernels shared across model instances.
_predict_f = jax.jit(P.predict_f)
_predict_joint = jax.jit(P.predict_joint)
_predict_y = jax.jit(P.predict_y)
_sample = jax.jit(P.sample_joint, static_argnames="num_samples")
_cov_between = jax.jit(P.covariance_between_points)
_cond_predict_f = jax.jit(P.conditional_predict_f)
_cond_predict_joint = jax.jit(P.conditional_predict_joint)
_cond_predict_y = jax.jit(P.conditional_predict_y)
_cond_sample = jax.jit(P.conditional_predict_f_sample, static_argnames="num_samples")
