"""Multifidelity GP models.

TPU-native rebuild of the reference's multifidelity surrogates
(``models/gpflow/models.py:1384-2057``):

* :class:`MultifidelityAutoregressive` — the Kennedy-O'Hagan AR(1) model:
  ``f_i(x) = rho_{i-1} f_{i-1}(x) + delta_i(x)`` with an independent exact GPR per level
  on the residuals and scalar ``rho`` couplings (reference ``models.py:1384-1676``).
* :class:`MultifidelityNonlinearAutoregressive` — NARGP-style: level ``i`` regresses on
  the augmented input ``[x, f_{i-1}(x)]``; predictions propagate Monte-Carlo samples
  through the level stack (reference ``models.py:1677-2057``).

Data convention (shared with the reference, ``data.py:115-204``): query points carry a
trailing fidelity column.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...data import (
    Dataset,
    add_fidelity_column,
    check_and_extract_fidelity_query_points,
    split_dataset_by_fidelity,
)
from ...types import TensorType
from .gpr import GaussianProcessRegression


def _select_by_fidelity(
    values_per_level: Sequence[jax.Array], fidelities: jax.Array
) -> jax.Array:
    """Pick per-row level outputs by the (integer) fidelity column, ``[N, 1]``."""
    stacked = jnp.stack(values_per_level, axis=0)  # [S, N, 1]
    idx = fidelities[:, 0].astype(jnp.int32)  # [N]
    return jnp.take_along_axis(
        stacked, idx[None, :, None], axis=0
    )[0]


class MultifidelityAutoregressive:
    """AR(1) multifidelity model (reference ``models.py:1384-1676``)."""

    def __init__(
        self,
        fidelity_models: Sequence[GaussianProcessRegression],
        rho: Optional[TensorType] = None,
    ):
        self._models: List[GaussianProcessRegression] = list(fidelity_models)
        S = len(self._models)
        if S < 2:
            raise ValueError(f"multifidelity models need >= 2 fidelities, got {S}")
        self.rho = (
            jnp.ones(S - 1) if rho is None else jnp.asarray(rho)
        )
        self._dataset: Optional[Dataset] = None

    @property
    def num_fidelities(self) -> int:
        return len(self._models)

    @property
    def lowest_fidelity_signal_model(self) -> GaussianProcessRegression:
        return self._models[0]

    @property
    def fidelity_residual_models(self) -> Sequence[GaussianProcessRegression]:
        return self._models[1:]

    def _level_moments(self, x: jax.Array) -> Tuple[List[jax.Array], List[jax.Array]]:
        """Mean/var of every fidelity level at plain inputs ``x [N, D]``."""
        means, variances = [], []
        m, v = self._models[0].predict(x)
        means.append(m)
        variances.append(v)
        for i, model in enumerate(self._models[1:]):
            dm, dv = model.predict(x)
            means.append(self.rho[i] * means[-1] + dm)
            variances.append(self.rho[i] ** 2 * variances[-1] + dv)
        return means, variances

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        """``[N, D+1]`` (trailing fidelity column) → per-row level predictions."""
        x, fid = check_and_extract_fidelity_query_points(
            jnp.asarray(query_points), max_fidelity=self.num_fidelities - 1
        )
        means, variances = self._level_moments(x)
        return _select_by_fidelity(means, fid), _select_by_fidelity(variances, fid)

    def covariance_with_top_fidelity(self, query_points: TensorType) -> jax.Array:
        """``cov(f_m(x), f_top(x))`` per row (reference ``models.py:1560-1610``):
        under AR(1), ``cov(f_m, f_S) = prod_{j>=m} rho_j * var(f_m)``."""
        x, fid = check_and_extract_fidelity_query_points(
            jnp.asarray(query_points), max_fidelity=self.num_fidelities - 1
        )
        _, variances = self._level_moments(x)
        S = self.num_fidelities
        covs = []
        for m_level in range(S):
            rho_prod = jnp.prod(self.rho[m_level:]) if m_level < S - 1 else jnp.asarray(1.0)
            covs.append(rho_prod * variances[m_level])
        return _select_by_fidelity(covs, fid)

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        mean, var = self.predict(query_points)
        eps = jax.random.normal(key, (num_samples,) + mean.shape, mean.dtype)
        return mean[None] + jnp.sqrt(var)[None] * eps

    def update(self, dataset: Dataset) -> None:
        """Split by fidelity and set per-level data (residuals recomputed in optimize)."""
        self._dataset = dataset

    def optimize(self, dataset: Dataset) -> None:
        """Fit level 0 on its data, then per level jointly optimize ``rho`` together with
        the residual GP's hyperparameters by marginal likelihood (the reference trains
        rho as a model parameter — ``models.py:1430-1530``)."""
        from .posterior import log_marginal_likelihood
        from .training import pack_params, randomize_starts, unpack_params
        from ...ops.lbfgs import minimize_lbfgs

        self._dataset = dataset
        per_level = split_dataset_by_fidelity(dataset, self.num_fidelities)
        m0 = self._models[0]
        m0.update(per_level[0])
        m0.optimize(per_level[0])
        rho = list(np.asarray(self.rho))
        for i, model in enumerate(self._models[1:]):
            level = i + 1
            ds_level = per_level[level]
            qp, obs = ds_level.astuple()
            prev_mean, _ = self._predict_level(qp, level - 1)
            padded = Dataset.from_arrays(qp, obs)
            prev_mean_padded = jnp.zeros(
                (padded.capacity, 1), qp.dtype
            ).at[: qp.shape[0]].set(prev_mean)
            template = model.params
            train_noise = model._train_noise

            def loss_fn(u):
                rho_u = u[0]
                gp_params = unpack_params(u[1:], template, train_noise)
                resid = padded.observations - rho_u * prev_mean_padded
                return -log_marginal_likelihood(
                    gp_params, padded.query_points, resid, padded.mask
                )

            base = jnp.concatenate(
                [jnp.asarray([rho[i]], qp.dtype), pack_params(template, train_noise)]
            )
            key = jax.random.PRNGKey(level)
            gp_starts = randomize_starts(key, template, 6, train_noise)
            rho_starts = jnp.concatenate(
                [jnp.asarray([[rho[i]]] * 3), jnp.asarray([[0.5], [1.0], [2.0]])]
            ).astype(qp.dtype)
            starts = jnp.concatenate([rho_starts, gp_starts], axis=-1)
            results = jax.vmap(
                lambda s0: minimize_lbfgs(loss_fn, s0, max_iters=100)
            )(starts)
            losses = jnp.where(jnp.isfinite(results.fun), results.fun, jnp.inf)
            best_u = results.x[jnp.argmin(losses)]
            rho[i] = float(best_u[0])
            best_gp = unpack_params(best_u[1:], template, train_noise)
            residual = obs - rho[i] * prev_mean
            res_ds = Dataset.from_arrays(qp, residual)
            model._params = best_gp
            model.update(res_ds)
        self.rho = jnp.asarray(rho)

    def _predict_level(self, x: jax.Array, level: int) -> Tuple[jax.Array, jax.Array]:
        means, variances = self._level_moments(x)
        return means[level], variances[level]

    def log(self, dataset: Optional[Dataset] = None) -> None:
        pass

    def __repr__(self) -> str:
        return f"MultifidelityAutoregressive(S={self.num_fidelities}, rho={self.rho})"


class MultifidelityNonlinearAutoregressive:
    """NARGP-style nonlinear multifidelity model (reference ``models.py:1677-2057``).

    Level 0 is a plain GPR; level ``i >= 1`` is a GPR over the augmented input
    ``[x, f_{i-1}(x)]``. Predictions propagate ``num_monte_carlo`` posterior samples
    through the stack (reference ``models.py:1879``) and report mixture moments.
    """

    def __init__(
        self,
        fidelity_models: Sequence[GaussianProcessRegression],
        num_monte_carlo: int = 32,
        *,
        key: Optional[jax.Array] = None,
    ):
        self._models = list(fidelity_models)
        if len(self._models) < 2:
            raise ValueError("need >= 2 fidelities")
        self._num_mc = num_monte_carlo
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._dataset: Optional[Dataset] = None

    @property
    def num_fidelities(self) -> int:
        return len(self._models)

    def _propagate(self, key: jax.Array, x: jax.Array) -> Tuple[List[jax.Array], List[jax.Array]]:
        """Sample-propagated per-level moments at plain inputs ``x [N, D]``."""
        keys = jax.random.split(key, self.num_fidelities)
        m0, v0 = self._models[0].predict(x)
        means, variances = [m0], [v0]
        # samples of the previous level, [S_mc, N, 1]
        eps = jax.random.normal(keys[0], (self._num_mc,) + m0.shape, m0.dtype)
        prev_samples = m0[None] + jnp.sqrt(v0)[None] * eps
        for i, model in enumerate(self._models[1:]):
            def eval_aug(prev_s):
                aug = jnp.concatenate([x, prev_s], axis=-1)
                return model.predict(aug)

            ms, vs = jax.vmap(eval_aug)(prev_samples)  # [S_mc, N, 1]
            mean_i = jnp.mean(ms, axis=0)
            var_i = jnp.mean(vs + jnp.square(ms), axis=0) - jnp.square(mean_i)
            means.append(mean_i)
            variances.append(jnp.maximum(var_i, 1e-24))
            eps = jax.random.normal(keys[i + 1], ms.shape, ms.dtype)
            prev_samples = ms + jnp.sqrt(vs) * eps
        return means, variances

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        x, fid = check_and_extract_fidelity_query_points(
            jnp.asarray(query_points), max_fidelity=self.num_fidelities - 1
        )
        self._key, sub = jax.random.split(self._key)
        means, variances = self._propagate(sub, x)
        return _select_by_fidelity(means, fid), _select_by_fidelity(variances, fid)

    def covariance_with_top_fidelity(self, query_points: TensorType) -> jax.Array:
        """MC estimate of ``cov(f_m, f_top)`` via the shared propagation samples."""
        x, fid = check_and_extract_fidelity_query_points(
            jnp.asarray(query_points), max_fidelity=self.num_fidelities - 1
        )
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self.num_fidelities)
        m0, v0 = self._models[0].predict(x)
        eps = jax.random.normal(keys[0], (self._num_mc,) + m0.shape, m0.dtype)
        level_samples = [m0[None] + jnp.sqrt(v0)[None] * eps]
        for i, model in enumerate(self._models[1:]):
            def eval_aug(prev_s):
                aug = jnp.concatenate([x, prev_s], axis=-1)
                return model.predict(aug)

            ms, vs = jax.vmap(eval_aug)(level_samples[-1])
            eps = jax.random.normal(keys[i + 1], ms.shape, ms.dtype)
            level_samples.append(ms + jnp.sqrt(vs) * eps)
        top = level_samples[-1]
        covs = []
        for m_level in range(self.num_fidelities):
            s = level_samples[m_level]
            cov = jnp.mean(s * top, axis=0) - jnp.mean(s, axis=0) * jnp.mean(top, axis=0)
            covs.append(cov)
        return _select_by_fidelity(covs, fid)

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        mean, var = self.predict(query_points)
        eps = jax.random.normal(key, (num_samples,) + mean.shape, mean.dtype)
        return mean[None] + jnp.sqrt(var)[None] * eps

    def update(self, dataset: Dataset) -> None:
        self._dataset = dataset

    def optimize(self, dataset: Dataset) -> None:
        self._dataset = dataset
        per_level = split_dataset_by_fidelity(dataset, self.num_fidelities)
        m0 = self._models[0]
        m0.update(per_level[0])
        m0.optimize(per_level[0])
        prev_models = [self._models[0]]
        for i, model in enumerate(self._models[1:]):
            qp, obs = per_level[i + 1].astuple()
            # augment with the previous level's posterior mean at the observed points
            prev_mean, _ = _chain_mean(prev_models, qp)
            aug_ds = Dataset.from_arrays(jnp.concatenate([qp, prev_mean], axis=-1), obs)
            model.update(aug_ds)
            model.optimize(aug_ds)
            prev_models.append(model)

    def log(self, dataset: Optional[Dataset] = None) -> None:
        pass


def _chain_mean(models: Sequence, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Deterministic mean propagation through a NARGP chain."""
    m, v = models[0].predict(x)
    for model in models[1:]:
        aug = jnp.concatenate([x, m], axis=-1)
        m, v = model.predict(aug)
    return m, v


def build_multifidelity_autoregressive_models(
    dataset: Dataset,
    num_fidelities: int,
    input_search_space,
    likelihood_variance: float = 1e-6,
    kernel_priors: bool = False,
) -> MultifidelityAutoregressive:
    """Builder (role of reference ``builders.py:478-560``)."""
    from .builders import build_gpr

    per_level = split_dataset_by_fidelity(dataset, num_fidelities)
    models = [
        build_gpr(
            per_level[i] if len(per_level[i]) > 0 else per_level[0],
            input_search_space,
            likelihood_variance=likelihood_variance,
        )
        for i in range(num_fidelities)
    ]
    return MultifidelityAutoregressive(models)
