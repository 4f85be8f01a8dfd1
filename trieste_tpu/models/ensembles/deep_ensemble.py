"""Deep ensembles of probabilistic MLPs.

TPU-native rebuild of the reference's Keras deep ensembles
(``trieste/models/keras``): the reference builds E separate Keras models trained
sequentially (``architectures.py:40-171``, ``models.py:253-361``); here a single flax
``GaussianMLP`` is **vmapped over an ensemble axis** — one pytree with a leading ``[E]``
dimension on every parameter, trained by one jitted Adam ``lax.scan`` for all members
simultaneously (each on its own bootstrap resample, reference ``prepare_dataset``
``models.py:201-252``). The ensemble axis is a shard axis under pjit.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ...data import Dataset
from ...types import TensorType
from ..interfaces import (
    ReparametrizationSampler,
    TrajectoryFunction,
    TrajectoryFunctionClass,
    TrajectorySampler,
)


class GaussianMLP(nn.Module):
    """An MLP with an independent-Gaussian head: outputs ``(mean, variance)``
    (role of reference ``GaussianNetwork``, ``architectures.py:260-370``)."""

    hidden_units: Sequence[int] = (25, 25)
    output_dim: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        for h in self.hidden_units:
            x = nn.relu(nn.Dense(h)(x))
        mean = nn.Dense(self.output_dim)(x)
        raw_var = nn.Dense(self.output_dim)(x)
        var = jax.nn.softplus(raw_var) + 1e-6
        return mean, var


@struct.dataclass
class DeepEnsembleParams:
    """Stacked member parameters (leading ``[E]`` axis on every leaf) + normalization."""

    member_params: Any
    x_mean: jax.Array
    x_std: jax.Array
    y_mean: jax.Array
    y_std: jax.Array


def _nll_loss(mean: jax.Array, var: jax.Array, y: jax.Array, w: jax.Array) -> jax.Array:
    """Masked Gaussian negative log likelihood (reference ``utils.py:125``)."""
    nll = 0.5 * (jnp.log(2.0 * jnp.pi * var) + jnp.square(y - mean) / var)
    return jnp.sum(nll * w[:, None]) / jnp.maximum(jnp.sum(w), 1.0)


class DeepEnsembleTrainingResult(NamedTuple):
    params: DeepEnsembleParams
    loss: jax.Array


def _normalize(params: DeepEnsembleParams, x: jax.Array) -> jax.Array:
    return (x - params.x_mean) / params.x_std


def ensemble_member_predict(
    network: GaussianMLP, params: DeepEnsembleParams, x: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Per-member predictions ``[E, N, L]`` (denormalized)."""
    xn = _normalize(params, x)
    mean, var = jax.vmap(lambda p: network.apply({"params": p}, xn))(
        params.member_params
    )
    return (
        mean * params.y_std + params.y_mean,
        var * jnp.square(params.y_std),
    )


def ensemble_predict(
    network: GaussianMLP, params: DeepEnsembleParams, x: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Gaussian-mixture moments over members (reference ``models.py:253-321``):
    ``[..., D] -> mean [..., L], var [..., L]``."""
    x = jnp.asarray(x)
    lead = x.shape[:-1]
    flat = jnp.reshape(x, (-1, x.shape[-1]))
    means, vars_ = ensemble_member_predict(network, params, flat)  # [E, N, L]
    mix_mean = jnp.mean(means, axis=0)
    mix_var = jnp.mean(vars_ + jnp.square(means), axis=0) - jnp.square(mix_mean)
    mix_var = jnp.maximum(mix_var, 1e-12)
    return (
        jnp.reshape(mix_mean, lead + mix_mean.shape[-1:]),
        jnp.reshape(mix_var, lead + mix_var.shape[-1:]),
    )


@partial(
    jax.jit,
    static_argnames=("network", "ensemble_size", "num_steps", "bootstrap"),
)
def fit_deep_ensemble(
    key: jax.Array,
    network: GaussianMLP,
    params: DeepEnsembleParams,
    X: jax.Array,
    Y: jax.Array,
    mask: jax.Array,
    *,
    ensemble_size: int,
    num_steps: int = 1000,
    learning_rate: float = 0.01,
    bootstrap: bool = True,
) -> DeepEnsembleTrainingResult:
    """Train all members simultaneously: vmapped Adam over the ensemble axis, each member
    weighting the data by a bootstrap resample (reference ``models.py:201-252,362-418``)."""
    C = X.shape[0]
    m = mask.astype(X.dtype)
    n = jnp.sum(m)
    # normalization from the valid rows
    x_mean = jnp.sum(X * m[:, None], axis=0) / jnp.maximum(n, 1.0)
    x_var = jnp.sum(jnp.square(X - x_mean) * m[:, None], axis=0) / jnp.maximum(n, 1.0)
    x_std = jnp.sqrt(jnp.maximum(x_var, 1e-12))
    y_mean = jnp.sum(Y * m[:, None], axis=0) / jnp.maximum(n, 1.0)
    y_var = jnp.sum(jnp.square(Y - y_mean) * m[:, None], axis=0) / jnp.maximum(n, 1.0)
    y_std = jnp.sqrt(jnp.maximum(y_var, 1e-12))
    params = params.replace(x_mean=x_mean, x_std=x_std, y_mean=y_mean, y_std=y_std)
    Xn = (X - x_mean) / x_std
    Yn = (Y - y_mean) / y_std

    # bootstrap weights: multinomial counts over the valid rows, one per member
    if bootstrap:
        k_boot, key = jax.random.split(key)
        probs = m / jnp.maximum(n, 1.0)
        # sample counts by drawing n indices per member
        idx = jax.random.categorical(
            k_boot, jnp.log(jnp.maximum(probs, 1e-12)), shape=(ensemble_size, C)
        )
        weights = jax.vmap(
            lambda row: jnp.bincount(row, length=C).astype(X.dtype)
        )(idx)
        weights = weights * m[None, :]  # safety
    else:
        weights = jnp.broadcast_to(m[None, :], (ensemble_size, C))

    tx = optax.adam(learning_rate)

    def member_loss(p, w):
        mean, var = network.apply({"params": p}, Xn)
        return _nll_loss(mean, var, Yn, w)

    def train_member(p0, w):
        opt_state = tx.init(p0)

        def step(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(member_loss)(p, w)
            updates, s = tx.update(g, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (p_final, _), losses = jax.lax.scan(step, (p0, opt_state), None, length=num_steps)
        return p_final, losses[-1]

    new_members, final_losses = jax.vmap(train_member)(params.member_params, weights)
    return DeepEnsembleTrainingResult(
        params=params.replace(member_params=new_members),
        loss=jnp.mean(final_losses),
    )


class DeepEnsemble:
    """Deep-ensemble model wrapper (reference ``models/keras/models.py:89-556``).

    Implements ``TrainableProbabilisticModel``, ``HasTrajectorySampler`` and (marginal)
    reparametrization sampling.
    """

    def __init__(
        self,
        network: GaussianMLP,
        params: DeepEnsembleParams,
        dataset: Dataset,
        *,
        ensemble_size: int,
        num_train_steps: int = 1000,
        learning_rate: float = 0.01,
        bootstrap: bool = True,
        optimize_key: Optional[jax.Array] = None,
    ):
        self._network = network
        self._params = params
        self._dataset = dataset
        self._ensemble_size = ensemble_size
        self._num_train_steps = num_train_steps
        self._learning_rate = learning_rate
        self._bootstrap = bootstrap
        self._key = optimize_key if optimize_key is not None else jax.random.PRNGKey(0)

    @property
    def params(self) -> DeepEnsembleParams:
        return self._params

    @property
    def ensemble_size(self) -> int:
        return self._ensemble_size

    @property
    def num_networks(self) -> int:
        return self._ensemble_size

    def get_internal_data(self) -> Dataset:
        return self._dataset

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return _jit_ensemble_predict(self._network, self._params, jnp.asarray(query_points))

    def predict_partial(self):
        from jax.tree_util import Partial
        import functools

        return Partial(
            functools.partial(ensemble_predict, self._network), self._params
        )

    def predict_ensemble(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        """Per-member predictions ``[E, N, L]`` (reference ``models.py:322-340``)."""
        return ensemble_member_predict(
            self._network, self._params, jnp.asarray(query_points)
        )

    def predict_y(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return self.predict(query_points)

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        """Mixture sampling: random member + its Gaussian head
        (reference ``sample``, ``models.py:341-361``)."""
        x = jnp.asarray(query_points)
        means, vars_ = self.predict_ensemble(x)  # [E, N, L]
        k_idx, k_eps = jax.random.split(key)
        idx = jax.random.randint(k_idx, (num_samples,), 0, self._ensemble_size)
        eps = jax.random.normal(k_eps, (num_samples,) + means.shape[1:], means.dtype)
        return means[idx] + jnp.sqrt(vars_[idx]) * eps

    def sample_ensemble(
        self, key: jax.Array, query_points: TensorType, num_samples: int
    ) -> jax.Array:
        """Sample member means only (reference ``sample_ensemble``, ``models.py:322-340``)."""
        means, _ = self.predict_ensemble(query_points)
        idx = jax.random.randint(key, (num_samples,), 0, self._ensemble_size)
        return means[idx]

    def update(self, dataset: Dataset) -> None:
        self._dataset = dataset

    def optimize(self, dataset: Dataset) -> DeepEnsembleTrainingResult:
        self._key, sub = jax.random.split(self._key)
        result = fit_deep_ensemble(
            sub,
            self._network,
            self._params,
            dataset.query_points,
            dataset.observations,
            dataset.mask,
            ensemble_size=self._ensemble_size,
            num_steps=self._num_train_steps,
            learning_rate=self._learning_rate,
            bootstrap=self._bootstrap,
        )
        self._params = result.params
        self._dataset = dataset
        return result

    def trajectory_sampler(self) -> TrajectorySampler:
        return DeepEnsembleTrajectorySampler(self)

    def reparam_sampler(self, num_samples: int) -> ReparametrizationSampler:
        from ..gp.sampler import IndependentReparametrizationSampler

        return IndependentReparametrizationSampler(num_samples, self)

    def log(self, dataset: Optional[Dataset] = None) -> None:
        pass

    def __repr__(self) -> str:
        return f"DeepEnsemble(E={self._ensemble_size})"


@struct.dataclass
class _EnsembleTrajectory(TrajectoryFunctionClass):
    """One member index per batch column; optionally diversified with frozen head noise
    (reference ``deep_ensemble_trajectory``, ``models/keras/sampler.py:33-226``)."""

    params: DeepEnsembleParams
    indices: jax.Array  # [B]
    eps: jax.Array  # [B, L] (zeros if not diversified)
    network: GaussianMLP = struct.field(pytree_node=False)

    def __call__(self, x: TensorType) -> jax.Array:
        x = jnp.asarray(x)  # [N, B, D]

        def member_eval(b_params, xb, eps_b):
            xn = _normalize(self.params, xb)
            mean, var = self.network.apply({"params": b_params}, xn)
            mean = mean * self.params.y_std + self.params.y_mean
            var = var * jnp.square(self.params.y_std)
            return mean + jnp.sqrt(var) * eps_b

        selected = jax.tree_util.tree_map(
            lambda p: p[self.indices], self.params.member_params
        )
        out = jax.vmap(member_eval, in_axes=(0, 1, 0), out_axes=1)(
            selected, x, self.eps
        )
        return out


class DeepEnsembleTrajectorySampler(TrajectorySampler):
    """(reference ``models/keras/sampler.py:33-226``)"""

    def __init__(self, model: DeepEnsemble, diversify: bool = False):
        super().__init__(model)
        self._diversify = diversify

    def get_trajectory(self, key: jax.Array, batch_size: int = 1) -> TrajectoryFunction:
        k_idx, k_eps = jax.random.split(key)
        indices = jax.random.randint(
            k_idx, (batch_size,), 0, self._model.ensemble_size
        )
        L = self._model.get_internal_data().num_outputs
        if self._diversify:
            eps = jax.random.normal(k_eps, (batch_size, L))
        else:
            eps = jnp.zeros((batch_size, L))
        return _EnsembleTrajectory(
            params=self._model.params,
            indices=indices,
            eps=eps,
            network=self._model._network,
        )


def build_deep_ensemble(
    dataset: Dataset,
    *,
    ensemble_size: int = 5,
    hidden_units: Sequence[int] = (25, 25),
    num_train_steps: int = 1000,
    learning_rate: float = 0.01,
    bootstrap: bool = True,
    key: Optional[jax.Array] = None,
) -> DeepEnsemble:
    """Build a deep ensemble (role of reference ``build_keras_ensemble``,
    ``models/keras/builders.py:32-130``)."""
    if ensemble_size < 2:
        raise ValueError(f"ensemble_size must be at least 2, got {ensemble_size}")
    if not hidden_units:
        raise ValueError("need at least one hidden layer")
    key = key if key is not None else jax.random.PRNGKey(0)
    network = GaussianMLP(
        hidden_units=tuple(hidden_units), output_dim=dataset.num_outputs
    )
    dummy = jnp.zeros((1, dataset.dimension), dataset.query_points.dtype)
    member_keys = jax.random.split(key, ensemble_size)
    member_params = jax.vmap(
        lambda k: network.init(k, dummy)["params"]
    )(member_keys)
    D = dataset.dimension
    L = dataset.num_outputs
    dtype = dataset.query_points.dtype
    params = DeepEnsembleParams(
        member_params=member_params,
        x_mean=jnp.zeros(D, dtype),
        x_std=jnp.ones(D, dtype),
        y_mean=jnp.zeros(L, dtype),
        y_std=jnp.ones(L, dtype),
    )
    return DeepEnsemble(
        network,
        params,
        dataset,
        ensemble_size=ensemble_size,
        num_train_steps=num_train_steps,
        learning_rate=learning_rate,
        bootstrap=bootstrap,
        optimize_key=key,
    )


_jit_ensemble_predict = jax.jit(ensemble_predict, static_argnames="network")
