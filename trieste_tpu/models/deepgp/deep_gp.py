"""Doubly-stochastic deep GP.

TPU-native rebuild of the reference's GPflux deep-GP wrapper
(``trieste/models/gpflux/models.py:52-404`` + ``builders.py:65``): a stack of whitened
sparse-variational GP layers trained by doubly-stochastic VI (Salimbeni & Deisenroth) —
the reference delegates to GPflux's Keras fit loop; here the whole model is one pytree
and training is a jitted Adam ``lax.scan`` with fresh propagation noise per step. Inner
layers use identity mean functions (skip connections), the output layer a constant mean,
matching the standard GPflux architecture built by ``build_vanilla_deep_gp``.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ...data import Dataset
from ...types import TensorType
from ...utils.misc import jitter_for
from ...ops.kernels import Stationary, gram, stationary
from ..interfaces import (
    ReparametrizationSampler,
    TrajectoryFunction,
    TrajectoryFunctionClass,
    TrajectorySampler,
)
from ..gp.posterior import _mm
from ..gp.training import NOISE_FLOOR


@struct.dataclass
class DGPLayerParams:
    """One whitened SVGP layer: ``f(x) = mean_fn(x) + g(x)``, ``g ~ SVGP(q)``.

    ``q_sqrt`` is interpreted as a LOWER-TRIANGULAR Cholesky factor (gpflux
    convention): every consumer applies ``jnp.tril`` so the KL's
    ``2·Σ log|diag|`` log-det identity stays valid under free-matrix training."""

    kernel: Stationary
    inducing_points: jax.Array  # [M, d_in]
    q_mu: jax.Array  # [M, d_out]
    q_sqrt: jax.Array  # [d_out, M, M] (lower triangle used)


@struct.dataclass
class DGPParams:
    layers: Tuple[DGPLayerParams, ...]
    noise_variance: jax.Array
    mean_constant: jax.Array


def _layer_moments(
    layer: DGPLayerParams, x: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Whitened SVGP layer moments at ``x [N, d_in]`` → ``([N, d_out], [N, d_out])``."""
    Z = layer.inducing_points
    M = Z.shape[0]
    Kuu = gram(layer.kernel, Z) + jitter_for(x.dtype) * jnp.eye(M, dtype=x.dtype)
    L = jnp.linalg.cholesky(Kuu)
    Kux = gram(layer.kernel, Z, x)  # [M, N]
    A = jax.scipy.linalg.solve_triangular(L, Kux, lower=True)  # [M, N]
    mean = _mm(A.T, layer.q_mu)  # [N, d_out]
    SA = jnp.einsum("pmk,mn->pkn", jnp.tril(layer.q_sqrt), A)
    var = (
        layer.kernel.diag(x)[None, :]
        - jnp.sum(jnp.square(A), axis=0)[None, :]
        + jnp.sum(jnp.square(SA), axis=1)
    )  # [d_out, N]
    return mean, jnp.maximum(var.T, 1e-24)


def _identity_mean(x: jax.Array, d_out: int) -> jax.Array:
    d_in = x.shape[-1]
    if d_in == d_out:
        return x
    if d_in > d_out:
        return x[..., :d_out]
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (d_out - d_in,), x.dtype)], axis=-1
    )


def dgp_propagate_samples(
    key: jax.Array, params: DGPParams, x: jax.Array, num_samples: int
) -> jax.Array:
    """Propagate ``num_samples`` sampled paths through the layer stack:
    ``[N, D] -> [S, N, d_out_last]``."""
    num_layers = len(params.layers)
    keys = jax.random.split(key, num_layers)
    h = jnp.broadcast_to(x[None], (num_samples,) + x.shape)  # [S, N, D]
    for i, layer in enumerate(params.layers):
        d_out = layer.q_mu.shape[-1]
        mean, var = jax.vmap(lambda hs: _layer_moments(layer, hs))(h)  # [S, N, d_out]
        eps = jax.random.normal(keys[i], mean.shape, mean.dtype)
        g = mean + jnp.sqrt(var) * eps
        if i < num_layers - 1:
            h = jax.vmap(lambda hs, gs: _identity_mean(hs, d_out) + gs)(h, g)
        else:
            h = params.mean_constant + g
    return h


def dgp_elbo(
    key: jax.Array,
    params: DGPParams,
    X: jax.Array,
    Y: jax.Array,
    mask: jax.Array,
    num_samples: int = 8,
) -> jax.Array:
    """Doubly-stochastic ELBO with a Gaussian likelihood, mask-aware."""
    m = mask.astype(X.dtype)
    f = dgp_propagate_samples(key, params, X, num_samples)  # [S, N, 1]
    sigma2 = jnp.maximum(params.noise_variance, NOISE_FLOOR)
    lik = -0.5 * jnp.log(2.0 * jnp.pi * sigma2) - 0.5 * jnp.square(Y[None] - f) / sigma2
    lik_sum = jnp.sum(jnp.mean(lik, axis=0) * m[:, None])
    kl = jnp.asarray(0.0, X.dtype)
    for layer in params.layers:
        P, M, _ = layer.q_sqrt.shape
        S = jnp.tril(layer.q_sqrt)  # triangular representation invariant
        diag = jnp.diagonal(S, axis1=-2, axis2=-1)
        kl += 0.5 * (
            jnp.sum(jnp.square(layer.q_mu))
            + jnp.sum(jnp.square(S))
            - M * P
            - 2.0 * jnp.sum(jnp.log(jnp.maximum(jnp.abs(diag), 1e-24)))
        )
    return lik_sum - kl


class DGPTrainingResult(NamedTuple):
    params: DGPParams
    loss: jax.Array


@partial(jax.jit, static_argnames=("num_steps", "num_samples"))
def fit_dgp(
    key: jax.Array,
    params: DGPParams,
    X: jax.Array,
    Y: jax.Array,
    mask: jax.Array,
    num_steps: int = 2000,
    learning_rate: float = 0.01,
    num_samples: int = 8,
) -> DGPTrainingResult:
    """Adam on the negative ELBO with fresh propagation noise per step
    (the role of the reference's Keras fit loop + LR schedule,
    ``models/gpflux/models.py:141``)."""
    # positivity via log-transform on kernel/noise params
    def to_unconstrained(p: DGPParams):
        return p.replace(
            layers=tuple(
                l.replace(
                    kernel=l.kernel.replace(
                        variance=jnp.log(l.kernel.variance),
                        lengthscales=jnp.log(l.kernel.lengthscales),
                    )
                )
                for l in p.layers
            ),
            noise_variance=jnp.log(p.noise_variance),
        )

    def to_constrained(p: DGPParams):
        return p.replace(
            layers=tuple(
                l.replace(
                    kernel=l.kernel.replace(
                        variance=jnp.exp(l.kernel.variance),
                        lengthscales=jnp.exp(l.kernel.lengthscales),
                    )
                )
                for l in p.layers
            ),
            noise_variance=jnp.exp(p.noise_variance),
        )

    u0 = to_unconstrained(params)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(u0)

    def loss_fn(u, k):
        return -dgp_elbo(k, to_constrained(u), X, Y, mask, num_samples)

    def step(carry, k):
        u, s = carry
        loss, g = jax.value_and_grad(loss_fn)(u, k)
        updates, s = tx.update(g, s, u)
        return (optax.apply_updates(u, updates), s), loss

    keys = jax.random.split(key, num_steps)
    (u_final, _), losses = jax.lax.scan(step, (u0, opt_state), keys)
    return DGPTrainingResult(params=to_constrained(u_final), loss=losses[-1])


class DeepGaussianProcess:
    """Deep-GP model wrapper (reference ``models/gpflux/models.py:52-404``)."""

    def __init__(
        self,
        params: DGPParams,
        dataset: Dataset,
        *,
        num_train_steps: int = 2000,
        learning_rate: float = 0.01,
        num_predict_samples: int = 64,
        optimize_key: Optional[jax.Array] = None,
    ):
        self._params = params
        self._dataset = dataset
        self._num_train_steps = num_train_steps
        self._learning_rate = learning_rate
        self._num_predict_samples = num_predict_samples
        self._key = optimize_key if optimize_key is not None else jax.random.PRNGKey(0)

    @property
    def params(self) -> DGPParams:
        return self._params

    def get_internal_data(self) -> Dataset:
        return self._dataset

    def get_observation_noise(self) -> jax.Array:
        return self._params.noise_variance

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        """Mixture moments over propagated samples (fixed key: deterministic surface)."""
        x = jnp.asarray(query_points)
        lead = x.shape[:-1]
        flat = jnp.reshape(x, (-1, x.shape[-1]))
        f = _jit_propagate(
            jax.random.PRNGKey(7), self._params, flat, self._num_predict_samples
        )  # [S, N, 1]
        mean = jnp.mean(f, axis=0)
        var = jnp.maximum(jnp.var(f, axis=0), 1e-12)
        return (
            jnp.reshape(mean, lead + mean.shape[-1:]),
            jnp.reshape(var, lead + var.shape[-1:]),
        )

    def predict_partial(self):
        from jax.tree_util import Partial

        return Partial(
            _dgp_mixture_predict, self._params,
            jnp.zeros((self._num_predict_samples,)),
        )

    def predict_y(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        mean, var = self.predict(query_points)
        return mean, var + self._params.noise_variance

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        x = jnp.asarray(query_points)
        return _jit_propagate(key, self._params, x, num_samples)

    def update(self, dataset: Dataset) -> None:
        self._dataset = dataset

    def optimize(self, dataset: Dataset) -> DGPTrainingResult:
        self._key, sub = jax.random.split(self._key)
        result = fit_dgp(
            sub,
            self._params,
            dataset.query_points,
            dataset.observations,
            dataset.mask,
            num_steps=self._num_train_steps,
            learning_rate=self._learning_rate,
        )
        self._params = result.params
        self._dataset = dataset
        return result

    def trajectory_sampler(self) -> TrajectorySampler:
        return _DGPTrajectorySampler(self)

    def reparam_sampler(self, num_samples: int) -> ReparametrizationSampler:
        from ..gp.sampler import IndependentReparametrizationSampler

        return IndependentReparametrizationSampler(num_samples, self)

    def log(self, dataset: Optional[Dataset] = None) -> None:
        pass

    def __repr__(self) -> str:
        return f"DeepGaussianProcess(L={len(self._params.layers)})"


def _dgp_mixture_predict(params, s_token, x):
    x = jnp.asarray(x)
    lead = x.shape[:-1]
    flat = jnp.reshape(x, (-1, x.shape[-1]))
    f = dgp_propagate_samples(jax.random.PRNGKey(7), params, flat, s_token.shape[0])
    mean = jnp.mean(f, axis=0)
    var = jnp.maximum(jnp.var(f, axis=0), 1e-12)
    return (
        jnp.reshape(mean, lead + mean.shape[-1:]),
        jnp.reshape(var, lead + var.shape[-1:]),
    )


@struct.dataclass
class _DGPTrajectory(TrajectoryFunctionClass):
    """A frozen-noise path through the DGP: one independent draw per batch column
    (role of reference ``dgp_feature_decomposition_trajectory``,
    ``models/gpflux/sampler.py:126-464``)."""

    params: DGPParams
    keys: jax.Array  # [B, 2] PRNG keys, one per batch column

    def __call__(self, x: TensorType) -> jax.Array:
        x = jnp.asarray(x)  # [N, B, D]

        def one_column(k, xb):
            return dgp_propagate_samples(k, self.params, xb, 1)[0]  # [N, 1]

        return jax.vmap(one_column, in_axes=(0, 1), out_axes=1)(self.keys, x)


class _DGPTrajectorySampler(TrajectorySampler):
    def __init__(self, model: DeepGaussianProcess):
        super().__init__(model)

    def get_trajectory(self, key: jax.Array, batch_size: int = 1) -> TrajectoryFunction:
        keys = jax.random.split(key, batch_size)
        return _DGPTrajectory(params=self._model.params, keys=keys)


def build_vanilla_deep_gp(
    dataset: Dataset,
    search_space,
    *,
    num_layers: int = 2,
    num_inducing_points: Optional[int] = None,
    inner_layer_width: Optional[int] = None,
    likelihood_variance: float = 1e-2,
    num_train_steps: int = 2000,
    learning_rate: float = 0.01,
    key: Optional[jax.Array] = None,
) -> DeepGaussianProcess:
    """Build a vanilla DGP (role of reference ``models/gpflux/builders.py:65-200``):
    inner layers at the input width with identity mean, output layer scalar."""
    if num_layers < 1:
        raise ValueError(f"num_layers must be at least 1, got {num_layers}")
    from ..gp.inducing_points import KMeansInducingPointSelector

    key = key if key is not None else jax.random.PRNGKey(0)
    D = dataset.dimension
    dtype = dataset.query_points.dtype
    M = num_inducing_points or min(20 * D, 100)
    width = inner_layer_width or D
    Z0 = KMeansInducingPointSelector(key=key)._recalculate_inducing_points(
        M, None, dataset
    )
    extent = (search_space.upper - search_space.lower).astype(dtype)
    layers = []
    d_in = D
    for i in range(num_layers):
        d_out = 1 if i == num_layers - 1 else width
        if i == 0:
            Z = Z0
        else:
            Z = Z0[:, :d_in] if d_in <= D else jnp.concatenate(
                [Z0, jnp.zeros((M, d_in - D), dtype)], axis=-1
            )
        ls = 0.5 * jnp.ones(d_in, dtype) * (jnp.mean(extent) if i == 0 else 1.0)
        layers.append(
            DGPLayerParams(
                kernel=stationary("rbf", 0.6 if i < num_layers - 1 else 1.0, ls, dtype=dtype),
                inducing_points=Z,
                q_mu=jnp.zeros((M, d_out), dtype),
                q_sqrt=jnp.broadcast_to(
                    (1e-1 if i < num_layers - 1 else 1.0) * jnp.eye(M, dtype=dtype)[None],
                    (d_out, M, M),
                ).copy(),
            )
        )
        d_in = d_out
    y = dataset.trimmed_observations
    params = DGPParams(
        layers=tuple(layers),
        noise_variance=jnp.asarray(likelihood_variance, dtype),
        mean_constant=jnp.asarray(float(jnp.mean(y)) if y.shape[0] else 0.0, dtype),
    )
    return DeepGaussianProcess(
        params,
        dataset,
        num_train_steps=num_train_steps,
        learning_rate=learning_rate,
        optimize_key=key,
    )


_jit_propagate = jax.jit(dgp_propagate_samples, static_argnames="num_samples")
