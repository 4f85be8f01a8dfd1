"""Fully-Bayesian exact GP: HMC over the hyperparameters.

A north-star addition over the reference (BASELINE.json: "NUTS/HMC over GP
hyperparameters" — the reference trains point estimates only): hyperparameter chains run
on device (vmapped lockstep HMC, :mod:`trieste_tpu.ops.hmc`), and the posterior is a
mixture over S retained hyperparameter samples whose posterior caches are one stacked
pytree built by a single vmapped Cholesky batch (MXU-friendly ``[S, C, C]`` factorizations).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...data import Dataset
from ...types import TensorType
from ...utils.misc import jitter_for
from ..interfaces import ReparametrizationSampler, TrajectorySampler
from . import posterior as P
from .training import NOISE_FLOOR, pack_params, unpack_params


def _log_posterior(u: jax.Array, template: P.GPRParams, X, Y, mask, prior_scale: float):
    """MLL + independent Gaussian priors on the unconstrained (log) hyperparameters."""
    params = unpack_params(u, template, train_noise=True)
    mll = P.log_marginal_likelihood(params, X, Y, mask)
    u0 = pack_params(template, train_noise=True)
    prior = -0.5 * jnp.sum(jnp.square((u - u0) / prior_scale))
    return mll + prior


@partial(jax.jit, static_argnames=("num_chains", "num_samples", "num_warmup", "pool_sharding"))
def _run_chains(key, template, X, Y, mask, u0, num_chains, num_samples, num_warmup,
                pool_sharding=None):
    from ...ops.hmc import hmc_sample

    k_init, k_chains = jax.random.split(key)
    jitter0 = 0.5 * jax.random.normal(k_init, (num_chains, u0.shape[0]), u0.dtype)
    inits = u0[None, :] + jitter0
    chain_keys = jax.random.split(k_chains, num_chains)
    if pool_sharding is not None:
        # chains run lockstep-vmapped; shard the chain axis over the mesh (SURVEY.md
        # §5.7 scaling axis: hyperparameter chains)
        inits = jax.lax.with_sharding_constraint(inits, pool_sharding)
        chain_keys = jax.lax.with_sharding_constraint(chain_keys, pool_sharding)

    def log_prob(u):
        return _log_posterior(u, template, X, Y, mask, prior_scale=2.0)

    results = jax.vmap(
        lambda k, q0: hmc_sample(
            k, log_prob, q0, num_samples=num_samples, num_warmup=num_warmup
        )
    )(chain_keys, inits)
    return results


def _mixture_predict(params_stack, caches_stack, x):
    """Marginal mixture moments over hyperparameter samples: ``[..., D] -> [..., P]``."""
    means, variances = jax.vmap(P.predict_f_reference, in_axes=(0, 0, None))(
        params_stack, caches_stack, x
    )  # [S, ..., P]
    mix_mean = jnp.mean(means, axis=0)
    mix_var = jnp.mean(variances + jnp.square(means), axis=0) - jnp.square(mix_mean)
    return mix_mean, jnp.maximum(mix_var, 1e-24)


class GaussianProcessRegressionMCMC:
    """Exact GPR with fully-Bayesian hyperparameters via HMC.

    ``optimize`` replaces maximum-likelihood training with posterior sampling; all
    prediction methods marginalize over the retained samples.
    """

    def __init__(
        self,
        params: P.GPRParams,
        dataset: Dataset,
        *,
        num_chains: int = 4,
        num_samples_per_chain: int = 25,
        num_warmup: int = 100,
        num_retained: int = 20,
        optimize_key: Optional[jax.Array] = None,
    ):
        self._template = params
        self._dataset = dataset
        self._num_chains = num_chains
        self._num_samples_per_chain = num_samples_per_chain
        self._num_warmup = num_warmup
        self._num_retained = num_retained
        self._key = optimize_key if optimize_key is not None else jax.random.PRNGKey(0)
        # start as a single-sample "mixture" at the initial parameters
        self._params_stack = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x)[None], params
        )
        self._refresh_caches()

    def _refresh_caches(self) -> None:
        ds = self._dataset
        # the posterior mixture predicts via predict_f_reference, so skip the O(S·C³)
        # LinvT build the fused path would need (it never dispatches for stacked states)
        from functools import partial

        self._caches_stack = jax.vmap(
            partial(P.build_cache, with_linvt=False), in_axes=(0, None, None, None)
        )(self._params_stack, ds.query_points, ds.observations, ds.mask)

    @property
    def params_stack(self) -> P.GPRParams:
        """Stacked hyperparameter samples (leading ``[S]`` axis)."""
        return self._params_stack

    @property
    def num_hyper_samples(self) -> int:
        return jax.tree_util.tree_leaves(self._params_stack)[0].shape[0]

    def get_internal_data(self) -> Dataset:
        return self._dataset

    def get_kernel(self):
        # the mean kernel over samples (for diagnostics / lengthscale-shaped regions)
        return jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), self._params_stack).kernel

    def get_observation_noise(self) -> jax.Array:
        return jnp.mean(self._params_stack.noise_variance)

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return _jit_mixture_predict(
            self._params_stack, self._caches_stack, jnp.asarray(query_points)
        )

    def predict_partial(self):
        from jax.tree_util import Partial

        return Partial(_mixture_predict, self._params_stack, self._caches_stack)

    def predict_y(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        mean, var = self.predict(query_points)
        return mean, var + jnp.mean(self._params_stack.noise_variance)

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        """Joint samples: draw a hyperparameter sample per draw, then a GP draw under it."""
        S = self.num_hyper_samples
        k_idx, k_draw = jax.random.split(key)
        idx = jax.random.randint(k_idx, (num_samples,), 0, S)
        keys = jax.random.split(k_draw, num_samples)
        x = jnp.asarray(query_points)

        def one(i, k):
            p = jax.tree_util.tree_map(lambda a: a[i], self._params_stack)
            c = jax.tree_util.tree_map(lambda a: a[i], self._caches_stack)
            return P.sample_joint(k, p, c, x, 1)[0]

        return jax.vmap(one)(idx, keys)

    def update(self, dataset: Dataset) -> None:
        self._dataset = dataset
        self._refresh_caches()

    def optimize(self, dataset: Dataset):
        """Run HMC and retain a thinned set of hyperparameter samples."""
        from ...parallel.mesh import current_pool_sharding, round_to_mesh

        self._dataset = dataset
        self._key, sub = jax.random.split(self._key)
        u0 = pack_params(self._template, train_noise=True)
        results = _run_chains(
            sub,
            self._template,
            dataset.query_points,
            dataset.observations,
            dataset.mask,
            u0,
            round_to_mesh(self._num_chains),
            self._num_samples_per_chain,
            self._num_warmup,
            current_pool_sharding(),
        )
        all_samples = jnp.reshape(results.samples, (-1, u0.shape[0]))
        total = all_samples.shape[0]
        take = min(self._num_retained, total)
        stride = max(total // take, 1)
        thinned = all_samples[::stride][:take]
        self._params_stack = jax.vmap(
            lambda u: unpack_params(u, self._template, train_noise=True)
        )(thinned)
        self._refresh_caches()
        return results

    def trajectory_sampler(self) -> TrajectorySampler:
        return _MCMCTrajectorySampler(self)

    def reparam_sampler(self, num_samples: int) -> ReparametrizationSampler:
        from .sampler import IndependentReparametrizationSampler

        return IndependentReparametrizationSampler(num_samples, self)

    def sample_marginal_partial(self, num_samples: int, key: jax.Array):
        from jax.tree_util import Partial

        s_token = jnp.zeros((num_samples,), self._dataset.query_points.dtype)
        return Partial(
            _mcmc_marginal_sample, self._params_stack, self._caches_stack, key, s_token
        )

    def log(self, dataset: Optional[Dataset] = None) -> None:
        pass

    def __repr__(self) -> str:
        return f"GaussianProcessRegressionMCMC(S={self.num_hyper_samples})"


def _mcmc_marginal_sample(params_stack, caches_stack, key, s_token, x):
    """Key-frozen marginal sampling from the hyperparameter mixture, ``[..., S, B, L]``."""
    x = jnp.asarray(x)
    mean, var = _mixture_predict(params_stack, caches_stack, x)
    S = s_token.shape[0]
    eps = jax.random.normal(key, (S, 1, mean.shape[-1]), mean.dtype)
    return mean[..., None, :, :] + jnp.sqrt(var)[..., None, :, :] * eps


class _MCMCTrajectorySampler(TrajectorySampler):
    """Trajectories under per-column random hyperparameter samples."""

    def __init__(self, model: GaussianProcessRegressionMCMC, num_features: int = 1000):
        super().__init__(model)
        self._num_features = num_features

    def get_trajectory(self, key: jax.Array, batch_size: int = 1):
        from .gpr import GaussianProcessRegression
        from .sampler import DecoupledTrajectorySampler

        model: GaussianProcessRegressionMCMC = self._model
        k_idx, k_traj = jax.random.split(key)
        idx = int(
            jax.random.randint(k_idx, (), 0, model.num_hyper_samples)
        )
        p = jax.tree_util.tree_map(lambda a: a[idx], model.params_stack)
        single = GaussianProcessRegression(p, model.get_internal_data())
        return DecoupledTrajectorySampler(single, self._num_features).get_trajectory(
            k_traj, batch_size
        )


def build_gpr_mcmc(
    dataset: Dataset,
    search_space,
    *,
    kernel_kind: str = "matern52",
    likelihood_variance: Optional[float] = None,
    num_chains: int = 4,
    num_samples_per_chain: int = 25,
    num_warmup: int = 100,
    num_retained: int = 20,
    optimize_key: Optional[jax.Array] = None,
) -> GaussianProcessRegressionMCMC:
    """Build a fully-Bayesian GPR."""
    from .builders import default_gpr_params

    params = default_gpr_params(
        dataset, search_space, kernel_kind=kernel_kind,
        likelihood_variance=likelihood_variance,
    )
    return GaussianProcessRegressionMCMC(
        params,
        dataset,
        num_chains=num_chains,
        num_samples_per_chain=num_samples_per_chain,
        num_warmup=num_warmup,
        num_retained=num_retained,
        optimize_key=optimize_key,
    )


_jit_mixture_predict = jax.jit(_mixture_predict)
