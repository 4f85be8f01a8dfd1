"""Acquisition-function optimizers.

TPU-native rebuild of the reference ``trieste/acquisition/optimizer.py`` (1011 LoC). The
reference's engine is host-side: greenlet-coordinated multi-start scipy L-BFGS-B with
function/gradient evaluations batched through TF (``optimizer.py:566-745``). Here the
entire pipeline — candidate seeding, chunked evaluation, per-slice top-k start selection,
multi-start projected L-BFGS, and winner selection — is one jitted device program:

* seeding: ``space.sample(key, N)`` with ``N = max(5000, 1000·D)`` (reference constants
  ``NUM_SAMPLES_MIN``/``NUM_SAMPLES_DIM``/``NUM_RUNS_DIM``, ``optimizer.py:46-66``),
* multi-start: ``R = 10·D`` runs advance in lockstep under ``vmap`` (a shard axis under
  ``pjit`` for multi-chip),
* vectorized acquisitions (V slices) are optimized simultaneously by summing slices —
  gradients decouple because slice ``v`` only reads ``x[..., v, :]``,
* mixed discrete/continuous spaces use continuous relaxation with per-run frozen discrete
  coordinates via collapsed box bounds (reference ``optimizer.py:748-894``),
* robustness: the returned point is the per-slice argmax over {optimized runs ∪ seed
  candidates}, so the optimizer can never return something worse than random search;
  if a slice still has no finite value (acquisition NaN over the whole sampled
  region), fresh-seed recovery runs retry up to ``num_recovery_runs`` times before
  raising (reference ``optimizer.py:461-530``).

Examples — exhaustive maximization over a discrete space:

>>> import jax.numpy as jnp
>>> from trieste_tpu.acquisition.optimizer import optimize_discrete
>>> from trieste_tpu.space import DiscreteSearchSpace
>>> space = DiscreteSearchSpace(jnp.array([[0.0], [1.0], [2.0]]))
>>> acq = lambda x: -jnp.sum((x[..., 0, :] - 1.9) ** 2, axis=-1, keepdims=True)
>>> optimize_discrete(space, acq).tolist()
[[2.0]]
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..logging import deferred_scalar, scalar
from ..parallel.mesh import current_pool_sharding, round_to_mesh
from ..space import (
    Box,
    CollectionSearchSpace,
    GeneralDiscreteSearchSpace,
    SearchSpace,
    TaggedMultiSearchSpace,
    TaggedProductSearchSpace,
)
from ..types import TensorType
from .interface import AcquisitionFunction
from ..ops.lbfgs import minimize_lbfgs

NUM_SAMPLES_MIN = 5000
"""Minimum number of initial candidate samples (reference ``optimizer.py:46-52``)."""

NUM_SAMPLES_DIM = 1000
"""Initial candidate samples per input dimension (reference ``optimizer.py:54-59``)."""

NUM_RUNS_DIM = 10
"""L-BFGS runs per input dimension (reference ``optimizer.py:61-66``)."""

AcquisitionOptimizer = Callable[..., jax.Array]
"""Maximizes an acquisition function (or a ``(fn, V)`` vectorized pair) over a space,
returning ``[V, D]`` (reference ``optimizer.py:73-87``)."""


class FailedOptimizationError(Exception):
    """Raised when acquisition optimization fails (reference ``optimizer.py:69-70``).

    With this module's seed-union winner selection this only occurs if the acquisition
    function returns non-finite values everywhere."""


def automatic_optimizer_selector(
    space: SearchSpace, f: Union[AcquisitionFunction, Tuple[AcquisitionFunction, int]],
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Select and run the default optimizer for the space (reference ``optimizer.py:90-121``)."""
    if isinstance(space, GeneralDiscreteSearchSpace):
        return optimize_discrete(space, f)
    return generate_continuous_optimizer()(space, f, key=key)


def optimize_discrete(
    space: GeneralDiscreteSearchSpace,
    f: Union[AcquisitionFunction, Tuple[AcquisitionFunction, int]],
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Exhaustive maximization over a discrete space (reference ``optimizer.py:124-153``)."""
    fn, V = f if isinstance(f, tuple) else (f, 1)
    points = space.points  # [N, D]
    candidates = jnp.tile(points[:, None, :], (1, V, 1))  # [N, V, D]
    vals = fn(candidates)  # [N, V] or [N, 1]
    vals = jnp.reshape(vals, (points.shape[0], V))
    best = jnp.argmax(vals, axis=0)  # [V]
    return points[best]


def _vec_wrap(fn, x):
    return jnp.reshape(fn(x), jnp.shape(x)[:-1])


def _scalar_wrap(fn, x):
    return jnp.reshape(fn(x), jnp.shape(x)[:-2] + (1,))


def _as_vectorized(
    f: Union[AcquisitionFunction, Tuple[AcquisitionFunction, int]]
) -> Tuple[Callable[[TensorType], jax.Array], int]:
    """Normalize to a vectorized function ``[N, V, D] -> [N, V]`` plus V, preserving the
    pytree (``Partial``) property so the jitted core is not retraced per BO step."""
    from jax.tree_util import Partial

    if isinstance(f, tuple):
        fn, V = f
    else:
        fn, V = f, None
    if V is not None and hasattr(fn, "as_partial"):
        # lazily-batched callables (e.g. PCTS trajectories) materialize their V-batch
        # state here, where V is known, and hand back a pure pytree Partial
        fn = fn.as_partial(V)
    if not isinstance(fn, Partial):
        # Plain callables become zero-leaf Partials: the function lands in the treedef
        # (static under jit) instead of being mistaken for an array leaf. Builders that
        # want no-retrace rebinding return proper Partials already.
        fn = Partial(fn)
    if V is not None:
        return Partial(_vec_wrap, fn), V
    return Partial(_scalar_wrap, fn), 1


def _space_bounds_and_discrete_mask(
    space: SearchSpace,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """``(lower [D], upper [D], discrete_mask [D])`` for continuous relaxation: discrete
    dims get their per-seed value frozen via collapsed bounds
    (reference ``optimizer.py:748-894``)."""
    lower, upper = space.lower, space.upper
    D = space.dimension
    mask = np.zeros(D, bool)
    if isinstance(space, GeneralDiscreteSearchSpace):
        mask[:] = True
    elif isinstance(space, TaggedProductSearchSpace):
        for tag in space.subspace_tags:
            sub = space.get_subspace(tag)
            lo, hi = space.subspace_dimension_range(tag)
            if isinstance(sub, GeneralDiscreteSearchSpace):
                mask[lo:hi] = True
    return (
        jnp.asarray(lower),
        jnp.asarray(upper),
        jnp.asarray(mask),
    )


@partial(jax.jit, static_argnames=("num_runs", "max_iters", "pool_sharding"))
def _optimize_continuous_core(
    acq: Callable[[TensorType], jax.Array],
    seeds: jax.Array,  # [N, V, D]
    lower: jax.Array,  # [V, D]
    upper: jax.Array,  # [V, D]
    discrete_mask: jax.Array,  # [D] bool
    num_runs: int,
    max_iters: int,
    pool_sharding=None,
    residual_fn=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One fused device program: seed scoring → top-k starts → lockstep multi-start
    L-BFGS → per-slice winner over runs and seeds. Returns ``(points [V, D],
    values [V], improvement [V])``.

    With ``pool_sharding`` (a ``NamedSharding`` over the leading axis, supplied when a
    global mesh is active) the N seed candidates and the R multi-start runs are sharded
    across devices; the ``top_k``/``argmax`` selections become XLA collectives. This is
    the multi-chip replacement for the reference's greenlet engine
    (``acquisition/optimizer.py:566-745``).

    ``residual_fn`` (``[..., D] -> [..., n_res]``, feasible iff all residuals >= 0)
    makes the optimization constraint-aware — the device-program counterpart of the
    reference switching scipy to ``trust-constr`` (``optimizer.py:735``): a quadratic
    exact-penalty term steers the L-BFGS runs toward the feasible region, and the winner
    selection discards infeasible candidates (the feasibly-sampled seeds guarantee a
    feasible fallback always exists)."""
    N, V, D = seeds.shape
    if pool_sharding is not None:
        seeds = jax.lax.with_sharding_constraint(seeds, pool_sharding)
    seed_vals = acq(seeds)  # [N, V]
    seed_vals = jnp.where(jnp.isfinite(seed_vals), seed_vals, -jnp.inf)
    if residual_fn is not None:
        seed_feasible = jnp.all(residual_fn(seeds) >= -1e-7, axis=-1)  # [N, V]
        seed_vals = jnp.where(seed_feasible, seed_vals, -jnp.inf)
    top_vals, top_idx = jax.lax.top_k(seed_vals.T, num_runs)  # [V, R]
    # starts[r] holds, for every slice v, that slice's r-th best seed point
    starts = jnp.take_along_axis(
        seeds.transpose(1, 0, 2), top_idx[..., None], axis=1
    )  # [V, R, D]
    starts = starts.transpose(1, 0, 2)  # [R, V, D]
    if pool_sharding is not None:
        starts = jax.lax.with_sharding_constraint(starts, pool_sharding)

    # per-slice normalization: slices are optimized through a shared line search on the
    # sum, so wildly different magnitudes (e.g. small- vs large-beta LCB slices) would let
    # one slice dominate the step-size choice; scaling by the best seed value equalizes
    # them without changing any slice's argmax (gradients stay decoupled)
    magnitudes = jnp.abs(top_vals[:, 0])  # [V]
    ref_mag = jnp.max(magnitudes)
    slice_scale = jnp.clip(
        ref_mag / jnp.maximum(magnitudes, 1e-12 * jnp.maximum(ref_mag, 1e-300)),
        1.0,
        1e6,
    )  # [V]; == 1 everywhere when V == 1

    # exact-penalty weight per slice: large relative to the (scaled) acquisition
    # magnitude so constraint violation always loses, while staying finite so gradients
    # pull violated runs back inside instead of exploding the line search
    penalty_weight = 100.0 * (1.0 + magnitudes * slice_scale)  # [V]

    def neg_sum_acq(xflat: jax.Array) -> jax.Array:
        x = xflat.reshape(V, D)
        value = jnp.sum(acq(x[None])[0] * slice_scale)
        if residual_fn is not None:
            violation = jnp.square(jax.nn.relu(-residual_fn(x)))  # [V, n_res]
            value = value - jnp.sum(penalty_weight * jnp.sum(violation, axis=-1))
        return -value

    # freeze discrete dims per run by collapsing their box to the seeded value
    def run_bounds(start: jax.Array) -> Tuple[jax.Array, jax.Array]:
        lo = jnp.where(discrete_mask[None, :], start, lower)
        hi = jnp.where(discrete_mask[None, :], start, upper)
        return lo.reshape(-1), hi.reshape(-1)

    def one_run(start: jax.Array):
        lo, hi = run_bounds(start)
        res = minimize_lbfgs(
            neg_sum_acq, start.reshape(-1), lower=lo, upper=hi, max_iters=max_iters
        )
        return res.x.reshape(V, D)

    opt_points = jax.vmap(one_run)(starts)  # [R, V, D]
    opt_vals = acq(opt_points)  # [R, V]
    opt_vals = jnp.where(jnp.isfinite(opt_vals), opt_vals, -jnp.inf)
    if residual_fn is not None:
        opt_feasible = jnp.all(residual_fn(opt_points) >= -1e-7, axis=-1)  # [R, V]
        opt_vals = jnp.where(opt_feasible, opt_vals, -jnp.inf)

    # winner per slice over optimized runs and all seeds
    best_run = jnp.argmax(opt_vals, axis=0)  # [V]
    run_pts = opt_points[best_run, jnp.arange(V)]  # [V, D]
    run_best = opt_vals[best_run, jnp.arange(V)]  # [V]
    seed_best_idx = jnp.argmax(seed_vals, axis=0)  # [V]
    seed_pts = seeds[seed_best_idx, jnp.arange(V)]  # [V, D]
    seed_best = seed_vals[seed_best_idx, jnp.arange(V)]  # [V]
    use_run = run_best >= seed_best
    points = jnp.where(use_run[:, None], run_pts, seed_pts)
    values = jnp.where(use_run, run_best, seed_best)
    return points, values, values - seed_best


def generate_continuous_optimizer(
    num_initial_samples: Optional[int] = None,
    num_optimization_runs: Optional[int] = None,
    num_recovery_runs: int = 10,
    optimizer_args: Optional[dict] = None,
) -> AcquisitionOptimizer:
    """Build the default continuous optimizer (reference ``optimizer.py:344-530``).

    ``num_initial_samples`` defaults to ``max(5000, 1000·D)`` and
    ``num_optimization_runs`` to ``10·D``, resolved per space at call time.
    ``num_recovery_runs`` bounds the fresh-seed retries attempted when the acquisition
    is non-finite over every sampled seed and run (reference ``optimizer.py:461-530``).
    """
    optimizer_args = optimizer_args or {}
    max_iters = optimizer_args.get("max_iters", 60)

    def optimize_continuous(
        space: SearchSpace,
        f: Union[AcquisitionFunction, Tuple[AcquisitionFunction, int]],
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(2**31))
        fn, V = _as_vectorized(f)
        D = space.dimension
        pool_sharding = current_pool_sharding()
        N = round_to_mesh(num_initial_samples or max(NUM_SAMPLES_MIN, NUM_SAMPLES_DIM * D))
        R = round_to_mesh(num_optimization_runs or NUM_RUNS_DIM * D)
        R = min(R, N)

        if isinstance(space, TaggedMultiSearchSpace):
            if V % space.num_subspaces != 0:
                raise ValueError(
                    f"The vectorization of the target function {V} must be a multiple of "
                    f"the number of subspaces {space.num_subspaces}"
                )
            lower = jnp.tile(space.lower, (V // space.num_subspaces, 1))
            upper = jnp.tile(space.upper, (V // space.num_subspaces, 1))
            discrete_mask = jnp.zeros(D, bool)

            def make_seeds(k: jax.Array) -> jax.Array:
                seeds = space.sample(k, N)  # [N, V0, D]
                if seeds.shape[1] != V:
                    seeds = jnp.tile(seeds, (1, V // seeds.shape[1], 1))
                return seeds

        else:
            lower_d, upper_d, discrete_mask = _space_bounds_and_discrete_mask(space)
            lower = jnp.broadcast_to(lower_d, (V, D))
            upper = jnp.broadcast_to(upper_d, (V, D))

            def make_seeds(k: jax.Array) -> jax.Array:
                flat = (
                    space.sample_feasible(k, N)
                    if getattr(space, "has_constraints", False)
                    else space.sample(k, N)
                )
                return jnp.tile(flat[:, None, :], (1, V, 1))  # [N, V, D]

        from jax.tree_util import Partial

        residual_fn = (
            Partial(space.constraints_residuals)
            if getattr(space, "has_constraints", False)
            else None
        )
        # the first attempt consumes ``key`` exactly as before recovery runs existed,
        # preserving seeded trajectories; recoveries draw fresh subkeys from it
        points, values, improvement = _optimize_continuous_core(
            fn, make_seeds(key), lower, upper, discrete_mask, R, max_iters,
            pool_sharding=pool_sharding, residual_fn=residual_fn,
        )
        scalar("spo_af_evaluations", N + R * max_iters)
        # deferred: keeps the device fetch of ``improvement`` out of the optimize path
        deferred_scalar(
            "spo_improvement_on_initial_samples", lambda: float(jnp.sum(improvement))
        )

        # recovery runs (reference ``optimizer.py:461-530``): when some slice found no
        # finite value over its seeds and runs (e.g. the model NaNs over most of the
        # domain after an observer failure), retry with fresh random seeds up to
        # ``num_recovery_runs`` times, keeping any slices that already succeeded.
        recoveries = 0
        while not bool(jnp.all(jnp.isfinite(values))):
            if recoveries >= num_recovery_runs:
                raise FailedOptimizationError(
                    "acquisition function returned no finite values over seeds and "
                    f"runs after {recoveries} recovery run(s)"
                )
            recoveries += 1
            key, sub = jax.random.split(key)
            new_points, new_values, _ = _optimize_continuous_core(
                fn, make_seeds(sub), lower, upper, discrete_mask, R, max_iters,
                pool_sharding=pool_sharding, residual_fn=residual_fn,
            )
            replace = ~jnp.isfinite(values) & jnp.isfinite(new_values)
            points = jnp.where(replace[:, None], new_points, points)
            values = jnp.where(replace, new_values, values)
        if recoveries:
            scalar("spo_recovery_runs", recoveries)
        return points

    return optimize_continuous


def batchify_joint(
    batch_size_one_optimizer: AcquisitionOptimizer, batch_size: int
) -> AcquisitionOptimizer:
    """Lift a size-1 optimizer to optimize a joint batch by searching ``space^B`` and
    reshaping (reference ``optimizer.py:897-936``)."""
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")

    def optimizer(space: SearchSpace, f, key: Optional[jax.Array] = None) -> jax.Array:
        if isinstance(f, tuple):
            raise ValueError("batchify_joint cannot be applied to vectorized functions")
        expanded = space**batch_size
        D = space.dimension

        def joint_fn(x: TensorType) -> jax.Array:
            x = jnp.asarray(x)  # [..., 1, B*D]
            return f(jnp.reshape(x, x.shape[:-2] + (batch_size, D)))

        pts = batch_size_one_optimizer(expanded, joint_fn, key=key)  # [1, B*D]
        return jnp.reshape(pts, (batch_size, D))

    return optimizer


def batchify_vectorize(
    batch_size_one_optimizer: AcquisitionOptimizer, batch_size: int
) -> AcquisitionOptimizer:
    """Lift a size-1 optimizer to optimize ``batch_size`` vectorized slices at once
    (reference ``optimizer.py:939-970``)."""
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")

    def optimizer(space: SearchSpace, f, key: Optional[jax.Array] = None) -> jax.Array:
        if isinstance(f, tuple):
            raise ValueError(
                "batchify_vectorize cannot be applied to already-vectorized functions"
            )
        return batch_size_one_optimizer(space, (f, batch_size), key=key)

    return optimizer


def generate_random_search_optimizer(
    num_samples: int = NUM_SAMPLES_MIN,
) -> AcquisitionOptimizer:
    """Pure random-search maximization (reference ``optimizer.py:973-1010``)."""
    if num_samples <= 0:
        raise ValueError(f"num_samples must be positive, got {num_samples}")

    def optimizer(
        space: SearchSpace,
        f: Union[AcquisitionFunction, Tuple[AcquisitionFunction, int]],
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(2**31))
        fn, V = _as_vectorized(f)
        if isinstance(space, TaggedMultiSearchSpace):
            seeds = space.sample(key, num_samples)
        else:
            flat = space.sample(key, num_samples)
            seeds = jnp.tile(flat[:, None, :], (1, V, 1))
        vals = fn(seeds)  # [N, V]
        best = jnp.argmax(vals, axis=0)
        return seeds[best, jnp.arange(seeds.shape[1])]

    return optimizer
