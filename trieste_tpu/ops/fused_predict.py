"""Fused exact-GP marginal prediction as a Pallas TPU kernel.

The innermost hot op of every BO step is marginal posterior prediction over a large
candidate pool (the seeding phase of the continuous acquisition optimizer evaluates
``max(5000, 1000·D)`` candidates per step — reference ``acquisition/optimizer.py:46-66,
247-341``). The unfused XLA path materializes the ``[N, C]`` cross-covariance matrix in
HBM three times (gram write, mean matmul read, triangular solve read); at the bench shape
(N=131072, C=128, f32) that is ~200 MB of HBM traffic for ~3 MB of useful input/output —
purely bandwidth bound.

This kernel fuses the whole chain per candidate tile in VMEM:

    r² = |x/ℓ|² + |X/ℓ|² − 2 (x/ℓ)(X/ℓ)ᵀ          (MXU matmul)
    K  = σ²·k(r)                                    (VPU elementwise)
    mean = K α + m                                  (MXU matmul)
    v    = K L⁻ᵀ                                    (MXU matmul)
    var  = σ² − Σ_j v ⊙ v                           (VPU reduce)

using a **precomputed masked triangular inverse** ``L⁻ᵀ`` from the posterior cache, so
the variance needs no triangular solve in the hot loop (``v = K·L⁻ᵀ`` is elementwise the
same quantity as the reference's ``v = L⁻¹ k``) — everything rides the MXU. The
cross-covariance never touches HBM: per tile the only HBM traffic is the candidate tile
in and (mean, var) out.

Precision. Three regimes, chosen per contraction (the MXU's 1-pass f32 path is
bf16-grade, ~1e-2 relative — unusable everywhere here):

- **r² matmul** (depth D, tiny): ``Precision.HIGHEST`` (6-pass f32 emulation) — the
  ``|x|² + |X|² − 2x·X`` form cancels catastrophically.
- **mean = K·α**: an exact **f32 VPU row reduction** per output column (round 4; the
  earlier 3-pass bf16 matvec padded its P output columns to the MXU's 128 lanes —
  ~9% of executed MXU work at C=1024 for P=1 — and was *less* accurate).
- **v = K·L⁻ᵀ** (the FLOPs hot spot): manual **3-pass bf16-split**
  (``a·b ≈ aₕbₕ + aₕbₗ + aₗbₕ``; Pallas-TPU has no ``Precision.HIGH``). Any 2-way
  bf16 split represents its operands to only 16 mantissa bits, so this is a
  ~2⁻¹⁶·‖K‖‖L⁻ᵀ‖ contract (~1e-2 variance absolute for ill-conditioned posteriors).
  That is the same order as the f32 XLA path's own conditioning error vs f64, and
  acceptable **because this kernel only serves candidate-pool scoring**: the small
  refinement batches inside L-BFGS fall under ``MIN_POINTS`` and take the exact XLA
  path, as do all gradients. Full HIGHEST on this contraction made the kernel slower
  than unfused XLA (2.3 vs 1.85 ms at C=256; 12.4 vs 11.7 ms at C=1024 — no reason to
  fuse). The hi/lo split of ``L⁻ᵀ`` is computed in-graph at each traced call of
  :func:`fused_predict_f` (XLA hoists/fuses it; the cost is O(C²), negligible next to
  the O(N·C²) kernel); ``K`` is split per tile in VMEM.

Measured on v5e (N=131072, D=6, round-4 tile model): 1.06 ms vs 1.85 ms unfused XLA
at C=256; 5.97 ms vs 11.7 ms at C=1024 (tile 512 — ~71% of the 3-pass MXU-bound
attainable time; see the roofline in ``bench.py``).

Correctness with padded training buffers (:mod:`trieste_tpu.ops.linalg`) is free: padded
rows of ``α`` and padded rows/columns of ``L⁻ᵀ`` are exactly zero, so the (finite, junk)
padded columns of ``K`` contribute nothing to either matmul — no masking inside the kernel.

Gradients: callers wrap this in ``jax.custom_vjp`` whose backward pass is the pure-JAX
reference implementation (see :func:`trieste_tpu.models.gp.posterior.predict_f`); the
kernel itself is forward-only.
"""
from __future__ import annotations

import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp

_SQRT3 = math.sqrt(3.0)
_SQRT5 = math.sqrt(5.0)

# flipped by tests to exercise the kernel on CPU via the Pallas interpreter
FORCE_INTERPRET = bool(int(os.environ.get("TRIESTE_TPU_PALLAS_INTERPRET", "0")))

# below this many flattened query points the pallas launch overhead outweighs the fusion
# win (and keeps the kernel out of the vmapped small-batch L-BFGS line-search evals)
MIN_POINTS = 2048

# beyond this training capacity the bf16 hi/lo splits of LinvT alone crowd the ~16MB
# scoped-VMEM budget; fall back to XLA (at that scale users want sparse models anyway)
_MAX_TRAIN = 1024

# capacities up to this use the exact elementwise (VPU) r² instead of the 6-pass
# HIGHEST matmul. DEFAULT OFF (0): although a standalone small-C call is ~38% faster
# elementwise (C=128: 0.93→0.58 ms — the r² matmul pads depth D=6 to the MXU's 128
# lanes and runs 6 passes), in the steady-state dispatch-amortized regime the MXU
# matmul overlaps with the previous call's VPU tail and wins clearly (EI-chain
# throughput 147.5M vs 134M evals/s measured v5e). Flip >0 for latency-critical
# single-shot scoring of small-capacity posteriors.
_ELEMENTWISE_MAX_CP = 0


def _tile_for(Cp: int) -> int:
    """Largest candidate-tile size whose VMEM working set fits the scoped budget.

    Empirical model (v5e): the per-tile working set costs ~24.5 bytes per K element
    (K f32 + bf16 hi/lo splits + v f32 + partial-product temporaries), plus the
    resident ``4·Cp²`` bytes of the LinvT bf16 splits. Measured: tile 4096 @ Cp=256
    OOMs; tile 2048 @ Cp=1024 fails to compile while tile 1024 works, so the usable
    budget is ~18 MiB (Mosaic reuses some of the model's temporaries). Tile sweep at
    Cp=1024 (``scripts/kernel_tile_experiment.py``): 128→6.50 ms, 256→6.39, 512→6.15
    (best), 1024→6.23 — the model's 18 MiB budget selects 512 there.
    """
    budget = 18 * 2**20 - 4 * Cp * Cp
    t = budget // int(24.5 * Cp)
    return max(256, min(2048, 1 << max(int(t).bit_length() - 1, 0)))


def _stationary(kind: str, r2: jax.Array) -> jax.Array:
    if kind == "rbf":
        return jnp.exp(-0.5 * r2)
    r = jnp.sqrt(jnp.maximum(r2, 0.0))
    if kind == "matern12":
        return jnp.exp(-r)
    if kind == "matern32":
        z = _SQRT3 * r
        return (1.0 + z) * jnp.exp(-z)
    if kind == "matern52":
        z = _SQRT5 * r
        return (1.0 + z + z * z / 3.0) * jnp.exp(-z)
    raise ValueError(f"unknown kernel kind {kind!r}")


def _split_hi_lo(a: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """bf16 hi/lo decomposition: ``a == hi + lo`` to ~2⁻¹⁶ relative."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


# MXU passes of the r² cross-term: 3 (default) = manual bf16 split, error
# ~2⁻¹⁶·Σ_d|x_d||a_d| ≈ 1e-3 absolute in r² — inside the variance path's own
# contract, and half the time of 6 (= Precision.HIGHEST emulation; at depth D ≪ 128
# every pass fills the whole systolic array, so passes are what cost, not FLOPs).
_R2_PASSES = 3

# executed MXU passes of the bf16-split variance contraction. 3 (default) keeps the
# ~2⁻¹⁶ contract documented above; 2 drops the lo·hi term (error ~2⁻¹¹·‖K‖‖L⁻ᵀ‖ —
# a ~5e-4-relative variance contract, still far inside EI's seed-scoring needs for
# well-conditioned pools) for a 1/3 cut of the kernel's dominant MXU work; 1 is
# bf16-only (experimentation). Experiment knob — see scripts/kernel_breakdown.py.
_V_PASSES = 3


def _dot3(k_hi, k_lo, b_hi, b_lo):
    """bf16-split matmul ≈ f32: ``_V_PASSES`` MXU passes (3 drops only lo·lo, ~2⁻¹⁶)."""
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    acc = d(k_hi, b_hi)
    if _V_PASSES >= 2:
        acc = acc + d(k_hi, b_lo)
    if _V_PASSES >= 3:
        acc = acc + d(k_lo, b_hi)
    return acc


# sub-tiles per candidate tile. 1 = single serialized chain (default). 2 splits the
# tile in half and interleaves: half 1's VPU phase (exp, bf16 splits, mean reduction)
# is emitted between half 0's MXU v-passes and their consumption, giving the scheduler
# independent VPU work to overlap the MXU drain. Experiment knob (kernel_breakdown.py):
# the ~1.4 ms serialized VPU tail at C=1024 is the residual after the v-passes run at
# 96-100% of the MXU bound.
_SUBTILES = 1


def _make_kernel(kind: str, P: int):
    def _phase_k(x, a_ref, b2_ref, kvar):
        """MXU r² + VPU kernel eval for a candidate sub-slice → K [Ts, Cp]."""
        D = x.shape[-1]
        Cp_k = a_ref.shape[0]
        if D <= 16 and Cp_k <= _ELEMENTWISE_MAX_CP:
            # r² via a static unrolled VPU loop over input dims: exact f32
            # differences (no cancellation at all — strictly better than any
            # emulated-matmul expansion of |x|²+|a|²−2xa) and no MXU time.
            # See _ELEMENTWISE_MAX_CP for when this pays (single-shot latency at
            # small C) and when it does not (pipelined throughput; large C, where
            # strided per-column broadcasts cost more than the matmul: 6.0→6.6 ms
            # at C=1024).
            a = a_ref[:]
            r2 = jnp.zeros(x.shape[:-1] + a.shape[:1], jnp.float32)
            for d in range(D):
                diff = x[:, d][:, None] - a[:, d][None, :]  # [T, Cp]
                r2 = r2 + diff * diff
        else:
            x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # [T, 1]
            # r² cancels catastrophically in the |x|²+|a|²−2x·a form, so the cross
            # term needs better-than-bf16 accuracy — but NOT the full 6-pass
            # Precision.HIGHEST emulation: a manual 3-pass bf16 split bounds the
            # error at ~2⁻¹⁶·Σ_d|x_d||a_d| (≲1e-3 absolute for lengthscale-
            # normalized inputs), far inside the variance path's own bf16-split
            # contract. Measured (scripts/kernel_breakdown.py + interleaved A/B):
            # no change at C=1024 (the depth-6 passes pipeline into the big v
            # contraction), +2.6% chained-EI throughput at C=128 where the r²
            # passes are a larger share of the call.
            a = a_ref[:]
            if _R2_PASSES == 3:
                x_hi, x_lo = _split_hi_lo(x)
                a_hi, a_lo = _split_hi_lo(a)
                dg = lambda p, q: jax.lax.dot_general(
                    p, q,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ab = dg(x_hi, a_hi) + dg(x_hi, a_lo) + dg(x_lo, a_hi)  # [T, Cp]
            else:
                ab = jax.lax.dot_general(
                    x, a,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            r2 = jnp.maximum(x2 + b2_ref[0, :][None, :] - 2.0 * ab, 0.0)
        return kvar * _stationary(kind, r2)  # [Ts, Cp]

    def _phase_mean_split(K, al_ref, mean_const):
        """VPU: mean row-reduction + bf16 hi/lo split of K.

        Mean on the VPU: an exact f32 row reduction per output column. The MXU
        alternative pads the [T,Cp]@[Cp,P] matvec's P output columns to 128 lanes
        and (bf16-split) runs 3 passes — ~9% of the kernel's executed MXU work at
        Cp=1024 for P=1; the VPU reduction is both cheaper and exactly f32."""
        cols = [
            jnp.sum(K * al_ref[p, :][None, :], axis=-1, keepdims=True)
            for p in range(P)
        ]
        mean = (cols[0] if P == 1 else jnp.concatenate(cols, axis=-1)) + mean_const
        k_hi, k_lo = _split_hi_lo(K)
        return mean, k_hi, k_lo

    def kernel(
        x_ref, a_ref, b2_ref, al_ref, lt_hi_ref, lt_lo_ref, scal_ref,
        mean_ref, var_ref,
    ):
        # x_ref: [T, D] candidate tile pre-scaled by 1/lengthscales
        # a_ref: [Cp, D] training inputs pre-scaled; b2_ref: [1, Cp] their sq. norms
        # al_ref: [P, Cp] f32 alpha rows; lt_*: [Cp, Cp] bf16 hi/lo of masked (L⁻¹)ᵀ
        # scal_ref: [1, 2] SMEM (signal variance, mean constant)
        kvar = scal_ref[0, 0]
        mean_const = scal_ref[0, 1]
        T = x_ref.shape[0]
        S = _SUBTILES if (T % _SUBTILES == 0) else 1
        if S == 1:
            K = _phase_k(x_ref[:], a_ref, b2_ref, kvar)
            mean, k_hi, k_lo = _phase_mean_split(K, al_ref, mean_const)
            mean_ref[:] = mean
            v = _dot3(k_hi, k_lo, lt_hi_ref[:], lt_lo_ref[:])  # [T, Cp]
            quad = jnp.sum(v * v, axis=-1, keepdims=True)  # [T, 1]
            var_ref[:] = jnp.maximum(kvar - quad, 1e-24)
            return
        # sub-tile interleave: emit half s's MXU v-passes, then half s+1's (purely
        # dependent-on-itself) VPU phase, THEN consume half s's v — independent VPU
        # work sits between the MXU pushes and their first consumer, so the scheduler
        # can overlap the MXU drain with the next half's exp/splits/mean.
        Ts = T // S
        lt_hi, lt_lo = lt_hi_ref[:], lt_lo_ref[:]
        pending = None  # (slice_start, v)
        for s in range(S):
            K = _phase_k(x_ref[s * Ts:(s + 1) * Ts, :], a_ref, b2_ref, kvar)
            mean, k_hi, k_lo = _phase_mean_split(K, al_ref, mean_const)
            mean_ref[s * Ts:(s + 1) * Ts, :] = mean
            v = _dot3(k_hi, k_lo, lt_hi, lt_lo)  # [Ts, Cp]
            if pending is not None:
                lo, v_prev = pending
                quad = jnp.sum(v_prev * v_prev, axis=-1, keepdims=True)
                var_ref[lo:lo + Ts, :] = jnp.maximum(kvar - quad, 1e-24)
            pending = (s * Ts, v)
        lo, v_prev = pending
        quad = jnp.sum(v_prev * v_prev, axis=-1, keepdims=True)
        var_ref[lo:lo + Ts, :] = jnp.maximum(kvar - quad, 1e-24)

    return kernel


def _is_batch_traced(*arrays) -> bool:
    """True when any operand is a ``vmap`` batch tracer: per-example ndim checks cannot
    see the batch axis, so without this the kernel would dispatch through the untested
    Pallas batching rule for stacked model states."""
    try:
        from jax._src.interpreters.batching import BatchTracer
    except ImportError:  # pragma: no cover — jax internals moved
        # conservative fallback: treat any tracer whose type name mentions batching
        # as batched
        return any("Batch" in type(a).__name__ for a in arrays)
    return any(isinstance(a, BatchTracer) for a in arrays)


def can_fuse(params, cache, flat: jax.Array) -> bool:
    """Trace-time gate: TPU backend (or forced interpret), f32, stationary kernel,
    unbatched AND un-vmapped model state, large-enough pool, LinvT present, capacity
    within VMEM budget, and (when values are concrete) adequate conditioning.

    Conditioning: the bf16-split variance contract is ~2⁻¹⁶·‖K‖‖L⁻ᵀ‖ ABSOLUTE error.
    With a very small likelihood variance (e.g. the README's 1e-7 low-noise recipe) the
    true posterior variance near training data is far below that contract, so fused
    variances there are noise. When the parameters are concrete (eager prediction) a
    noise/signal ratio below 1e-5 falls back to XLA; under ``jit`` the values are traced
    and unknowable, so low-noise users who need tight variances near data should score
    pools with ``predict_f_reference``."""
    kernel = getattr(params, "kernel", None)
    kind = getattr(kernel, "kind", None)
    if kind not in ("rbf", "matern12", "matern32", "matern52"):
        return False
    if getattr(cache, "LinvT", None) is None:
        return False
    if flat.dtype != jnp.float32 or cache.X.dtype != jnp.float32:
        return False
    if flat.ndim != 2 or cache.X.ndim != 2 or cache.alpha.ndim != 2:
        return False
    if cache.alpha.shape[-1] > 8:
        return False  # the VPU mean reduction unrolls over output columns
    if kernel.variance.ndim != 0 or kernel.lengthscales.ndim > 1:
        return False
    if _is_batch_traced(flat, cache.X, cache.alpha, kernel.variance, kernel.lengthscales):
        return False
    if flat.shape[0] < MIN_POINTS or cache.X.shape[0] > _MAX_TRAIN:
        return False
    noise = getattr(params, "noise_variance", None)
    if (
        noise is not None
        and not isinstance(noise, jax.core.Tracer)
        and not isinstance(kernel.variance, jax.core.Tracer)
    ):
        if float(noise) / max(float(kernel.variance), 1e-30) < 1e-5:
            return False
    return jax.default_backend() == "tpu" or FORCE_INTERPRET


def _launch(kind: str, P: int, tile: int, xs, A, b2, al_rows, lt_hi, lt_lo, scal):
    """One ``pallas_call`` over ``xs.shape[0] // tile`` candidate tiles. Under a pool
    mesh this runs per-device inside ``shard_map`` on the local shard; standalone it is
    the whole launch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Np, D = xs.shape
    Cp = A.shape[0]
    f32 = jnp.float32
    grid = (Np // tile,)
    return pl.pallas_call(
        _make_kernel(kind, P),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, P), f32),
            jax.ShapeDtypeStruct((Np, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * Cp * (6 * D + P + 3 * Cp) + 8 * Np * Cp,
            bytes_accessed=4 * (Np * D + Cp * (D + P + Cp) + Np * (P + 1)),
            transcendentals=Np * Cp,
        ),
        interpret=FORCE_INTERPRET and jax.default_backend() != "tpu",
    )(xs, A, b2, al_rows, lt_hi, lt_lo, scal)


def _launch_tuple(kind, P, tile, *args):
    mean, var = _launch(kind, P, tile, *args)
    return mean, var


def fused_predict_f(params, cache, flat: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """``flat [N, D] -> (mean [N, P], var [N, P])`` — forward-only fused prediction.

    Call only when :func:`can_fuse` holds.

    **Multi-chip composition.** ``pallas_call`` has no GSPMD partitioning rule, so under
    an active pool mesh (:mod:`trieste_tpu.parallel.mesh`) a bare launch would force XLA
    to all-gather the full candidate pool onto every device — exactly the sharding the
    mesh exists to provide (reference greenlet engine this replaces:
    ``acquisition/optimizer.py:566-745``). The kernel is embarrassingly parallel over
    candidate tiles, so with a mesh active the launch is wrapped in ``jax.shard_map``
    over the ``pool`` axis: each device runs the kernel on its local row shard with the
    (small) model state replicated; no collectives are needed until the caller's
    downstream ``top_k``. The candidate tile size is re-fit to the *local* shard so tiny
    per-device shards don't pad up to the global tile.
    """
    N, D = flat.shape
    C = cache.X.shape[0]
    P = cache.alpha.shape[-1]
    f32 = jnp.float32

    ls = jnp.broadcast_to(jnp.atleast_1d(params.kernel.lengthscales), (D,)).astype(f32)
    m = cache.mask.astype(f32)
    A = (cache.X * m[:, None]) / ls  # zeroed padded rows keep their norms at 0
    b2 = jnp.sum(A * A, axis=-1)[None, :]  # [1, C]
    alpha = cache.alpha.astype(f32)
    LinvT = cache.LinvT.astype(f32)

    # pad training capacity to the f32 lane tile so every matmul is MXU-aligned;
    # zero padding is inert (see module docstring)
    Cp = -(-C // 128) * 128
    if Cp != C:
        A = jnp.pad(A, ((0, Cp - C), (0, 0)))
        b2 = jnp.pad(b2, ((0, 0), (0, Cp - C)))
        alpha = jnp.pad(alpha, ((0, Cp - C), (0, 0)))
        LinvT = jnp.pad(LinvT, ((0, Cp - C), (0, Cp - C)))

    al_rows = alpha.T  # [P, Cp] f32 — consumed by the VPU mean reduction
    lt_hi, lt_lo = _split_hi_lo(LinvT)

    scal = jnp.stack(
        [params.kernel.variance.astype(f32), params.mean_constant.astype(f32)]
    )[None, :]  # [1, 2]

    xs = flat / ls
    kind = params.kernel.kind

    from ..parallel.mesh import POOL_AXIS, get_global_mesh

    mesh = get_global_mesh()
    if mesh is None or mesh.size == 1:
        tile = _tile_for(Cp)
        Np = -(-N // tile) * tile
        if Np != N:
            xs = jnp.pad(xs, ((0, Np - N), (0, 0)))
        mean, var = _launch(kind, P, tile, xs, A, b2, al_rows, lt_hi, lt_lo, scal)
    else:
        from functools import partial

        from jax.sharding import PartitionSpec as PSpec

        d = mesh.size
        local = -(-N // d)
        # fit the tile to the LOCAL shard: next pow2 ≥ local, clipped to the VMEM model
        tile = min(_tile_for(Cp), max(256, 1 << max(local - 1, 1).bit_length()))
        local_p = -(-local // tile) * tile
        Np = local_p * d
        if Np != N:
            xs = jnp.pad(xs, ((0, Np - N), (0, 0)))
        sharded_launch = jax.shard_map(
            partial(_launch_tuple, kind, P, tile),
            mesh=mesh,
            in_specs=(
                PSpec(POOL_AXIS, None),  # xs: rows sharded over the pool
                PSpec(None, None),  # A
                PSpec(None, None),  # b2
                PSpec(None, None),  # al_rows
                PSpec(None, None),  # lt_hi
                PSpec(None, None),  # lt_lo
                PSpec(None, None),  # scal
            ),
            out_specs=(PSpec(POOL_AXIS, None), PSpec(POOL_AXIS, None)),
            check_vma=False,
        )
        mean, var = sharded_launch(xs, A, b2, al_rows, lt_hi, lt_lo, scal)

    mean = mean[:N]
    var = jnp.broadcast_to(var[:N], (N, P))
    return mean, var
