"""Quasi-Monte-Carlo sequences.

The reference uses ``tfp.mcmc.sample_halton_sequence`` and ``tf.math.sobol_sample``
(``space.py:862-915``) and Sobol+inverse-CDF normal samples
(``models/gpflow/sampler.py:53-81``). Here Halton is generated **on device** in pure JAX
(randomized with a Cranley-Patterson rotation so it composes with explicit PRNG keys), and
Sobol points come from scipy's Joe-Kuo direction numbers on the host — Sobol is only used
at initialization time (seeding candidate pools / QMC normals), never inside a jitted hot
loop, so a host round-trip at trace time is free.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import default_float

# First 168 primes: supports Halton up to 168 dimensions.
_PRIMES = np.array(
    [
        2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71,
        73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139, 149, 151,
        157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223, 227, 229, 233,
        239, 241, 251, 257, 263, 269, 271, 277, 281, 283, 293, 307, 311, 313, 317,
        331, 337, 347, 349, 353, 359, 367, 373, 379, 383, 389, 397, 401, 409, 419,
        421, 431, 433, 439, 443, 449, 457, 461, 463, 467, 479, 487, 491, 499, 503,
        509, 521, 523, 541, 547, 557, 563, 569, 571, 577, 587, 593, 599, 601, 607,
        613, 617, 619, 631, 641, 643, 647, 653, 659, 661, 673, 677, 683, 691, 701,
        709, 719, 727, 733, 739, 743, 751, 757, 761, 769, 773, 787, 797, 809, 811,
        821, 823, 827, 829, 839, 853, 857, 859, 863, 877, 881, 883, 887, 907, 911,
        919, 929, 937, 941, 947, 953, 967, 971, 977, 983, 991, 997,
    ],
    dtype=np.int64,
)


def _radical_inverse(indices: jax.Array, base: int, num_digits: int, dtype: Any) -> jax.Array:
    """Van der Corput radical inverse of integer ``indices`` in ``base``."""
    result = jnp.zeros(indices.shape, dtype)
    inv_base = jnp.asarray(1.0 / base, dtype)
    factor = inv_base
    idx = indices
    for _ in range(num_digits):
        digit = idx % base
        result = result + digit.astype(dtype) * factor
        idx = idx // base
        factor = factor * inv_base
    return result


def halton_sample(
    key: Optional[jax.Array],
    num_samples: int,
    dimension: int,
    dtype: Any = None,
) -> jax.Array:
    """Randomized Halton points in ``[0, 1)^D``, shape ``[num_samples, D]``.

    Randomization is a Cranley-Patterson rotation: ``(halton + u) mod 1`` with
    ``u ~ U[0,1)^D``. Pass ``key=None`` for the deterministic sequence.
    """
    if dimension > len(_PRIMES):
        raise ValueError(f"Halton supports up to {len(_PRIMES)} dims, got {dimension}")
    dtype = dtype or default_float()
    if dimension == 0:
        return jnp.zeros((num_samples, 0), dtype)
    indices = jnp.arange(1, num_samples + 1, dtype=jnp.int64 if num_samples > 2**31 else jnp.int32)
    cols = []
    for d in range(dimension):
        base = int(_PRIMES[d])
        num_digits = max(1, int(np.ceil(np.log(num_samples + 1) / np.log(base))))
        cols.append(_radical_inverse(indices, base, num_digits, dtype))
    pts = jnp.stack(cols, axis=-1)
    if key is not None:
        shift = jax.random.uniform(key, (dimension,), dtype=dtype)
        pts = jnp.mod(pts + shift, 1.0)
    return pts


def sobol_sample(
    num_samples: int,
    dimension: int,
    skip: Optional[int] = None,
    dtype: Any = None,
) -> jax.Array:
    """Sobol points in ``[0, 1)^D``, shape ``[num_samples, D]`` (host-generated)."""
    from scipy.stats import qmc

    dtype = dtype or default_float()
    eng = qmc.Sobol(d=dimension, scramble=False)
    if skip:
        eng.fast_forward(skip)
    pts = eng.random(num_samples)
    return jnp.asarray(pts, dtype)


def qmc_normal_samples(
    num_samples: int, shape_tail: int, skip: int = 0, dtype: Any = None
) -> jax.Array:
    """Quasi-random standard-normal samples via Sobol + inverse CDF
    (reference ``models/gpflow/sampler.py:53-81``), shape ``[num_samples, shape_tail]``."""
    from jax.scipy.stats import norm

    dtype = dtype or default_float()
    # skip=0 yields the all-zero first Sobol point -> -inf under the inverse CDF; skip it.
    u = sobol_sample(num_samples, shape_tail, skip=skip + 1, dtype=dtype)
    eps = jnp.finfo(dtype).tiny
    return norm.ppf(jnp.clip(u, eps, 1 - jnp.finfo(dtype).epsneg))
