"""Masked GP linear algebra primitives.

All GP math in this framework operates on **fixed-capacity padded buffers** (see
:class:`trieste_tpu.data.Dataset`), so every Gram-matrix routine is mask-aware: rows and
columns at or beyond the valid count are replaced by identity, which makes the Cholesky
factor, log-determinant, and solves of the padded system *exactly* equal to those of the
trimmed system (block-diagonal ``[[K, 0], [0, I]]`` ⇒ ``chol = [[L, 0], [0, I]]``,
``logdet = logdet(K)``, and solves against zero-padded right-hand sides carry zeros).

This is the TPU replacement for the reference's reliance on dynamic-shape ``tf.Variable``
data (``models/gpflow/models.py:146-166``) + GPflow's TF Cholesky kernels.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.misc import jitter_for


def add_jitter(K: jax.Array, jitter: Optional[float] = None) -> jax.Array:
    """Add ``jitter * I`` to the trailing two dims of ``K``."""
    j = jitter_for(K.dtype) if jitter is None else jitter
    n = K.shape[-1]
    return K + j * jnp.eye(n, dtype=K.dtype)


def masked_gram(K: jax.Array, mask: jax.Array) -> jax.Array:
    """Replace padded rows/cols of a ``[..., N, N]`` Gram matrix by the identity.

    ``mask`` is ``[N]`` (or broadcastable) boolean; entry ``(i, j)`` is kept iff both
    ``mask[i]`` and ``mask[j]``, the diagonal of the padded block is set to 1.
    """
    m = mask.astype(K.dtype)
    outer = m[..., :, None] * m[..., None, :]
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    return K * outer + eye * (1.0 - m[..., :, None])


def masked_cholesky(
    K: jax.Array, mask: Optional[jax.Array] = None, jitter: Optional[float] = None
) -> jax.Array:
    """Cholesky of ``K + jitter*I`` with padded rows/cols as identity.

    The jitter is added to valid rows only (the padded block's diagonal stays exactly 1).
    """
    j = jitter_for(K.dtype) if jitter is None else jitter
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    if mask is None:
        return jnp.linalg.cholesky(K + j * eye)
    m = mask.astype(K.dtype)
    Kj = K + j * eye * m[..., :, None]
    return jnp.linalg.cholesky(masked_gram(Kj, mask))


def solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L x = b`` for lower-triangular ``L``."""
    return jax.scipy.linalg.solve_triangular(L, b, lower=True)


def solve_upper(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L^T x = b`` for lower-triangular ``L``."""
    return jax.scipy.linalg.solve_triangular(L, b, lower=True, trans=1)


def cho_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``(L L^T) x = b``."""
    return solve_upper(L, solve_lower(L, b))


def masked_logdet_from_chol(L: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """``log det`` of the (masked) matrix whose Cholesky factor is ``L``. With a mask the
    padded diagonal entries are 1, so no correction is needed — kept explicit for clarity."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
