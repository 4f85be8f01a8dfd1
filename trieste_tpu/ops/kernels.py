"""GP covariance kernels as pytrees.

TPU-native replacement for the reference's delegation to ``gpflow.kernels`` (SURVEY.md
§2.5). Kernels are flax ``struct`` dataclasses — pure pytrees of hyperparameters with a
static ``kind`` — so a *batch of kernel hyperparameters* (multi-start training candidates,
HMC chains, per-output stacks) is just a leading axis handled by ``vmap``/``pjit``.

Gram assembly uses the ``(|a|² + |b|² - 2 a·b)`` expansion so the dominant cost is a single
MXU matmul; XLA fuses the surrounding elementwise work into it.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

_SQRT3 = math.sqrt(3.0)
_SQRT5 = math.sqrt(5.0)

RBF = "rbf"
MATERN12 = "matern12"
MATERN32 = "matern32"
MATERN52 = "matern52"
KINDS = (RBF, MATERN12, MATERN32, MATERN52)


@struct.dataclass
class Stationary:
    """A stationary kernel ``variance * k(r)`` with ARD lengthscales.

    :param variance: scalar signal variance.
    :param lengthscales: ``[D]`` (ARD) or scalar lengthscales.
    :param kind: one of :data:`KINDS` (static — not a pytree leaf).
    """

    variance: jax.Array
    lengthscales: jax.Array
    kind: str = struct.field(pytree_node=False, default=RBF)

    def __call__(self, a: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
        return gram(self, a, b)

    def diag(self, a: jax.Array) -> jax.Array:
        return jnp.broadcast_to(self.variance, a.shape[:-1])


def stationary(
    kind: str,
    variance: float = 1.0,
    lengthscales: float | Sequence[float] | jax.Array = 1.0,
    dtype: Optional[jnp.dtype] = None,
) -> Stationary:
    """Construct a stationary kernel with the given hyperparameters."""
    if kind not in KINDS:
        raise ValueError(f"unknown kernel kind {kind!r}; choose from {KINDS}")
    from ..utils.misc import default_float

    dtype = dtype or default_float()
    return Stationary(
        variance=jnp.asarray(variance, dtype),
        lengthscales=jnp.asarray(lengthscales, dtype),
        kind=kind,
    )


def scaled_squared_distance(
    a: jax.Array, b: jax.Array, lengthscales: jax.Array
) -> jax.Array:
    """``[..., N, M]`` pairwise squared distances of ``a/l`` and ``b/l``.

    Computed via the matmul expansion so the N×M×D contraction runs on the MXU.
    """
    a = a / lengthscales
    b = b / lengthscales
    a2 = jnp.sum(jnp.square(a), axis=-1)
    b2 = jnp.sum(jnp.square(b), axis=-1)
    # full fp32 accumulation: TPU default matmul precision is bf16-grade, which is far
    # too coarse for kernel matrices feeding Cholesky factorizations
    ab = jnp.einsum(
        "...nd,...md->...nm", a, b, precision=jax.lax.Precision.HIGHEST
    )
    r2 = a2[..., :, None] + b2[..., None, :] - 2.0 * ab
    return jnp.maximum(r2, 0.0)


def _stationary_fn(kind: str, r2: jax.Array) -> jax.Array:
    if kind == RBF:
        return jnp.exp(-0.5 * r2)
    # Matérn kernels need r; guard the sqrt for stable gradients at r == 0.
    r = jnp.sqrt(jnp.maximum(r2, 1e-36))
    if kind == MATERN12:
        return jnp.exp(-r)
    if kind == MATERN32:
        z = _SQRT3 * r
        return (1.0 + z) * jnp.exp(-z)
    if kind == MATERN52:
        z = _SQRT5 * r
        return (1.0 + z + z * z / 3.0) * jnp.exp(-z)
    raise ValueError(f"unknown kernel kind {kind!r}")


def gram(kernel: Stationary, a: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """Kernel matrix ``K(a, b)`` of shape ``[..., N, M]`` (``b=None`` means ``K(a, a)``)."""
    b = a if b is None else b
    r2 = scaled_squared_distance(a, b, kernel.lengthscales)
    return kernel.variance * _stationary_fn(kernel.kind, r2)
