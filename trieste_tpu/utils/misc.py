"""Miscellaneous core utilities.

TPU-native rebuild of the reference's ``trieste/utils/misc.py``: the ``Result`` monad
(``misc.py:73-177``), ``Timer`` (``misc.py:287-307``), ``DEFAULTS`` (``misc.py:180-187``),
``LocalizedTag`` (``misc.py:249-284``) and small mapping helpers. JAX-specific additions:
``default_float`` (dtype policy — f64 when x64 is enabled, else f32) and
``flatten_leading_dims`` built on ``jnp.reshape``.

Examples:

>>> from trieste_tpu.utils.misc import Ok, Err, LocalizedTag, map_values
>>> Ok(3).unwrap()
3
>>> Ok(3).is_ok
True
>>> Err(ValueError("boom")).is_err
True
>>> tag = LocalizedTag("OBJECTIVE", 2)
>>> tag.global_tag, tag.local_index
('OBJECTIVE', 2)
>>> LocalizedTag.from_tag(tag) is tag
True
>>> map_values(lambda v: v + 1, {"a": 1, "b": 2})["b"]
3
>>> import jax.numpy as jnp
>>> from trieste_tpu.utils.misc import flatten_leading_dims
>>> flat, unflatten = flatten_leading_dims(jnp.zeros((2, 3, 4)))
>>> flat.shape
(6, 4)
>>> unflatten(flat).shape
(2, 3, 4)
"""
from __future__ import annotations

import time
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Callable, Generic, Mapping, NoReturn, Optional, Tuple, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Tag, TensorType

T = TypeVar("T")
U = TypeVar("U")
K = TypeVar("K")


class _Defaults:
    """Default constants (reference ``utils/misc.py:180-187``).

    ``JITTER`` is added to Gram-matrix diagonals before Cholesky. The reference uses 1e-6
    with float64; on TPU the compute path is float32/bfloat16 so a dtype-aware jitter is
    exposed via :func:`jitter_for`.
    """

    JITTER: float = 1e-6


DEFAULTS = _Defaults()


def default_float() -> jnp.dtype:
    """The default floating dtype: float64 iff JAX x64 is enabled (CPU/testing parity with
    the reference, which defaults to f64 — ``space.py:37``), float32 otherwise (TPU).
    Computed without touching the device (cheap at import time)."""
    return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.float32)


def jitter_for(dtype: Any) -> float:
    """Dtype-aware Cholesky jitter: the reference's 1e-6 for f64, a larger 1e-5 for f32."""
    return DEFAULTS.JITTER if jnp.dtype(dtype).itemsize >= 8 else 1e-5


class Result(ABC, Generic[T]):
    """Monadic success/failure wrapper (reference ``utils/misc.py:73-177``)."""

    @property
    @abstractmethod
    def is_ok(self) -> bool:
        """`True` iff this is an :class:`Ok`."""

    @property
    def is_err(self) -> bool:
        return not self.is_ok

    @abstractmethod
    def unwrap(self) -> T:
        """Return the wrapped value, or raise the wrapped error."""


@dataclass(frozen=True)
class Ok(Result[T]):
    value: T

    @property
    def is_ok(self) -> bool:
        return True

    def unwrap(self) -> T:
        return self.value


@dataclass(frozen=True)
class Err(Result[NoReturn]):
    error: Exception

    @property
    def is_ok(self) -> bool:
        return False

    def unwrap(self) -> NoReturn:
        raise self.error


class Timer:
    """Context manager measuring wall-clock time (reference ``utils/misc.py:287-307``).

    Calls ``jax.block_until_ready`` are the caller's responsibility — async dispatch means
    un-synced timings measure dispatch, not compute.
    """

    def __enter__(self) -> "Timer":
        self.start = time.perf_counter()
        self.time = 0.0
        return self

    def __exit__(self, *_: Any) -> None:
        self.time = time.perf_counter() - self.start


def map_values(f: Callable[[T], U], mapping: Mapping[K, T]) -> dict[K, U]:
    """Apply ``f`` to every value of ``mapping`` (reference ``utils/misc.py:200``)."""
    return {k: f(v) for k, v in mapping.items()}


@dataclass(frozen=True)
class LocalizedTag:
    """A tag with a global part and an optional local (region) index, used by batch
    trust-region rules to maintain per-region datasets/models
    (reference ``utils/misc.py:249-284``)."""

    global_tag: Tag
    local_index: Optional[int]

    @property
    def is_local(self) -> bool:
        return self.local_index is not None

    @classmethod
    def from_tag(cls, tag: Tag) -> "LocalizedTag":
        return tag if isinstance(tag, LocalizedTag) else cls(tag, None)

    def __str__(self) -> str:
        return f"{self.global_tag}__{self.local_index}" if self.is_local else str(self.global_tag)


def ignoring_local_tags(mapping: Mapping[Tag, T]) -> dict[Tag, T]:
    """Expose local tags under their global name where no global entry exists
    (reference ``utils/misc.py:277-284``)."""
    out: dict[Tag, T] = {}
    for k, v in mapping.items():
        ltag = LocalizedTag.from_tag(k)
        if not ltag.is_local:
            out[k] = v
    for k, v in mapping.items():
        ltag = LocalizedTag.from_tag(k)
        if ltag.is_local and ltag.global_tag not in out:
            out[ltag.global_tag] = v
    return out


def get_value_for_tag(
    mapping: Optional[Mapping[Tag, T]], *tags: Tag
) -> Tuple[Optional[Tag], Optional[T]]:
    """Return the first matching (tag, value) pair, searching ``tags`` in order, defaulting
    to the ``OBJECTIVE`` tag (reference ``utils/misc.py:224-246``)."""
    from ..observer import OBJECTIVE

    if mapping is None:
        return None, None
    search = tags if tags else (OBJECTIVE,)
    for tag in search:
        if tag in mapping:
            return tag, mapping[tag]
    return None, None


def flatten_leading_dims(
    x: TensorType, output_dims: int = 2
) -> Tuple[jax.Array, Callable[[jax.Array], jax.Array]]:
    """Flatten the leading dims of ``x`` down to ``output_dims`` total dims; returns the
    flattened array and an unflatten function (reference ``utils/misc.py:310-335``)."""
    x = jnp.asarray(x)
    if not 1 <= output_dims <= x.ndim:
        raise ValueError(f"output_dims {output_dims} must be in [1, {x.ndim}]")
    leading = x.shape[: x.ndim - output_dims + 1]
    rest = x.shape[x.ndim - output_dims + 1 :]
    flat = jnp.reshape(x, (-1,) + rest)

    def unflatten(y: jax.Array) -> jax.Array:
        return jnp.reshape(y, leading + y.shape[1:])

    return flat, unflatten


def to_numpy(x: TensorType) -> np.ndarray:
    """Device→host transfer as a numpy array."""
    return np.asarray(x)
