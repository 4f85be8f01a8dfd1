"""Core type aliases.

TPU-native equivalents of the reference's ``trieste/types.py:19-36``: the tensor type is a
:class:`jax.Array` (immutable — there is no ``tf.Variable`` analogue; mutable state lives in
pytrees threaded through pure functions), and the functional ``State`` alias maps 1:1 onto
JAX's ``(state) -> (state, value)`` idiom.
"""
from __future__ import annotations

from typing import Callable, Hashable, Tuple, TypeVar, Union

import jax
import numpy as np

TensorType = Union[jax.Array, np.ndarray]
"""Type alias for tensor-like values accepted by the framework."""

S = TypeVar("S")
T = TypeVar("T")

State = Callable[[S], Tuple[S, T]]
"""A stateful computation: consumes a state, returns the new state and a value
(reference ``types.py:28-33``). Because it is a pure function of pytrees it is jittable."""

Tag = Hashable
"""Type alias for a dataset/model tag (reference ``types.py:36``)."""
