"""Helpers for model stacks."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..types import TensorType
from .interfaces import ModelStack, ReparametrizationSampler


class StackReparametrizationSampler(ReparametrizationSampler):
    """Reparametrization sampler over a :class:`ModelStack`: concatenates member samplers'
    output slices (reference ``interfaces.py:490-510``)."""

    def __init__(self, sample_size: int, stack: ModelStack):
        super().__init__(sample_size, stack)
        self._samplers = [
            m.reparam_sampler(sample_size) for m in stack.models  # type: ignore[attr-defined]
        ]

    def sample(self, at: TensorType, *, key: Optional[jax.Array] = None) -> jax.Array:
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, len(self._samplers))
        return jnp.concatenate(
            [s.sample(at, key=k) for s, k in zip(self._samplers, keys)], axis=-1
        )

    def reset_sampler(self) -> None:
        for s in self._samplers:
            s.reset_sampler()
