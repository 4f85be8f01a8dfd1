"""Observer factories (reference ``trieste/objectives/utils.py:41-106``)."""
from __future__ import annotations

from typing import Callable, Mapping, Optional, Sequence, Union

import jax.numpy as jnp

from ..data import Dataset
from ..observer import MultiObserver, Observer, SingleObserver, OBJECTIVE
from ..types import Tag, TensorType
from ..utils.misc import LocalizedTag


def mk_observer(
    objective: Callable[[TensorType], TensorType], key: Optional[Tag] = None
) -> Observer:
    """Wrap a function as an observer (reference ``objectives/utils.py:41-57``)."""
    if key is not None:
        return lambda qp: {key: Dataset.from_arrays(qp, objective(qp))}
    return lambda qp: Dataset.from_arrays(qp, objective(qp))


def mk_multi_observer(**kwargs: Callable[[TensorType], TensorType]) -> MultiObserver:
    """Build a multi-observer from keyword objectives (reference ``objectives/utils.py:60-70``)."""
    return lambda qp: {
        key: Dataset.from_arrays(qp, obj(qp)) for key, obj in kwargs.items()
    }


def mk_batch_observer(
    objective_or_observer: Union[Callable[[TensorType], TensorType], Observer],
    default_key: Tag = OBJECTIVE,
) -> MultiObserver:
    """Wrap an observer so rank-3 ``[B, V, D]`` query points produce per-batch-element
    local datasets under :class:`LocalizedTag`s plus the combined global dataset
    (reference ``objectives/utils.py:73-106``)."""

    def observer(qps: TensorType) -> Mapping[Tag, Dataset]:
        qps = jnp.asarray(qps)
        if qps.ndim == 2:
            result = objective_or_observer(qps)
            return result if isinstance(result, Mapping) else {default_key: result}
        if qps.ndim != 3:
            raise ValueError(f"query points must be rank 2 or 3, got shape {qps.shape}")
        B, V, D = qps.shape
        flat = jnp.reshape(qps, (-1, D))
        result = objective_or_observer(flat)
        results = result if isinstance(result, Mapping) else {default_key: result}
        out: dict[Tag, Dataset] = {}
        for tag, ds in results.items():
            qp, obs = ds.astuple()
            qp3 = jnp.reshape(qp, (B, V, D))
            obs3 = jnp.reshape(obs, (B, V, obs.shape[-1]))
            out[tag] = ds
            for v in range(V):
                out[LocalizedTag(tag, v)] = Dataset.from_arrays(qp3[:, v], obs3[:, v])
        return out

    return observer
