"""Observer protocol: the bridge between the optimizer and the (black-box) objective.

TPU-native rebuild of the reference ``trieste/observer.py:25-78``. Observers run on the
host side of the loop — control deliberately leaves the jitted world here, since the
objective may be an external experiment.

Examples:

>>> import jax.numpy as jnp
>>> from trieste_tpu.observer import filter_finite, map_is_finite, OBJECTIVE
>>> qp = jnp.array([[0.0], [1.0], [2.0]])
>>> obs = jnp.array([[1.0], [jnp.inf], [3.0]])
>>> kept = filter_finite(qp, obs)  # drops the non-finite observation row
>>> len(kept)
2
>>> flags = map_is_finite(qp, obs)  # success indicators instead of dropping
>>> len(flags)
3
>>> [int(v) for v in flags.trimmed_observations[:, 0]]
[1, 0, 1]
>>> OBJECTIVE
'OBJECTIVE'
"""
from __future__ import annotations

from typing import Callable, Mapping, Union

import jax
import jax.numpy as jnp

from .data import Dataset
from .types import Tag, TensorType

OBJECTIVE: Tag = "OBJECTIVE"
"""Default tag for the objective data and model (reference ``observer.py:31``)."""

SingleObserver = Callable[[TensorType], Dataset]
"""An observer mapping query points [N, D] to a single dataset (``observer.py:25``)."""

MultiObserver = Callable[[TensorType], Mapping[Tag, Dataset]]
"""An observer returning tagged datasets (``observer.py:28``)."""

Observer = Union[SingleObserver, MultiObserver]


def filter_finite(query_points: TensorType, observations: TensorType) -> Dataset:
    """Keep only rows whose observations are all finite (reference ``observer.py:53-66``).
    Host-side: produces a data-dependent shape."""
    import numpy as np

    qp = np.asarray(query_points)
    obs = np.asarray(observations)
    if obs.ndim != 2 or obs.shape[-1] != 1:
        raise ValueError(f"observations must have shape [N, 1], got {obs.shape}")
    if qp.ndim != 2 or qp.shape[0] != obs.shape[0]:
        raise ValueError(
            f"query points {qp.shape} do not match observations {obs.shape}"
        )
    mask = np.isfinite(obs).all(axis=-1)
    return Dataset.from_arrays(qp[mask], obs[mask])


def map_is_finite(query_points: TensorType, observations: TensorType) -> Dataset:
    """Return a dataset of binary finiteness indicators (reference ``observer.py:69-78``)."""
    qp = jnp.asarray(query_points)
    obs = jnp.asarray(observations)
    ok = jnp.all(jnp.isfinite(obs), axis=-1, keepdims=True)
    return Dataset.from_arrays(qp, ok.astype(qp.dtype))
