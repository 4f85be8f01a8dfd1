"""Acquisition utilities.

TPU-native rebuild of the reference ``trieste/acquisition/utils.py`` (258 LoC), plus the
``predictor`` helpers that turn model posteriors into pytree ``Partial``s (the mechanism
behind the no-retrace acquisition design, see :mod:`.interface`).
"""
from __future__ import annotations

import math
from typing import Callable, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.tree_util import Partial

from ..data import Dataset
from ..types import Tag, TensorType
from ..utils.misc import LocalizedTag


def predictor(model) -> Callable[[TensorType], tuple[jax.Array, jax.Array]]:
    """A pytree-friendly marginal-prediction callable for ``model``.

    Models exposing ``predict_partial`` (pure function + pytree state) yield a ``Partial``
    that the jitted optimizer can re-trace-freely rebind each BO step; other models fall
    back to their bound ``predict`` method (correct, but retraces per model object).
    """
    if hasattr(model, "predict_partial"):
        return model.predict_partial()
    # zero-leaf Partial: the bound method lands in the treedef (static under jit)
    return Partial(model.predict)


def joint_predictor(model) -> Callable[[TensorType], tuple[jax.Array, jax.Array]]:
    """Like :func:`predictor` for full-covariance predictions."""
    if hasattr(model, "predict_joint_partial"):
        return model.predict_joint_partial()
    return Partial(model.predict_joint)


def split_acquisition_function(
    fn: Callable[[TensorType], jax.Array],
    split_size: int,
) -> Callable[[TensorType], jax.Array]:
    """Wrap ``fn`` to evaluate huge leading-axis inputs in fixed-size chunks, bounding
    peak memory (reference ``utils.py:31-80``). The input is padded up to a chunk multiple
    and processed with ``lax.map`` — a compiled sequential loop, not a Python loop."""
    if split_size <= 0:
        raise ValueError(f"split_size must be positive, got {split_size}")

    def wrapped(x: TensorType) -> jax.Array:
        x = jnp.asarray(x)
        n = x.shape[0]
        if n <= split_size:
            return fn(x)
        num_chunks = math.ceil(n / split_size)
        pad = num_chunks * split_size - n
        xp = jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], axis=0)
        chunks = xp.reshape((num_chunks, split_size) + x.shape[1:])
        out = jax.lax.map(fn, chunks)
        out = out.reshape((num_chunks * split_size,) + out.shape[2:])
        return out[:n]

    return wrapped


def split_acquisition_function_calls(optimizer, split_size: int):
    """Wrap an ``AcquisitionOptimizer`` so that all its internal acquisition evaluations
    are chunked (reference ``utils.py:83-109``)."""

    def wrapped(space, f, key=None):
        if isinstance(f, tuple):
            fn, v = f
            return optimizer(space, (split_acquisition_function(fn, split_size), v), key=key)
        return optimizer(space, split_acquisition_function(f, split_size), key=key)

    return wrapped


def select_nth_output(x: TensorType, output_dim: int = 0) -> jax.Array:
    """Select one output dimension of trajectory samples (reference ``utils.py:112-123``)."""
    return jnp.asarray(x)[..., output_dim]


def get_local_dataset(local_space, dataset: Dataset) -> Dataset:
    """Filter a dataset to the points inside ``local_space`` (reference ``utils.py:126-143``).
    Host-side (data-dependent shape)."""
    import numpy as np

    if dataset.dimension != local_space.dimension:
        raise ValueError("dataset and space dimensions do not match")
    qp, obs = dataset.astuple()
    in_region = np.asarray(local_space.contains(qp))
    return Dataset.from_arrays(np.asarray(qp)[in_region], np.asarray(obs)[in_region])


def copy_to_local_models(
    global_model, num_local_models: int, key: Tag = None
) -> Mapping[Tag, object]:
    """Produce per-region copies of a model under localized tags
    (reference ``utils.py:146-160``)."""
    import copy

    from ..observer import OBJECTIVE

    key = key if key is not None else OBJECTIVE
    return {
        LocalizedTag(key, i): copy.deepcopy(global_model) for i in range(num_local_models)
    }


def with_local_datasets(
    datasets: Mapping[Tag, Dataset],
    num_local_datasets: int,
    local_dataset_indices: Optional[Sequence[jax.Array]] = None,
) -> dict[Tag, Dataset]:
    """Add local dataset copies for each global tag (reference ``utils.py:162-204``)."""
    updated: dict[Tag, Dataset] = dict(datasets)
    for tag in list(datasets):
        ltag = LocalizedTag.from_tag(tag)
        if ltag.is_local:
            continue
        for i in range(num_local_datasets):
            local_tag = LocalizedTag(ltag.global_tag, i)
            if local_tag in updated:
                continue
            if local_dataset_indices is None:
                updated[local_tag] = datasets[tag]
            else:
                import numpy as np

                idx = np.asarray(local_dataset_indices[i])
                qp, obs = datasets[tag].astuple()
                updated[local_tag] = Dataset.from_arrays(
                    np.asarray(qp)[idx], np.asarray(obs)[idx]
                )
    return updated


def get_unique_points_mask(points: TensorType, tolerance: float = 1e-6) -> jax.Array:
    """Greedy deduplication: mark points farther than ``tolerance`` from every
    earlier-kept point (reference ``utils.py:211-257``). Jittable (lax.scan)."""
    points = jnp.asarray(points)
    n = points.shape[0]

    def body(kept, i):
        d = jnp.linalg.norm(points - points[i], axis=-1)
        is_dup = jnp.any((d <= tolerance) & kept & (jnp.arange(n) < i))
        keep_i = ~is_dup
        return kept.at[i].set(keep_i), keep_i

    init = jnp.zeros(n, bool)
    kept, flags = jax.lax.scan(body, init, jnp.arange(n))
    return flags
