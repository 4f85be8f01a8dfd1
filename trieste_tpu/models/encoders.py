"""Encoded-model wrappers: route model inputs through a point encoder.

TPU-native rebuild of the reference's ``EncodedProbabilisticModel`` family
(``models/interfaces.py:748-907``): models trained over encoded (e.g. one-hot) inputs
while the BO loop works in the raw (e.g. categorical-index) space.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.tree_util import Partial

from ..data import Dataset
from ..space import EncoderFunction
from ..types import TensorType


def encode_dataset(dataset: Dataset, encoder: EncoderFunction) -> Dataset:
    """Encode a dataset's query points (reference ``interfaces.py:778-795``)."""
    qp, obs = dataset.astuple()
    return Dataset.from_arrays(encoder(qp), obs)


def _encoded_predict(encoder_partial, predict_partial, x):
    return predict_partial(encoder_partial(x))


class EncodedProbabilisticModel:
    """Wrap a model so its public interface takes un-encoded points
    (reference ``interfaces.py:748-860``)."""

    def __init__(self, model, encoder: EncoderFunction):
        self._model = model
        self._encoder = encoder

    @property
    def encoder(self) -> EncoderFunction:
        return self._encoder

    @property
    def wrapped_model(self):
        return self._model

    def predict(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return self._model.predict(self._encoder(jnp.asarray(query_points)))

    def predict_partial(self):
        from ..acquisition.utils import predictor

        return Partial(_encoded_predict, Partial(self._encoder), predictor(self._model))

    def predict_joint(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return self._model.predict_joint(self._encoder(jnp.asarray(query_points)))

    def predict_y(self, query_points: TensorType) -> Tuple[jax.Array, jax.Array]:
        return self._model.predict_y(self._encoder(jnp.asarray(query_points)))

    def sample(self, key: jax.Array, query_points: TensorType, num_samples: int) -> jax.Array:
        return self._model.sample(key, self._encoder(jnp.asarray(query_points)), num_samples)

    def log(self, dataset: Optional[Dataset] = None) -> None:
        self._model.log(encode_dataset(dataset, self._encoder) if dataset else None)

    def __getattr__(self, name: str):
        # expose remaining capabilities (get_kernel, get_observation_noise, ...) directly
        return getattr(self._model, name)

    def __repr__(self) -> str:
        return f"EncodedProbabilisticModel({self._model!r})"


class EncodedTrainableProbabilisticModel(EncodedProbabilisticModel):
    """Trainable variant: data is encoded before update/optimize
    (reference ``interfaces.py:863-907``)."""

    def update(self, dataset: Dataset) -> None:
        self._model.update(encode_dataset(dataset, self._encoder))

    def optimize(self, dataset: Dataset):
        return self._model.optimize(encode_dataset(dataset, self._encoder))
