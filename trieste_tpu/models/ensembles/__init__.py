"""Deep-ensemble models (TPU-native rebuild of ``trieste/models/keras``)."""

from .deep_ensemble import (
    DeepEnsemble,
    DeepEnsembleParams,
    DeepEnsembleTrajectorySampler,
    GaussianMLP,
    build_deep_ensemble,
)

build_keras_ensemble = build_deep_ensemble
"""Alias matching the reference's builder name (``models/keras/builders.py:32``)."""

__all__ = [
    "DeepEnsemble",
    "DeepEnsembleParams",
    "DeepEnsembleTrajectorySampler",
    "GaussianMLP",
    "build_deep_ensemble",
    "build_keras_ensemble",
]
