"""Deep Gaussian processes (TPU-native rebuild of ``trieste/models/gpflux``)."""

from .deep_gp import (
    DeepGaussianProcess,
    DGPLayerParams,
    DGPParams,
    build_vanilla_deep_gp,
)

__all__ = [
    "DeepGaussianProcess",
    "DGPLayerParams",
    "DGPParams",
    "build_vanilla_deep_gp",
]
