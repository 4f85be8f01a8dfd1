"""trieste_tpu: a TPU-native Bayesian-optimization and active-learning framework.

A from-scratch JAX/XLA/pjit rebuild of the capabilities of
`secondmind-labs/trieste <https://github.com/secondmind-labs/trieste>`_ — see ``SURVEY.md``
for the blueprint. Functional core (immutable pytree state, explicit PRNG keys, vmapped
multi-start optimization, padded device-resident datasets) with a thin object shell
mirroring the reference's public API surface.
"""

from . import acquisition, logging, models, objectives, profiling, space, utils
from .ask_tell_optimization import (
    AskTellOptimizer,
    AskTellOptimizerABC,
    AskTellOptimizerNoTraining,
    AskTellOptimizerState,
)
from .bayesian_optimizer import (
    BayesianOptimizer,
    FrozenRecord,
    OptimizationResult,
    Record,
    stop_at_minimum,
)
from .data import Dataset
from .observer import OBJECTIVE, Observer

__version__ = "0.1.0"

__all__ = [
    "AskTellOptimizer",
    "AskTellOptimizerABC",
    "AskTellOptimizerNoTraining",
    "AskTellOptimizerState",
    "BayesianOptimizer",
    "Dataset",
    "FrozenRecord",
    "OBJECTIVE",
    "Observer",
    "OptimizationResult",
    "Record",
    "acquisition",
    "logging",
    "models",
    "objectives",
    "space",
    "stop_at_minimum",
    "utils",
]
