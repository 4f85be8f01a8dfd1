"""trieste_tpu: a TPU-native Bayesian-optimization and active-learning framework.

A from-scratch JAX/XLA/pjit rebuild of the capabilities of
`secondmind-labs/trieste <https://github.com/secondmind-labs/trieste>`_ — see ``SURVEY.md``
for the blueprint. Functional core (immutable pytree state, explicit PRNG keys, vmapped
multi-start optimization, padded device-resident datasets) with a thin object shell
mirroring the reference's public API surface.
"""

from .data import Dataset
from .observer import OBJECTIVE, Observer

__version__ = "0.1.0"
