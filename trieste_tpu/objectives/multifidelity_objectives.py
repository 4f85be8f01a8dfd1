"""Multifidelity benchmark problems (reference
``trieste/objectives/multifidelity_objectives.py:28-106``): the Forrester-based linear
multifidelity family where higher fidelity indices interpolate towards the exact
function."""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..space import Box, DiscreteSearchSpace, SearchSpace, TaggedProductSearchSpace
from ..types import TensorType
from .single_objectives import SingleObjectiveTestProblem


@dataclass(frozen=True)
class SingleObjectiveMultifidelityTestProblem(SingleObjectiveTestProblem):
    """(reference ``multifidelity_objectives.py:28-34``)"""

    num_fidelities: int = 2
    fidelity_search_space: SearchSpace = None  # type: ignore[assignment]


def linear_multifidelity(x: TensorType) -> jax.Array:
    """The Forrester function with linearly-varying fidelity (reference
    ``multifidelity_objectives.py:36-45``): the trailing input column is the fidelity
    index; fidelity 0 is the coarsest."""
    x = jnp.asarray(x)
    x_input = x[..., :-1]
    x_fidelity = x[..., -1:]
    f = 0.5 * ((6.0 * x_input - 2.0) ** 2) * jnp.sin(12.0 * x_input - 4.0) + 10.0 * (
        x_input - 1.0
    )
    return f + x_fidelity * (f - 20.0 * (x_input - 1.0))


def _fidelity_space(n_fidelities: int, input_space: Box) -> TaggedProductSearchSpace:
    fidelities = DiscreteSearchSpace(
        np.arange(n_fidelities, dtype=float).reshape(-1, 1)
    )
    return TaggedProductSearchSpace([input_space, fidelities], ["input", "fidelity"])


_MINIMIZERS = {2: 0.75724875, 3: 0.76333767, 5: 0.76801846}
_MINIMA = {2: -6.020740055, 3: -6.634287061, 5: -7.933019704}


def _make_linear(n: int) -> SingleObjectiveMultifidelityTestProblem:
    return SingleObjectiveMultifidelityTestProblem(
        name=f"Linear {n} Fidelity",
        objective=linear_multifidelity,
        search_space=Box(np.zeros(1), np.ones(1)),
        minimizers=np.array([[_MINIMIZERS[n]]]),
        minimum=np.array([_MINIMA[n]]),
        num_fidelities=n,
        fidelity_search_space=_fidelity_space(n, Box(np.zeros(1), np.ones(1))),
    )


Linear2Fidelity = _make_linear(2)
Linear3Fidelity = _make_linear(3)
Linear5Fidelity = _make_linear(5)
