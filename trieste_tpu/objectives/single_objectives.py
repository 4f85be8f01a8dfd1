"""Single-objective benchmark problems.

TPU-native rebuild of the reference ``trieste/objectives/single_objectives.py``: the same
catalogue of standard synthetic problems (Branin, Hartmann, Michalewicz, …, all classic
functions from the optimization literature), implemented in JAX with vmap-friendly
vectorized evaluation. Each problem records its search space, minimizers and minimum for
regret-parity tests (reference ``single_objectives.py:38-76``).

Examples:

>>> import jax.numpy as jnp
>>> from trieste_tpu.objectives import Branin, ScaledBranin, Hartmann6
>>> Branin.search_space.dimension
2
>>> y = Branin.objective(Branin.minimizers)  # objective at the known minimizers
>>> bool(jnp.allclose(y, Branin.minimum, atol=1e-5))
True
>>> round(float(ScaledBranin.minimum[0]), 4)
-1.0474
>>> Hartmann6.objective(jnp.zeros((4, 6))).shape  # vectorized evaluation
(4, 1)
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..space import Box, LinearConstraint, NonlinearConstraint, SearchSpace
from ..types import TensorType

ObjectiveFn = Callable[[TensorType], jax.Array]


@dataclass(frozen=True)
class ObjectiveTestProblem:
    """(reference ``single_objectives.py:38-60``)"""

    name: str
    objective: ObjectiveFn
    search_space: SearchSpace

    @property
    def dim(self) -> int:
        return self.search_space.dimension

    @property
    def bounds(self) -> list:
        return [self.search_space.lower, self.search_space.upper]


@dataclass(frozen=True)
class SingleObjectiveTestProblem(ObjectiveTestProblem):
    """A test problem with known global minimum (reference ``single_objectives.py:65-76``)."""

    minimizers: TensorType  # [N, D] (host numpy: no device transfer at import)
    minimum: TensorType  # [1]


def _as_objective(f: Callable[[jax.Array], jax.Array]) -> ObjectiveFn:
    """Wrap an ``[..., D] -> [...]`` function to return ``[..., 1]``."""

    def objective(x: TensorType) -> jax.Array:
        x = jnp.asarray(x)
        return f(x)[..., None]

    return objective


# -- Branin family ------------------------------------------------------------------


def _branin_raw(x: jax.Array) -> jax.Array:
    x0, x1 = x[..., 0], x[..., 1]
    a, b, c = 1.0, 5.1 / (4 * math.pi**2), 5.0 / math.pi
    r, s, t = 6.0, 10.0, 1.0 / (8 * math.pi)
    return a * (x1 - b * x0**2 + c * x0 - r) ** 2 + s * (1 - t) * jnp.cos(x0) + s


branin = _as_objective(_branin_raw)
"""The Branin-Hoo function over [-5, 10] x [0, 15] (reference ``single_objectives.py:79-101``)."""


def _scaled_branin_raw(u: jax.Array) -> jax.Array:
    # unit-hypercube Branin, normalized to mean 0 / variance 1 over the domain
    x = jnp.stack([u[..., 0] * 15.0 - 5.0, u[..., 1] * 15.0], axis=-1)
    return (_branin_raw(x) - 54.8104) / 51.9496


scaled_branin = _as_objective(_scaled_branin_raw)
"""Branin rescaled to the unit hypercube with standardized outputs
(reference ``single_objectives.py:104-124``)."""

_BRANIN_MINIMIZERS = np.array(
    [[-math.pi, 12.275], [math.pi, 2.275], [9.42478, 2.475]]
)

Branin = SingleObjectiveTestProblem(
    name="Branin",
    objective=branin,
    search_space=Box([-5.0, 0.0], [10.0, 15.0]),
    minimizers=_BRANIN_MINIMIZERS,
    minimum=np.array([0.397887]),
)

ScaledBranin = SingleObjectiveTestProblem(
    name="Scaled Branin",
    objective=scaled_branin,
    search_space=Box([0.0, 0.0], [1.0, 1.0]),
    minimizers=(_BRANIN_MINIMIZERS + np.array([5.0, 0.0])) / 15.0,
    minimum=np.array([(0.397887 - 54.8104) / 51.9496]),
)


def _nonlinear_branin_constraint() -> NonlinearConstraint:
    """The toroidal feasibility constraint of the reference's constrained Branin
    (``single_objectives.py:152-184``)."""

    def constraint(x: TensorType) -> jax.Array:
        x = jnp.asarray(x)
        z = x - 0.5
        return jnp.sqrt(z[..., 0] ** 2 + z[..., 1] ** 2) - 0.4

    return NonlinearConstraint(constraint, -100.0, 0.0)


ConstrainedScaledBranin = SingleObjectiveTestProblem(
    name="Constrained Scaled Branin",
    objective=scaled_branin,
    search_space=Box([0.0, 0.0], [1.0, 1.0], constraints=[_nonlinear_branin_constraint()]),
    minimizers=np.array([[0.16518, 0.66518]]),
    minimum=np.array([-0.99888]),
)


# -- Simple quadratic / 1D problems -------------------------------------------------


def _simple_quadratic_raw(x: jax.Array) -> jax.Array:
    return -jnp.sum(jnp.square(x), axis=-1)


simple_quadratic = _as_objective(_simple_quadratic_raw)
"""Centred negated quadratic on the unit square (reference ``single_objectives.py:197-206``)."""

SimpleQuadratic = SingleObjectiveTestProblem(
    name="Simple Quadratic",
    objective=simple_quadratic,
    search_space=Box([0.0, 0.0], [1.0, 1.0]),
    minimizers=np.array([[1.0, 1.0]]),
    minimum=np.array([-2.0]),
)


def _gramacy_lee_raw(x: jax.Array) -> jax.Array:
    x0 = x[..., 0]
    return jnp.sin(10 * math.pi * x0) / (2 * x0) + (x0 - 1.0) ** 4


gramacy_lee = _as_objective(_gramacy_lee_raw)
"""(reference ``single_objectives.py:208-229``)"""

GramacyLee = SingleObjectiveTestProblem(
    name="Gramacy & Lee",
    objective=gramacy_lee,
    search_space=Box([0.5], [2.5]),
    minimizers=np.array([[0.548562]]),
    minimum=np.array([-0.869011]),
)


def _log_goldstein_price_raw(u: jax.Array) -> jax.Array:
    x = 4.0 * u - 2.0
    x0, x1 = x[..., 0], x[..., 1]
    a = (x0 + x1 + 1) ** 2
    b = 19 - 14 * x0 + 3 * x0**2 - 14 * x1 + 6 * x0 * x1 + 3 * x1**2
    c = (2 * x0 - 3 * x1) ** 2
    d = 18 - 32 * x0 + 12 * x0**2 + 48 * x1 - 36 * x0 * x1 + 27 * x1**2
    g = (1 + a * b) * (30 + c * d)
    return (jnp.log(g) - 8.693) / 2.427


logarithmic_goldstein_price = _as_objective(_log_goldstein_price_raw)
"""Standardized log Goldstein-Price on the unit square
(reference ``single_objectives.py:232-260``)."""

LogarithmicGoldsteinPrice = SingleObjectiveTestProblem(
    name="Logarithmic Goldstein-Price",
    objective=logarithmic_goldstein_price,
    search_space=Box([0.0, 0.0], [1.0, 1.0]),
    minimizers=np.array([[0.5, 0.25]]),
    minimum=np.array([-3.12913]),
)


# -- Hartmann family ----------------------------------------------------------------

_H3_A = np.array(
    [[3.0, 10.0, 30.0], [0.1, 10.0, 35.0], [3.0, 10.0, 30.0], [0.1, 10.0, 35.0]]
)
_H3_P = np.array(
    [
        [0.3689, 0.1170, 0.2673],
        [0.4699, 0.4387, 0.7470],
        [0.1091, 0.8732, 0.5547],
        [0.0381, 0.5743, 0.8828],
    ]
)
_H_ALPHA = np.array([1.0, 1.2, 3.0, 3.2])


def _hartmann_3_raw(x: jax.Array) -> jax.Array:
    inner = jnp.sum(_H3_A * jnp.square(x[..., None, :] - _H3_P), axis=-1)
    return -jnp.sum(_H_ALPHA * jnp.exp(-inner), axis=-1)


hartmann_3 = _as_objective(_hartmann_3_raw)
"""(reference ``single_objectives.py:263-293``)"""

Hartmann3 = SingleObjectiveTestProblem(
    name="Hartmann 3",
    objective=hartmann_3,
    search_space=Box([0.0] * 3, [1.0] * 3),
    minimizers=np.array([[0.114614, 0.555649, 0.852547]]),
    minimum=np.array([-3.86278]),
)

_H6_A = np.array(
    [
        [10.0, 3.0, 17.0, 3.5, 1.7, 8.0],
        [0.05, 10.0, 17.0, 0.1, 8.0, 14.0],
        [3.0, 3.5, 1.7, 10.0, 17.0, 8.0],
        [17.0, 8.0, 0.05, 10.0, 0.1, 14.0],
    ]
)
_H6_P = np.array(
    [
        [0.1312, 0.1696, 0.5569, 0.0124, 0.8283, 0.5886],
        [0.2329, 0.4135, 0.8307, 0.3736, 0.1004, 0.9991],
        [0.2348, 0.1451, 0.3522, 0.2883, 0.3047, 0.6650],
        [0.4047, 0.8828, 0.8732, 0.5743, 0.1091, 0.0381],
    ]
)


def _hartmann_6_raw(x: jax.Array) -> jax.Array:
    inner = jnp.sum(_H6_A * jnp.square(x[..., None, :] - _H6_P), axis=-1)
    return -jnp.sum(_H_ALPHA * jnp.exp(-inner), axis=-1)


hartmann_6 = _as_objective(_hartmann_6_raw)
"""(reference ``single_objectives.py:476-512``)"""

Hartmann6 = SingleObjectiveTestProblem(
    name="Hartmann 6",
    objective=hartmann_6,
    search_space=Box([0.0] * 6, [1.0] * 6),
    minimizers=np.array(
        [[0.20169, 0.150011, 0.476874, 0.275332, 0.311652, 0.6573]]
    ),
    minimum=np.array([-3.32237]),
)


# -- Shekel -------------------------------------------------------------------------

_SHEKEL_BETA = np.array([1, 2, 2, 4, 4, 6, 3, 7, 5, 5], dtype=np.float64) / 10.0
_SHEKEL_C = np.array(
    [
        [4.0, 1.0, 8.0, 6.0, 3.0, 2.0, 5.0, 8.0, 6.0, 7.0],
        [4.0, 1.0, 8.0, 6.0, 7.0, 9.0, 3.0, 1.0, 2.0, 3.6],
        [4.0, 1.0, 8.0, 6.0, 3.0, 2.0, 5.0, 8.0, 6.0, 7.0],
        [4.0, 1.0, 8.0, 6.0, 7.0, 9.0, 3.0, 1.0, 2.0, 3.6],
    ]
)


def _shekel_4_raw(x: jax.Array) -> jax.Array:
    # standardized as in the reference (:297-333): inputs in unit cube, outputs scaled
    z = x * 10.0
    d2 = jnp.sum(jnp.square(z[..., :, None] - _SHEKEL_C), axis=-2)  # [..., 10]
    val = -jnp.sum(1.0 / (d2 + _SHEKEL_BETA), axis=-1)
    return (val + 1.0) / 2.73


shekel_4 = _as_objective(_shekel_4_raw)
"""(reference ``single_objectives.py:297-333``)"""

Shekel4 = SingleObjectiveTestProblem(
    name="Shekel 4",
    objective=shekel_4,
    search_space=Box([0.0] * 4, [1.0] * 4),
    minimizers=np.array([[0.4, 0.4, 0.4, 0.4]]),
    minimum=np.array([(-10.5363 + 1.0) / 2.73]),
)


# -- Levy / Rosenbrock / Ackley ------------------------------------------------------


def _levy_raw(x: jax.Array) -> jax.Array:
    w = 1.0 + (x - 1.0) / 4.0
    term1 = jnp.sin(math.pi * w[..., 0]) ** 2
    wi = w[..., :-1]
    mid = jnp.sum(
        (wi - 1.0) ** 2 * (1.0 + 10.0 * jnp.sin(math.pi * wi + 1.0) ** 2), axis=-1
    )
    last = (w[..., -1] - 1.0) ** 2 * (1.0 + jnp.sin(2 * math.pi * w[..., -1]) ** 2)
    return term1 + mid + last


def _levy_8_raw(u: jax.Array) -> jax.Array:
    return _levy_raw(u * 20.0 - 10.0)


levy_8 = _as_objective(_levy_8_raw)
"""Levy in 8D on the unit hypercube (reference ``single_objectives.py:336-380``)."""

Levy8 = SingleObjectiveTestProblem(
    name="Levy 8",
    objective=levy_8,
    search_space=Box([0.0] * 8, [1.0] * 8),
    minimizers=(np.ones((1, 8)) + 10.0) / 20.0,
    minimum=np.array([0.0]),
)


def _rosenbrock_raw(x: jax.Array) -> jax.Array:
    return jnp.sum(
        100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2 + (1.0 - x[..., :-1]) ** 2, axis=-1
    )


def _rosenbrock_4_raw(u: jax.Array) -> jax.Array:
    # standardized 4D Rosenbrock on the unit cube (reference :384-430)
    x = u * 4.1 - 2.048
    return (_rosenbrock_raw(x) - 3.827 * 1e3) / (3.755 * 1e3)


rosenbrock_4 = _as_objective(_rosenbrock_4_raw)
"""(reference ``single_objectives.py:384-430``)"""

Rosenbrock4 = SingleObjectiveTestProblem(
    name="Rosenbrock 4",
    objective=rosenbrock_4,
    search_space=Box([0.0] * 4, [1.0] * 4),
    minimizers=(np.ones((1, 4)) + 2.048) / 4.1,
    # pure-host evaluation of the standardized minimum (x*=1 -> raw 0): no device op
    minimum=np.array([(0.0 - 3.827e3) / 3.755e3]),
)


def _ackley_5_raw(u: jax.Array) -> jax.Array:
    x = u * 65.536 - 32.768
    d = x.shape[-1]
    a, b, c = 20.0, 0.2, 2 * math.pi
    s1 = jnp.sum(jnp.square(x), axis=-1) / d
    s2 = jnp.sum(jnp.cos(c * x), axis=-1) / d
    return -a * jnp.exp(-b * jnp.sqrt(s1)) - jnp.exp(s2) + a + math.e


ackley_5 = _as_objective(_ackley_5_raw)
"""Ackley in 5D on the unit hypercube (reference ``single_objectives.py:434-472``)."""

Ackley5 = SingleObjectiveTestProblem(
    name="Ackley 5",
    objective=ackley_5,
    search_space=Box([0.0] * 5, [1.0] * 5),
    minimizers=np.full((1, 5), 32.768 / 65.536),
    minimum=np.array([0.0]),
)


# -- Michalewicz / Trid --------------------------------------------------------------


def _michalewicz_raw(x: jax.Array, m: float = 10.0) -> jax.Array:
    d = x.shape[-1]
    i = jnp.arange(1, d + 1, dtype=x.dtype)
    return -jnp.sum(
        jnp.sin(x) * jnp.sin(i * jnp.square(x) / math.pi) ** (2 * m), axis=-1
    )


def _make_michalewicz(d: int, minimizer: Sequence[float], minimum: float):
    obj = _as_objective(lambda x: _michalewicz_raw(x))
    return SingleObjectiveTestProblem(
        name=f"Michalewicz {d}",
        objective=obj,
        search_space=Box([0.0] * d, [math.pi] * d),
        minimizers=np.array([minimizer]),
        minimum=np.array([minimum]),
    )


michalewicz = _as_objective(_michalewicz_raw)
"""(reference ``single_objectives.py:516-612``)"""

Michalewicz2 = _make_michalewicz(2, [2.202906, 1.570796], -1.8013034)
Michalewicz5 = _make_michalewicz(
    5, [2.202906, 1.570796, 1.284992, 1.923058, 1.720470], -4.687658
)
Michalewicz10 = _make_michalewicz(
    10,
    [
        2.202906, 1.570796, 1.284992, 1.923058, 1.720470,
        1.570796, 1.454414, 1.756087, 1.655717, 1.570796,
    ],
    -9.66015,
)


def _trid_raw(x: jax.Array) -> jax.Array:
    return jnp.sum(jnp.square(x - 1.0), axis=-1) - jnp.sum(
        x[..., 1:] * x[..., :-1], axis=-1
    )


trid = _as_objective(_trid_raw)
"""(reference ``single_objectives.py:616-655``)"""


def _make_trid(d: int) -> SingleObjectiveTestProblem:
    i = jnp.arange(1, d + 1, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    minimizer = i * (d + 1.0 - i)
    minimum = -d * (d + 4.0) * (d - 1.0) / 6.0
    return SingleObjectiveTestProblem(
        name=f"Trid {d}",
        objective=trid,
        search_space=Box([-(d**2.0)] * d, [d**2.0] * d),
        minimizers=minimizer[None, :],
        minimum=np.array([minimum]),
    )


Trid10 = _make_trid(10)


# -- Reference-parity function aliases ----------------------------------------------
# The reference exposes every problem both as a dataclass and as a bare vectorized
# function (``single_objectives.py``); the generic forms take any dimension.

ObjectiveTestFunction = ObjectiveFn
"""Alias of the objective-function type (reference ``single_objectives.py:35``)."""

levy = _as_objective(_levy_raw)
rosenbrock = _as_objective(_rosenbrock_raw)
michalewicz_2 = Michalewicz2.objective
michalewicz_5 = Michalewicz5.objective
michalewicz_10 = Michalewicz10.objective
trid_10 = Trid10.objective


def check_objective_shapes(d: int):
    """Decorator asserting an objective maps ``[..., d] -> [..., 1]`` (role of the
    reference's ``check_shapes`` contract, ``single_objectives.py:78-80``) — checks run
    at trace time, so they are free inside ``jit``."""

    def decorator(f: ObjectiveFn) -> ObjectiveFn:
        def wrapped(x: TensorType) -> jax.Array:
            x = jnp.asarray(x)
            if x.shape[-1] != d:
                raise ValueError(f"objective expects [..., {d}] inputs, got {x.shape}")
            out = f(x)
            if out.shape != x.shape[:-1] + (1,):
                raise ValueError(
                    f"objective returned {out.shape}, expected {x.shape[:-1] + (1,)}"
                )
            return out

        return wrapped

    return decorator
