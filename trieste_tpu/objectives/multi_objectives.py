"""Multi-objective benchmark problems (reference ``trieste/objectives/multi_objectives.py``):
VLMOP2 and the DTLZ family, with generators for Pareto-optimal points."""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Callable, Protocol, runtime_checkable

import jax
import jax.numpy as jnp

from ..space import Box
from ..types import TensorType
from .single_objectives import ObjectiveTestProblem


@runtime_checkable
class GenParetoOptimalPoints(Protocol):
    """A function generating ``n`` Pareto-optimal points with an optional PRNG key
    (reference ``multi_objectives.py:32-47``)."""

    def __call__(self, n: int, key=None):  # pragma: no cover - protocol
        ...


@dataclass(frozen=True)
class MultiObjectiveTestProblem(ObjectiveTestProblem):
    """A multi-objective test problem with a Pareto-optimal point generator
    (reference ``multi_objectives.py:47-73``)."""

    gen_pareto_optimal_points: Callable[[int, jax.Array], jax.Array]


def vlmop2(x: TensorType, d: int = 2) -> jax.Array:
    """The VLMOP2 function, 2 objectives (reference ``multi_objectives.py:76-105``)."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    transl = 1.0 / math.sqrt(n)
    f1 = 1.0 - jnp.exp(-jnp.sum((x - transl) ** 2, axis=-1))
    f2 = 1.0 - jnp.exp(-jnp.sum((x + transl) ** 2, axis=-1))
    return jnp.stack([f1, f2], axis=-1)


def _vlmop2_pareto(n: int, key: jax.Array) -> jax.Array:
    d = 2
    transl = 1.0 / math.sqrt(d)
    t = jnp.linspace(-transl, transl, n)
    pts = jnp.stack([t, t], axis=-1)
    return vlmop2(pts)


VLMOP2 = MultiObjectiveTestProblem(
    name="VLMOP2",
    objective=vlmop2,
    search_space=Box([-2.0, -2.0], [2.0, 2.0]),
    gen_pareto_optimal_points=_vlmop2_pareto,
)


def dtlz_mkd(input_dim: int, num_objectives: int) -> tuple[int, int, int]:
    """(reference ``multi_objectives.py:149-153``)"""
    if input_dim <= 0 or num_objectives <= 0 or input_dim <= num_objectives:
        raise ValueError(
            f"DTLZ requires input_dim > num_objectives > 0, got {input_dim}, "
            f"{num_objectives}"
        )
    M = num_objectives
    d = input_dim
    k = d - M + 1
    return M, k, d


def dtlz1(x: TensorType, num_objectives: int = 2) -> jax.Array:
    """DTLZ1 (reference ``multi_objectives.py:155-213``)."""
    x = jnp.asarray(x)
    M = num_objectives
    xm = x[..., M - 1 :]
    g = 100.0 * (
        xm.shape[-1]
        + jnp.sum((xm - 0.5) ** 2 - jnp.cos(20.0 * math.pi * (xm - 0.5)), axis=-1)
    )
    objs = []
    for i in range(M):
        f = 0.5 * (1.0 + g)
        for j in range(M - 1 - i):
            f = f * x[..., j]
        if i > 0:
            f = f * (1.0 - x[..., M - 1 - i])
        objs.append(f)
    return jnp.stack(objs, axis=-1)


def dtlz2(x: TensorType, num_objectives: int = 2) -> jax.Array:
    """DTLZ2 (reference ``multi_objectives.py:215-271``)."""
    x = jnp.asarray(x)
    M = num_objectives
    xm = x[..., M - 1 :]
    g = jnp.sum((xm - 0.5) ** 2, axis=-1)
    objs = []
    for i in range(M):
        f = 1.0 + g
        for j in range(M - 1 - i):
            f = f * jnp.cos(0.5 * math.pi * x[..., j])
        if i > 0:
            f = f * jnp.sin(0.5 * math.pi * x[..., M - 1 - i])
        objs.append(f)
    return jnp.stack(objs, axis=-1)


def _dtlz1_pareto(M: int, n: int, key: jax.Array) -> jax.Array:
    w = jax.random.dirichlet(key, jnp.ones(M), (n,))
    return 0.5 * w


def _dtlz2_pareto(M: int, n: int, key: jax.Array) -> jax.Array:
    z = jnp.abs(jax.random.normal(key, (n, M)))
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    return z


def DTLZ1(input_dim: int, num_objectives: int) -> MultiObjectiveTestProblem:
    M, k, d = dtlz_mkd(input_dim, num_objectives)
    return MultiObjectiveTestProblem(
        name=f"DTLZ1({d}, {M})",
        objective=partial(dtlz1, num_objectives=M),
        search_space=Box([0.0] * d, [1.0] * d),
        gen_pareto_optimal_points=partial(_dtlz1_pareto, M),
    )


def DTLZ2(input_dim: int, num_objectives: int) -> MultiObjectiveTestProblem:
    M, k, d = dtlz_mkd(input_dim, num_objectives)
    return MultiObjectiveTestProblem(
        name=f"DTLZ2({d}, {M})",
        objective=partial(dtlz2, num_objectives=M),
        search_space=Box([0.0] * d, [1.0] * d),
        gen_pareto_optimal_points=partial(_dtlz2_pareto, M),
    )
