"""Plotting utilities for inequality-constrained problems.

TPU-native counterpart of the reference
``trieste/experimental/plotting/inequality_constraints.py:30-187``: a ``Simulation``
protocol bundling (objective, constraint, threshold), plus figure builders showing the
constrained objective landscape and the feasible/infeasible split of query points.
JAX/numpy only — no TF tensors, so data can be jnp arrays, np arrays or Datasets'
trimmed views.
"""
from __future__ import annotations

from typing import Optional, Protocol, Tuple, Type, runtime_checkable

import numpy as np

from ...types import TensorType
from .plotting import create_grid


@runtime_checkable
class Simulation(Protocol):
    """A constrained simulation: objective + constraint + feasibility threshold
    (reference ``inequality_constraints.py:30-44``)."""

    threshold: float

    @staticmethod
    def objective(input_data: TensorType) -> TensorType:
        ...

    @staticmethod
    def constraint(input_data: TensorType) -> TensorType:
        ...


def _np(x) -> np.ndarray:
    return np.asarray(x)


def plot_objective_and_constraints(search_space, simulation: Type[Simulation]):
    """2x2 panel: objective, constraint, and both masked to the feasible region
    (reference ``inequality_constraints.py:46-90``)."""
    import matplotlib.pyplot as plt

    grid, xx, yy = create_grid(search_space.lower, search_space.upper, grid_density=30)
    objective = _np(simulation.objective(grid))
    constraint = _np(simulation.constraint(grid))
    fig, (axes1, axes2) = plt.subplots(2, 2, sharex="all", sharey="all", figsize=(8, 8))
    levels = 30

    axes1[0].contourf(xx, yy, objective.reshape(*xx.shape), levels, alpha=0.9)
    axes1[1].contourf(xx, yy, constraint.reshape(*xx.shape), levels, alpha=0.9)
    axes1[0].set_title("Objective")
    axes1[1].set_title("Constraint")

    mask = (constraint > simulation.threshold).reshape(objective.shape)
    objective_masked = np.ma.array(objective, mask=mask)
    constraint_masked = np.ma.array(constraint, mask=mask)
    axes2[0].contourf(xx, yy, objective_masked.reshape(*xx.shape), levels, alpha=0.9)
    axes2[1].contourf(xx, yy, constraint_masked.reshape(*xx.shape), levels, alpha=0.9)
    axes2[0].set_title("Constrained objective")
    axes2[1].set_title("Constraint mask")

    lower, upper = _np(search_space.lower), _np(search_space.upper)
    for ax in np.ravel([axes1, axes2]):
        ax.set_xlim(lower[0], upper[0])
        ax.set_ylim(lower[1], upper[1])
    return fig


def plot_init_query_points(
    search_space,
    simulation: Type[Simulation],
    objective_data: TensorType,
    constraint_data: TensorType,
    new_constraint_data: Optional[Tuple[TensorType, TensorType]] = None,
):
    """Query points over the feasibility-masked objective: feasible points filled,
    infeasible hollow; optional new points in a second colour
    (reference ``inequality_constraints.py:91-155``).

    ``objective_data``/``constraint_data`` are ``[N, D(+1)]`` arrays whose first two
    columns are the 2-D inputs and whose last column is the observation.
    """
    import matplotlib.pyplot as plt

    levels, psize = 30, 15
    cw, cb, co = "white", "tab:blue", "tab:orange"
    grid, xx, yy = create_grid(search_space.lower, search_space.upper, grid_density=30)
    objective = _np(simulation.objective(grid))
    constraint = _np(simulation.constraint(grid))
    fig, ax = plt.subplots(1, 1, figsize=(8, 6))

    mask = np.zeros_like(objective, dtype=bool)
    mask[constraint[:, 0] > simulation.threshold, :] = True
    objective_masked = np.ma.array(objective, mask=mask)

    def in_out(points, cvals):
        points, cvals = _np(points), _np(cvals)
        ids_in = cvals[:, -1] <= simulation.threshold
        return points[ids_in], points[~ids_in]

    pts_in, pts_out = in_out(objective_data, constraint_data)
    ax.contourf(xx, yy, objective_masked.reshape(*xx.shape), levels, alpha=0.9)
    ax.scatter(pts_in[:, 0], pts_in[:, 1], s=psize, c=cb, edgecolors=cw, marker="o")
    ax.scatter(pts_out[:, 0], pts_out[:, 1], s=psize, c=cw, edgecolors=cb, marker="o")

    if new_constraint_data is not None:
        new_points, new_cvals = new_constraint_data
        n_in, n_out = in_out(new_points, new_cvals)
        ax.scatter(n_in[:, 0], n_in[:, 1], s=psize, c=co, edgecolors=cw, marker="o")
        ax.scatter(n_out[:, 0], n_out[:, 1], s=psize, c=cw, edgecolors=co, marker="o")

    lower, upper = _np(search_space.lower), _np(search_space.upper)
    ax.set_title("Constrained objective")
    ax.set_xlim(lower[0], upper[0])
    ax.set_ylim(lower[1], upper[1])
    return fig


def plot_2obj_cst_query_points(
    search_space,
    simulation: Type[Simulation],
    objective_data: TensorType,
    constraint_data: TensorType,
) -> list:
    """Per-objective constrained query-point figures for a 2-output simulation
    (reference ``inequality_constraints.py:156-187``). Returns the two figures."""
    figures = []
    for idx in range(2):

        class _SimSlice:
            threshold = simulation.threshold
            constraint = staticmethod(simulation.constraint)

            @staticmethod
            def objective(input_data, _idx=idx):
                return _np(simulation.objective(input_data))[:, _idx : _idx + 1]

        figures.append(
            plot_init_query_points(search_space, _SimSlice, objective_data, constraint_data)
        )
    return figures
