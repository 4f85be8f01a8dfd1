"""Smoke + value tests for the plotting surface (reference keeps plotting out of
coverage, but we at least pin the API and the non-trivial logic: point markers,
Pareto staircase inputs, feasibility shading, GIF encoding)."""
from __future__ import annotations

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

from trieste_tpu.experimental.plotting import (
    convert_figure_to_frame,
    convert_frames_to_gif,
    create_grid,
    format_point_markers,
    plot_acq_function_2d,
    plot_feasible_region_2d,
    plot_mobo_history,
    plot_constrained_objective_2d,
    plot_pareto_front_2d,
    plot_regret,
    plot_surface,
)
from trieste_tpu.space import Box, NonlinearConstraint


def test_format_point_markers():
    markers, colors = format_point_markers(
        6, num_init=2, idx_best=[5], mask_fail=np.array([0, 0, 1, 0, 0, 0], bool)
    )
    assert list(markers) == ["x", "x", "o", "o", "o", "o"]
    assert colors[2] == "tab:red"
    assert colors[5] == "tab:purple"
    assert colors[0] == "tab:green"


def test_plot_regret_and_mobo_history_run():
    fig, (ax1, ax2) = plt.subplots(1, 2)
    plot_regret(np.array([3.0, 2.0, 2.5, 1.0]), ax1, num_init=2, minimum=0.5)
    plot_mobo_history(
        np.random.default_rng(0).uniform(size=(10, 2)),
        lambda obs: float(obs.min()),
        num_init=3,
        ax=ax2,
    )
    plt.close(fig)


def test_plot_acq_function_2d_runs():
    fig, ax = plot_acq_function_2d(
        lambda x: -jnp.sum(jnp.square(jnp.asarray(x)[..., 0, :]), -1, keepdims=True),
        [0.0, 0.0],
        [1.0, 1.0],
        grid_density=10,
        title="acq",
    )
    plt.close(fig)


def test_constraint_plots():
    c = NonlinearConstraint(lambda x: x[..., 0] + x[..., 1], lb=0.5, ub=2.0)
    space = Box([0.0, 0.0], [1.0, 1.0], constraints=[c])
    fig, ax = plt.subplots()
    plot_feasible_region_2d(space, ax, grid_density=30)
    plt.close(fig)
    fig, ax = plot_constrained_objective_2d(
        space, lambda x: jnp.sum(jnp.square(x), -1), grid_density=30
    )
    plt.close(fig)


def test_plot_pareto_front_2d():
    obs = np.array([[0.1, 0.9], [0.5, 0.5], [0.9, 0.1], [0.8, 0.8]])
    fig, ax = plt.subplots()
    plot_pareto_front_2d(obs, ax, reference_point=np.array([1.0, 1.0]))
    plt.close(fig)


def test_figure_to_frames_to_gif():
    fig, ax = plt.subplots(figsize=(2, 2))
    ax.plot([0, 1], [0, 1])
    frame = convert_figure_to_frame(fig)
    plt.close(fig)
    assert frame.ndim == 3 and frame.shape[-1] == 3
    gif = convert_frames_to_gif([frame, frame])
    data = gif.read()
    assert data[:6] in (b"GIF87a", b"GIF89a")


def test_format_point_markers_roles():
    """Plotly-independent marker logic (reference ``plotting_plotly.py:31-66``)."""
    from trieste_tpu.experimental.plotting.plotting_plotly import format_point_markers

    cols, marks = format_point_markers(
        6, num_init=2, idx_best=4, mask_fail=np.array([False, False, True, False, False, False])
    )
    assert list(marks[:2]) == ["x", "x"] and set(marks[2:]) == {"circle"}
    assert cols[2] == "red" and cols[4] == "darkmagenta" and cols[0] == "green"


def test_plotly_functions_gated_without_plotly():
    """Without the optional plotly extra, the plotly entry points raise ImportError
    cleanly (reference gates its extras the same way, ``setup.py:52-55``)."""
    from trieste_tpu.experimental.plotting import plotting_plotly as pp

    if pp.PLOTLY_AVAILABLE:  # pragma: no cover - env-dependent
        import pytest

        pytest.skip("plotly installed in this environment")
    with np.testing.assert_raises(ImportError):
        pp.add_surface_plotly(np.eye(2), np.eye(2), np.eye(2), fig=None)


def test_plot_surface_contour_modes():
    points, XX, YY = create_grid(np.array([0.0, 0.0]), np.array([1.0, 1.0]), 12)
    vals = (points**2).sum(-1)
    fig, ax = plt.subplots()
    cs = plot_surface(XX, YY, vals, ax, contour=True, fill=True)
    assert cs is not None
    plt.close(fig)


def test_inequality_constraints_figures():
    """Simulation-protocol constrained plots (reference
    ``inequality_constraints.py:30-187``)."""
    import jax.numpy as jnp

    from trieste_tpu.experimental.plotting import (
        plot_2obj_cst_query_points,
        plot_init_query_points,
        plot_objective_and_constraints,
    )
    from trieste_tpu.space import Box

    class Sim:
        threshold = 0.5

        @staticmethod
        def objective(x):
            return jnp.sum(jnp.square(x), -1, keepdims=True)

        @staticmethod
        def constraint(x):
            return jnp.sum(x, -1, keepdims=True)

    space = Box([0.0, 0.0], [1.0, 1.0])
    fig = plot_objective_and_constraints(space, Sim)
    plt.close(fig)
    pts = np.array([[0.1, 0.2], [0.8, 0.9], [0.3, 0.1]])
    cvals = np.asarray(Sim.constraint(jnp.asarray(pts)))
    fig = plot_init_query_points(space, Sim, pts, cvals)
    plt.close(fig)

    class Sim2(Sim):
        @staticmethod
        def objective(x):
            return jnp.stack([jnp.sum(x**2, -1), jnp.sum((x - 1) ** 2, -1)], axis=-1)

    figs = plot_2obj_cst_query_points(space, Sim2, pts, cvals)
    assert len(figs) == 2
    for f in figs:
        plt.close(f)
