"""Matplotlib plotting utilities.

TPU-native rebuild of the reference ``trieste/experimental/plotting/plotting.py``
(1.1k LoC): regret curves, 2D function/GP surfaces, BO point overlays, trust-region
history and multi-objective point clouds. Kept host-side and dependency-light
(matplotlib only; plotly variants are gated in ``plotting_plotly``).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

from ...data import Dataset
from ...types import TensorType


def _to_np(x) -> np.ndarray:
    return np.asarray(x)


def plot_regret(
    observations: TensorType,
    ax,
    num_init: int = 0,
    show_obs: bool = True,
    minimum: Optional[float] = None,
) -> None:
    """Plot the running-minimum regret curve (reference ``plotting.py`` ``plot_regret``)."""
    obs = _to_np(observations).reshape(-1)
    best = np.minimum.accumulate(obs)
    steps = np.arange(len(obs))
    if show_obs:
        ax.scatter(steps, obs, s=12, alpha=0.5, label="observations")
    ax.plot(steps, best, color="C1", label="best so far")
    if minimum is not None:
        ax.axhline(minimum, color="k", linestyle="--", alpha=0.5, label="minimum")
    if num_init:
        ax.axvline(num_init - 0.5, color="gray", linestyle=":", alpha=0.7)
    ax.set_xlabel("observation index")
    ax.set_ylabel("objective")
    ax.legend()


def create_grid(
    mins: TensorType, maxs: TensorType, grid_density: int = 30
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A 2D evaluation grid (reference ``create_grid``)."""
    mins, maxs = _to_np(mins), _to_np(maxs)
    xs = np.linspace(mins[0], maxs[0], grid_density)
    ys = np.linspace(mins[1], maxs[1], grid_density)
    XX, YY = np.meshgrid(xs, ys)
    points = np.stack([XX.ravel(), YY.ravel()], axis=-1)
    return points, XX, YY


def plot_surface(
    xx: np.ndarray,
    yy: np.ndarray,
    f: np.ndarray,
    ax,
    contour: bool = False,
    fill: bool = False,
    alpha: float = 1.0,
):
    """Add a contour or 3D surface of meshgrid data to an axis
    (reference ``plotting.py:66-99``)."""
    f = _to_np(f).reshape(np.shape(xx))
    if contour:
        if fill:
            return ax.contourf(xx, yy, f, 80, alpha=alpha)
        return ax.contour(xx, yy, f, 80, alpha=alpha)
    return ax.plot_surface(xx, yy, f, alpha=alpha, linewidth=0, antialiased=False)


def plot_function_2d(
    f: Callable[[TensorType], TensorType],
    mins: TensorType,
    maxs: TensorType,
    grid_density: int = 30,
    contour: bool = True,
    title: Optional[str] = None,
    fig=None,
    ax=None,
):
    """Contour plot of a 2D function (reference ``plot_function_2d``)."""
    import matplotlib.pyplot as plt

    points, XX, YY = create_grid(mins, maxs, grid_density)
    values = _to_np(f(points)).reshape(XX.shape[0], XX.shape[1], -1)[:, :, 0]
    if ax is None:
        fig, ax = plt.subplots()
    if contour:
        cs = ax.contourf(XX, YY, values, levels=30)
        if fig is not None:
            fig.colorbar(cs, ax=ax)
    else:
        ax.pcolormesh(XX, YY, values)
    if title:
        ax.set_title(title)
    return fig, ax


def plot_gp_2d(
    model,
    mins: TensorType,
    maxs: TensorType,
    grid_density: int = 30,
    fig=None,
):
    """Posterior mean and variance surfaces of a 2-input model
    (reference ``plot_gp_2d``)."""
    import matplotlib.pyplot as plt

    points, XX, YY = create_grid(mins, maxs, grid_density)
    mean, var = model.predict(points)
    if fig is None:
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    else:
        axes = fig.subplots(1, 2)
    for ax, vals, name in zip(axes, [mean, var], ["mean", "variance"]):
        cs = ax.contourf(XX, YY, _to_np(vals)[:, 0].reshape(XX.shape), levels=30)
        fig.colorbar(cs, ax=ax)
        ax.set_title(name)
    return fig, axes


def plot_bo_points(
    pts: TensorType,
    ax,
    num_init: int = 0,
    idx_best: Optional[int] = None,
) -> None:
    """Overlay BO query points: initial vs acquired vs best (reference ``plot_bo_points``)."""
    pts = _to_np(pts)
    if num_init:
        ax.scatter(pts[:num_init, 0], pts[:num_init, 1], c="black", marker="x",
                   label="initial")
    ax.scatter(pts[num_init:, 0], pts[num_init:, 1], c="tab:red", s=18, label="acquired")
    if idx_best is not None:
        ax.scatter(pts[idx_best, 0], pts[idx_best, 1], c="gold", marker="*",
                   s=150, edgecolor="k", label="best")
    ax.legend()


def plot_mobo_points_in_obj_space(
    obs_values: TensorType,
    num_init: Optional[int] = None,
    mask_fail: Optional[np.ndarray] = None,
    ax=None,
):
    """Multi-objective observations with the Pareto front highlighted
    (reference ``plot_mobo_points_in_obj_space``)."""
    import matplotlib.pyplot as plt

    from ...acquisition.multi_objective import non_dominated

    obs = _to_np(obs_values)
    _, nd_mask = non_dominated(obs)
    nd_mask = _to_np(nd_mask)
    if ax is None:
        _, ax = plt.subplots()
    ax.scatter(obs[~nd_mask, 0], obs[~nd_mask, 1], c="tab:blue", alpha=0.5,
               label="dominated")
    ax.scatter(obs[nd_mask, 0], obs[nd_mask, 1], c="tab:red", label="Pareto front")
    ax.set_xlabel("objective 1")
    ax.set_ylabel("objective 2")
    ax.legend()
    return ax


def plot_trust_region_history_2d(
    obj_func: Callable[[TensorType], TensorType],
    mins: TensorType,
    maxs: TensorType,
    history: Sequence,
    num_query_points: Optional[int] = None,
    num_init: Optional[int] = None,
):
    """Contour of the objective with the final step's trust-region boxes overlaid
    (reference ``plot_trust_region_history_2d``)."""
    import matplotlib.patches as patches
    import matplotlib.pyplot as plt

    fig, ax = plot_function_2d(obj_func, mins, maxs, contour=True)
    if not history:
        return fig, ax
    record = history[-1]
    record = record.load() if hasattr(record, "load") else record
    state = record.acquisition_state
    if state is not None and hasattr(state, "subspaces"):
        for i, region in enumerate(state.subspaces):
            lower = _to_np(region.lower)
            upper = _to_np(region.upper)
            rect = patches.Rectangle(
                lower, *(upper - lower), fill=False, edgecolor=f"C{i % 10}", linewidth=2
            )
            ax.add_patch(rect)
    from ...utils.misc import ignoring_local_tags

    ds = ignoring_local_tags(record.datasets)
    if ds:
        qp = _to_np(next(iter(ds.values())).trimmed_query_points)
        plot_bo_points(qp, ax, num_init or 0)
    return fig, ax


def plot_acq_function_2d(
    acq_fn: Callable[[TensorType], TensorType],
    mins: TensorType,
    maxs: TensorType,
    grid_density: int = 40,
    contour: bool = True,
    colorbar: bool = True,
    title: Optional[str] = None,
    fig_size: Tuple[float, float] = (8.0, 6.0),
):
    """Plot an acquisition function over a 2D box; the function is evaluated on the
    rank-3 ``[N, 1, D]`` protocol shape (reference ``plotting.py:183-237``)."""
    import matplotlib.pyplot as plt

    points, XX, YY = create_grid(mins, maxs, grid_density)
    vals = _to_np(acq_fn(points[:, None, :])).reshape(XX.shape)
    fig, ax = plt.subplots(figsize=fig_size)
    if contour:
        cm = ax.contourf(XX, YY, vals, levels=40)
    else:
        cm = ax.pcolormesh(XX, YY, vals)
    if colorbar:
        fig.colorbar(cm, ax=ax)
    if title:
        ax.set_title(title)
    return fig, ax


def format_point_markers(
    num_pts: int,
    num_init: int = 0,
    idx_best: Optional[Sequence[int]] = None,
    mask_fail: Optional[np.ndarray] = None,
    m_init: str = "x",
    m_add: str = "o",
    c_pass: str = "tab:green",
    c_fail: str = "tab:red",
    c_best: str = "tab:purple",
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-point marker symbols and colors for BO progress plots
    (reference ``plotting.py:238-279``): initial points get ``m_init``, added points
    ``m_add``; failures are colored ``c_fail`` and the best points ``c_best``."""
    markers = np.repeat(m_add, num_pts).astype("<U1")
    markers[:num_init] = m_init
    colors = np.repeat(c_pass, num_pts).astype("<U16")
    if mask_fail is not None:
        colors[np.asarray(mask_fail, bool)] = c_fail
    if idx_best is not None:
        colors[np.asarray(idx_best, int)] = c_best
    return markers, colors


def plot_mobo_history(
    obs_values: TensorType,
    metric_fn: Callable[[np.ndarray], float],
    num_init: int,
    ax,
) -> None:
    """Plot a multi-objective progress metric (e.g. hypervolume regret) as observations
    accrue (reference ``plotting.py:396-425``)."""
    obs = _to_np(obs_values)
    steps = np.arange(num_init, len(obs) + 1)
    vals = [float(metric_fn(obs[:i])) for i in steps]
    ax.plot(steps, vals, color="C0")
    ax.axvline(num_init - 0.5, color="gray", linestyle=":", alpha=0.7)
    ax.set_xlabel("observations")
    ax.set_ylabel("metric")


def plot_feasible_region_2d(
    space,
    ax,
    grid_density: int = 200,
    color: str = "tab:green",
    alpha: float = 0.25,
) -> None:
    """Shade the feasible region of a constrained 2D space (role of the reference's
    ``inequality_constraints`` plotting, ``inequality_constraints.py:46-155``)."""
    points, XX, YY = create_grid(space.lower, space.upper, grid_density)
    import jax.numpy as jnp

    feasible = _to_np(space.is_feasible(jnp.asarray(points))).reshape(XX.shape)
    ax.contourf(
        XX, YY, feasible.astype(float), levels=[0.5, 1.5], colors=[color], alpha=alpha
    )
    ax.contour(XX, YY, feasible.astype(float), levels=[0.5], colors=[color])


def plot_constrained_objective_2d(
    space,
    objective: Callable[[TensorType], TensorType],
    grid_density: int = 100,
    fig_size: Tuple[float, float] = (8.0, 6.0),
):
    """Objective contours with the space's own constraint-infeasible region masked
    out (companion of :func:`.inequality_constraints.plot_objective_and_constraints`,
    which takes a Simulation protocol instead of a constrained space)."""
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    points, XX, YY = create_grid(space.lower, space.upper, grid_density)
    vals = _to_np(objective(jnp.asarray(points))).reshape(XX.shape)
    fig, ax = plt.subplots(figsize=fig_size)
    cm = ax.contourf(XX, YY, vals, levels=40)
    fig.colorbar(cm, ax=ax)
    if getattr(space, "has_constraints", False):
        feasible = _to_np(space.is_feasible(jnp.asarray(points))).reshape(XX.shape)
        masked = np.ma.masked_where(feasible, np.ones_like(vals))
        ax.pcolormesh(XX, YY, masked, cmap="gray", alpha=0.45, shading="auto")
        ax.contour(XX, YY, feasible.astype(float), levels=[0.5], colors="k")
    return fig, ax


def plot_pareto_front_2d(
    observations: TensorType,
    ax,
    reference_point: Optional[TensorType] = None,
    show_dominated: bool = True,
) -> None:
    """Scatter observed objective vectors, highlight the Pareto front as a staircase,
    and optionally draw the hypervolume reference point
    (role of reference ``plot_mobo_points_in_obj_space`` + front overlay)."""
    import jax.numpy as jnp

    from ...acquisition.multi_objective.dominance import non_dominated

    obs = _to_np(observations)
    front, mask = non_dominated(jnp.asarray(obs))
    front = _to_np(front)
    mask = _to_np(mask)
    if show_dominated:
        ax.scatter(obs[~mask, 0], obs[~mask, 1], s=14, c="gray", alpha=0.5,
                   label="dominated")
    order = np.argsort(front[:, 0])
    f = front[order]
    ax.scatter(f[:, 0], f[:, 1], s=24, c="C3", label="Pareto front")
    # staircase connecting front points (minimization convention)
    xs = np.repeat(f[:, 0], 2)[1:]
    ys = np.repeat(f[:, 1], 2)[:-1]
    ax.plot(xs, ys, c="C3", lw=1, alpha=0.8)
    if reference_point is not None:
        rp = _to_np(reference_point)
        ax.scatter([rp[0]], [rp[1]], marker="*", s=120, c="k", label="reference")
    ax.set_xlabel("objective 1")
    ax.set_ylabel("objective 2")
    ax.legend()


def convert_figure_to_frame(fig) -> np.ndarray:
    """Rasterize a matplotlib figure to an RGB array (reference ``plotting.py:674-686``)."""
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())
    return buf[..., :3].copy()


def convert_frames_to_gif(frames: Sequence[np.ndarray], duration: int = 5000):
    """Encode frames as an animated GIF in a BytesIO (reference ``plotting.py:687-700``);
    requires pillow (bundled with matplotlib)."""
    import io

    from PIL import Image

    images = [Image.fromarray(np.asarray(f)) for f in frames]
    out = io.BytesIO()
    images[0].save(
        out, format="gif", save_all=True, append_images=images[1:],
        duration=duration // max(len(images), 1), loop=0,
    )
    out.seek(0)
    return out
