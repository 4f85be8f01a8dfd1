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
