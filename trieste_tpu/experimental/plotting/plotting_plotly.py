"""Plotly plotting utilities (reference ``plotting_plotly.py``), gated on the optional
``plotly`` dependency exactly as the reference gates its extras (``setup.py:52-55``)."""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

try:
    import plotly.graph_objects as go

    PLOTLY_AVAILABLE = True
except ImportError:  # pragma: no cover - optional extra
    go = None
    PLOTLY_AVAILABLE = False


def _require_plotly() -> None:
    if not PLOTLY_AVAILABLE:
        raise ImportError(
            "plotly is not installed; install the 'plotting' extra to use plotly plots"
        )


def plot_function_plotly(
    f: Callable,
    mins,
    maxs,
    grid_density: int = 30,
    title: Optional[str] = None,
):
    """3D surface plot of a 2D function (reference ``plot_function_plotly``)."""
    _require_plotly()
    from .plotting import create_grid

    points, XX, YY = create_grid(mins, maxs, grid_density)
    values = np.asarray(f(points)).reshape(XX.shape)
    fig = go.Figure(data=[go.Surface(x=XX, y=YY, z=values)])
    if title:
        fig.update_layout(title=title)
    return fig


def plot_model_predictions_plotly(
    model,
    mins,
    maxs,
    grid_density: int = 30,
    num_samples: Optional[int] = None,
):
    """Posterior mean surface with +/-2 std bands (reference
    ``plot_model_predictions_plotly``)."""
    _require_plotly()
    from .plotting import create_grid

    points, XX, YY = create_grid(mins, maxs, grid_density)
    mean, var = model.predict(points)
    mean = np.asarray(mean)[:, 0].reshape(XX.shape)
    std = np.sqrt(np.asarray(var)[:, 0]).reshape(XX.shape)
    fig = go.Figure(
        data=[
            go.Surface(x=XX, y=YY, z=mean, opacity=1.0, name="mean"),
            go.Surface(x=XX, y=YY, z=mean + 2 * std, opacity=0.3, showscale=False),
            go.Surface(x=XX, y=YY, z=mean - 2 * std, opacity=0.3, showscale=False),
        ]
    )
    return fig


def add_bo_points_plotly(x, y, z, fig, num_init: int = 0, idx_best: Optional[int] = None):
    """Overlay BO points on a plotly 3D figure (reference ``add_bo_points_plotly``)."""
    _require_plotly()
    fig.add_trace(
        go.Scatter3d(
            x=np.asarray(x)[num_init:],
            y=np.asarray(y)[num_init:],
            z=np.asarray(z)[num_init:],
            mode="markers",
            marker=dict(size=4, color="red"),
            name="acquired",
        )
    )
    if num_init:
        fig.add_trace(
            go.Scatter3d(
                x=np.asarray(x)[:num_init],
                y=np.asarray(y)[:num_init],
                z=np.asarray(z)[:num_init],
                mode="markers",
                marker=dict(size=4, color="black", symbol="x"),
                name="initial",
            )
        )
    return fig
