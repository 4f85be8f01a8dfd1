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


def format_point_markers(
    num_pts: int,
    num_init: int,
    idx_best: Optional[int] = None,
    mask_fail=None,
    m_init: str = "x",
    m_add: str = "circle",
    c_pass: str = "green",
    c_fail: str = "red",
    c_best: str = "darkmagenta",
):
    """Marker styles/colors by BO role: initial crosses, acquired circles, failures
    red, best point dark magenta (reference ``format_point_markers``,
    ``plotting_plotly.py:31-66``). Returns ``(colors [N], markers [N])``."""
    col_pts = np.repeat(c_pass, num_pts).astype("<U15")
    mark_pts = np.repeat(m_init, num_pts).astype("<U15")
    mark_pts[num_init:] = m_add
    if mask_fail is not None:
        col_pts[np.asarray(mask_fail)] = c_fail
    if idx_best is not None:
        col_pts[idx_best] = c_best
    return col_pts, mark_pts


def add_surface_plotly(xx, yy, f, fig, alpha: float = 1.0, figrow: int = 1, figcol: int = 1):
    """Add a surface to an existing plotly (sub)figure (reference
    ``add_surface_plotly``, ``plotting_plotly.py:68-97``)."""
    _require_plotly()
    xx = np.asarray(xx)
    yy = np.asarray(yy)
    z = np.asarray(f).reshape([xx.shape[0], yy.shape[1]])
    fig.add_trace(
        go.Surface(z=z, x=xx, y=yy, showscale=False, opacity=alpha, colorscale="viridis"),
        row=figrow,
        col=figcol,
    )
    return fig


def add_bo_points_plotly(
    x,
    y,
    z,
    fig,
    num_init: int = 0,
    idx_best: Optional[int] = None,
    mask_fail=None,
    figrow: int = 1,
    figcol: int = 1,
):
    """Overlay BO points on a plotly 3D (sub)figure with role-based markers
    (reference ``add_bo_points_plotly``, ``plotting_plotly.py:100-143``)."""
    _require_plotly()
    x = np.asarray(x)
    col_pts, mark_pts = format_point_markers(x.shape[0], num_init, idx_best, mask_fail)
    fig.add_trace(
        go.Scatter3d(
            x=x,
            y=np.asarray(y),
            z=np.asarray(z),
            mode="markers",
            marker=dict(size=4, color=col_pts, symbol=mark_pts, opacity=0.8),
        ),
        row=figrow,
        col=figcol,
    )
    return fig
