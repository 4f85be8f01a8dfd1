"""Experimental plotting (reference ``trieste/experimental/plotting/__init__.py:20-47``)."""

from .plotting import (
    create_grid,
    plot_bo_points,
    plot_function_2d,
    plot_gp_2d,
    plot_mobo_points_in_obj_space,
    plot_regret,
    plot_trust_region_history_2d,
)
from .plotting_plotly import (
    PLOTLY_AVAILABLE,
    add_bo_points_plotly,
    plot_function_plotly,
    plot_model_predictions_plotly,
)

__all__ = [
    "PLOTLY_AVAILABLE",
    "add_bo_points_plotly",
    "create_grid",
    "plot_bo_points",
    "plot_function_2d",
    "plot_function_plotly",
    "plot_gp_2d",
    "plot_mobo_points_in_obj_space",
    "plot_model_predictions_plotly",
    "plot_regret",
    "plot_trust_region_history_2d",
]
