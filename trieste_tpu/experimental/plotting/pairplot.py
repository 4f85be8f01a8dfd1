"""Scatter-matrix ("pairplot") figures for loop diagnostics.

Role of the seaborn pairplots the reference logs from its BO loop
(``trieste/bayesian_optimizer.py:977-1157``): a grid of pairwise scatter plots (and
per-dimension histograms on the diagonal) of observations or query points, with groups
("initial"/"old"/"new", optionally "(non-dominated)") coloured differently. Implemented
with pure matplotlib so the summaries need no seaborn/pandas dependency; the figure is
built host-side and handed to :func:`trieste_tpu.logging.pyplot`.
"""
from __future__ import annotations

from typing import Mapping, Optional, Sequence

import numpy as np

_PALETTE = {
    "initial": "tab:green",
    "old": "tab:green",
    "new": "tab:orange",
    "initial (non-dominated)": "tab:purple",
    "old (non-dominated)": "tab:purple",
    "new (non-dominated)": "tab:red",
}
_MARKERS = {"initial": "X", "old": "o", "new": "o"}


def pairplot(
    data: np.ndarray,
    groups: Optional[Sequence[str]] = None,
    labels: Optional[Sequence[str]] = None,
    palette: Optional[Mapping[str, str]] = None,
):
    """A matplotlib scatter-matrix of ``data [N, D]``.

    ``groups`` assigns each row a group name (colour/marker via the reference's
    palette: initial/old green, new orange, non-dominated purple/red). Returns the
    figure (caller owns closing it).
    """
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    data = np.asarray(data, dtype=float)
    n, d = data.shape
    if groups is None:
        groups = ["old"] * n
    groups = list(groups)
    labels = list(labels) if labels is not None else [f"x{i}" for i in range(d)]
    palette = dict(_PALETTE, **(palette or {}))

    fig, axes = plt.subplots(d, d, figsize=(2.2 * d, 2.2 * d), squeeze=False)
    group_names = sorted(set(groups), key=lambda g: (g.endswith(")"), g))
    for gi in range(d):
        for gj in range(d):
            ax = axes[gi][gj]
            if gi == gj:
                for name in group_names:
                    rows = [k for k, g in enumerate(groups) if g == name]
                    ax.hist(
                        data[rows, gi],
                        bins=min(20, max(5, len(rows))),
                        alpha=0.6,
                        color=palette.get(name, "tab:gray"),
                    )
            else:
                for name in group_names:
                    rows = [k for k, g in enumerate(groups) if g == name]
                    base = name.split(" (")[0]
                    ax.scatter(
                        data[rows, gj],
                        data[rows, gi],
                        s=18,
                        alpha=0.8,
                        color=palette.get(name, "tab:gray"),
                        marker=_MARKERS.get(base, "o"),
                        label=name if (gi, gj) == (0, 1) else None,
                    )
            if gi == d - 1:
                ax.set_xlabel(labels[gj])
            if gj == 0:
                ax.set_ylabel(labels[gi])
    if d > 1:
        handles, names = axes[0][1].get_legend_handles_labels()
        if handles:
            fig.legend(handles, names, loc="upper right", fontsize="small")
    fig.tight_layout()
    return fig


def observation_groups(
    num_initial: int,
    num_old: int,
    num_new: int,
    non_dominated_mask: Optional[np.ndarray] = None,
) -> list[str]:
    """Group labels for a stacked [initial; old; new] observation matrix, optionally
    suffixing non-dominated rows (reference hue scheme,
    ``bayesian_optimizer.py:1056-1090``)."""
    groups = (
        ["initial"] * num_initial + ["old"] * num_old + ["new"] * num_new
    )
    if non_dominated_mask is not None:
        groups = [
            g + " (non-dominated)" if bool(nd) else g
            for g, nd in zip(groups, non_dominated_mask)
        ]
    return groups
