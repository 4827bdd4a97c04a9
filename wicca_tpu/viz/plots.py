"""Visualization — parity with reference visualization.py (SURVEY.md C13).

Same five entry points; matplotlib/seaborn based. Radar and scatter plots use
plotly when installed and fall back to matplotlib (this environment ships
without plotly). All functions accept HWC uint8 images like the reference.
"""

from __future__ import annotations

import logging

import numpy as np

from wicca_tpu.config.constants import SIM_CLASSES_PERC
from wicca_tpu.data.normalization import normalize_depth
from wicca_tpu.data.validation import validate_image


def _icon_of(image_hwc: np.ndarray, depth: int, coder=None) -> np.ndarray:
    if coder is not None and hasattr(coder, "get_small_copy"):
        return coder.get_small_copy(image_hwc, depth)
    from wicca_tpu.harness.processor import _compute_icon

    return _compute_icon(image_hwc, depth)


def show_image_vs_icon(image: np.ndarray, depths, coder=None, figsize=(14, 6)):
    """Original next to its icons per depth (reference visualization.py:34-106)."""
    import matplotlib.pyplot as plt

    validate_image(image)
    depths = normalize_depth(depths)
    fig, axes = plt.subplots(1, len(depths) + 1, figsize=figsize)
    axes = np.atleast_1d(axes)
    axes[0].imshow(image)
    axes[0].set_title(f"Original {image.shape[1]}x{image.shape[0]}")
    axes[0].axis("off")
    for ax, d in zip(axes[1:], depths):
        icon = _icon_of(image, d, coder)
        ax.imshow(icon)
        ax.set_title(f"depth {d}: {icon.shape[1]}x{icon.shape[0]}")
        ax.axis("off")
    fig.tight_layout()
    return fig


def show_icon_on_image(image: np.ndarray, depth: int, coder=None, border: int = 2, figsize=(8, 8)):
    """Paste the icon (with border) into the original's top-left corner
    (reference visualization.py:109-165)."""
    import matplotlib.pyplot as plt

    validate_image(image)
    (depth,) = normalize_depth(depth)
    icon = _icon_of(image, depth, coder)
    canvas = image.copy()
    ih, iw = icon.shape[:2]
    bh, bw = ih + 2 * border, iw + 2 * border
    canvas[:bh, :bw] = 255
    canvas[border : border + ih, border : border + iw] = icon if icon.ndim == 3 else icon[..., None]
    fig, ax = plt.subplots(figsize=figsize)
    ax.imshow(canvas)
    ax.set_title(f"Icon (depth {depth}) on image")
    ax.axis("off")
    return fig


def visualize_comparison(comparison_df, metric: str = SIM_CLASSES_PERC, figsize=(8, 5)):
    """Classifier x depth heatmap of a metric (reference visualization.py:
    168-216: seaborn heatmap over a pivot)."""
    import matplotlib.pyplot as plt
    import seaborn as sns

    if metric not in comparison_df.columns:
        raise ValueError(f"no column {metric!r} in the comparison table")
    pivot = comparison_df.pivot(index="Classifier", columns="Depth", values=metric)
    fig, ax = plt.subplots(figsize=figsize)
    sns.heatmap(pivot, annot=True, fmt=".2f", cmap="viridis", ax=ax)
    ax.set_title(metric)
    return fig


def plot_metric_radar(names: list[str], metric: list[float], title: str = "Metric radar"):
    """Polar/radar chart of one metric across classifiers (reference
    visualization.py:219-253 uses plotly Scatterpolar; matplotlib fallback)."""
    try:
        import plotly.graph_objects as go

        fig = go.Figure(go.Scatterpolar(r=list(metric) + [metric[0]], theta=list(names) + [names[0]], fill="toself"))
        fig.update_layout(title=title)
        return fig
    except ImportError:
        logging.info("plotly not installed; using matplotlib polar fallback")
        import matplotlib.pyplot as plt

        angles = np.linspace(0, 2 * np.pi, len(names), endpoint=False)
        values = np.asarray(list(metric), dtype=float)
        angles_c = np.concatenate([angles, angles[:1]])
        values_c = np.concatenate([values, values[:1]])
        fig, ax = plt.subplots(figsize=(6, 6), subplot_kw={"projection": "polar"})
        ax.plot(angles_c, values_c, "o-")
        ax.fill(angles_c, values_c, alpha=0.25)
        ax.set_xticks(angles)
        ax.set_xticklabels(names)
        ax.set_title(title)
        return fig


def plot_compare_metrics(comparison_df, x_metric=None, y_metric=None, title: str = "Metric comparison",
                         xlabel: str | None = None, ylabel: str | None = None):
    """Scatter of two metrics with classifier/depth labels (reference
    visualization.py:256-280; plotly with matplotlib fallback).

    Accepts BOTH calling conventions:

    * DataFrame form — ``(comparison_df, "x_col", "y_col")`` with column
      names from the cross-run comparison table.
    * Reference positional form — ``(names, metric1, metric2)`` value
      sequences, exactly as /root/reference/wicca/visualization.py:256
      takes them (what ``extract_from_comparison`` output feeds); the
      reference's ``xlabel``/``ylabel`` defaults apply.
    """
    if x_metric is None or y_metric is None:
        # required in BOTH conventions; fail clearly instead of a confusing
        # downstream TypeError/"no column None"
        raise TypeError(
            "plot_compare_metrics needs two metrics: either column names "
            "(DataFrame form) or value sequences (reference form)"
        )
    if not hasattr(comparison_df, "columns"):  # reference value-list form
        names = list(comparison_df)
        xs = np.asarray(list(x_metric), dtype=float)
        ys = np.asarray(list(y_metric), dtype=float)
        x_name = xlabel or "Similar classes, %"
        y_name = ylabel or "Best class similarity, %"
        if title == "Metric comparison":
            title = "Classifier Performance Comparison"
        return _scatter_labeled(xs, ys, names, x_name, y_name, title)
    for m in (x_metric, y_metric):
        if m not in comparison_df.columns:
            raise ValueError(f"no column {m!r} in the comparison table")
    labels = [f"{c} d{d}" for c, d in zip(comparison_df["Classifier"], comparison_df["Depth"])]
    return _scatter_labeled(
        np.asarray(comparison_df[x_metric]), np.asarray(comparison_df[y_metric]),
        labels, xlabel or x_metric, ylabel or y_metric, title,
    )


def _scatter_labeled(xs, ys, labels, x_name, y_name, title):
    try:
        import plotly.express as px

        fig = px.scatter(x=xs, y=ys, text=labels, labels={"x": x_name, "y": y_name}, title=title)
        fig.update_traces(textposition="top center", marker_size=12)
        return fig
    except ImportError:
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 5))
        ax.scatter(xs, ys)
        for x, y, lbl in zip(xs, ys, labels):
            ax.annotate(lbl, (x, y), fontsize=8)
        ax.set_xlabel(x_name)
        ax.set_ylabel(y_name)
        ax.set_title(title)
        return fig
