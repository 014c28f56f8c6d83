"""Plotting helpers for convergence studies (port of
src/notebook_studies_helpers.py:62-179).  Matplotlib is imported lazily so the
compute path never depends on it."""

from __future__ import annotations

from typing import List

import numpy as np


def plot_errors_and_rates(
    errors: List[float],
    rates: List[float],
    x_values: List,
    x_label: str,
    title: str,
    expected_rate: float = None,
    log_scale: bool = True,
    save_path: str = None,
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(15, 6))

    ax1.plot(x_values, errors, "o-", linewidth=2, markersize=8)
    if log_scale:
        ax1.set_xscale("log")
        ax1.set_yscale("log")
    ax1.set_xlabel(x_label)
    ax1.set_ylabel("Error")
    ax1.set_title(f"{title} - Error Values")
    ax1.grid(True, which="both", ls="-")

    if rates:
        rate_x = x_values[1:-1]
        ax2.plot(rate_x, rates, "o-", linewidth=2, markersize=8)
        if expected_rate:
            ax2.axhline(y=expected_rate, color="r", linestyle="--",
                        label=f"Expected Rate = {expected_rate}")
            ax2.legend()
        ax2.set_xlabel(x_label)
        ax2.set_ylabel("Convergence Rate")
        ax2.set_title(f"{title} - Convergence Rates")
        ax2.grid(True)
    else:
        ax2.text(0.5, 0.5, "Not enough data points\nto calculate rates",
                 ha="center", va="center", fontsize=14)

    plt.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig


def visualize_mms_solution(mms_case, time_point: float = 0.1, save_path: str = None):
    """2×3 contour panel of the five fields + regularized-Heaviside profile."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from na_dd_tpu.core import heaviside_regularized

    grid = mms_case.grid
    xx, yy = np.asarray(grid.xx), np.asarray(grid.yy)
    fig, axs = plt.subplots(2, 3, figsize=(18, 10))
    panels = [
        ("T (Temperature)", mms_case.T, "hot", (0, 0)),
        ("cp (Polymer Concentration)", mms_case.cp, "viridis", (0, 1)),
        ("cl (Liquid Concentration)", mms_case.cl, "Blues", (0, 2)),
        ("cd (Dissolved Concentration)", mms_case.cd, "Greens", (1, 0)),
        ("cs (Solid Concentration)", mms_case.cs, "Purples", (1, 1)),
    ]
    for title, fn, cmap, (r, c) in panels:
        vals = np.asarray(fn(time_point, grid.xx, grid.yy))
        im = axs[r, c].contourf(xx, yy, vals, cmap=cmap)
        plt.colorbar(im, ax=axs[r, c])
        axs[r, c].set_title(title)

    x_vals = np.linspace(-1, 1, 1000)
    for eta in (10, 50, 100):
        axs[1, 2].plot(x_vals, np.asarray(heaviside_regularized(x_vals, eta)), label=f"eta = {eta}")
    axs[1, 2].set_title("Regularized Heaviside Function")
    axs[1, 2].legend()
    axs[1, 2].grid(True)

    plt.tight_layout()
    plt.suptitle(f"MMS Solution at time t = {time_point}", fontsize=16)
    plt.subplots_adjust(top=0.93)
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path
    return fig
