"""Plotting: GP posteriors, covariance heatmaps, BO traces, MCMC diagnostics.

Parity: src/bark/utils/plots/plot_gp.py:11-113 (1D/2D posterior plots +
covariance heatmap) and plot_training.py:7-25 (loss/trace plot); the
reference's tree-diagram plotter is stale (plot_trees.py references
undefined classes) — its intent is covered by :func:`plot_forest_depths`.
All functions take an ``ax`` or create one; headless-safe (Agg).
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_gp_1d(ax, x, mu, std, train_x=None, train_y=None, true_f=None):
    """1-D posterior mean ± 2 std (plot_gp.py:11-45)."""
    order = np.argsort(x.reshape(-1))
    x, mu, std = (np.asarray(a).reshape(-1)[order] for a in (x, mu, std))
    ax.plot(x, mu, label="posterior mean")
    ax.fill_between(x, mu - 2 * std, mu + 2 * std, alpha=0.3, label="±2σ")
    if true_f is not None:
        ax.plot(x, np.asarray(true_f).reshape(-1)[order], "k--", label="truth")
    if train_x is not None:
        ax.scatter(train_x, train_y, c="r", s=15, zorder=3, label="data")
    ax.legend()
    return ax


def plot_covariance(ax, K):
    """Kernel heatmap (plot_gp.py covariance panel)."""
    im = ax.imshow(np.asarray(K), cmap="viridis")
    plt.colorbar(im, ax=ax)
    return ax


def plot_bo_trace(ax, best_trace, label=None):
    """Best-so-far regret curve (logger.py:84-86 / plot_bo_runs intent)."""
    ax.plot(np.minimum.accumulate(np.asarray(best_trace)), label=label)
    ax.set_xlabel("iteration")
    ax.set_ylabel("best observed")
    if label:
        ax.legend()
    return ax


def plot_mll_trace(ax, mlls):
    """Per-chain MLL traces (analyse_mll_arr.py:4-7 intent)."""
    mlls = np.atleast_2d(np.asarray(mlls))
    for i, chain in enumerate(mlls):
        ax.plot(chain, alpha=0.8, label=f"chain {i}")
    ax.set_xlabel("sample")
    ax.set_ylabel("MLL")
    ax.legend()
    return ax


def plot_forest_depths(ax, forest):
    """Histogram of active-leaf depths across a forest (tree-structure
    visualization replacing the reference's stale plot_trees.py)."""
    depth = np.asarray(forest.depth)
    leaf = np.asarray(forest.active & forest.is_leaf)
    ax.hist(depth[leaf].reshape(-1), bins=np.arange(0, depth.max() + 2) - 0.5)
    ax.set_xlabel("leaf depth")
    ax.set_ylabel("count")
    return ax


def save_fig(fig, path):
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
