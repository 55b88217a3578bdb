"""Plotting suite (reference deepinv/utils/plotting.py, 1314 LoC:
plot, plot_curves, plot_parameters, plot_inset, scatter_plot).

matplotlib with the Agg backend; every function accepts jax or numpy arrays
in (B, C, H, W) and saves or returns the figure.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["plot", "plot_curves", "plot_parameters", "plot_inset", "scatter_plot", "rescale_img"]


def _mpl():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def _to_np_img(x):
    a = np.asarray(x)
    if a.ndim == 4:
        a = a[0]
    if a.ndim == 3:
        if a.shape[0] in (1, 3):
            a = a.transpose(1, 2, 0)
        if a.shape[-1] == 1:
            a = a[..., 0]
    return a


def rescale_img(x, rescale_mode: str = "min_max"):
    a = np.asarray(x, np.float32)
    if rescale_mode == "min_max":
        lo, hi = a.min(), a.max()
        return (a - lo) / max(hi - lo, 1e-9)
    return np.clip(a, 0, 1)


def plot(img_list, titles=None, save_fn: Optional[str] = None, show: bool = False, figsize=None, rescale_mode="min_max", cmap="gray", suptitle=None):
    """Plot a row of images (reference plotting.py plot)."""
    plt = _mpl()
    if not isinstance(img_list, (list, tuple)):
        img_list = [img_list]
    if titles is None:
        titles = [None] * len(img_list)
    elif isinstance(titles, str):
        titles = [titles]
    n = len(img_list)
    fig, axes = plt.subplots(1, n, figsize=figsize or (3 * n, 3), squeeze=False)
    for ax, img, title in zip(axes[0], img_list, titles):
        ax.imshow(rescale_img(_to_np_img(img), rescale_mode), cmap=cmap)
        ax.axis("off")
        if title:
            ax.set_title(title, fontsize=9)
    if suptitle:
        fig.suptitle(suptitle)
    fig.tight_layout()
    if save_fn:
        fig.savefig(save_fn, bbox_inches="tight", dpi=150)
    if not show:
        plt.close(fig)
    return fig


def plot_curves(metrics: dict, save_fn: Optional[str] = None, show: bool = False):
    """Plot per-iteration metric curves (reference plot_curves)."""
    plt = _mpl()
    n = len(metrics)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3), squeeze=False)
    for ax, (name, values) in zip(axes[0], metrics.items()):
        vals = np.asarray(values)
        if vals.ndim == 1:
            vals = vals[None]
        for b in range(vals.shape[0]):
            ax.plot(vals[b], label=f"b{b}" if vals.shape[0] > 1 else None)
        ax.set_title(name)
        ax.set_xlabel("iteration")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    if save_fn:
        fig.savefig(save_fn, bbox_inches="tight", dpi=150)
    if not show:
        plt.close(fig)
    return fig


def plot_parameters(model, save_fn: Optional[str] = None, show: bool = False):
    """Plot learned per-iteration parameters of an unfolded model
    (reference plot_parameters)."""
    plt = _mpl()
    params = getattr(model, "params_algo", {})
    keys = [k for k, v in params.items() if np.asarray(v).ndim >= 1]
    fig, ax = plt.subplots(figsize=(5, 3))
    for k in keys:
        v = np.asarray(params[k])
        if v.ndim == 1:
            ax.plot(v, marker="o", label=k)
    ax.set_xlabel("iteration")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    if save_fn:
        fig.savefig(save_fn, bbox_inches="tight", dpi=150)
    if not show:
        plt.close(fig)
    return fig


def plot_inset(img_list, titles=None, inset_loc=(0.0, 0.0), inset_size: float = 0.4, extract_loc=(0.5, 0.5), extract_size: float = 0.2, save_fn=None, show=False):
    """Images with a zoomed inset (reference plot_inset)."""
    plt = _mpl()
    if not isinstance(img_list, (list, tuple)):
        img_list = [img_list]
    n = len(img_list)
    fig, axes = plt.subplots(1, n, figsize=(3 * n, 3), squeeze=False)
    titles = titles or [None] * n
    for ax, img, title in zip(axes[0], img_list, titles):
        a = rescale_img(_to_np_img(img))
        H, W = a.shape[:2]
        ax.imshow(a, cmap="gray")
        ey, ex = int(extract_loc[0] * H), int(extract_loc[1] * W)
        eh, ew = int(extract_size * H), int(extract_size * W)
        patch = a[ey : ey + eh, ex : ex + ew]
        axin = ax.inset_axes([inset_loc[1], inset_loc[0], inset_size, inset_size])
        axin.imshow(patch, cmap="gray")
        axin.set_xticks([])
        axin.set_yticks([])
        for s in axin.spines.values():
            s.set_color("red")
        ax.axis("off")
        if title:
            ax.set_title(title, fontsize=9)
    fig.tight_layout()
    if save_fn:
        fig.savefig(save_fn, bbox_inches="tight", dpi=150)
    if not show:
        plt.close(fig)
    return fig


def scatter_plot(points, labels=None, save_fn=None, show=False):
    """2D scatter (reference scatter_plot)."""
    plt = _mpl()
    pts = np.asarray(points)
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.scatter(pts[:, 0], pts[:, 1], c=labels, s=8, cmap="tab10")
    fig.tight_layout()
    if save_fn:
        fig.savefig(save_fn, bbox_inches="tight", dpi=150)
    if not show:
        plt.close(fig)
    return fig
