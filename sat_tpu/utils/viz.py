"""Attention-map visualization, host-side.

Replicates the reference's overlays (train.py:386-436 for train-time W&B
logging; generate_caption.py:104-151 for the CLI figure) without the
skimage dependency: `pyramid_expand(upscale=16, sigma=20)` becomes a
bilinear zoom + gaussian blur from scipy.ndimage, which matches skimage's
smoothed upsampling closely enough for visual parity.
"""

from __future__ import annotations

import numpy as np


def expand_alpha(alpha: np.ndarray, grid_side: int, upscale: int = 16,
                 sigma: float = 20.0) -> np.ndarray:
    """(L,) attention weights -> smoothed (grid*upscale)^2 map."""
    from scipy.ndimage import gaussian_filter, zoom
    grid = np.asarray(alpha, dtype=np.float64).reshape(grid_side, grid_side)
    up = zoom(grid, upscale, order=1)
    return gaussian_filter(up, sigma=sigma)


def save_attention_plot(path: str, image01: np.ndarray, words, alphas: np.ndarray,
                        grid_side: int, reference_caption: str | None = None) -> None:
    """One row of per-word attention overlays (reference train.py:407-427).

    image01: (H, W, 3) in [0,1]; alphas: (T, L) aligned with `words`.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = max(len(words), 1)
    fig, axs = plt.subplots(1, n, figsize=(20, 10))
    if n == 1:
        axs = [axs]
    for idx, word in enumerate(words):
        amap = expand_alpha(alphas[idx], grid_side)
        axs[idx].imshow(image01)
        axs[idx].imshow(amap, cmap="gray", alpha=0.8,
                        extent=(0, image01.shape[1], image01.shape[0], 0))
        axs[idx].axis("off")
        axs[idx].text(0, 1, word, backgroundcolor="white", fontsize=13)
        axs[idx].text(0, 1, word, color="black", fontsize=13)
    if reference_caption:
        fig.suptitle(f"Ref: {reference_caption}")
    plt.tight_layout()
    plt.savefig(path)
    plt.close(fig)


def save_caption_grid(path: str, image01: np.ndarray, words, alphas: np.ndarray,
                      grid_side: int, smooth: bool = True) -> None:
    """The generate_caption.py layout: source image first, then one tile per
    word with its attention overlay (generate_caption.py:126-151)."""
    from math import ceil
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.cm as cm
    import matplotlib.pyplot as plt

    num_words = len(words)
    plot_height = ceil((num_words + 3) / 4.0)
    plt.figure(figsize=(12, 12))
    plt.subplot(4, plot_height, 1)
    plt.imshow(image01)
    plt.axis("off")
    for idx in range(num_words):
        plt.subplot(4, plot_height, idx + 2)
        plt.text(0, 1, words[idx], backgroundcolor="white", fontsize=13)
        plt.text(0, 1, words[idx], color="black", fontsize=13)
        plt.imshow(image01)
        if smooth:
            amap = expand_alpha(alphas[idx], grid_side)
        else:
            from scipy.ndimage import zoom
            g = np.asarray(alphas[idx], np.float64).reshape(grid_side, grid_side)
            amap = zoom(g, image01.shape[0] / grid_side, order=1)
        plt.imshow(amap, alpha=0.8,
                   extent=(0, image01.shape[1], image01.shape[0], 0))
        plt.set_cmap(cm.Greys_r)
        plt.axis("off")
    plt.savefig(path)
    plt.close()
