"""Attention-heatmap export: per-slide instance attention → spatial grid.

The reference renders attention heatmaps through the vendored CLAM stack
(reference: CLAM/create_heatmaps.py:35-437, CLAM/wsi_core/WholeSlideImage.py
:487-677 ``visHeatmap``), which needs OpenSlide and the raw WSI. This
framework's models emit per-instance attention directly (``return_attn``);
this module rasterizes those scores onto the patch grid and exports
``.npy``/``.csv`` artifacts that any viewer can overlay — the raw-pixel
blending stays out of scope (features-only pipeline, SURVEY.md §7 step 9).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def attention_to_grid(
    attn: np.ndarray,
    coords: Optional[np.ndarray] = None,
    normalize: str = "percentile",
) -> np.ndarray:
    """Rasterize per-instance attention ``[N]`` into a ``[H, W]`` grid.

    ``coords[N, 2]`` are integer patch-grid positions (data/readers.py
    ``coords_to_grid``); without coords a row-major square grid is assumed.
    ``normalize``: 'percentile' rescales scores to their empirical CDF (the
    reference's heatmap convention, CLAM/wsi_core/WholeSlideImage.py:560-570
    ``convert_to_percentiles``); 'minmax' or 'none' otherwise.
    """
    attn = np.asarray(attn, np.float64).reshape(-1)
    n = len(attn)
    if normalize == "percentile":
        order = attn.argsort().argsort()
        attn = (order + 1) / n
    elif normalize == "minmax":
        lo, hi = attn.min(), attn.max()
        attn = (attn - lo) / (hi - lo + 1e-12)

    if coords is None:
        w = int(np.ceil(np.sqrt(n)))
        h = int(np.ceil(n / w))
        grid = np.full((h, w), np.nan)
        grid.flat[:n] = attn
        return grid
    coords = np.asarray(coords, np.int64)
    h, w = coords[:, 1].max() + 1, coords[:, 0].max() + 1
    grid = np.full((h, w), np.nan)
    grid[coords[:, 1], coords[:, 0]] = attn
    return grid


def export_heatmap(
    out_dir: str,
    slide_id: str,
    attn: np.ndarray,
    coords: Optional[np.ndarray] = None,
    normalize: str = "percentile",
) -> Dict[str, str]:
    """Write ``<slide>_attn.npy`` (grid) and ``<slide>_attn.csv``
    (x, y, score rows) under ``out_dir``. Returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    grid = attention_to_grid(attn, coords, normalize)
    npy = os.path.join(out_dir, f"{slide_id}_attn.npy")
    np.save(npy, grid)
    csv = os.path.join(out_dir, f"{slide_id}_attn.csv")
    attn = np.asarray(attn).reshape(-1)
    if coords is None:
        w = grid.shape[1]
        coords = np.stack([np.arange(len(attn)) % w, np.arange(len(attn)) // w], -1)
    with open(csv, "w") as f:
        f.write("x,y,score\n")
        for (x, y), s in zip(np.asarray(coords), attn):
            f.write(f"{x},{y},{s}\n")
    return {"npy": npy, "csv": csv}
