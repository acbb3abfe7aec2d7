"""Classification-map rendering (reference ``DrawResult``,
tools/hyper_tools.py:58-205).

Palettes live in the dataset registry; this module maps 1-based labels to
RGB and writes the SVG, vectorised (the reference loops classes and calls
matplotlib's stateful API).
"""

from __future__ import annotations

import numpy as np

from cmlpl_tpu.registry import get_dataset


def draw_result(labels_1based: np.ndarray, data_id, rows=None,
                cols=None) -> np.ndarray:
    """Map flat 1-based labels to an (rows, cols, 3) float RGB image.

    Label 0 (background / unpredicted) renders black, matching the zeros
    the reference leaves for unmatched labels.
    """
    spec = get_dataset(data_id)
    rows = rows or spec.rows
    cols = cols or spec.cols
    labels = np.asarray(labels_1based).reshape(-1).astype(np.int64)
    palette = np.concatenate(
        [np.zeros((1, 3)), spec.palette[: int(labels.max())]], axis=0)
    img = palette[np.clip(labels, 0, palette.shape[0] - 1)]
    return img.reshape(rows, cols, 3)


def save_class_map(path: str, labels_1based: np.ndarray, data_id,
                   rows=None, cols=None, dpi: int = 300) -> np.ndarray:
    """Render and save the class map (reference train.py:308-314)."""
    img = draw_result(labels_1based, data_id, rows, cols)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(path, img, dpi=dpi)
    return img
