"""Chamfer-distance evaluation.

Port of the reference's synthetic-GT evaluator
(/root/reference/opt/eval_cf_blender.py:37-45 ``eval_cf``: kNN d2s/s2d) and
the point-cloud downsampling used before eval (radius-based, train_eval.sh
--downsample 0.001). scipy cKDTree replaces sklearn NearestNeighbors.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def chamfer(pts: np.ndarray, gt_pts: np.ndarray):
    """Mean nearest-neighbor distances both ways + overall mean.

    :return: dict(d2s, s2d, overall) — d2s: data(prediction)->source(gt)
    """
    if len(pts) == 0 or len(gt_pts) == 0:
        return {"d2s": np.inf, "s2d": np.inf, "overall": np.inf}
    d2s = cKDTree(gt_pts).query(pts, k=1)[0].mean()
    s2d = cKDTree(pts).query(gt_pts, k=1)[0].mean()
    return {"d2s": float(d2s), "s2d": float(s2d),
            "overall": float((d2s + s2d) / 2)}


def downsample_points(pts: np.ndarray, radius: float) -> np.ndarray:
    """Voxel-hash downsample with cell size ``radius`` (purpose-equivalent
    to the reference's radius-NN subset selection, opt.py:606-615).
    Keeps the first point per cell; native C++ hash path when available."""
    if len(pts) == 0 or radius <= 0:
        return pts
    from ..utils import native

    idx = native.voxel_downsample_indices(pts, radius)
    if idx is not None:
        return pts[idx]
    keys = np.floor(pts / radius).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return pts[np.sort(idx)]
