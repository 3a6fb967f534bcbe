"""CO3D loader on a synthetic fixture tree (frame_annotations.jgz format,
co3d_dataset.py:78-154)."""
import gzip
import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from alphasurf_tpu.data import datasets


@pytest.fixture
def co3d_root(tmp_path):
    rng = np.random.default_rng(0)
    cat = tmp_path / "toaster"
    imdir = cat / "seqA" / "images"
    imdir.mkdir(parents=True)
    frames = []
    H, W = 20, 30
    for k in range(10):
        rel = f"toaster/seqA/images/frame{k:03d}.jpg"
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / rel), img)
        az = 2 * np.pi * k / 10
        # camera on a circle looking inward (any valid R/T works here)
        R = np.array([
            [np.cos(az), -np.sin(az), 0],
            [np.sin(az), np.cos(az), 0],
            [0, 0, 1.0],
        ])
        T = np.array([0.1 * k, 0.05 * k, 3.0])
        frames.append({
            "sequence_name": "seqA",
            "frame_number": k,
            "image": {"size": [H, W], "path": rel},
            "viewpoint": {
                "R": R.tolist(),
                "T": T.tolist(),
                "focal_length": [2.0, 2.0],
                "principal_point": [0.0, 0.0],
            },
        })
    with gzip.open(cat / "frame_annotations.jgz", "wt") as f:
        json.dump(frames, f)
    return str(tmp_path)


def test_co3d_constructs_and_gens_rays(co3d_root, tmp_path):
    dset = datasets["co3d"](
        co3d_root, split="train", seq_id=0, hold_every=4,
        cache_dir=str(tmp_path / "cache"),
    )
    assert dset.n_seq == 1
    assert dset.n_images > 0
    assert dset.rays is not None
    n = dset.n_images * dset.h_full * dset.w_full
    assert len(dset.rays) == n
    # dirs normalized, gt in [0, 1]
    np.testing.assert_allclose(
        np.linalg.norm(dset.rays.dirs, axis=-1), 1.0, rtol=1e-5
    )
    assert dset.rays.gt.min() >= 0.0 and dset.rays.gt.max() <= 1.0

    # index cache reused on second construction
    dset2 = datasets["co3d"](
        co3d_root, split="test", seq_id=0, hold_every=4,
        cache_dir=str(tmp_path / "cache"),
    )
    assert dset2.n_images + dset.n_images == 10
