"""Full five-stage pipeline (train_eval.sh contract) at micro scale on the
procedural synthetic dataset: Plenoxels -> surface init -> surface refine ->
render/PSNR -> extract -> chamfer."""
import json
from os import path

import numpy as np

from alphasurf_tpu.app.pipeline import run_pipeline


def test_pipeline_end_to_end(tmp_path):
    res = run_pipeline(
        str(tmp_path),
        reso=24, n_train_images=16, image_size=40,
        n_iters_plenoxels=300, n_iters_surface=100, batch_size=1600,
        overrides_plenoxels={"lambda_tv": 1e-5},
    )
    s = res["summary"]
    # measured on this exact micro config: psnr 23.0, chamfer 0.038
    # (sphere radius 0.5) — margins below for cross-platform jitter
    assert np.isfinite(s["psnr"]) and s["psnr"] > 19, s
    assert s["chamfer"] is not None and s["chamfer"] < 0.1, s
    assert res["stages"]["extract"]["n_points"] > 100
    # artifacts on disk
    assert path.isfile(path.join(tmp_path, "pipeline_results.json"))
    assert path.isfile(path.join(tmp_path, "surface", "ckpt.npz"))
    assert path.isfile(path.join(tmp_path, "pts.npy"))
    with open(path.join(tmp_path, "pipeline_results.json")) as f:
        onfile = json.load(f)
    assert onfile["summary"]["psnr"] == s["psnr"]
