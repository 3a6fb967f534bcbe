"""In-training point extraction + chamfer (opt.py:596-657 equivalent):
``log_pts`` extracts iso points at eval time; with ``eval_cf`` and a
``shape.npy`` GT in data_dir it logs cf_d2s/cf_s2d/cf_mean and writes
coarse_pts_eval/{step}/cf.txt."""
import os

import numpy as np

from alphasurf_tpu.app.config import Config
from alphasurf_tpu.data.synthetic import SyntheticDataset, make_gt_grid
from alphasurf_tpu.train.steps import init_rms
from alphasurf_tpu.train.trainer import Trainer


def test_in_training_chamfer(tmp_path):
    reso = 24
    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    # GT point cloud: the analytic sphere surface in the world frame the
    # extractor reports (radius reso/4 voxels = 0.5 world, /(2/3) scene scale)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(4000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    gt_pts = (d * 0.5 / (2.0 / 3.0)).astype(np.float32)
    np.save(data_dir / "shape.npy", gt_pts)

    dset = SyntheticDataset(split="train", n_images=4, width=32, height=32, reso=reso)
    cfg = Config(
        train_dir=str(tmp_path / "ckpt"), data_dir=str(data_dir),
        reso=[[reso] * 3], surface_type="sdf", batch_size=256, n_iters=1,
        log_pts=True, eval_cf=True, surf_eval_n_sample=3,
        surf_eval_intersect_th=-1e9,
        eval_every_iter=0, n_eval_test=1, save_every=-1, tune_mode=True,
        nosphereinit=True,
    )
    tr = Trainer(cfg, dset)
    tr.grid = make_gt_grid(reso=reso)
    tr.surface_initialized = True
    tr.rms = init_rms(tr.grid)

    psnr = tr.eval_step()
    assert np.isfinite(psnr)
    tail = tr._eval_points()
    assert "cf_mean=" in tail
    cf_mean = float(tail.split("cf_mean=")[1].split()[0])
    # extracted sphere vs analytic sphere: sub-voxel agreement
    # (one voxel = (2/24)/(2/3) = 0.125 world units here)
    assert cf_mean < 0.1, tail
    step_dir = tmp_path / "ckpt" / "coarse_pts_eval" / str(tr.gstep)
    assert (step_dir / "cf.txt").is_file()
    assert (step_dir / "vis_d2s.ply").is_file()
