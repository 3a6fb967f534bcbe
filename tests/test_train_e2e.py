"""End-to-end three-stage training on the procedural synthetic dataset:
Plenoxels sigma warm-up -> density->SDF conversion -> surface refinement.
The contract of train_eval.sh / opt.py at miniature scale."""
import numpy as np

from alphasurf_tpu.app.config import Config
from alphasurf_tpu.data.synthetic import SyntheticDataset
from alphasurf_tpu.train.trainer import Trainer


def test_three_stage_training(tmp_path):
    dset = SyntheticDataset(split="train", n_images=12, width=40, height=40, reso=24)
    dset_test = SyntheticDataset(split="test", n_images=2, width=40, height=40, reso=24)

    cfg = Config(
        train_dir=str(tmp_path / "ckpt"),
        reso=[[24, 24, 24]],
        surface_type="sdf",
        batch_size=800,
        n_iters=120,
        no_surface_init_iters=60,
        surf_init_density_lvs=[1.5],
        surf_init_alpha_rescale=1.0,
        init_sigma=0.5,
        # plenoxels-stage lrs (tiny scale)
        lr_sigma=3e1, lr_sigma_final=3e0, lr_sigma_delay_steps=0,
        lr_sh=1e-2, lr_sh_final=1e-2,
        # surface stage
        lr_alpha=1e-1, lr_alpha_final=1e-2, lr_alpha_delay_steps=0,
        lr_surface=1e-2, lr_surface_final=1e-3, lr_surface_delay_steps=0,
        lr_sh_surf=1e-2, lr_sh_surf_final=1e-2,
        lambda_tv=1e-6, lambda_tv_sh=1e-4,
        lambda_tv_alpha=1e-6, lambda_tv_surface=1e-5,
        lambda_normal_loss_l1=1e-6, no_surf_norm_con_check=True,
        lambda_l_entropy=1e-5,
        only_outward_intersect=True,
        surf_fake_sample=True, limited_fake_sample=True,
        fake_sample_std=0.2, fake_sample_std_final=0.05,
        fs_std_decay_type="linear", fake_sample_std_decay_steps=60,
        sigma_thresh=-1e9, stop_thresh=-1e9,
        eval_every_iter=0, print_every=40, save_every=-1,
        n_eval_test=2, nosphereinit=True,
    )
    trainer = Trainer(cfg, dset, dset_test)
    psnr = trainer.train()

    assert trainer.surface_initialized
    assert trainer.grid.surface_data is not None
    assert np.isfinite(psnr)
    # easy scene: even a short run should reconstruct something sensible
    assert psnr > 13.0, f"final psnr too low: {psnr}"

    # checkpoint round-trip
    from alphasurf_tpu.utils.io import load_grid

    g2, step = load_grid(str(tmp_path / "ckpt" / "ckpt.npz"))
    assert step == 120
    assert g2.surface_data.shape == trainer.grid.surface_data.shape
