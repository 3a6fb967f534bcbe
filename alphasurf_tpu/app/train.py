"""Training CLI — `python -m alphasurf_tpu.app.train DATA -t CKPT -c cfg.yaml`.

Equivalent of /root/reference/opt/opt.py's entry (flag names compatible —
reference recipe configs under opt/configs/ load directly).
"""
from __future__ import annotations

import sys


def main(argv=None):
    from ..app.config import load_config
    from ..data import datasets
    from ..train.trainer import Trainer

    cfg = load_config(argv)
    print(f"train_dir={cfg.train_dir} data={cfg.data_dir} "
          f"surface_type={cfg.surface_type} backend={cfg.renderer_backend}")

    dset = datasets[cfg.dataset_type](
        cfg.data_dir,
        split="train",
        epoch_size=cfg.epoch_size,
        scene_scale=cfg.scene_scale,
        scale=cfg.scale,
        white_bkgd=cfg.white_bkgd,
        n_images=cfg.n_train_images,
    )
    try:
        dset_test = datasets[cfg.dataset_type](
            cfg.data_dir, split="test", scene_scale=cfg.scene_scale,
            scale=cfg.scale, white_bkgd=cfg.white_bkgd,
        )
    except (FileNotFoundError, AssertionError):
        dset_test = None

    trainer = Trainer(cfg, dset, dset_test)
    psnr = trainer.train()
    print(f"final eval psnr: {psnr}")
    return psnr


if __name__ == "__main__":
    main(sys.argv[1:])
