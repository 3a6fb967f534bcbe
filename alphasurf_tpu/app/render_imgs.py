"""Render test-set images from a checkpoint and report PSNR/SSIM.

Equivalent of /root/reference/opt/render_imgs.py: renders every test view,
writes PNGs and ``test_psnr.txt`` (the autotune scraping protocol,
autotune.py:48-57).

Usage: python -m alphasurf_tpu.app.render_imgs CKPT DATA_DIR [--options]
"""
from __future__ import annotations

import argparse
import json
import os
from os import path

import numpy as np


def main(argv=None):
    import imageio.v2 as imageio

    from ..app.config import Config, render_options_from
    from ..core.rays import Camera
    from ..data import datasets
    from ..render.image import render_image
    from ..utils.io import load_grid
    from ..utils.lpips import make_lpips
    from ..utils.metrics import compute_ssim, psnr

    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("data_dir")
    ap.add_argument("--dataset_type", default="auto")
    ap.add_argument("--split", default="test")
    ap.add_argument("--scale", type=float, default=None)
    ap.add_argument("--scene_scale", type=float, default=None)
    ap.add_argument("--no_imsave", action="store_true")
    ap.add_argument("--n_images", type=int, default=None)
    ap.add_argument("--render_depth", action="store_true")
    args = ap.parse_args(argv)

    ckpt_path = args.ckpt
    if path.isdir(ckpt_path):
        ckpt_path = path.join(ckpt_path, "ckpt.npz")
    grid, step = load_grid(ckpt_path)
    print(f"loaded {ckpt_path} (step {step}, reso {grid.reso}, "
          f"capacity {grid.capacity})")

    dset = datasets[args.dataset_type](
        args.data_dir, split=args.split, scale=args.scale,
        scene_scale=args.scene_scale,
    )
    cfg = Config(only_outward_intersect=True, truncated_vol_render=True,
                 sigma_thresh=-1e9, stop_thresh=1e-7)
    opt = render_options_from(cfg, no_surface=grid.surface_data is None)

    out_dir = path.join(path.dirname(ckpt_path), f"render_{args.split}")
    os.makedirs(out_dir, exist_ok=True)

    n = dset.n_images if args.n_images is None else min(args.n_images, dset.n_images)
    lpips_fn = make_lpips()  # None unless weight files are provided
    psnrs, ssims, lpipss = [], [], []
    fx = np.atleast_1d(np.asarray(dset.intrins_full.fx))
    fy = np.atleast_1d(np.asarray(dset.intrins_full.fy))
    cx = np.atleast_1d(np.asarray(dset.intrins_full.cx))
    cy = np.atleast_1d(np.asarray(dset.intrins_full.cy))
    for i in range(n):
        j = min(i, len(fx) - 1)
        cam = Camera.make(
            dset.c2w[i], fx=fx[j], fy=fy[j], cx=cx[j], cy=cy[j],
            width=dset.w_full, height=dset.h_full,
        )
        if args.render_depth:
            img, depth = render_image(grid, cam, opt, return_depth=True)
        else:
            img = render_image(grid, cam, opt)
        gt = dset.gt[i]
        p = psnr(img, gt)
        s = compute_ssim(img, gt)
        psnrs.append(p)
        ssims.append(s)
        lp = lpips_fn(img, gt) if lpips_fn is not None else None
        if lp is not None:
            lpipss.append(lp)
        print(f"view {i}: psnr={p:.3f} ssim={s:.4f}"
              + (f" lpips={lp:.4f}" if lp is not None else ""))
        if not args.no_imsave:
            imageio.imwrite(
                path.join(out_dir, f"{i:04d}.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8),
            )
            if args.render_depth:
                d = depth / max(depth.max(), 1e-9)
                imageio.imwrite(
                    path.join(out_dir, f"{i:04d}_depth.png"),
                    (np.clip(d, 0, 1) * 255).astype(np.uint8),
                )

    mean_psnr = float(np.mean(psnrs))
    mean_ssim = float(np.mean(ssims))
    stats = {"psnr": mean_psnr, "ssim": mean_ssim, "n": n}
    line = f"eval stats: psnr={mean_psnr:.4f} ssim={mean_ssim:.4f}"
    if lpipss:
        stats["lpips"] = float(np.mean(lpipss))
        line += f" lpips={stats['lpips']:.4f}"
    print(line)
    with open(path.join(path.dirname(ckpt_path), "test_psnr.txt"), "w") as f:
        json.dump(stats, f)
    return mean_psnr


if __name__ == "__main__":
    main()
