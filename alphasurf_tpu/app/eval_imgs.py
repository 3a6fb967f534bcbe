"""Evaluate a checkpoint on test views: PSNR/SSIM + frames + video.

Equivalent of /root/reference/opt/eval_imgs.py (214 LoC): renders
``--num_views`` test cameras (evenly subsampled when fewer than the split),
computes PSNR/SSIM against GT, writes ``test_renders[_trunc]/NNNN.png``, an
mp4 when imageio-ffmpeg is available, and ``psnr.txt`` / ``ssim.txt``
(``psnr_truc.txt`` / ``ssim_truc.txt`` with --truncated_vol_render, which
also forces truncated_vol_render_a = 2 like eval_imgs.py:114-117).
``--render_depth`` renders median depth (or the first sample above
``--depth_thresh``) through the viridis colormap instead.

Usage: python -m alphasurf_tpu.app.eval_imgs CKPT DATA_DIR [--options]
"""
from __future__ import annotations

import argparse
import math
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
    from ..utils.metrics import compute_ssim, psnr, viridis_cmap

    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("data_dir")
    ap.add_argument("--dataset_type", default="auto")
    ap.add_argument("--num_views", "-N", type=int, default=100000)
    ap.add_argument("--fps", type=int, default=2)
    ap.add_argument("--crop", type=float, default=1.0,
                    help="Crop (0, 1], 1.0 = full image")
    ap.add_argument("--width", "-W", type=int, default=None)
    ap.add_argument("--height", "-H", type=int, default=None)
    ap.add_argument("--render_depth", action="store_true")
    ap.add_argument("--depth_thresh", type=float, default=None,
                    help="alpha threshold for depth; None = median depth")
    ap.add_argument("--truncated_vol_render", action="store_true")
    ap.add_argument("--scale", type=float, default=None)
    ap.add_argument("--no_vid", action="store_true")
    args = ap.parse_args(argv)

    ckpt_path = args.ckpt
    if path.isdir(ckpt_path):
        ckpt_path = path.join(ckpt_path, "ckpt.npz")
    grid, step = load_grid(ckpt_path)

    dset = datasets[args.dataset_type](
        args.data_dir, split="test", scale=args.scale
    )
    cfg = Config(only_outward_intersect=True,
                 truncated_vol_render=args.truncated_vol_render,
                 sigma_thresh=-1e9, stop_thresh=1e-7)
    opt = render_options_from(cfg, no_surface=grid.surface_data is None)
    if args.truncated_vol_render:
        import jax.numpy as jnp

        grid = grid.replace(
            truncated_vol_render_a=jnp.asarray(2.0, grid.density_data.dtype)
        )

    exp_dir = path.dirname(ckpt_path)
    suffix = "_trunc" if args.truncated_vol_render else ""
    img_out = path.join(exp_dir, "test_renders" + suffix)
    vid_out = path.join(
        exp_dir,
        "test_render_vid" + ("_depth" if args.render_depth else "")
        + (f"_crop{args.crop}" if args.crop != 1.0 else "") + ".mp4",
    )
    os.makedirs(img_out, exist_ok=True)

    n_total = dset.n_images
    if args.num_views >= n_total:
        ids = np.arange(n_total)
    else:
        ids = np.round(np.linspace(0, n_total - 1, args.num_views)).astype(int)
        print(f"Using test views with ids: {ids}")

    fx = np.atleast_1d(np.asarray(dset.intrins_full.fx))
    fy = np.atleast_1d(np.asarray(dset.intrins_full.fy))
    psnrs, ssims, frames = [], [], []
    for k, i in enumerate(ids):
        H, W = dset.h_full, dset.w_full
        if args.height:
            H = args.height
        if args.width:
            W = args.width
        if args.crop != 1.0:
            H, W = int(H * args.crop), int(W * args.crop)
        j = min(int(i), len(fx) - 1)
        cam = Camera.make(
            dset.c2w[int(i)], fx=fx[j], fy=fy[j],
            cx=W * 0.5, cy=H * 0.5, width=W, height=H,
        )
        if args.render_depth:
            im, depth = render_image(grid, cam, opt, return_depth=True)
            frame = viridis_cmap(np.asarray(depth))
        else:
            im = render_image(grid, cam, opt)
            frame = np.clip(np.asarray(im), 0.0, 1.0)
        gt = np.asarray(dset.gt[int(i)], np.float32)
        if gt.shape[:2] == np.asarray(im).shape[:2]:
            mse = float(np.mean((gt - np.asarray(im)) ** 2))
            psnrs.append(-10.0 * math.log10(max(mse, 1e-12)))
            ssims.append(float(compute_ssim(np.asarray(im), gt)))
        frame8 = (frame * 255).astype(np.uint8)
        frames.append(frame8)
        imageio.imwrite(path.join(img_out, f"{k:04d}.png"), frame8)

    if frames and not args.no_vid:
        try:
            imageio.mimwrite(vid_out, frames, fps=args.fps,
                             macro_block_size=8)
            print("Wrote", vid_out)
        except Exception as e:  # imageio-ffmpeg absent in this env
            print(f"video skipped ({type(e).__name__}: {e})")

    if psnrs:
        all_psnr, all_ssim = float(np.mean(psnrs)), float(np.mean(ssims))
        print("PSNR:", psnrs)
        print("SSIM:", ssims)
        tag = "_truc" if args.truncated_vol_render else ""
        with open(path.join(exp_dir, f"psnr{tag}.txt"), "w") as f:
            f.write(str(all_psnr))
        with open(path.join(exp_dir, f"ssim{tag}.txt"), "w") as f:
            f.write(str(all_ssim))
        print(f"mean PSNR {all_psnr:.3f} SSIM {all_ssim:.4f}")
    return psnrs, ssims


if __name__ == "__main__":
    main()
