"""Render a circular/spiral novel-view trajectory from a checkpoint.

Equivalent of /root/reference/opt/render_imgs_circle.py and
render_depth_circle.py: orbit poses around the scene, rgb + optional depth
and normal map videos (written as PNG frames; mp4 if imageio-ffmpeg exists).
"""
from __future__ import annotations

import argparse
import os
from os import path

import numpy as np


def main(argv=None):
    import imageio.v2 as imageio

    from ..app.config import Config, render_options_from
    from ..core.rays import Camera
    from ..data.synthetic import pose_spherical
    from ..render.image import render_image
    from ..utils.io import load_grid

    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--n_frames", type=int, default=40)
    ap.add_argument("--elevation", type=float, default=-30.0)
    ap.add_argument("--radius", type=float, default=2.7)
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=400)
    ap.add_argument("--fx", type=float, default=None)
    ap.add_argument("--render_depth", action="store_true")
    ap.add_argument("--out_dir", default=None)
    args = ap.parse_args(argv)

    ckpt_path = args.ckpt
    if path.isdir(ckpt_path):
        ckpt_path = path.join(ckpt_path, "ckpt.npz")
    grid, step = load_grid(ckpt_path)
    fx = args.fx or 1.2 * args.width
    cfg = Config(only_outward_intersect=True, sigma_thresh=-1e9, stop_thresh=1e-7)
    opt = render_options_from(cfg, no_surface=grid.surface_data is None)

    out_dir = args.out_dir or path.join(path.dirname(ckpt_path), "circle")
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for i in range(args.n_frames):
        az = 360.0 * i / args.n_frames
        cam = Camera.make(
            pose_spherical(az, -args.elevation, args.radius),
            fx=fx, width=args.width, height=args.height,
        )
        if args.render_depth:
            img, depth = render_image(grid, cam, opt, return_depth=True)
            d = depth / max(float(depth.max()), 1e-9)
            imageio.imwrite(
                path.join(out_dir, f"{i:04d}_depth.png"),
                (np.clip(d, 0, 1) * 255).astype(np.uint8),
            )
        else:
            img = render_image(grid, cam, opt)
        frame = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(path.join(out_dir, f"{i:04d}.png"), frame)
        frames.append(frame)
        print(f"frame {i}/{args.n_frames}")
    try:
        imageio.mimwrite(path.join(out_dir, "circle.mp4"), frames, fps=12)
    except Exception as e:  # ffmpeg may be unavailable
        print(f"(skipped mp4: {e})")
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
