"""Debug-render one test view from a checkpoint, optionally probing pixels.

Equivalent of /root/reference/opt/debug_render.py (149 LoC): loads
``TRAIN_DIR/ckpt.npz``, renders test view ``--img_id`` with fake samples
forced OFF (debug_render.py:127 ``grid.opt.surf_fake_sample = False``),
saves ``debug_{step}.png``, and for each ``--pixel X,Y`` prints the
rendered rgb / depth / intersection count at that pixel (the analog of the
kernel's ``debug_pixels`` per-pixel dump).

Usage: python -m alphasurf_tpu.app.debug_render TRAIN_DIR DATA_DIR
           [--img_id 46] [--pixel 167,315 ...]
"""
from __future__ import annotations

import argparse
from os import path

import numpy as np


def main(argv=None):
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from ..app.config import Config, render_options_from
    from ..core.rays import Camera, Rays
    from ..data import datasets
    from ..render.image import render_image
    from ..render.surface import volume_render_surface_packed
    from ..utils.io import load_grid

    ap = argparse.ArgumentParser()
    ap.add_argument("train_dir")
    ap.add_argument("data_dir")
    ap.add_argument("--dataset_type", default="auto")
    ap.add_argument("--img_id", type=int, default=46)
    ap.add_argument("--pixel", action="append", default=[],
                    help="X,Y matplotlib coords (reference P_COORD)")
    ap.add_argument("--scale", type=float, default=None)
    args = ap.parse_args(argv)

    ckpt = args.train_dir
    if path.isdir(ckpt):
        ckpt = path.join(ckpt, "ckpt.npz")
    if not path.isfile(ckpt):
        raise FileNotFoundError(f"Ckpt {ckpt} not found")
    grid, step = load_grid(ckpt)

    dset = datasets[args.dataset_type](
        args.data_dir, split="test", scale=args.scale
    )
    img_id = min(args.img_id, dset.n_images - 1)
    cfg = Config(only_outward_intersect=True, truncated_vol_render=True,
                 sigma_thresh=-1e9, stop_thresh=1e-7,
                 surf_fake_sample=False)  # debug_render.py:127
    opt = render_options_from(cfg, no_surface=grid.surface_data is None)

    H, W = dset.h_full, dset.w_full
    fx = np.atleast_1d(np.asarray(dset.intrins_full.fx))
    fy = np.atleast_1d(np.asarray(dset.intrins_full.fy))
    cx = np.atleast_1d(np.asarray(dset.intrins_full.cx))
    cy = np.atleast_1d(np.asarray(dset.intrins_full.cy))
    j = min(img_id, len(fx) - 1)
    cam = Camera.make(
        dset.c2w[img_id], fx=fx[j], fy=fy[j], cx=cx[j], cy=cy[j],
        width=W, height=H, ndc_coeffs=dset.ndc_coeffs,
    )

    if args.pixel and grid.surface_data is not None:
        rays = cam.gen_rays()
        for p in args.pixel:
            x, y = (int(v) for v in p.split(","))
            idx = y * W + x  # reference convention: rgb[P_y, P_x]
            r = Rays(rays.origins[idx : idx + 1], rays.dirs[idx : idx + 1])
            out = volume_render_surface_packed(
                grid, r, opt, entries_per_ray=64.0
            )
            print(
                f"pixel ({x},{y}): rgb={np.asarray(out['rgb'])[0]} "
                f"depth={float(out['depth'][0]):.4f} "
                f"alpha={float(out['alpha'][0]):.4f} "
                f"n_intersections={int(out['n_intersections'][0])}"
            )
        return

    im = np.clip(np.asarray(render_image(grid, cam, opt)), 0.0, 1.0)
    out_png = path.join(path.dirname(ckpt), f"debug_{step}.png")
    imageio.imwrite(out_png, (im * 255).astype(np.uint8))
    print("wrote", out_png)


if __name__ == "__main__":
    main()
