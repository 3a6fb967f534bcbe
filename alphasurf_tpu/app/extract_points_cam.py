"""Camera-trajectory point extraction.

Equivalent of /root/reference/opt/exract_points.py: render every (training)
camera, collect the renderer's real ray/iso-surface intersections, filter by
alpha, optionally weight-filter and downsample, save as npy/ply.

Usage: python -m alphasurf_tpu.app.extract_points_cam CKPT DATA_DIR
           [--intersect_th 0.1] [--downsample r] [--out pts.npy]
"""
from __future__ import annotations

import argparse
import functools
from os import path

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..app.config import Config, render_options_from
    from ..core.rays import Camera, Rays
    from ..data import datasets
    from ..geometry.chamfer import downsample_points
    from ..render.surface import volume_render_surface_packed, voxel_occupancy
    from ..utils.io import load_grid
    from .extract_points import save_ply

    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("data_dir")
    ap.add_argument("--dataset_type", default="auto")
    ap.add_argument("--split", default="train")
    ap.add_argument("--intersect_th", type=float, default=0.1,
                    help="keep intersections with alpha >= th")
    ap.add_argument("--weight_th", type=float, default=0.0,
                    help="optional composite-weight filter")
    ap.add_argument("--downsample", type=float, default=0.0)
    ap.add_argument("--n_images", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    ckpt_path = args.ckpt
    if path.isdir(ckpt_path):
        ckpt_path = path.join(ckpt_path, "ckpt.npz")
    grid, step = load_grid(ckpt_path)
    assert grid.surface_data is not None, "surface checkpoint required"
    dset = datasets[args.dataset_type](args.data_dir, split=args.split)

    cfg = Config(only_outward_intersect=True, sigma_thresh=-1e9,
                 stop_thresh=1e-7)
    opt = render_options_from(cfg)
    occ = jax.jit(voxel_occupancy, static_argnums=1)(grid, opt)

    @functools.partial(jax.jit, static_argnames=("opt",))
    def render_chunk(grid, o, d, occ, opt):
        out = volume_render_surface_packed(
            grid, Rays(o, d), opt, occupancy=occ, return_intersections=True
        )
        return out["intersections"]

    fx = np.atleast_1d(np.asarray(dset.intrins_full.fx))
    fy = np.atleast_1d(np.asarray(dset.intrins_full.fy))
    cx = np.atleast_1d(np.asarray(dset.intrins_full.cx))
    cy = np.atleast_1d(np.asarray(dset.intrins_full.cy))
    all_pts = []
    n = dset.n_images if args.n_images is None else min(args.n_images, dset.n_images)
    for i in range(n):
        j = min(i, len(fx) - 1)
        cam = Camera.make(
            dset.c2w[i], fx=fx[j], fy=fy[j], cx=cx[j], cy=cy[j],
            width=dset.w_full, height=dset.h_full,
        )
        rays = cam.gen_rays()
        nr = rays.origins.shape[0]
        for s in range(0, nr, args.chunk):
            e = min(s + args.chunk, nr)
            o = np.asarray(rays.origins[s:e])
            d = np.asarray(rays.dirs[s:e])
            if e - s < args.chunk:
                padn = args.chunk - (e - s)
                o = np.concatenate([o, np.repeat(o[-1:], padn, 0)])
                d = np.concatenate([d, np.repeat(d[-1:], padn, 0)])
            res = render_chunk(grid, jnp.asarray(o), jnp.asarray(d), occ, opt)
            mask = np.asarray(res["mask"]).copy()
            mask &= np.asarray(res["alpha"]) >= args.intersect_th
            if args.weight_th > 0:
                mask &= np.asarray(res["weight"]) >= args.weight_th
            if mask.any():
                all_pts.append(np.asarray(res["pts"])[mask])
        print(f"camera {i}: {sum(len(p) for p in all_pts)} pts so far")

    pts = (np.concatenate(all_pts, 0) if all_pts
           else np.zeros((0, 3), np.float32))
    if args.downsample > 0:
        pts = downsample_points(pts, args.downsample)
    out = args.out or path.join(path.dirname(ckpt_path), "pts_cam.npy")
    if out.endswith(".ply"):
        save_ply(pts, out)
    else:
        np.save(out, pts)
    print(f"wrote {out} ({len(pts)} points)")
    return pts


if __name__ == "__main__":
    main()
