"""Extract a point cloud from rendered depth maps along a camera set.

Equivalent of /root/reference/opt/exract_points_depth.py: for each camera
(dataset test/train poses or a spherical circle trajectory), render depth
(mean / med / mode / sigma-thresh), back-project each ray to a 3D world
point (svox2.py:3881-3906: pts = origins + dirs * depth, zero/NaN depths
dropped), concatenate and optionally radius-downsample.

Usage: python -m alphasurf_tpu.app.extract_points_depth CKPT
           [--data_dir D --dataset_type auto] [--traj_type circle]
           [--depth_type mean|med|mode|thresh] [--depth_sigma_thresh T]
           [--weight_thresh W] [--out pts.npy] [--downsample R]
"""
from __future__ import annotations

import argparse
import functools
from os import path

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..core.rays import Camera, Rays
    from ..core.options import RenderOptions
    from ..geometry.chamfer import downsample_points
    from ..ops import dda
    from ..render.surface import volume_render_surface_packed
    from ..render.cuvol import volume_render_cuvol
    from ..utils.io import load_grid

    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--dataset_type", default="auto")
    ap.add_argument("--traj_type", choices=["test", "train", "circle"],
                    default="test")
    ap.add_argument("--num_views", "-N", type=int, default=30)
    ap.add_argument("--radius", type=float, default=2.7)
    ap.add_argument("--elevation", type=float, default=-30.0)
    ap.add_argument("--width", "-W", type=int, default=None)
    ap.add_argument("--height", "-H", type=int, default=None)
    ap.add_argument("--depth_type", choices=["mean", "med", "mode", "thresh"],
                    default="mean")
    ap.add_argument("--depth_sigma_thresh", type=float, default=0.1)
    ap.add_argument("--weight_thresh", type=float, default=0.5,
                    help="min accumulated opacity for a ray to emit a point")
    ap.add_argument("--downsample", type=float, default=0.0)
    ap.add_argument("--out", default="pts_depth.npy")
    ap.add_argument("--chunk", type=int, default=16384)
    args = ap.parse_args(argv)

    ckpt_path = args.ckpt
    if path.isdir(ckpt_path):
        ckpt_path = path.join(ckpt_path, "ckpt.npz")
    grid, step = load_grid(ckpt_path)
    print(f"loaded {ckpt_path} (step {step})")

    # ---- camera set ----
    cams = []
    if args.traj_type in ("test", "train") and args.data_dir:
        from ..data import auto_dataset, datasets

        maker = (
            auto_dataset if args.dataset_type == "auto"
            else datasets[args.dataset_type]
        )
        dset = maker(args.data_dir, split=args.traj_type)
        for i in range(min(dset.n_images, args.num_views)):
            cams.append(Camera.make(
                dset.c2w[i], fx=dset.intrins_full.fx, fy=dset.intrins_full.fy,
                cx=dset.intrins_full.cx, cy=dset.intrins_full.cy,
                width=dset.w_full, height=dset.h_full,
            ))
    else:
        from ..data.synthetic import pose_spherical

        W = args.width or 400
        H = args.height or 400
        for az in np.linspace(-180, 180, args.num_views, endpoint=False):
            c2w = pose_spherical(az, args.elevation, args.radius)
            cams.append(Camera.make(
                jnp.asarray(c2w), fx=1.1 * W, width=W, height=H,
            ))

    opt = RenderOptions(sigma_thresh=-1e9, stop_thresh=-1.0)
    surface = grid.surface_data is not None
    sig = args.depth_sigma_thresh if args.depth_type == "thresh" else None

    @functools.partial(jax.jit, static_argnames=("n",))
    def depth_chunk(origins, dirs, n=0):
        rays = Rays(origins, dirs)
        if surface:
            out = volume_render_surface_packed(
                grid, rays, opt, entries_per_ray=16, depth_sigma_thresh=sig,
            )
        else:
            out = volume_render_cuvol(grid, rays, opt, depth_sigma_thresh=sig)
        if args.depth_type == "thresh":
            d = out["depth_sigma_thresh"]
        elif args.depth_type == "mode" and surface:
            d = out["depth_mode"]
        elif args.depth_type == "med" and surface:
            d = out["depth_med"]
        else:
            d = out["depth"]
            # expected depth is weight-sum-scaled; normalize by opacity
            alpha = 1.0 - jnp.exp(out["log_transmit"])
            d = d / jnp.maximum(alpha, 1e-9)
        alpha = 1.0 - jnp.exp(out["log_transmit"])
        # grid t -> world ray-parameter via the per-ray dir rescale
        _, _, _, delta_scale = dda.preprocess_rays(grid, origins, dirs)
        return d * delta_scale, alpha

    all_pts = []
    for ci, cam in enumerate(cams):
        rays = cam.gen_rays()
        n = rays.origins.shape[0]
        for s in range(0, n, args.chunk):
            e = min(s + args.chunk, n)
            o = np.asarray(rays.origins[s:e])
            dv = np.asarray(rays.dirs[s:e])
            if e - s < args.chunk:
                pad = args.chunk - (e - s)
                o = np.concatenate([o, np.repeat(o[-1:], pad, 0)])
                dv = np.concatenate([dv, np.repeat(dv[-1:], pad, 0)])
            d, alpha = depth_chunk(jnp.asarray(o), jnp.asarray(dv))
            d = np.asarray(d)[: e - s]
            alpha = np.asarray(alpha)[: e - s]
            ok = (d > 0) & np.isfinite(d) & (alpha > args.weight_thresh)
            if ok.any():
                all_pts.append(o[: e - s][ok] + dv[: e - s][ok] * d[ok, None])
        print(f"view {ci}: {sum(len(p) for p in all_pts)} pts total")

    pts = (
        np.concatenate(all_pts, 0).astype(np.float32)
        if all_pts else np.zeros((0, 3), np.float32)
    )
    if args.downsample > 0 and len(pts):
        pts = downsample_points(pts, args.downsample)
        print(f"downsampled to {len(pts)}")
    np.save(args.out, pts)
    print(f"wrote {args.out} ({len(pts)} points)")
    return pts


if __name__ == "__main__":
    main()
