"""Official DTU-protocol Chamfer evaluation CLI.

Equivalent of /root/reference/opt/eval_dtu.py (DTUeval-python port):
mesh/point loading, mesh surface sampling, ObsMask culling, ground-Plane
filtering, thresholded d2s/s2d, cf.txt + error-colored vis PLYs.

Usage: python -m alphasurf_tpu.app.eval_dtu --input_path PTS --scan N \
           --dataset_dir "SampleSet/MVS Data" [--out_dir DIR]
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    from ..geometry.dtu_eval import (
        dtu_eval,
        load_points,
        sample_mesh,
        write_ply_points,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--input_path", type=str, required=True)
    ap.add_argument("--scan", type=int, default=1)
    ap.add_argument("--dataset_dir", type=str, required=True)
    ap.add_argument("--downsample_density", type=float, default=0.2)
    ap.add_argument("--patch_size", type=float, default=60)
    ap.add_argument("--max_dist", type=float, default=20)
    ap.add_argument("--visualize_threshold", type=float, default=10)
    ap.add_argument("--out_dir", type=str, default=None)
    ap.add_argument("--no_pts_save", action="store_true", default=False)
    args = ap.parse_args(argv)

    pts, tris = load_points(args.input_path)
    if tris is not None:
        pts = sample_mesh(pts, tris, args.downsample_density)

    res = dtu_eval(
        pts, args.scan, args.dataset_dir,
        max_dist=args.max_dist, patch_size=args.patch_size,
        visualize_threshold=args.visualize_threshold,
    )
    print(f"======= eval result =======")
    print(f"Mean d2s: {res['mean_d2s']}")
    print(f"Mean s2d: {res['mean_s2d']}")
    print(f"Avg cf: {res['overall']}")
    print(json.dumps({k: res[k] for k in ("mean_d2s", "mean_s2d", "overall")}))

    if args.out_dir is not None:
        os.makedirs(args.out_dir, exist_ok=True)
        if not args.no_pts_save:
            v = res["vis"]
            write_ply_points(
                f"{args.out_dir}/vis_{args.scan:03}_d2s.ply",
                v["data_points"], v["data_colors"],
            )
            write_ply_points(
                f"{args.out_dir}/vis_{args.scan:03}_s2d.ply",
                v["stl_points"], v["stl_colors"],
            )
        with open(f"{args.out_dir}/cf.txt", "w") as f:
            f.write(f"Mean d2s: {res['mean_d2s']}\n")
            f.write(f"Mean s2d: {res['mean_s2d']}\n")
            f.write(f"Avg cf: {res['overall']}\n")
    return res


if __name__ == "__main__":
    main()
