"""Dataset preprocessing utilities (opt/scripts equivalents).

* ``downsample``: pre-scale images into ``images_<factor>/`` (the layout
  the loaders' ``factor`` option expects) — replaces
  opt/scripts/downsample.py (cv2 INTER_AREA, concurrent workers).
* ``run-colmap``: drive a COLMAP sparse reconstruction (feature
  extraction -> matching -> mapper) and convert it with colmap2nsvf —
  replaces opt/scripts/run_colmap.py. Gated on the ``colmap`` binary
  being installed; prints the exact commands either way.

Usage:
    python -m alphasurf_tpu.app.preprocess downsample ROOT/images 4
    python -m alphasurf_tpu.app.preprocess run-colmap ROOT [--matcher exhaustive]
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from os import path


def downsample(img_dir: str, factor: int, workers: int = 8) -> str:
    import cv2

    out_dir = path.join(
        path.dirname(img_dir.rstrip("/")),
        f"images_{factor}",
    )
    os.makedirs(out_dir, exist_ok=True)
    names = [
        n for n in sorted(os.listdir(img_dir))
        if n.lower().endswith((".png", ".jpg", ".jpeg"))
    ]

    def one(name):
        img = cv2.imread(path.join(img_dir, name), cv2.IMREAD_UNCHANGED)
        h, w = img.shape[:2]
        out = cv2.resize(
            img, (w // factor, h // factor), interpolation=cv2.INTER_AREA
        )
        cv2.imwrite(path.join(out_dir, name), out)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(one, names))
    print(f"downsampled {len(names)} images -> {out_dir}")
    return out_dir


def run_colmap(root: str, matcher: str = "exhaustive", scale: float = 1.0,
               split: int = 0) -> None:
    """COLMAP sparse pipeline on ROOT/images -> ROOT/sparse/0 -> NSVF."""
    img_dir = path.join(root, "images")
    db = path.join(root, "database.db")
    sparse = path.join(root, "sparse")
    cmds = [
        ["colmap", "feature_extractor", "--database_path", db,
         "--image_path", img_dir,
         "--ImageReader.camera_model", "SIMPLE_RADIAL",
         "--ImageReader.single_camera", "1"],
        ["colmap", f"{matcher}_matcher", "--database_path", db],
        ["colmap", "mapper", "--database_path", db, "--image_path", img_dir,
         "--output_path", sparse],
    ]
    if shutil.which("colmap") is None:
        print("colmap binary not found; run these, then "
              "`python -m alphasurf_tpu.app.colmap2nsvf ROOT/sparse/0`:")
        for c in cmds:
            print("  " + " ".join(c))
        sys.exit(1)
    os.makedirs(sparse, exist_ok=True)
    for c in cmds:
        print("+ " + " ".join(c))
        subprocess.run(c, check=True)
    from .colmap2nsvf import convert

    convert(path.join(sparse, "0"), scale=scale, split=split)


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("downsample")
    d.add_argument("img_dir")
    d.add_argument("factor", type=int)
    d.add_argument("--workers", type=int, default=8)
    r = sub.add_parser("run-colmap")
    r.add_argument("root")
    r.add_argument("--matcher", default="exhaustive",
                   choices=["exhaustive", "sequential"])
    r.add_argument("--scale", type=float, default=1.0)
    r.add_argument("--split", type=int, default=0)
    a = ap.parse_args(argv)
    if a.cmd == "downsample":
        downsample(a.img_dir, a.factor, a.workers)
    else:
        run_colmap(a.root, a.matcher, a.scale, a.split)


if __name__ == "__main__":
    main()
