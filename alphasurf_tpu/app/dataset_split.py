"""NSVF split management + Record3D capture conversion.

* ``create_split`` / ``unsplit`` — the reference's rename-based split
  tooling (``opt/scripts/create_split.py:1-92`` / ``unsplit.py``): prefix
  every Nth image ``1_`` (test) and the rest ``0_`` (train) across all
  parallel per-frame directories (pose/, rgb/, images/, feature/, depths/),
  keyed on the pose directory's file stems; ``unsplit`` strips the
  prefixes again. Our twist: pure stdlib, ``--dry_run`` prints the rename
  plan without touching disk, and both directions are idempotent.
* ``record3d_to_nsvf`` — ``proc_record3d.py:1-81``: a Record3D capture
  (metadata.json with row-major intrinsics + quaternion poses, plus an
  mp4 whose left half is RGB) becomes an NSVF-layout dataset: per-frame
  ``pose/*.txt`` (OpenCV c2w — the ARKit OpenGL pose is flipped with
  diag(1,-1,-1)), shared ``intrinsics.txt``, frames sampled every
  ``--every`` and downscaled by ``--factor``. Video decoding is gated on
  cv2; a directory of pre-extracted frames always works.
"""
from __future__ import annotations

import argparse
import json
import os
from os import path

import numpy as np

_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".gif", ".tif", ".tiff", ".bmp")
_SPLIT_DIRS = [
    ("pose", (".txt",)), ("poses", (".txt",)), ("feature", (".npz",)),
    ("rgb", _IMAGE_EXTS), ("images", _IMAGE_EXTS), ("image", _IMAGE_EXTS),
    ("c2w", _IMAGE_EXTS), ("depths", (".exr", ".pfm", ".png", ".npy")),
]


def _split_dirs(root: str):
    """(dir, valid_exts) pairs present under root; reference dir = pose."""
    found, ref = [], None
    for name, exts in _SPLIT_DIRS:
        for d in sorted(os.listdir(root)):
            full = path.join(root, d)
            if d.startswith(name) and path.isdir(full):
                if d == "pose":
                    ref = len(found)
                found.append((full, exts))
    if not found:
        raise FileNotFoundError(f"no splittable dirs under {root}")
    return found, (ref if ref is not None else 0)


def create_split(root: str, every: int = 16, randomize: bool = False,
                 dry_run: bool = False, seed: int = 0) -> int:
    """Prefix every ``every``-th frame ``1_`` (test), the rest ``0_``."""
    dirs, ref = _split_dirs(root)
    ref_dir, ref_exts = dirs[ref]
    stems = [path.splitext(f)[0] for f in sorted(os.listdir(ref_dir))
             if path.splitext(f)[1].lower() in ref_exts
             and not f.startswith(("0_", "1_"))]
    if randomize:
        np.random.default_rng(seed).shuffle(stems)
    plan = {s: f"{int(i % every == 0)}_{s}" for i, s in enumerate(stems)}
    n = 0
    for dirname, exts in dirs:
        for fn in sorted(os.listdir(dirname)):
            stem, ext = path.splitext(fn)
            if (fn.startswith(("0_", "1_")) or ext.lower() not in exts
                    or stem not in plan):
                continue
            src, dst = path.join(dirname, fn), path.join(
                dirname, plan[stem] + ext)
            print(f"rename {src} -> {dst}")
            if not dry_run:
                os.rename(src, dst)
            n += 1
    return n


def unsplit(root: str, dry_run: bool = False) -> int:
    """Strip 0_/1_/2_ split prefixes (unsplit.py)."""
    dirs, _ = _split_dirs(root)
    n = 0
    for dirname, _exts in dirs:
        for fn in sorted(os.listdir(dirname)):
            if len(fn) > 2 and fn[1] == "_" and fn[0] in "012":
                src, dst = path.join(dirname, fn), path.join(dirname, fn[2:])
                print(f"rename {src} -> {dst}")
                if not dry_run:
                    os.rename(src, dst)
                n += 1
    return n


def _record3d_frames(data_dir: str, every: int):
    """Yield (index, HxWx3 uint8) frames from frames/ or the capture mp4."""
    frames_dir = path.join(data_dir, "frames")
    if path.isdir(frames_dir):
        import imageio.v2 as imageio

        names = sorted(os.listdir(frames_dir))
        for i, fn in enumerate(names):
            if i % every == 0:
                yield i, np.asarray(imageio.imread(path.join(frames_dir, fn)))
        return
    mp4s = [f for f in sorted(os.listdir(data_dir)) if f.endswith(".mp4")]
    if not mp4s:
        raise FileNotFoundError(f"no frames/ dir or .mp4 in {data_dir}")
    import cv2

    video = cv2.VideoCapture(path.join(data_dir, mp4s[0]))
    i = 0
    while True:
        ok, frame = video.read()
        if not ok:
            break
        if i % every == 0:
            yield i, frame[..., ::-1]  # BGR -> RGB
        i += 1


def record3d_to_nsvf(data_dir: str, every: int = 15, factor: int = 2) -> int:
    """Convert a Record3D capture directory to the NSVF layout in place."""
    import imageio.v2 as imageio

    with open(path.join(data_dir, "metadata.json")) as f:
        meta = json.load(f)
    K = np.asarray(meta["K"], np.float64).reshape(3, 3).T / factor
    K4 = np.eye(4)
    K4[:3, :3] = K
    np.savetxt(path.join(data_dir, "intrinsics.txt"), K4)

    poses = np.asarray(meta["poses"], np.float64)  # (n, 7): qx qy qz qw, t
    q, t = poses[:, :4], poses[:, 4:]
    t = t - t.mean(axis=0)  # recenter
    # quaternion (x,y,z,w) -> rotation matrix (scipy.Rotation.from_quat
    # convention, re-derived: R = I + 2s[q]_x + 2[q]_x^2)
    x, y, z, w = q.T
    n2 = (q * q).sum(-1)
    s = 2.0 / np.maximum(n2, 1e-12)
    R = np.empty((len(q), 3, 3))
    R[:, 0, 0] = 1 - s * (y * y + z * z)
    R[:, 0, 1] = s * (x * y - w * z)
    R[:, 0, 2] = s * (x * z + w * y)
    R[:, 1, 0] = s * (x * y + w * z)
    R[:, 1, 1] = 1 - s * (x * x + z * z)
    R[:, 1, 2] = s * (y * z - w * x)
    R[:, 2, 0] = s * (x * z - w * y)
    R[:, 2, 1] = s * (y * z + w * x)
    R[:, 2, 2] = 1 - s * (x * x + y * y)
    c2w = np.zeros((len(q), 4, 4))
    c2w[:, 3, 3] = 1.0
    c2w[:, :3, :3] = R
    c2w[:, :3, 3] = t
    c2w = c2w @ np.diag([1.0, -1.0, -1.0, 1.0])  # OpenGL -> OpenCV

    pose_dir = path.join(data_dir, "pose")
    rgb_dir = path.join(data_dir, "rgb")
    os.makedirs(pose_dir, exist_ok=True)
    os.makedirs(rgb_dir, exist_ok=True)
    n = 0
    for i, frame in _record3d_frames(data_dir, every):
        if i >= len(c2w):
            break
        rgb = frame[:, : frame.shape[1] // 2]  # left half is RGB
        if factor > 1:
            rgb = rgb[::factor, ::factor]
        np.savetxt(path.join(pose_dir, f"{n:05d}.txt"), c2w[i])
        imageio.imwrite(path.join(rgb_dir, f"{n:05d}.png"), rgb)
        n += 1
    print(f"{n} frames -> {rgb_dir}")
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("create_split")
    c.add_argument("root_dir")
    c.add_argument("--every", type=int, default=16)
    c.add_argument("--random", action="store_true")
    c.add_argument("--dry_run", action="store_true")
    u = sub.add_parser("unsplit")
    u.add_argument("root_dir")
    u.add_argument("--dry_run", action="store_true")
    r = sub.add_parser("record3d")
    r.add_argument("data_dir")
    r.add_argument("--every", type=int, default=15)
    r.add_argument("--factor", type=int, default=2)
    a = p.parse_args(argv)
    if a.cmd == "create_split":
        n = create_split(a.root_dir, a.every, a.random, a.dry_run)
    elif a.cmd == "unsplit":
        n = unsplit(a.root_dir, a.dry_run)
    else:
        n = record3d_to_nsvf(a.data_dir, a.every, a.factor)
    print(f"{n} files processed")


if __name__ == "__main__":
    main()
