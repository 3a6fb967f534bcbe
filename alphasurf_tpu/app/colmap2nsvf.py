"""COLMAP sparse reconstruction -> NSVF-format dataset directory.

Equivalent of /root/reference/opt/scripts/colmap2nsvf.py (369 LoC) +
create_split.py: parses COLMAP's binary sparse model (cameras.bin /
images.bin / points3D.bin — the public COLMAP format), autoscales the
scene by the median feature-point spread, and writes the layout our
``NSVFDataset`` loader consumes:

    pose/<image>.txt   4x4 OpenCV c2w per image
    intrinsics.txt     4x4 K (focal + principal point)
    points.npy         (N, 3) rescaled sparse feature cloud
    feature/<image>.npz  per-image feature pixel positions + point ids

``--split N`` additionally prefixes every Nth image ``1_`` (test) and the
rest ``0_`` (train) — the reference requires a separate create_split.py
pass for this.

Usage: python -m alphasurf_tpu.app.colmap2nsvf SPARSE_DIR [--scale S]
       [--gl_cam] [--split 8]
"""
from __future__ import annotations

import argparse
import os
import struct
from os import path

import numpy as np

# COLMAP camera model ids -> (name, n_params); focal/principal extraction
# below supports the pinhole-family models
_CAM_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),   # f, cx, cy
    1: ("PINHOLE", 4),          # fx, fy, cx, cy
    2: ("SIMPLE_RADIAL", 4),    # f, cx, cy, k
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
}


def _read(fid, fmt):
    return struct.unpack("<" + fmt, fid.read(struct.calcsize("<" + fmt)))


def _quat_to_rot(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def read_cameras_bin(p):
    cams = {}
    with open(p, "rb") as f:
        (n,) = _read(f, "Q")
        for _ in range(n):
            cam_id, model_id, w, h = _read(f, "iiQQ")
            name, np_ = _CAM_MODELS.get(model_id, (None, None))
            if name is None:
                raise NotImplementedError(f"COLMAP camera model {model_id}")
            params = np.array(_read(f, "d" * np_))
            if name == "PINHOLE":
                fx, fy, cx, cy = params[:4]
            else:
                fx = fy = params[0]
                cx, cy = params[1], params[2]
            cams[cam_id] = {"w": int(w), "h": int(h), "fx": fx, "fy": fy,
                            "cx": cx, "cy": cy}
    return cams


def read_points3d_bin(p):
    ids, xyzs, rgbs = [], [], []
    with open(p, "rb") as f:
        (n,) = _read(f, "Q")
        for _ in range(n):
            vals = _read(f, "QdddBBBd")
            ids.append(vals[0])
            xyzs.append(vals[1:4])
            rgbs.append(vals[4:7])
            (track_len,) = _read(f, "Q")
            f.read(8 * track_len)  # (image_id, point2D_idx) pairs, unused
    idmap = {pid: i for i, pid in enumerate(ids)}
    return np.asarray(xyzs, np.float64), np.asarray(rgbs, np.uint8), idmap


def read_images_bin(p):
    images = []
    with open(p, "rb") as f:
        (n,) = _read(f, "Q")
        for _ in range(n):
            vals = _read(f, "idddddddi")
            qvec = np.array(vals[1:5])
            tvec = np.array(vals[5:8])
            cam_id = vals[8]
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            (n2d,) = _read(f, "Q")
            raw = _read(f, "ddq" * n2d)
            xys = np.array(raw).reshape(-1, 3)[:, :2] if n2d else np.zeros((0, 2))
            pids = np.array(raw[2::3], np.int64) if n2d else np.zeros(0, np.int64)
            images.append({
                "name": name.decode(), "qvec": qvec, "tvec": tvec,
                "camera_id": cam_id, "xys": xys, "point3D_ids": pids,
            })
    return images


def convert(sparse_dir: str, out_dir: str | None = None, scale: float = 1.0,
            gl_cam: bool = False, split: int = 0) -> str:
    """Convert; returns the dataset root directory."""
    sparse_dir = sparse_dir.rstrip("/")
    base = out_dir or path.dirname(path.dirname(sparse_dir))
    pose_dir = path.join(base, "pose")
    feat_dir = path.join(base, "feature")
    os.makedirs(pose_dir, exist_ok=True)
    os.makedirs(feat_dir, exist_ok=True)

    cams = read_cameras_bin(path.join(sparse_dir, "cameras.bin"))
    images = read_images_bin(path.join(sparse_dir, "images.bin"))
    points, rgbs, idmap = read_points3d_bin(path.join(sparse_dir, "points3D.bin"))

    cam0 = cams[images[0]["camera_id"]]
    K = np.eye(4)
    K[0, 0], K[1, 1] = cam0["fx"], cam0["fy"]
    K[0, 2], K[1, 2] = cam0["cx"], cam0["cy"]
    np.savetxt(path.join(base, "intrinsics.txt"), K)

    # autoscale: center on the median feature point, scale so the median
    # squared spread maps to 2*scale (the reference's convention)
    cen = np.median(points, axis=0)
    pts = points - cen
    meddist = np.median((pts**2).sum(axis=1))
    s = 2.0 * scale / max(meddist, 1e-12)
    np.save(path.join(base, "points.npy"), pts * s)

    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    for i, im in enumerate(images):
        R = _quat_to_rot(im["qvec"])  # world->cam
        t_world = -R.T @ im["tvec"].reshape(3, 1)
        t_world = (t_world - cen[:, None]) * s
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = t_world[:, 0]
        if gl_cam:
            c2w = c2w @ flip
        stem = path.splitext(path.basename(im["name"]))[0]
        if split > 0:
            stem = ("1_" if i % split == split - 1 else "0_") + stem
        np.savetxt(path.join(pose_dir, stem + ".txt"), c2w)
        valid = im["point3D_ids"] >= 0
        ids = np.array([idmap.get(p, -1) for p in im["point3D_ids"][valid]])
        np.savez(path.join(feat_dir, stem + ".npz"),
                 xys=im["xys"][valid], ids=ids)
    print(f"wrote {len(images)} poses to {pose_dir}; "
          f"{len(points)} points; intrinsics f={K[0,0]:.1f}")
    return base


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("sparse_dir", help="COLMAP sparse model dir (sparse/0)")
    ap.add_argument("--out", default=None, help="dataset root (default: "
                                                "sparse_dir/../..)")
    ap.add_argument("--scale", "-s", type=float, default=1.0)
    ap.add_argument("--gl_cam", action="store_true")
    ap.add_argument("--split", type=int, default=0,
                    help="hold out every Nth image as test (1_ prefix)")
    a = ap.parse_args(argv)
    convert(a.sparse_dir, a.out, a.scale, a.gl_cam, a.split)


if __name__ == "__main__":
    main()
