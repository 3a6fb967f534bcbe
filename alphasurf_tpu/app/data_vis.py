"""Data-inspection tooling: depth-map GT points, turntable renders, camera
visualization.

Self-contained analogs of the reference's visualization scripts
(``opt/scripts/``), none of which could run in a headless TPU pod:

* ``depth_to_points`` — ``exr_to_pts.py:1-76``: unproject Blender depth
  renders through the ``transforms_train.json`` cameras into a world point
  cloud, bbox-crop, radius-downsample, save ``shape.npy`` (the Blender
  chamfer GT). EXR reading is dependency-gated (imageio/cv2 when present);
  ``.npy`` depth maps always work.
* ``turntable_render`` — ``vis_pt_mesh.py:1-87`` / ``vis_pt_mesh_dtu.py``:
  azimuth x elevation turntable screenshots of a point cloud or mesh.
  Instead of a pyvista GL window (no display, no pyvista here) this is a
  numpy z-buffer point splatter: meshes are area-sampled to points
  (``geometry.dtu_eval.sample_mesh``) and splatted with depth-resolved
  nearest-point coloring.
* ``view_data`` — ``view_data.py:1-382``: the reference emits an HTML
  nerfvis scene of the dataset's camera frusta + image planes. Here the
  same inspection artifact is a colored PLY (camera frusta as line-sampled
  points, per-split colors, scene bbox) viewable in any mesh tool, plus a
  printed pose/intrinsics summary — no browser or nerfvis needed.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from os import path

import numpy as np

sys.path.insert(0, path.dirname(path.dirname(path.dirname(path.abspath(__file__)))))

from alphasurf_tpu.geometry.dtu_eval import (  # noqa: E402
    load_obj, load_ply, radius_downsample, sample_mesh, write_ply_points,
)


# ---------------------------------------------------------------------------
# depth maps -> GT point cloud (exr_to_pts)
# ---------------------------------------------------------------------------

def _read_depth(fp: str) -> np.ndarray:
    """Read a depth map: .npy natively; .exr/.pfm/.png via imageio when
    installed (the reference hard-requires cv2+OpenEXR)."""
    if fp.endswith(".npy"):
        d = np.load(fp)
    else:
        try:
            import imageio.v2 as imageio
            d = np.asarray(imageio.imread(fp))
        except Exception as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                f"cannot read {fp}: install imageio with EXR support, or "
                "convert depth maps to .npy") from e
    if d.ndim == 3:
        d = d[..., 0]
    return d.astype(np.float32)


def depth_to_points(
    data_json: str,
    depth_dir: str,
    out_path: str | None = None,
    thresh: float = 0.001,
    bbox: float = 2.0,
    max_depth: float = 1e10,
) -> np.ndarray:
    """Unproject per-frame depth maps into one world-space point cloud.

    Mirrors ``exr_to_pts.py``: Blender camera convention (look down -z,
    x mirrored), distance factor ``2 tan(fov_x/2)``, pixel offsets from the
    image center scaled by ``max(rows, cols)``, then a +-``bbox`` crop and
    a ``thresh``-radius density downsample. Depth files are matched as
    ``r_{i}*.{npy,exr,png}`` in ``depth_dir``.
    """
    with open(data_json) as f:
        meta = json.load(f)
    factor = 2.0 * np.tan(float(meta["camera_angle_x"]) / 2.0)
    all_pts = []
    for i, frame in enumerate(meta["frames"]):
        cand = sorted(
            fn for fn in os.listdir(depth_dir)
            if fn.startswith(f"r_{i}_") or fn == f"r_{i}.npy"
            or path.splitext(fn)[0] == f"r_{i}"
        )
        if not cand:
            continue
        depth = _read_depth(path.join(depth_dir, cand[0]))
        c2w = np.asarray(frame["transform_matrix"], np.float64)
        rows, cols = depth.shape
        c, r = np.meshgrid(np.arange(cols), np.arange(rows))
        valid = depth < max_depth
        z = -depth[valid]
        ratio = float(max(rows, cols))
        x = -factor * z * (c[valid] - cols / 2.0) / ratio
        y = factor * z * (r[valid] - rows / 2.0) / ratio
        pts_cam = np.stack([x, y, z, np.ones_like(z)], axis=-1)
        all_pts.append((pts_cam @ c2w.T)[:, :3])
    pts = np.concatenate(all_pts, axis=0) if all_pts else np.zeros((0, 3))
    pts = pts[(np.abs(pts) < bbox).all(axis=-1)].astype(np.float32)
    if len(pts):
        pts = radius_downsample(pts, thresh)
    if out_path:
        np.save(out_path, pts.astype(np.float32))
    return pts.astype(np.float32)


# ---------------------------------------------------------------------------
# turntable point/mesh renders (vis_pt_mesh*)
# ---------------------------------------------------------------------------

def _look_at(eye: np.ndarray, center: np.ndarray, up: np.ndarray):
    f = center - eye
    f = f / (np.linalg.norm(f) + 1e-12)
    s = np.cross(f, up)
    s = s / (np.linalg.norm(s) + 1e-12)
    u = np.cross(s, f)
    R = np.stack([s, u, -f], axis=0)  # world -> camera rows
    return R, eye


def splat_points(
    pts: np.ndarray,
    colors: np.ndarray | None,
    eye,
    center=(0.0, 0.0, 0.0),
    up=(0.0, 0.0, 1.0),
    width: int = 500,
    height: int = 500,
    fov: float = 35.0,
    background: float = 1.0,
    point_px: int = 1,
) -> np.ndarray:
    """Z-buffered perspective point splat -> (H, W, 3) float image.

    The visibility resolution matches pyvista's 1-px point render: nearest
    point wins per pixel (implemented with a single lexsort + first-hit
    scatter — no per-point loop)."""
    R, eye = _look_at(np.asarray(eye, np.float64),
                      np.asarray(center, np.float64),
                      np.asarray(up, np.float64))
    cam = (pts - eye) @ R.T
    z = -cam[:, 2]
    ok = z > 1e-6
    f = 0.5 * height / np.tan(np.radians(fov) / 2.0)
    u = np.round(f * cam[:, 0] / z + width / 2.0).astype(np.int64)
    v = np.round(-f * cam[:, 1] / z + height / 2.0).astype(np.int64)
    ok &= (u >= 0) & (u < width) & (v >= 0) & (v < height)
    u, v, z = u[ok], v[ok], z[ok]
    col = (np.broadcast_to(np.array([[0.55, 0.55, 0.6]]), (len(z), 3))
           if colors is None else colors[ok])
    img = np.full((height, width, 3), background, np.float32)
    if len(z):
        pix = v * width + u
        order = np.lexsort((z, pix))     # per-pixel, nearest first
        pix, col = pix[order], col[order]
        first = np.ones(len(pix), bool)
        first[1:] = pix[1:] != pix[:-1]
        img.reshape(-1, 3)[pix[first]] = col[first]
        if point_px > 1:                  # dilate for visibility
            from scipy import ndimage  # pragma: no cover - optional

            img = ndimage.grey_erosion(
                img, size=(point_px, point_px, 1), mode="nearest")
    return img


def turntable_render(
    input_path: str,
    out_dir: str,
    is_mesh: bool = False,
    no_color: bool = False,
    mask_crop: bool = False,
    llff: bool = False,
    extra_ele: float | None = None,
    width: int = 500,
    height: int = 500,
    mesh_sample_thresh: float = 0.004,
) -> int:
    """Write the reference's turntable screenshot grid (vis_pt_mesh.py:
    21-87): 10 azimuths x elevations [0, 30] (+extra), +-1.5 bbox crop,
    optional +x+y-z quadrant crop (``mask_crop``), white background."""
    colors = None
    if input_path.endswith(".npy"):
        pts = np.load(input_path).astype(np.float32)
        if pts.shape[1] >= 6:  # xyzrgb layout (extract_points --color)
            colors = np.clip(pts[:, 3:6], 0.0, 1.0)
    else:
        loader = load_obj if input_path.endswith(".obj") else load_ply
        verts, tris = loader(input_path)
        pts = (sample_mesh(verts, tris, mesh_sample_thresh)
               if (is_mesh and tris is not None) else verts)
    pts = np.asarray(pts, np.float32)[:, :3]
    keep = (np.abs(pts) < 1.5).all(axis=-1)
    if mask_crop:
        inq = ((pts > np.array([[0.1, 0.1, -100.0]])).all(axis=-1)
               & (pts < np.array([[100.0, 100.0, 0.0]])).all(axis=-1))
        keep &= ~inq
    pts = pts[keep]
    if colors is not None:
        colors = colors[keep]
    if no_color:
        colors = None

    azas = np.linspace(0.0, 360.0, 11)[:10]
    eles = [-15.0, 0.0, 15.0] if llff else [0.0, 30.0]
    if extra_ele is not None:
        eles = list(eles) + [extra_ele]
    radius = np.sqrt(18.0) if llff else np.sqrt(9.0)  # ref camera dists
    os.makedirs(out_dir, exist_ok=True)
    try:
        import imageio.v2 as imageio
    except Exception:  # pragma: no cover
        imageio = None
    i = 0
    for ele in eles:
        for aza in azas:
            th, ph = np.radians(aza), np.radians(ele)
            eye = radius * np.array([
                np.cos(ph) * np.cos(th), np.cos(ph) * np.sin(th), np.sin(ph)])
            img = splat_points(pts, colors, eye, width=width, height=height)
            if imageio is not None:
                imageio.imwrite(path.join(out_dir, f"{i:05d}.png"),
                                (np.clip(img, 0, 1) * 255).astype(np.uint8))
            else:
                np.save(path.join(out_dir, f"{i:05d}.npy"), img)
            i += 1
    return i


# ---------------------------------------------------------------------------
# dataset camera visualization (view_data)
# ---------------------------------------------------------------------------

_SPLIT_COLORS = {"train": (0.3, 0.8, 0.45), "test": (0.85, 0.35, 0.3),
                 "val": (0.35, 0.45, 0.85)}


def _frustum_points(c2w: np.ndarray, fx: float, fy: float, w: int, h: int,
                    depth: float, n: int = 24) -> np.ndarray:
    """Sample the 8 frustum edges (apex->corners + far rectangle) as points.
    OpenCV camera convention (+z forward, y down) matching DatasetBase."""
    corners = np.array([
        [(u - w / 2) / fx * depth, (v - h / 2) / fy * depth, depth]
        for u, v in [(0, 0), (w, 0), (w, h), (0, h)]])
    t = np.linspace(0.0, 1.0, n)[:, None]
    segs = [np.zeros(3) * (1 - t) + c * t for c in corners]
    segs += [corners[k] * (1 - t) + corners[(k + 1) % 4] * t
             for k in range(4)]
    pts = np.concatenate(segs, axis=0)
    return pts @ c2w[:3, :3].T + c2w[:3, 3]


def view_data(data_root: str, out_path: str | None = None,
              frustum_depth: float | None = None) -> str:
    """Export every split's camera frusta (+ scene bbox and GT points when
    present) to one colored PLY; print the intrinsics/pose summary the
    reference overlays in its HTML scene."""
    from alphasurf_tpu.data import auto_dataset

    out_path = out_path or path.join(data_root, "data_vis.ply")
    pts, cols = [], []
    for split in ("train", "test"):
        try:
            ds = auto_dataset(data_root, split=split)
        except Exception:
            continue
        c2ws = np.asarray(ds.c2w)
        intr = ds.intrins_full
        w, h = int(ds.w_full), int(ds.h_full)
        depth = frustum_depth or 0.35 * float(
            np.linalg.norm(c2ws[:, :3, 3], axis=-1).mean())
        print(f"[{split}] {len(c2ws)} cams  {w}x{h}  "
              f"fx={float(intr.fx):.1f} fy={float(intr.fy):.1f}  "
              f"mean |t|={np.linalg.norm(c2ws[:, :3, 3], axis=-1).mean():.3f}")
        for c2w in c2ws:
            fp = _frustum_points(np.asarray(c2w, np.float64), float(intr.fx),
                                 float(intr.fy), w, h, depth)
            pts.append(fp)
            cols.append(np.tile(_SPLIT_COLORS.get(split, (0.8,) * 3),
                                (len(fp), 1)))
    # unit scene bbox wireframe
    t = np.linspace(-1.0, 1.0, 32)
    for axis in range(3):
        for a in (-1.0, 1.0):
            for b in (-1.0, 1.0):
                seg = np.empty((32, 3))
                seg[:, axis] = t
                seg[:, (axis + 1) % 3] = a
                seg[:, (axis + 2) % 3] = b
                pts.append(seg)
                cols.append(np.tile((0.6, 0.6, 0.6), (32, 1)))
    shape = path.join(data_root, "shape.npy")
    if path.isfile(shape):
        gt = np.load(shape)[:, :3]
        pts.append(gt)
        cols.append(np.tile((0.95, 0.8, 0.25), (len(gt), 1)))
    write_ply_points(out_path, np.concatenate(pts, 0).astype(np.float32),
                     np.concatenate(cols, 0))
    print(f"wrote {out_path}")
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("depth_to_points")
    d.add_argument("data_json")
    d.add_argument("depth_dir")
    d.add_argument("--out", default=None)
    d.add_argument("--thresh", type=float, default=0.001)
    t = sub.add_parser("turntable")
    t.add_argument("input_path")
    t.add_argument("out_dir")
    t.add_argument("--is_mesh", action="store_true")
    t.add_argument("--no_color", action="store_true")
    t.add_argument("--mask_crop", action="store_true")
    t.add_argument("--llff", action="store_true")
    t.add_argument("--extra_ele", type=float, default=None)
    v = sub.add_parser("view")
    v.add_argument("data_root")
    v.add_argument("--out", default=None)
    a = p.parse_args(argv)
    if a.cmd == "depth_to_points":
        out = a.out or path.join(path.dirname(a.data_json), "shape.npy")
        pts = depth_to_points(a.data_json, a.depth_dir, out, thresh=a.thresh)
        print(f"{len(pts)} points -> {out}")
    elif a.cmd == "turntable":
        n = turntable_render(a.input_path, a.out_dir, is_mesh=a.is_mesh,
                             no_color=a.no_color, mask_crop=a.mask_crop,
                             llff=a.llff, extra_ele=a.extra_ele)
        print(f"{n} views -> {a.out_dir}")
    else:
        view_data(a.data_root, a.out)


if __name__ == "__main__":
    main()
