"""Official DTU-protocol Chamfer evaluation.

Port of the reference's DTUeval-python-derived evaluator
(/root/reference/opt/eval_dtu.py:17-190): triangle-grid mesh sampling,
radius-NN downsampling, bounding-box + ObsMask culling of the prediction,
ground-Plane filtering of the GT, and thresholded mean d2s / s2d / overall.

open3d is not available in this environment; PLY/OBJ I/O is implemented
directly (ASCII OBJ, ASCII + binary-little-endian PLY).
"""
from __future__ import annotations

import os
import struct
from typing import Optional

import numpy as np


# ---------------------------------------------------------------------------
# Minimal mesh / point-cloud I/O (replaces o3d.io)
# ---------------------------------------------------------------------------

def load_obj(path):
    """ASCII OBJ -> (vertices (N,3) f64, triangles (M,3) int or None)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return (
        np.asarray(verts, np.float64),
        np.asarray(faces, np.int64) if faces else None,
    )


def load_ply(path):
    """PLY -> (vertices (N,3) f64, triangles (M,3) int or None).

    Supports ascii and binary_little_endian with float/double x,y,z leading
    the vertex element (extra per-vertex properties are skipped) and
    list-typed face elements.
    """
    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply", "not a ply file"
        fmt = None
        elements = []  # (name, count, [(type, name)])
        while True:
            line = f.readline().strip().decode()
            if line.startswith("comment"):
                continue
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, count = line.split()
                elements.append([name, int(count), []])
            elif line.startswith("property"):
                parts = line.split()
                elements[-1][2].append(tuple(parts[1:]))
            elif line == "end_header":
                break

        _SZ = {"float": 4, "float32": 4, "double": 8, "float64": 8,
               "int": 4, "int32": 4, "uint": 4, "uint32": 4,
               "short": 2, "ushort": 2, "int16": 2, "uint16": 2,
               "char": 1, "uchar": 1, "int8": 1, "uint8": 1}
        _NP = {"float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
               "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
               "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
               "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1"}

        verts = None
        faces = None
        for name, count, props in elements:
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                if name == "vertex":
                    verts = np.asarray(
                        [[float(r[0]), float(r[1]), float(r[2])] for r in rows],
                        np.float64,
                    )
                elif name == "face":
                    faces = []
                    for r in rows:
                        n = int(r[0])
                        idx = [int(x) for x in r[1 : 1 + n]]
                        for k in range(1, n - 1):
                            faces.append([idx[0], idx[k], idx[k + 1]])
                    faces = np.asarray(faces, np.int64) if faces else None
            elif fmt == "binary_little_endian":
                if name == "vertex":
                    dt = np.dtype(
                        [(p[1], "<" + _NP[p[0]]) for p in props]
                    )
                    arr = np.frombuffer(f.read(dt.itemsize * count), dtype=dt)
                    verts = np.stack(
                        [arr["x"], arr["y"], arr["z"]], -1
                    ).astype(np.float64)
                elif name == "face":
                    faces = []
                    for _ in range(count):
                        (n,) = struct.unpack("<B", f.read(1))
                        idx = struct.unpack(f"<{n}i", f.read(4 * n))
                        for k in range(1, n - 1):
                            faces.append([idx[0], idx[k], idx[k + 1]])
                    faces = np.asarray(faces, np.int64) if faces else None
                else:  # skip unknown fixed-size element
                    row = sum(_SZ[p[0]] for p in props)
                    f.read(row * count)
            else:
                raise ValueError(f"unsupported ply format {fmt}")
    return verts, faces


def write_ply_points(path, points, colors=None):
    """ASCII PLY point cloud writer (vis outputs, eval_dtu.py:28-31)."""
    points = np.asarray(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property double x\nproperty double y\nproperty double z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        if colors is None:
            for p in points:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
        else:
            c8 = np.clip(np.asarray(colors) * 255, 0, 255).astype(np.uint8)
            for p, c in zip(points, c8):
                f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")


def load_points(path):
    """Prediction loader: .npy point array, dir containing pts.npy, .obj or
    .ply mesh (meshes are surface-sampled by the caller)."""
    if os.path.isdir(path):
        return np.load(os.path.join(path, "pts.npy")), None
    if path.endswith(".npy"):
        return np.load(path), None
    if path.endswith(".obj"):
        return load_obj(path)
    if path.endswith(".ply"):
        return load_ply(path)
    raise ValueError(f"unsupported input {path}")


# ---------------------------------------------------------------------------
# DTUeval core (eval_dtu.py:17-80, 150-190)
# ---------------------------------------------------------------------------

def sample_single_tri(n1, n2, v1, v2, tri_vert):
    """Uniform barycentric grid samples on one triangle
    (eval_dtu.py:17-26)."""
    c = np.mgrid[: int(n1) + 1, : int(n2) + 1].astype(np.float64)
    c += 0.5
    c[0] /= max(n1, 1e-7)
    c[1] /= max(n2, 1e-7)
    c = np.transpose(c, (1, 2, 0))
    k = c[c.sum(axis=-1) < 1]
    return v1 * k[:, :1] + v2 * k[:, 1:] + tri_vert


def radius_downsample(points, radius):
    """Keep a subset where no two points are within ``radius``
    (eval_dtu.py:71-79 greedy radius-NN mask)."""
    import sklearn.neighbors as skln

    nn = skln.NearestNeighbors(
        n_neighbors=1, radius=radius, algorithm="kd_tree", n_jobs=-1
    )
    nn.fit(points)
    rnn_idxs = nn.radius_neighbors(points, radius=radius, return_distance=False)
    mask = np.ones(points.shape[0], dtype=np.bool_)
    for curr, idxs in enumerate(rnn_idxs):
        if mask[curr]:
            mask[idxs] = 0
            mask[curr] = 1
    return points[mask]


def sample_mesh(vertices, triangles, thresh):
    """Mesh -> dense point set at ~``thresh`` spacing + radius downsample
    (eval_dtu.py:33-80)."""
    vertices = np.asarray(vertices, np.float64)
    tri_vert = vertices[triangles]
    v1 = tri_vert[:, 1] - tri_vert[:, 0]
    v2 = tri_vert[:, 2] - tri_vert[:, 0]
    l1 = np.linalg.norm(v1, axis=-1, keepdims=True)
    l2 = np.linalg.norm(v2, axis=-1, keepdims=True)
    area2 = np.linalg.norm(np.cross(v1, v2), axis=-1, keepdims=True)
    non_zero = (area2 > 0)[:, 0]
    l1, l2, area2, v1, v2, tv0 = [
        a[non_zero] for a in [l1, l2, area2, v1, v2, tri_vert[:, 0]]
    ]
    thr = thresh * np.sqrt(l1 * l2 / area2)
    n1 = np.floor(l1 / thr)
    n2 = np.floor(l2 / thr)
    new_pts = [
        sample_single_tri(n1[i, 0], n2[i, 0], v1[i : i + 1], v2[i : i + 1],
                          tv0[i : i + 1])
        for i in range(len(n1))
    ]
    data_pcd = np.concatenate([vertices] + new_pts, axis=0)
    return radius_downsample(data_pcd, thresh)


def dtu_eval(
    data_pcd: np.ndarray,
    scan: int,
    dataset_dir: str,
    max_dist: float = 20.0,
    patch_size: float = 60.0,
    visualize_threshold: float = 10.0,
    stl_points: Optional[np.ndarray] = None,
    seed: Optional[int] = 0,
):
    """Official DTU chamfer (eval_dtu.py:135-216).

    :param data_pcd: predicted points (already mesh-sampled/downsampled)
    :param dataset_dir: SampleSet/MVS Data dir with ObsMask/ObsMask{scan}_10.mat,
        ObsMask/Plane{scan}.mat and Points/stl/stl{scan:03}_total.ply
    :param stl_points: optional override of the GT point cloud (tests)
    :return: dict(mean_d2s, mean_s2d, overall, vis) — vis holds colored
        point sets for the error visualizations
    """
    import sklearn.neighbors as skln
    from scipy.io import loadmat

    rng = np.random.default_rng(seed)
    data_down = np.array(data_pcd, np.float64)
    rng.shuffle(data_down, axis=0)

    obs = loadmat(f"{dataset_dir}/ObsMask/ObsMask{scan}_10.mat")
    ObsMask, BB, Res = obs["ObsMask"], obs["BB"].astype(np.float32), obs["Res"]
    Res = float(np.asarray(Res).reshape(-1)[0])

    inbound = (
        (data_down >= BB[:1] - patch_size)
        & (data_down < BB[1:] + patch_size * 2)
    ).sum(axis=-1) == 3
    data_in = data_down[inbound]

    data_grid = np.around((data_in - BB[:1]) / Res).astype(np.int32)
    grid_inbound = (
        (data_grid >= 0) & (data_grid < np.expand_dims(ObsMask.shape, 0))
    ).sum(axis=-1) == 3
    data_grid_in = data_grid[grid_inbound]
    in_obs = ObsMask[
        data_grid_in[:, 0], data_grid_in[:, 1], data_grid_in[:, 2]
    ].astype(np.bool_)
    data_in_obs = data_in[grid_inbound][in_obs]

    if stl_points is None:
        stl_points, _ = load_ply(
            f"{dataset_dir}/Points/stl/stl{scan:03}_total.ply"
        )
    stl = np.asarray(stl_points, np.float64)

    nn = skln.NearestNeighbors(
        n_neighbors=1, algorithm="kd_tree", n_jobs=-1
    )
    nn.fit(stl)
    dist_d2s, _ = nn.kneighbors(data_in_obs, n_neighbors=1,
                                return_distance=True)
    mean_d2s = float(dist_d2s[dist_d2s < max_dist].mean())

    ground_plane = loadmat(f"{dataset_dir}/ObsMask/Plane{scan}.mat")["P"]
    stl_hom = np.concatenate([stl, np.ones_like(stl[:, :1])], -1)
    above = (ground_plane.reshape((1, 4)) * stl_hom).sum(-1) > 0
    stl_above = stl[above]

    nn.fit(data_in)
    dist_s2d, _ = nn.kneighbors(stl_above, n_neighbors=1,
                                return_distance=True)
    mean_s2d = float(dist_s2d[dist_s2d < max_dist].mean())

    # error-colored visualization point sets (eval_dtu.py:195-210)
    vis = visualize_threshold
    R, G, B, W = (np.array([c], np.float64) for c in
                  ([1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]))
    data_color = np.tile(B, (data_down.shape[0], 1))
    data_alpha = dist_d2s.clip(max=vis) / vis
    sel = np.where(inbound)[0][grid_inbound][in_obs]
    data_color[sel] = R * data_alpha + W * (1 - data_alpha)
    data_color[sel[dist_d2s[:, 0] >= max_dist]] = G
    stl_color = np.tile(B, (stl.shape[0], 1))
    stl_alpha = dist_s2d.clip(max=vis) / vis
    stl_color[np.where(above)[0]] = R * stl_alpha + W * (1 - stl_alpha)
    stl_color[np.where(above)[0][dist_s2d[:, 0] >= max_dist]] = G

    return {
        "mean_d2s": mean_d2s,
        "mean_s2d": mean_s2d,
        "overall": (mean_d2s + mean_s2d) / 2,
        "vis": {
            "data_points": data_down, "data_colors": data_color,
            "stl_points": stl, "stl_colors": stl_color,
        },
    }
