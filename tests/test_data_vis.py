"""Data-inspection tooling (app/data_vis.py): depth unprojection
(exr_to_pts twin), the z-buffer turntable splatter (vis_pt_mesh twin), and
the camera-frustum PLY export (view_data twin)."""
import json
import os

import numpy as np

from alphasurf_tpu.app import data_vis


def test_depth_to_points_unprojects_plane(tmp_path):
    # a 32x32 constant-depth map seen by the identity (Blender) camera is a
    # planar patch at z=-d spanning +-factor*d/2 in x/y
    d = 2.0
    rows = cols = 32
    np.save(tmp_path / "r_0.npy", np.full((rows, cols), d, np.float32))
    fov = 0.8
    meta = {"camera_angle_x": fov,
            "frames": [{"transform_matrix": np.eye(4).tolist()}]}
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    pts = data_vis.depth_to_points(
        str(tmp_path / "transforms_train.json"), str(tmp_path),
        out_path=str(tmp_path / "shape.npy"), thresh=1e-6, bbox=100.0)
    assert os.path.isfile(tmp_path / "shape.npy")
    np.testing.assert_allclose(pts[:, 2], -d, atol=1e-5)
    half = 2.0 * np.tan(fov / 2.0) * d / 2.0
    assert np.abs(pts[:, :2]).max() <= half + 1e-5
    assert np.abs(pts[:, :2]).max() > 0.8 * half  # corners reach the rim
    # frustum handedness: pixel (0,0) maps to (-x, +y) (Blender camera
    # looks down -z with x mirrored, exr_to_pts.py:42-50)
    corner_mask = np.add.outer((np.arange(rows) < 2).astype(int),
                               (np.arange(cols) < 2).astype(int)) == 2
    np.save(tmp_path / "r_0.npy",
            np.where(corner_mask, d, 1e12).astype(np.float32))
    corner = data_vis.depth_to_points(
        str(tmp_path / "transforms_train.json"), str(tmp_path),
        thresh=1e-6, bbox=100.0)
    assert len(corner) and (corner[:, 0] < 0).all() and (corner[:, 1] > 0).all()


def test_splat_points_visibility_and_projection():
    # two points along the same view ray: the nearer one must win the pixel
    pts = np.array([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0]], np.float32)
    col = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    img = data_vis.splat_points(pts, col, eye=(3.0, 0.0, 0.0), width=33,
                                height=33)
    center = img[16, 16]
    np.testing.assert_allclose(center, [0.0, 1.0, 0.0], atol=1e-6)
    assert (img.reshape(-1, 3) == 1.0).all(axis=-1).sum() >= 33 * 33 - 2


def test_turntable_render_writes_views(tmp_path):
    rng = np.random.default_rng(0)
    d = rng.normal(size=(4000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    np.save(tmp_path / "pts.npy", (d * 0.5).astype(np.float32))
    n = data_vis.turntable_render(str(tmp_path / "pts.npy"),
                                  str(tmp_path / "vis"), extra_ele=60.0,
                                  width=64, height=64)
    assert n == 30  # 10 azimuths x (2 + 1 extra) elevations
    files = sorted(os.listdir(tmp_path / "vis"))
    assert len(files) == 30
    try:
        import imageio.v2 as imageio
        im = np.asarray(imageio.imread(tmp_path / "vis" / files[0]))
        # the sphere covers the image center from every view
        assert im[24:40, 24:40].mean() < 250
        assert (im[:2] == 255).all()  # white background at the border
    except ImportError:
        pass


def test_view_data_exports_frusta_ply(tmp_path, monkeypatch):
    # minimal NSVF-layout dataset (auto_dataset fallback branch)
    from PIL import Image

    root = tmp_path / "scene"
    for sub in ("rgb", "pose"):
        os.makedirs(root / sub)
    with open(root / "intrinsics.txt", "w") as f:
        f.write("20.0 8.0 8.0\n")
    rng = np.random.default_rng(1)
    for i, split in [(0, "0_train"), (1, "1_val"), (2, "2_test")]:
        c2w = np.eye(4)
        c2w[:3, 3] = rng.normal(size=3)
        np.savetxt(root / "pose" / f"{split}_{i:04d}.txt", c2w)
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
            root / "rgb" / f"{split}_{i:04d}.png")
    np.save(root / "shape.npy", rng.normal(size=(10, 3)).astype(np.float32))
    out = data_vis.view_data(str(root))
    assert os.path.isfile(out)
    from alphasurf_tpu.geometry.dtu_eval import load_ply
    verts, _ = load_ply(out)
    # frusta (>=1 split loaded) + 12 bbox edges + 10 GT points
    assert len(verts) > 12 * 32 + 10
