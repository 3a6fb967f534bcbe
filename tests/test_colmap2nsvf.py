"""COLMAP->NSVF converter: binary parsing, pose inversion, autoscaling,
split prefixes (reference: opt/scripts/colmap2nsvf.py + create_split.py)."""
import struct

import numpy as np

from alphasurf_tpu.app.colmap2nsvf import convert


def _rot_from_axis_angle(axis, ang):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K


def _rot_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def _write_colmap_sparse(d, c2ws, fx=100.0, cx=32.0, cy=24.0, n_pts=50):
    d.mkdir(parents=True)
    with open(d / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, 64, 48))  # SIMPLE_PINHOLE
        f.write(struct.pack("<ddd", fx, cx, cy))
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n_pts, 3)) * 2.0 + 1.0
    with open(d / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            f.write(struct.pack("<QdddBBBd", i + 10, *pts[i], 255, 0, 0, 0.5))
            f.write(struct.pack("<Q", 0))
    with open(d / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", len(c2ws)))
        for i, c2w in enumerate(c2ws):
            R = c2w[:3, :3].T  # world->cam
            t = -R @ c2w[:3, 3]
            q = _rot_to_quat(R)
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # two 2D features
            f.write(struct.pack("<ddq", 1.0, 2.0, 10))
            f.write(struct.pack("<ddq", 3.0, 4.0, -1))
    return pts


def test_convert_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    c2ws = []
    for i in range(8):
        c2w = np.eye(4)
        c2w[:3, :3] = _rot_from_axis_angle(rng.normal(size=3), rng.uniform(0, 2))
        c2w[:3, 3] = rng.normal(size=3) * 3
        c2ws.append(c2w)
    sparse = tmp_path / "scene" / "sparse" / "0"
    pts = _write_colmap_sparse(sparse, c2ws)

    root = convert(str(sparse), split=4)
    assert root == str(tmp_path / "scene")

    K = np.loadtxt(tmp_path / "scene" / "intrinsics.txt")
    assert K[0, 0] == 100.0 and K[0, 2] == 32.0 and K[1, 2] == 24.0

    out_pts = np.load(tmp_path / "scene" / "points.npy")
    cen = np.median(pts, axis=0)
    meddist = np.median(((pts - cen) ** 2).sum(1))
    np.testing.assert_allclose(out_pts, (pts - cen) * 2.0 / meddist, atol=1e-9)

    pose_files = sorted((tmp_path / "scene" / "pose").iterdir())
    assert len(pose_files) == 8
    # split: every 4th image is test (1_), others train (0_)
    names = [p.name for p in pose_files]
    assert sum(n.startswith("1_") for n in names) == 2
    assert sum(n.startswith("0_") for n in names) == 6

    # pose round trip: rotation preserved, translation recentered+scaled
    for i, c2w in enumerate(c2ws):
        pref = "1_" if i % 4 == 3 else "0_"
        got = np.loadtxt(tmp_path / "scene" / "pose" / f"{pref}img_{i:03d}.txt")
        np.testing.assert_allclose(got[:3, :3], c2w[:3, :3], atol=1e-9)
        np.testing.assert_allclose(
            got[:3, 3], (c2w[:3, 3] - cen) * 2.0 / meddist, atol=1e-9
        )
    # feature files carry remapped point ids
    feat = np.load(tmp_path / "scene" / "feature" / "0_img_000.npz")
    assert feat["xys"].shape == (1, 2)  # the -1 id row is dropped
    assert feat["ids"][0] == 0  # point id 10 -> row 0


def test_loader_consumes_converted(tmp_path):
    """The converted directory loads through NSVFDataset."""
    import imageio.v2 as imageio

    rng = np.random.default_rng(5)
    c2ws = []
    for i in range(6):
        c2w = np.eye(4)
        c2w[:3, :3] = _rot_from_axis_angle(rng.normal(size=3), rng.uniform(0, 2))
        c2w[:3, 3] = rng.normal(size=3) * 2
        c2ws.append(c2w)
    sparse = tmp_path / "scene" / "sparse" / "0"
    _write_colmap_sparse(sparse, c2ws)
    convert(str(sparse), split=3)
    img_dir = tmp_path / "scene" / "images"
    img_dir.mkdir()
    for p in (tmp_path / "scene" / "pose").iterdir():
        imageio.imwrite(
            img_dir / (p.stem + ".png"),
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8),
        )
    from alphasurf_tpu.data.nsvf import NSVFDataset

    ds = NSVFDataset(str(tmp_path / "scene"), split="train")
    assert ds.n_images == 4
    assert ds.rays is not None and len(ds.rays) == 4 * 48 * 64
    ds_test = NSVFDataset(str(tmp_path / "scene"), split="test")
    assert ds_test.n_images == 2


def test_downsample(tmp_path):
    import imageio.v2 as imageio

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        imageio.imwrite(img_dir / f"{i}.png",
                        rng.integers(0, 255, (32, 48, 3), dtype=np.uint8))
    from alphasurf_tpu.app.preprocess import downsample

    out = downsample(str(img_dir), 2)
    assert out == str(tmp_path / "images_2")
    im = imageio.imread(tmp_path / "images_2" / "0.png")
    assert im.shape[:2] == (16, 24)
