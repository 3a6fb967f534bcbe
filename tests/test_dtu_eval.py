"""DTU-protocol chamfer on a crafted synthetic fixture: known plane GT,
hand-built ObsMask that culls half the space, ground plane that filters the
GT, exact expected d2s/s2d (eval_dtu.py:135-216 port)."""
import numpy as np
import pytest
from scipy.io import savemat

from alphasurf_tpu.geometry.dtu_eval import (
    dtu_eval,
    load_obj,
    load_ply,
    radius_downsample,
    sample_mesh,
    write_ply_points,
)


@pytest.fixture
def dtu_dir(tmp_path):
    d = tmp_path / "MVS Data"
    (d / "ObsMask").mkdir(parents=True)
    (d / "Points" / "stl").mkdir(parents=True)
    # ObsMask grid: BB [0,0,0] - [100,100,100], Res 10 -> 11^3 cells;
    # observable only where x-cell < 6 (i.e. x < ~55)
    shape = (11, 11, 11)
    ObsMask = np.zeros(shape, np.uint8)
    ObsMask[:6] = 1
    BB = np.array([[0.0, 0.0, 0.0], [100.0, 100.0, 100.0]])
    savemat(str(d / "ObsMask" / "ObsMask1_10.mat"),
            {"ObsMask": ObsMask, "BB": BB, "Res": np.array([[10.0]])})
    # ground plane z > 20  ->  P = [0, 0, 1, -20]
    savemat(str(d / "ObsMask" / "Plane1.mat"),
            {"P": np.array([[0.0], [0.0], [1.0], [-20.0]])})
    # GT: plane z=30 grid over x,y in [0,50]; plus "below-plane" junk z=10
    xs = np.linspace(0, 50, 26)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    gt = np.stack([X.ravel(), Y.ravel(), np.full(X.size, 30.0)], -1)
    junk = gt.copy()
    junk[:, 2] = 10.0  # below the ground plane -> must be filtered from s2d
    stl = np.concatenate([gt, junk], 0)
    write_ply_points(str(d / "Points" / "stl" / "stl001_total.ply"), stl)
    return str(d)


def test_dtu_eval_exact(dtu_dir):
    # prediction: same plane offset by +3 in z, half of it outside ObsMask
    xs = np.linspace(0, 50, 26)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    pred_in = np.stack([X.ravel(), Y.ravel(), np.full(X.size, 33.0)], -1)
    pred_out = pred_in + np.array([70.0, 0.0, 0.0])  # x>55: culled by mask
    pred_far = pred_in + np.array([0.0, 0.0, 500.0])  # beyond BB+patch: culled
    pred = np.concatenate([pred_in, pred_out, pred_far], 0)

    res = dtu_eval(pred, 1, dtu_dir, max_dist=20.0, patch_size=60.0)
    # d2s: every surviving pred point is exactly 3 away from GT plane z=30
    np.testing.assert_allclose(res["mean_d2s"], 3.0, atol=1e-6)
    # s2d: GT above plane (z=30 only) vs pred (all in-bounds pts incl the
    # x-shifted block, which is inbound for BB+patch): nearest pred is 3 away
    np.testing.assert_allclose(res["mean_s2d"], 3.0, atol=1e-6)
    np.testing.assert_allclose(res["overall"], 3.0, atol=1e-6)

    # culling sanity: with the obs mask ignored (all pred kept) d2s would
    # include the x-shifted block at distance >= sqrt(20^2+3^2) > 3
    assert res["vis"]["data_points"].shape[0] == pred.shape[0]


def test_mesh_sampling_and_io(tmp_path):
    # unit right triangle, thresh small -> interior samples appear
    verts = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0]], np.float64)
    tris = np.array([[0, 1, 2]])
    pts = sample_mesh(verts, tris, thresh=1.0)
    assert len(pts) > 20
    # spacing respected (no two points closer than thresh after downsample)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(pts).query(pts, k=2)
    assert d[:, 1].min() >= 1.0 - 1e-9

    # OBJ round trip
    obj = tmp_path / "m.obj"
    with open(obj, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3 4\n")
    v, t = load_obj(str(obj))
    assert v.shape == (4, 3) and t.shape == (2, 3)  # quad fan-triangulated

    # ascii ply round trip with colors
    ply = tmp_path / "p.ply"
    write_ply_points(str(ply), verts, colors=np.ones((3, 3)) * 0.5)
    v2, _ = load_ply(str(ply))
    np.testing.assert_allclose(v2, verts)


def test_binary_ply_reader(tmp_path):
    import struct

    pts = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    p = tmp_path / "b.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(pts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"end_header\n")
        f.write(pts.astype("<f4").tobytes())
    v, t = load_ply(str(p))
    np.testing.assert_allclose(v, pts, rtol=1e-6)
    assert t is None


def test_radius_downsample():
    pts = np.array([[0, 0, 0], [0.05, 0, 0], [1, 0, 0], [1.04, 0, 0]])
    kept = radius_downsample(pts, 0.2)
    assert len(kept) == 2
