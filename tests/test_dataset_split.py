"""Split tooling (app/dataset_split.py): create_split/unsplit round-trip
and the Record3D -> NSVF conversion on a frames-dir fixture."""
import json
import os

import numpy as np

from alphasurf_tpu.app import dataset_split


def _make_scene(root, n=8):
    os.makedirs(root / "pose")
    os.makedirs(root / "rgb")
    for i in range(n):
        np.savetxt(root / "pose" / f"{i:04d}.txt", np.eye(4))
        with open(root / "rgb" / f"{i:04d}.png", "wb") as f:
            f.write(b"x")  # content never read by the renamer


def test_create_split_and_unsplit_roundtrip(tmp_path):
    _make_scene(tmp_path, n=8)
    orig = sorted(os.listdir(tmp_path / "pose"))
    n = dataset_split.create_split(str(tmp_path), every=4)
    assert n == 16  # 8 poses + 8 images renamed
    poses = sorted(os.listdir(tmp_path / "pose"))
    test = [f for f in poses if f.startswith("1_")]
    train = [f for f in poses if f.startswith("0_")]
    assert len(test) == 2 and len(train) == 6  # every 4th of 8
    assert sorted(os.listdir(tmp_path / "rgb")) == [
        f[:-4] + ".png" for f in poses]
    # idempotent: nothing left to rename
    assert dataset_split.create_split(str(tmp_path), every=4) == 0
    # unsplit restores the original names
    assert dataset_split.unsplit(str(tmp_path)) == 16
    assert sorted(os.listdir(tmp_path / "pose")) == orig


def test_create_split_dry_run_touches_nothing(tmp_path):
    _make_scene(tmp_path, n=4)
    before = sorted(os.listdir(tmp_path / "pose"))
    n = dataset_split.create_split(str(tmp_path), every=2, dry_run=True)
    assert n == 8
    assert sorted(os.listdir(tmp_path / "pose")) == before


def test_record3d_to_nsvf_frames_dir(tmp_path):
    import imageio.v2 as imageio

    frames = tmp_path / "frames"
    os.makedirs(frames)
    rng = np.random.default_rng(0)
    for i in range(6):
        im = (rng.random((8, 12, 3)) * 255).astype(np.uint8)
        imageio.imwrite(frames / f"{i:05d}.png", im)
    # identity quaternion, camera at +x
    poses = [[0.0, 0.0, 0.0, 1.0, float(i), 0.0, 0.0] for i in range(6)]
    meta = {"K": np.array([[50.0, 0, 6], [0, 50.0, 4], [0, 0, 1]]
                          ).T.reshape(-1).tolist(),
            "poses": poses}
    with open(tmp_path / "metadata.json", "w") as f:
        json.dump(meta, f)
    n = dataset_split.record3d_to_nsvf(str(tmp_path), every=2, factor=2)
    assert n == 3  # frames 0, 2, 4
    K = np.loadtxt(tmp_path / "intrinsics.txt")
    np.testing.assert_allclose(K[0, 0], 25.0)  # fx/factor
    c2w0 = np.loadtxt(tmp_path / "pose" / "00000.txt")
    # identity quat -> R = diag(1,-1,-1) after the OpenGL->OpenCV flip
    np.testing.assert_allclose(c2w0[:3, :3], np.diag([1.0, -1.0, -1.0]),
                               atol=1e-12)
    # translations recentered: frame 0 at x = 0 - mean([0..5]) = -2.5
    np.testing.assert_allclose(c2w0[0, 3], -2.5)
    im0 = imageio.imread(tmp_path / "rgb" / "00000.png")
    assert im0.shape == (4, 3, 3)  # left half (12//2=6 wide) / factor 2


def test_record3d_matches_scipy_quaternions(tmp_path):
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(3)
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    frames = tmp_path / "frames"
    os.makedirs(frames)
    import imageio.v2 as imageio
    for i in range(5):
        imageio.imwrite(frames / f"{i:05d}.png",
                        np.zeros((4, 4, 3), np.uint8))
    meta = {"K": np.eye(3).T.reshape(-1).tolist(),
            "poses": [list(q[i]) + [0.0, 0.0, 0.0] for i in range(5)]}
    with open(tmp_path / "metadata.json", "w") as f:
        json.dump(meta, f)
    dataset_split.record3d_to_nsvf(str(tmp_path), every=1, factor=1)
    flip = np.diag([1.0, -1.0, -1.0])
    for i in range(5):
        got = np.loadtxt(tmp_path / "pose" / f"{i:05d}.txt")[:3, :3]
        want = Rotation.from_quat(q[i]).as_matrix() @ flip
        np.testing.assert_allclose(got, want, atol=1e-12)
