"""Smoke tests for the minor app/topology parity items: depth-based point
extraction, point-cloud combining, background sparsify, SH resize, and the
svox1 octree export."""
import numpy as np
import jax.numpy as jnp

import alphasurf_tpu as at
from alphasurf_tpu import defs
from alphasurf_tpu.core import topology
from alphasurf_tpu.core.grid import create_grid
from alphasurf_tpu.data.synthetic import make_gt_grid
from alphasurf_tpu.utils.io import save_grid


def test_extract_points_depth_synthetic(tmp_path):
    from alphasurf_tpu.app import extract_points_depth

    g = make_gt_grid(16)
    ck = str(tmp_path / "ckpt.npz")
    save_grid(g, ck, step_id=0)
    out = str(tmp_path / "pts.npy")
    pts = extract_points_depth.main([
        ck, "--traj_type", "circle", "--num_views", "4",
        "-W", "64", "-H", "64", "--depth_type", "mean",
        "--weight_thresh", "0.3", "--out", out,
    ])
    assert len(pts) > 100
    # points should lie near the radius-0.5 sphere
    r = np.linalg.norm(pts, axis=-1)
    assert abs(np.median(r) - 0.5) < 0.15, np.median(r)

    pts2 = extract_points_depth.main([
        ck, "--traj_type", "circle", "--num_views", "2",
        "-W", "48", "-H", "48", "--depth_type", "thresh",
        "--depth_sigma_thresh", "0.2", "--out", out,
    ])
    assert len(pts2) > 50


def test_combine_points(tmp_path):
    from alphasurf_tpu.app import combine_points

    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 3)).astype(np.float32)
    b = a + 1e-5  # near-duplicates must collapse
    pa, pb = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    np.save(pa, a)
    np.save(pb, b)
    pts = combine_points.main([pa, pb, "--downsample_density", "0.01",
                               "--out", str(tmp_path / "c.npy")])
    # near-duplicate pairs collapse: ~500 survivors, far below the 1000 input
    assert len(pts) < 520
    assert (tmp_path / "c.npy").exists()


def test_sparsify_background():
    g = create_grid(8, basis_dim=4)
    H, W, n_layers = 16, 32, 4
    links = np.arange(H * W, dtype=np.int32).reshape(H, W)
    data = np.zeros((H * W, n_layers, 4), np.float32)
    data[: H * W // 2, :, -1] = 5.0  # top half dense
    g = g.replace(background_links=jnp.asarray(links),
                  background_data=jnp.asarray(data))
    g2 = topology.sparsify_background(g, sigma_thresh=1.0, dilate=1)
    kept = int((np.asarray(g2.background_links) >= 0).sum())
    assert 0 < kept < H * W
    # dilation keeps one extra row beyond the dense half
    assert kept >= H * W // 2
    assert g2.background_data.shape[0] == kept


def test_resize_basis():
    g = create_grid(8, basis_dim=9)
    sh = np.asarray(g.sh_data).copy()
    sh[:] = np.random.default_rng(0).normal(size=sh.shape)
    g = g.replace(sh_data=jnp.asarray(sh))
    g_small = topology.resize_basis(g, 4)
    assert g_small.sh_data.shape[1] == 12
    np.testing.assert_allclose(
        np.asarray(g_small.sh_data)[:, 4:8], sh[:, 9:13]
    )
    g_big = topology.resize_basis(g_small, 9)
    assert g_big.sh_data.shape[1] == 27
    np.testing.assert_allclose(
        np.asarray(g_big.sh_data)[:, :4], sh[:, :4]
    )
    assert np.all(np.asarray(g_big.sh_data)[:, 4:9] == 0)


def test_to_svox1_npz(tmp_path):
    from alphasurf_tpu.geometry.svox1 import to_svox1_npz

    g = create_grid(8, basis_dim=4, surface_type=defs.SURFACE_TYPE_NONE)
    # sparsify: keep a corner blob
    links = np.full((8, 8, 8), -1, np.int32)
    links[:3, :3, :3] = np.arange(27, dtype=np.int32).reshape(3, 3, 3)
    g = g.replace(
        links=jnp.asarray(links),
        density_data=jnp.arange(27, dtype=jnp.float32)[:, None],
        sh_data=jnp.ones((27, 12), jnp.float32),
    )
    out = str(tmp_path / "tree.npz")
    info = to_svox1_npz(g, out)
    z = np.load(out, allow_pickle=True)
    assert int(z["data_dim"]) == 13
    assert str(z["data_format"]) == "SH4"
    child, data = z["child"], z["data"]
    assert child.shape[0] == info["n_nodes"] == data.shape[0]
    # walk the octree to voxel (1, 2, 0): depth 3 tree (8 = 2^3)
    def lookup(v):
        node, d = 0, 0
        while True:
            side = 8 >> (d + 1)
            cx, cy, cz = (v[0] // side) & 1, (v[1] // side) & 1, (v[2] // side) & 1
            rel = child[node, cx, cy, cz]
            if rel == 0:
                return data[node, cx, cy, cz]
            node, d = node + rel, d + 1

    val = lookup((1, 2, 0))
    assert float(val[-1]) == float(links[1, 2, 0] and np.asarray(g.density_data)[links[1, 2, 0], 0])
    empty = lookup((7, 7, 7))
    assert float(empty[-1]) == 0.0
