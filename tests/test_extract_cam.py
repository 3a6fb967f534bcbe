"""Camera-trajectory intersection extraction on the synthetic GT sphere
(exract_points.py equivalent): extracted points must lie on the 0.5-radius
surface."""
import jax.numpy as jnp
import numpy as np

import alphasurf_tpu as at
from alphasurf_tpu.data.synthetic import make_gt_grid, pose_spherical
from alphasurf_tpu.render.surface import volume_render_surface_packed


def test_packed_intersections_on_sphere():
    grid = make_gt_grid(reso=24, seed=0)
    cam = at.Camera.make(pose_spherical(30.0, 20.0, 2.7), fx=60.0,
                         width=48, height=48)
    rays = cam.gen_rays()
    opt = at.RenderOptions(sigma_thresh=-1e9, stop_thresh=-1.0,
                           only_outward_intersect=True)
    out = volume_render_surface_packed(
        grid, rays, opt, return_intersections=True
    )
    it = out["intersections"]
    mask = np.asarray(it["mask"]) & (np.asarray(it["alpha"]) >= 0.1)
    pts = np.asarray(it["pts"])[mask]
    assert len(pts) > 200
    r = np.linalg.norm(pts, axis=-1)
    # all real intersections lie on the GT sphere (world radius 0.5)
    assert abs(np.median(r) - 0.5) < 0.03
    assert np.percentile(np.abs(r - 0.5), 95) < 0.05


def test_extract_points_cam_app(tmp_path):
    from alphasurf_tpu.app import extract_points_cam
    from alphasurf_tpu.utils.io import save_grid

    grid = make_gt_grid(reso=16, seed=1)
    ck = str(tmp_path / "ckpt.npz")
    save_grid(grid, ck)
    pts = extract_points_cam.main([
        ck, "", "--dataset_type", "synthetic", "--n_images", "2",
        "--chunk", "1024", "--out", str(tmp_path / "p.npy"),
    ])
    assert len(pts) > 50
    r = np.linalg.norm(pts, axis=-1)
    assert abs(np.median(r) - 0.5) < 0.05
