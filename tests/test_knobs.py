"""Behavioral tests for the render/trainer knobs that have no pure-torch
oracle path (the reference implements them only in the CUDA kernels):
no_surf_grad_from_sh, use_spheric_clip, last_sample_opaque,
lr_fg_begin_step, surf_normal_loss_lambda_type, load_ckpt resume."""
import jax
import jax.numpy as jnp
import numpy as np

import alphasurf_tpu as at
from alphasurf_tpu import defs
from alphasurf_tpu.data.synthetic import SyntheticDataset, make_gt_grid, pose_spherical


def _central_rays(n=64, dist=2.5):
    cam = at.Camera.make(pose_spherical(40.0, 25.0, dist), fx=60.0, width=32, height=32)
    rays = cam.gen_rays()
    s = rays.origins.shape[0] // 2 - n // 2
    return at.Rays(rays.origins[s : s + n], rays.dirs[s : s + n])


def test_no_surf_grad_from_sh():
    """With uniform corner alphas the only surface gradient from the color
    loss flows through the SH interpolation position; the knob must cut it
    (surf_trav.cu:2250-2264) without changing forward values."""
    grid = make_gt_grid(reso=16, seed=0)
    # uniform raw alpha: kills the alpha->position gradient path
    grid = grid.replace(density_data=jnp.full_like(grid.density_data, 2.0))
    rays = _central_rays()
    base = at.RenderOptions(sigma_thresh=-1e9, stop_thresh=-1.0)

    def surf_grad(opt):
        def loss(surface):
            out = at.volume_render_surface(grid.replace(surface_data=surface), rays, opt)
            return jnp.sum(out["rgb"])

        return jax.grad(loss)(grid.surface_data)

    g_on = np.asarray(surf_grad(base.replace(no_surf_grad_from_sh=True)))
    g_off = np.asarray(surf_grad(base))
    assert np.abs(g_on).max() == 0.0
    assert np.abs(g_off).max() > 0.0
    # forward values identical
    rgb_on = at.volume_render_surface(grid, rays, base.replace(no_surf_grad_from_sh=True))["rgb"]
    rgb_off = at.volume_render_surface(grid, rays, base)["rgb"]
    np.testing.assert_allclose(np.asarray(rgb_on), np.asarray(rgb_off), rtol=1e-12)


def test_use_spheric_clip_surface():
    grid = make_gt_grid(reso=16, seed=1)
    base = at.RenderOptions(sigma_thresh=-1e9, stop_thresh=-1.0)
    # the GT sphere (radius reso/4) is well inside the inscribed sphere:
    # central rays must render identically under the spheric clip
    rays = _central_rays()
    rgb_box = at.volume_render_surface(grid, rays, base)["rgb"]
    rgb_sph = at.volume_render_surface(grid, rays, base.replace(use_spheric_clip=True))["rgb"]
    np.testing.assert_allclose(np.asarray(rgb_sph), np.asarray(rgb_box), atol=1e-6)

    # a ray grazing only the lattice corner (outside the inscribed sphere)
    # must be clipped to empty -> pure background
    o = jnp.asarray([[2.0, 2.0, -2.0]], jnp.float64)
    d = jnp.asarray([[-0.32, -0.32, 1.0]], jnp.float64)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    corner = at.Rays(o, d)
    out = at.volume_render_surface(grid, corner, base.replace(use_spheric_clip=True))
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-6)

    # a near_clip in spheric mode shrinks the near sphere (smoke: finite)
    out2 = at.volume_render_surface(
        grid, rays, base.replace(use_spheric_clip=True, near_clip=0.1)
    )
    assert np.all(np.isfinite(np.asarray(out2["rgb"])))


def test_last_sample_opaque_cuvol():
    grid = make_gt_grid(reso=12, seed=2)
    grid = grid.replace(surface_data=None, level_set_data=None)
    rays = _central_rays(n=16)
    base = at.RenderOptions(sigma_thresh=-1e9, stop_thresh=-1.0)
    out_off = at.volume_render_cuvol(grid, rays, base)
    out_on = at.volume_render_cuvol(grid, rays, base.replace(last_sample_opaque=True))
    # opaque last sample: transmittance collapses, so no background leaks
    assert np.all(np.asarray(out_on["log_transmit"]) < -20.0)
    assert np.asarray(out_off["log_transmit"]).max() > -20.0


def _tiny_cfg(tmp_path, **kw):
    from alphasurf_tpu.app.config import Config

    base = dict(
        train_dir=str(tmp_path / "ckpt"),
        reso=[[16, 16, 16]],
        surface_type="none",
        batch_size=400,
        n_iters=6,
        lr_sigma=3e1, lr_sigma_final=3e0, lr_sigma_delay_steps=0,
        lr_sh=1e-2, lr_sh_final=1e-2,
        lambda_tv=1e-6, lambda_tv_sh=1e-4,
        sigma_thresh=-1e9, stop_thresh=-1e9,
        eval_every_iter=0, print_every=100, save_every=-1,
        n_eval_test=1, nosphereinit=True, tune_mode=True,
    )
    base.update(kw)
    return Config(**base)


def test_lr_fg_begin_step(tmp_path):
    from alphasurf_tpu.train.trainer import Trainer

    dset = SyntheticDataset(split="train", n_images=4, width=24, height=24, reso=16)
    cfg = _tiny_cfg(tmp_path, lr_fg_begin_step=3, init_sigma=0.7)
    tr = Trainer(cfg, dset)
    # density starts at 0 (opt.py:150) and is frozen before the begin step
    assert float(jnp.abs(tr.grid.density_data).max()) == 0.0
    assert tr._hparams(True).lr_sigma == 0.0
    tr.train(n_iters=2)
    assert float(jnp.abs(tr.grid.density_data).max()) == 0.0
    tr.train(n_iters=4)  # crosses step 3: density reset to init_sigma, trains
    d = np.asarray(tr.grid.density_data)
    assert np.abs(d).max() > 0.0


def test_normal_lambda_linear_schedule(tmp_path):
    from alphasurf_tpu.train.trainer import Trainer

    dset = SyntheticDataset(split="train", n_images=2, width=16, height=16, reso=16)
    cfg = _tiny_cfg(
        tmp_path,
        surf_normal_loss_lambda_type="linear",
        lambda_normal_loss_l1=1e-3, lambda_normal_loss_l1_final=1e-5,
        lambda_normal_loss_l1_delay_steps=0, lambda_normal_loss_l1_decay_steps=100,
    )
    tr = Trainer(cfg, dset)
    assert abs(tr.lambda_normal_l1_func(0) - 1e-3) < 1e-12
    assert abs(tr.lambda_normal_l1_func(100) - 1e-5) < 1e-12
    mid = tr.lambda_normal_l1_func(50)
    assert 1e-5 < mid < 1e-3


def test_resume_from_ckpt(tmp_path):
    from alphasurf_tpu.train.trainer import Trainer

    dset = SyntheticDataset(split="train", n_images=4, width=24, height=24, reso=16)
    cfg = _tiny_cfg(tmp_path, n_iters=4)
    tr = Trainer(cfg, dset)
    tr.train()
    assert tr.gstep == 4

    cfg2 = _tiny_cfg(tmp_path, n_iters=8, load_ckpt=True)
    tr2 = Trainer(cfg2, dset)
    assert tr2.gstep == 4  # resumed, not restarted
    np.testing.assert_allclose(
        np.asarray(tr2.grid.density_data), np.asarray(tr.grid.density_data)
    )
    tr2.train()
    assert tr2.gstep == 8
