"""Differential tests of the round-2 streaming losses (l_inward_norm,
density_lap_loss, udf_var_loss) against the reference oracle's
``extra_loss`` outputs (svox2.py:2559-2617)."""
import jax.numpy as jnp
import numpy as np
import torch

import alphasurf_tpu as at
from alphasurf_tpu.losses import render_losses as rl
from ref_oracle import grid_to_jax, load_reference, make_ref_grid, make_rays

BASE_OPT = dict(
    sigma_thresh=-1e9, stop_thresh=-1.0, near_clip=0.0,
    background_brightness=1.0,
)


def _oracle_extra(g, origins, dirs, **opt_kw):
    for k, v in opt_kw.items():
        setattr(g.opt, k, v)
    rays_t = load_reference().Rays(
        torch.from_numpy(origins).double(), torch.from_numpy(dirs).double()
    )
    out = g._surface_render_gradcheck_lerp(rays_t, dtype=torch.double, reg=True)
    return {
        k: float(v) for k, v in out["extra_loss"].items()
        if np.isscalar(v) or torch.is_tensor(v)
    }


def _ours(gj, origins, dirs, opt):
    rays = at.Rays(jnp.asarray(origins, jnp.float64), jnp.asarray(dirs, jnp.float64))
    return at.volume_render_surface(gj, rays, opt)


def test_inward_and_lap_match_oracle():
    g = make_ref_grid(reso=8, seed=11)
    g.fake_sample_std = torch.nn.Parameter(torch.tensor([[0.25]]).double())
    origins, dirs = make_rays(24, seed=12)
    extra = _oracle_extra(
        g, origins, dirs, surf_fake_sample=True, limited_fake_sample=False
    )
    gj = grid_to_jax(g, jnp.float64)
    opt = at.RenderOptions(
        **BASE_OPT, surf_fake_sample=True, limited_fake_sample=False,
        surf_fake_sample_min_vox_len=0.0,
    )
    out = _ours(gj, origins, dirs, opt)
    ray_l = out["ray_losses"]

    got_inward = float(jnp.sum(ray_l["l_inward"]))
    np.testing.assert_allclose(got_inward, extra["l_inward_norm"],
                               rtol=1e-5, atol=1e-8)

    got_lap = float(rl.density_lap_from_ray_losses(ray_l))
    np.testing.assert_allclose(got_lap, extra["density_lap_loss"],
                               rtol=1e-5, atol=1e-9)


def test_udf_var_matches_oracle():
    g = make_ref_grid(reso=8, seed=13, surface_type="udf")
    g.fake_sample_std = torch.nn.Parameter(torch.tensor([[1e-6]]).double())
    origins, dirs = make_rays(24, seed=14)
    extra = _oracle_extra(
        g, origins, dirs, surf_fake_sample=True, limited_fake_sample=False
    )
    gj = grid_to_jax(g, jnp.float64)
    opt = at.RenderOptions(
        **BASE_OPT, surf_fake_sample=True, limited_fake_sample=False,
        surf_fake_sample_min_vox_len=0.0,
    )
    out = _ours(gj, origins, dirs, opt)
    got = float(rl.udf_var_from_ray_losses(out["ray_losses"]))
    np.testing.assert_allclose(got, extra["udf_var_loss"], rtol=1e-5, atol=1e-9)
