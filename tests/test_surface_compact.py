"""Occupancy-compacted renderer vs the dense DDA walk: identical results."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import alphasurf_tpu as at
from alphasurf_tpu.render.surface import (
    volume_render_surface,
    volume_render_surface_compact,
)
from ref_oracle import grid_to_jax, make_ref_grid, make_rays


CONFIGS = [
    dict(),
    dict(surf_fake_sample=True, limited_fake_sample=True,
         surf_fake_sample_min_vox_len=0.0),
    dict(surf_fake_sample=True, limited_fake_sample=False,
         surf_fake_sample_min_vox_len=0.0),
    dict(only_outward_intersect=True, truncated_vol_render=True),
]


@pytest.mark.parametrize("idx", range(len(CONFIGS)))
def test_compact_matches_dense(idx):
    g = make_ref_grid(reso=10, seed=20 + idx, prune_frac=0.4)
    import torch

    g.fake_sample_std = torch.nn.Parameter(torch.tensor([[0.3]]).double())
    gj = grid_to_jax(g, jnp.float64)
    origins, dirs = make_rays(32, seed=21 + idx)
    rays = at.Rays(jnp.asarray(origins, jnp.float64), jnp.asarray(dirs, jnp.float64))
    opt = at.RenderOptions(sigma_thresh=-1e9, stop_thresh=-1.0, **CONFIGS[idx])

    dense = volume_render_surface(gj, rays, opt)
    comp = volume_render_surface_compact(gj, rays, opt, max_intersect_voxels=64)
    assert int(jnp.max(comp["n_occupied"])) <= 64
    np.testing.assert_allclose(
        np.asarray(comp["rgb"]), np.asarray(dense["rgb"]), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(comp["depth"]), np.asarray(dense["depth"]), rtol=1e-8, atol=1e-11
    )
    for k in dense["ray_losses"]:
        np.testing.assert_allclose(
            np.asarray(comp["ray_losses"][k]), np.asarray(dense["ray_losses"][k]),
            rtol=1e-7, atol=1e-10, err_msg=k,
        )


def test_compact_gradients_match_dense():
    g = make_ref_grid(reso=10, seed=30, prune_frac=0.3)
    gj = grid_to_jax(g, jnp.float64)
    origins, dirs = make_rays(16, seed=31)
    rays = at.Rays(jnp.asarray(origins, jnp.float64), jnp.asarray(dirs, jnp.float64))
    opt = at.RenderOptions(sigma_thresh=-1e9, stop_thresh=-1.0)

    def loss_dense(surf, dens, sh):
        g2 = gj.replace(surface_data=surf, density_data=dens, sh_data=sh)
        return jnp.sum(volume_render_surface(g2, rays, opt)["rgb"])

    def loss_comp(surf, dens, sh):
        g2 = gj.replace(surface_data=surf, density_data=dens, sh_data=sh)
        return jnp.sum(
            volume_render_surface_compact(g2, rays, opt, max_intersect_voxels=48)["rgb"]
        )

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(
        gj.surface_data, gj.density_data, gj.sh_data
    )
    gc = jax.grad(loss_comp, argnums=(0, 1, 2))(
        gj.surface_data, gj.density_data, gj.sh_data
    )
    for a, b, name in zip(gd, gc, ("surface", "density", "sh")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-7, atol=1e-10, err_msg=name
        )


def test_overflow_truncates_far_voxels():
    """With K=1 only the nearest occupied voxel contributes."""
    g = make_ref_grid(reso=10, seed=40)
    gj = grid_to_jax(g, jnp.float64)
    origins, dirs = make_rays(8, seed=41)
    rays = at.Rays(jnp.asarray(origins, jnp.float64), jnp.asarray(dirs, jnp.float64))
    opt = at.RenderOptions(sigma_thresh=-1e9, stop_thresh=-1.0)
    out = volume_render_surface_compact(gj, rays, opt, max_intersect_voxels=1)
    assert np.all(np.isfinite(np.asarray(out["rgb"])))
