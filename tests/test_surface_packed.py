"""The packed renderer (global entry pool + segment compositor) must match
the dense DDA walk on every output and on gradients — the same contract the
compacted renderer satisfies."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import alphasurf_tpu as at
from alphasurf_tpu.render.surface import (
    volume_render_surface,
    volume_render_surface_packed,
)
from ref_oracle import grid_to_jax, make_ref_grid, make_rays

BASE = dict(sigma_thresh=-1e9, stop_thresh=-1.0, near_clip=0.0)


def _setup(seed=0, prune_frac=0.0, n=48, **optkw):
    g = make_ref_grid(reso=8, seed=seed, prune_frac=prune_frac)
    gj = grid_to_jax(g, jnp.float64)
    origins, dirs = make_rays(n, seed=seed + 1)
    rays = at.Rays(jnp.asarray(origins, jnp.float64), jnp.asarray(dirs, jnp.float64))
    opt = at.RenderOptions(**{**BASE, **optkw})
    return gj, rays, opt


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(surf_fake_sample=True, limited_fake_sample=False,
             surf_fake_sample_min_vox_len=0.0),
        dict(truncated_vol_render=True, trunc_vol_weight_min=1e-10,
             surf_fake_sample=True, limited_fake_sample=True),
        dict(only_outward_intersect=True, stop_thresh=1e-4),
    ],
)
def test_packed_matches_dense(kw):
    gj, rays, opt = _setup(seed=3, prune_frac=0.2, **kw)
    ref = volume_render_surface(gj, rays, opt, cache_size=16)
    got = volume_render_surface_packed(gj, rays, opt, entries_per_ray=24,
                                       cache_size=16)
    for k in ("rgb", "depth", "normal", "log_transmit", "alpha",
              "depth_mode", "depth_med"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-9, atol=1e-10,
            err_msg=k,
        )
    np.testing.assert_array_equal(
        np.asarray(got["n_intersections"]), np.asarray(ref["n_intersections"])
    )
    for k in ref["ray_losses"]:
        np.testing.assert_allclose(
            np.asarray(got["ray_losses"][k]), np.asarray(ref["ray_losses"][k]),
            rtol=1e-8, atol=1e-10, err_msg=f"ray_losses[{k}]",
        )
    for k in ("ts", "alphas", "weights"):
        np.testing.assert_allclose(
            np.asarray(got["cache"][k]), np.asarray(ref["cache"][k]),
            rtol=1e-9, atol=1e-12, err_msg=f"cache[{k}]",
        )
    np.testing.assert_array_equal(
        np.asarray(got["cache"]["n_cached"]), np.asarray(ref["cache"]["n_cached"])
    )


def test_packed_gradients_match_dense():
    gj, rays, opt = _setup(
        seed=5, surf_fake_sample=True, limited_fake_sample=False,
        surf_fake_sample_min_vox_len=0.0,
    )

    def loss(render, dd, sh, sf):
        g2 = gj.replace(density_data=dd, sh_data=sh, surface_data=sf)
        out = render(g2, rays, opt)
        ray_l = out["ray_losses"]
        return (
            jnp.sum(out["rgb"] ** 2)
            + 0.1 * jnp.sum(ray_l["l_dist"])
            + 0.1 * jnp.sum(ray_l["l_entropy_a"])
            + 0.01 * jnp.sum(ray_l["l_inward"])
        )

    args = (gj.density_data, gj.sh_data, gj.surface_data)
    ref = jax.grad(lambda *a: loss(volume_render_surface, *a), argnums=(0, 1, 2))(*args)
    got = jax.grad(
        lambda *a: loss(
            lambda g, r, o: volume_render_surface_packed(g, r, o, entries_per_ray=24),
            *a,
        ),
        argnums=(0, 1, 2),
    )(*args)
    for a, b, name in zip(got, ref, ("density", "sh", "surface")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-10, err_msg=name
        )


def test_packed_coarse_matches_dense():
    """Two-level supervoxel phase A must still match the dense walk
    (reso 16 grid so the coarse path actually engages)."""
    g = make_ref_grid(reso=16, seed=9, prune_frac=0.3)
    gj = grid_to_jax(g, jnp.float64)
    origins, dirs = make_rays(64, seed=10)
    rays = at.Rays(jnp.asarray(origins, jnp.float64), jnp.asarray(dirs, jnp.float64))
    opt = at.RenderOptions(
        **BASE, surf_fake_sample=True, limited_fake_sample=True,
        truncated_vol_render=True, only_outward_intersect=True,
    )
    ref = volume_render_surface(gj, rays, opt)
    for cf in (2, 4):
        got = volume_render_surface_packed(
            gj, rays, opt, entries_per_ray=48, coarse_factor=cf,
            supers_per_ray=24,
        )
        for k in ("rgb", "depth", "log_transmit"):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-9,
                atol=1e-10, err_msg=f"cf={cf} {k}",
            )
        for k in ref["ray_losses"]:
            np.testing.assert_allclose(
                np.asarray(got["ray_losses"][k]),
                np.asarray(ref["ray_losses"][k]),
                rtol=1e-8, atol=1e-10, err_msg=f"cf={cf} ray_losses[{k}]",
            )


def test_packed_overflow_monitor():
    gj, rays, opt = _setup(seed=7)
    out = volume_render_surface_packed(gj, rays, opt, entries_per_ray=1)
    # pool too small: still runs, reports true occupancy for monitoring
    assert int(np.asarray(out["n_entries_used"])) <= rays.origins.shape[0]
    assert np.asarray(out["n_occupied"]).sum() > int(np.asarray(out["n_entries_used"]))
