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


def test_packed_corner_crossings_camera():
    """Regression: near-axis camera rays through the lattice center cross
    voxel corners where two plane crossings land within f32 roundoff of
    each other. The closed-form candidate enumeration must still cover
    every voxel exactly once (the r2 code lost the diagonal voxel: f32
    floor of o + t*d at the crossing picked the pre-crossing side, 24/2304
    rays were off by up to 0.57 rgb)."""
    from alphasurf_tpu.data.synthetic import make_gt_grid

    g = make_gt_grid(16)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = -2.5
    cam = at.Camera.make(jnp.asarray(c2w), fx=60.0, width=48, height=48)
    rays = cam.gen_rays()
    opt = at.RenderOptions(sigma_thresh=-1e9, stop_thresh=-1.0,
                           only_outward_intersect=True)
    ref = volume_render_surface(g, rays, opt)
    for cf in (0, 8):
        got = volume_render_surface_packed(
            g, rays, opt, entries_per_ray=32, coarse_factor=cf)
        dd = np.abs(np.asarray(got["rgb"] - ref["rgb"])).max(-1)
        assert dd.max() < 1e-3, (cf, dd.max(), (dd > 1e-3).sum())
        assert int(got["pool_overflow"]) == 0


def test_packed_gradients_finite_with_invalid_entries():
    """Regression: mid-pool entries invalidated after the (ray, t) sort
    (degenerate corner slivers) made pre_att garbage-positive -> exp inf
    -> NaN through the whole compositor; and huge cubic pseudo-roots
    overflowed t^3 in the implicit-diff JVP. Both must stay finite."""
    from alphasurf_tpu.data.synthetic import make_gt_grid

    g = make_gt_grid(16).replace(
        fake_sample_std=jnp.full((1, 1), 0.2, jnp.float32))
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = -2.5
    cam = at.Camera.make(jnp.asarray(c2w), fx=60.0, width=48, height=48)
    rays = cam.gen_rays()
    opt = at.RenderOptions(
        sigma_thresh=-1e9, stop_thresh=-1.0, only_outward_intersect=True,
        surf_fake_sample=True, limited_fake_sample=True,
        truncated_vol_render=True)

    def loss(surf, dens):
        o = volume_render_surface_packed(
            g.replace(surface_data=surf, density_data=dens), rays, opt,
            entries_per_ray=16, coarse_factor=8)
        return jnp.mean(o["rgb"] ** 2) + 1e-3 * jnp.sum(o["ray_losses"]["l_dist"])

    gs, gd = jax.grad(loss, argnums=(0, 1))(g.surface_data, g.density_data)
    assert bool(jnp.all(jnp.isfinite(gs))), "surface grad has NaN/inf"
    assert bool(jnp.all(jnp.isfinite(gd))), "density grad has NaN/inf"
