"""Tests for the recipe-critical topology ops added in round 2:
weight-based resample thresholding, max_elements top-k bound,
non_expanding surface resample, weight/mask surface init, visibility
pruning (svox2.py:3963-4418, 2954-3225)."""
import jax.numpy as jnp
import numpy as np

import alphasurf_tpu as at
from alphasurf_tpu import defs
from alphasurf_tpu.core import topology
from alphasurf_tpu.core.weight_render import (
    sparse_grid_mask_render,
    sparse_grid_visibility_render_surf,
    sparse_grid_weight_render,
)
from alphasurf_tpu.data.synthetic import make_gt_grid, pose_spherical


def _cams(n=3, width=24, height=24, dist=2.7):
    return [
        at.Camera.make(
            pose_spherical(360.0 * i / n, 20.0, dist), fx=30.0,
            width=width, height=height,
        )
        for i in range(n)
    ]


def _wall_grid(reso=16):
    """Dense density grid with an opaque wall at x ~ reso/3: cells behind
    the wall (larger x) are invisible from a camera at -x."""
    g = at.create_grid(reso, radius=1.0, basis_dim=1)
    dens = np.full((g.capacity, 1), 5.0, np.float32)
    return g.replace(density_data=jnp.asarray(dens))


def test_resample_surface_basic_and_max_elements():
    g = make_gt_grid(reso=16, seed=0)
    rng = np.random.default_rng(0)
    g = g.replace(density_data=jnp.asarray(
        rng.uniform(0.1, 5.0, (g.capacity, 1)).astype(np.float32)
    ))
    up = topology.resample_surface(g, 24, alpha_thresh=-1e9, dilate=0)
    assert up.reso == (24, 24, 24)
    assert up.capacity > 0
    # bounded capacity via top-k threshold readjustment (pre-dilation)
    up_b = topology.resample_surface(g, 24, alpha_thresh=-1e9, dilate=0,
                                     max_elements=500)
    assert up_b.capacity <= 500


def test_resample_density_weight_thresh_culls_occluded():
    g = _wall_grid(16)
    cam = at.Camera.make(pose_spherical(180.0, 0.0, 2.7), fx=40.0,
                         width=32, height=32)  # looks along +x
    up = topology.resample(g, 16, weight_thresh=1e-4, dilate=0,
                           cameras=[cam])
    links = np.asarray(up.links)
    # front slab (hit first, high weight) survives; deep cells are occluded
    front = (links[1:4] >= 0).mean()
    back = (links[12:15] >= 0).mean()
    assert front > 0.5, f"front={front}"
    assert back < 0.1, f"back={back}"


def test_resample_surface_non_expanding():
    g = make_gt_grid(reso=16, seed=1)
    # prune half the grid: drop all links with x >= 8
    links = np.asarray(g.links).copy()
    keep = np.ones_like(links, bool)
    keep[8:] = False
    dense_keep = keep & (links >= 0)
    fields = {
        "density_data": topology._dense_field(g, g.density_data),
        "sh_data": topology._dense_field(g, g.sh_data),
        "surface_data": topology._dense_field(g, g.surface_data),
    }
    g = topology._rebuild(g, dense_keep, fields)

    up_exp = topology.resample_surface(g, 20, alpha_thresh=-1e9, dilate=0)
    up_non = topology.resample_surface(g, 20, alpha_thresh=-1e9, dilate=0,
                                       non_expanding=True)
    assert up_non.capacity < up_exp.capacity
    # non-expanding keeps nothing in the half that was pruned away
    links_non = np.asarray(up_non.links)
    x_cut = int(np.ceil(8 / (15.5 / 19)))  # old x=8 in new coords
    assert (links_non[x_cut + 1 :] >= 0).sum() == 0


def test_mask_render_marks_corridor():
    g = at.create_grid(16, radius=1.0, basis_dim=1)
    # single ray through the middle along +x
    o = np.array([[-2.0, 0.0, 0.0]], np.float32)
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    marked = np.asarray(sparse_grid_mask_render(g, o, d))
    links = np.asarray(g.links)
    hit = np.zeros(g.capacity, bool)
    hit[links[links >= 0]] = False
    frac = marked.mean()
    assert 0 < marked.sum() <= 4 * 17 * 2  # corridor corners only
    # marked vertices all lie near the y=z=center line
    idx = np.argwhere(np.isin(links, np.flatnonzero(marked > 0)))
    assert np.all(np.abs(idx[:, 1] - 8.0) <= 1.0 + 1e-6)
    assert np.all(np.abs(idx[:, 2] - 8.0) <= 1.0 + 1e-6)
    assert frac < 0.1


def test_weight_init_and_visibility_pruning():
    # GT sphere grid: interior vertices are occluded by the surface
    g = make_gt_grid(reso=16, seed=2)
    g = g.replace(density_data=jnp.full_like(g.density_data, 5.0))
    cams = _cams(4)

    wt = np.asarray(sparse_grid_weight_render(g, cams))
    assert wt.max() <= 1.0 + 1e-6 and wt.max() > 0.5

    vis = np.asarray(sparse_grid_visibility_render_surf(g, cams))
    links = np.asarray(g.links)
    center = vis[links[8, 8, 8]]
    outside = vis[links[0, 8, 8]]
    assert outside > 0
    assert center < outside, "interior must be less visible than exterior"

    # visibility pruning pushes occluded surfaces strongly negative
    dens_grid = g.replace(
        surface_data=None, level_set_data=None,
        surface_type=defs.SURFACE_TYPE_NONE,
    )
    out = topology.init_surface_from_density(
        dens_grid, density_lvs=[1.5], prune_threshold=0.0, dilate=0,
        visibility_pruning_scale=0.05, weight_init_cams=cams,
    )
    assert out.surface_data is not None
    assert np.isfinite(np.asarray(out.surface_data)).all()

    # weight-based surface init runs and differs from the density init
    out_w = topology.init_surface_from_density(
        dens_grid, density_lvs=[1.5], prune_threshold=0.0, dilate=0,
        init_type="weight", weight_init_cams=cams,
    )
    assert out_w.surface_data is not None
    assert np.isfinite(np.asarray(out_w.surface_data)).all()
