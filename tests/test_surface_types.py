"""Non-scalar surface types: PLANE, UDF_ALPHA, VOXEL_FACE.

Oracle status: the reference's pure-torch renderer CRASHES on two of the
three (verified against /root/reference@HEAD):
  * PLANE — its branch (svox2.py:2254-2288) filters ``ray_ids`` but leaves
    ``l_ids`` stale, so the following alpha interpolation
    (svox2.py:2312-2317) fails with a shape mismatch for any ray set where
    ``valid_sample_mask`` removes samples.
  * UDF_ALPHA — ``alpha_raw`` is only assigned in the non-UDF_ALPHA branch
    (svox2.py:2318-2325) but the activation reads it unconditionally ->
    UnboundLocalError.
VOXEL_FACE runs and is differential-tested below. PLANE and UDF_ALPHA are
therefore tested against the reference's *math* (same equations,
svox2.py:2254-2288 / 2318-2322) via semantic checks: an analytically known
plane must produce the exact ray-plane depth, and UDF_ALPHA's alpha must
come from the per-level-set table (gradients land there, not on corners).
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import alphasurf_tpu as at
from alphasurf_tpu import defs
from alphasurf_tpu.core.grid import create_grid
from alphasurf_tpu.render.surface import (
    volume_render_surface,
    volume_render_surface_packed,
)
from ref_oracle import load_reference, make_rays

BASE = dict(sigma_thresh=-1e9, stop_thresh=-1.0, near_clip=0.0)


def _rays(n=32, seed=2):
    origins, dirs = make_rays(n, seed=seed)
    return at.Rays(jnp.asarray(origins), jnp.asarray(dirs)), origins, dirs


# ---------------------------------------------------------------------------
# PLANE
# ---------------------------------------------------------------------------

def _plane_grid(reso=8):
    """All voxels carry the same world plane z = 0 (grid plane z = reso/2):
    surface = (0, 0, 1, -reso/2) at every vertex. The d-clamp
    (svox2.py:2267-2269) pulls a local plane into EVERY voxel, so opacity
    must gate visibility: alpha is high only on vertices adjacent to the
    true plane (exactly how PLANE grids represent geometry)."""
    g = create_grid(reso, radius=1.0, basis_dim=4,
                    surface_type=defs.SURFACE_TYPE_PLANE,
                    surface_init="random", init_sigma=3.0)
    plane = np.zeros((g.capacity, 4), np.float32)
    plane[:, 2] = 1.0
    plane[:, 3] = -reso / 2.0
    # vertex z-coordinates: links is dense row-major from create_grid
    zz = np.meshgrid(np.arange(reso), np.arange(reso), np.arange(reso),
                     indexing="ij")[2].reshape(-1)
    dens = np.where(np.abs(zz - reso / 2.0) < 0.5, 8.0, -15.0)
    g = g.replace(surface_data=jnp.asarray(plane),
                  density_data=jnp.asarray(dens[:, None], np.float32),
                  sh_data=jnp.zeros_like(g.sh_data))
    return g


def test_plane_renders_analytic_depth():
    reso = 8
    g = _plane_grid(reso)
    # straight-down ray through the center: hits z-plane at world z=0.
    # The d-clamp (th=0.3, svox2.py:2267-2269) keeps each voxel's plane
    # within 0.3 of its own center, so hits happen in the voxels adjacent
    # to the true plane; expected depth ~ distance to z=0 within a voxel.
    origins = np.array([[0.3, -0.2, -2.5]], np.float32)
    dirs = np.array([[0.0, 0.0, 1.0]], np.float32)
    rays = at.Rays(jnp.asarray(origins), jnp.asarray(dirs))
    opt = at.RenderOptions(**BASE)
    out = volume_render_surface(g, rays, opt)
    w = 1.0 - np.exp(np.asarray(out["log_transmit"])[0])
    assert w > 0.5, "plane not hit"
    depth_world = float(out["depth"][0]) / w * (2.0 / reso)
    # voxel size in world units = 2/reso; clamp keeps plane within ~0.3 vox
    assert abs(depth_world - 2.5) < 2.0 / reso + 1e-3, depth_world

    # packed production path agrees
    outp = volume_render_surface_packed(g, rays, opt, entries_per_ray=32)
    np.testing.assert_allclose(np.asarray(outp["rgb"]), np.asarray(out["rgb"]),
                               atol=1e-5)


def test_plane_gradients_flow():
    g = _plane_grid(8)
    rays, _, _ = _rays(24, seed=4)
    opt = at.RenderOptions(**BASE)

    def loss(surf, dens, sh):
        g2 = g.replace(surface_data=surf, density_data=dens, sh_data=sh)
        return jnp.sum(volume_render_surface(g2, rays, opt)["rgb"])

    gs, gd, gsh = jax.grad(loss, argnums=(0, 1, 2))(
        g.surface_data, g.density_data, g.sh_data)
    for name, arr in (("surface", gs), ("density", gd), ("sh", gsh)):
        assert bool(jnp.all(jnp.isfinite(arr))), name
    assert float(jnp.abs(gs).sum()) > 0
    assert float(jnp.abs(gd).sum()) > 0


# ---------------------------------------------------------------------------
# UDF_ALPHA
# ---------------------------------------------------------------------------

def test_udf_alpha_uses_level_set_table():
    reso = 8
    g = create_grid(reso, radius=1.0, basis_dim=4,
                    surface_type=defs.SURFACE_TYPE_UDF_ALPHA,
                    surface_init="sphere")
    assert g.density_data.shape == (g.level_set_data.shape[0], 1)
    assert g.capacity == g.sh_data.shape[0] != g.density_data.shape[0]
    g = g.replace(density_data=jnp.asarray(
        [[2.0], [0.5]], jnp.float32)[: g.level_set_data.shape[0]])
    rays, _, _ = _rays(48, seed=5)
    opt = at.RenderOptions(**BASE)
    out = volume_render_surface(g, rays, opt)
    assert bool(jnp.all(jnp.isfinite(out["rgb"])))
    hit = np.asarray(out["n_intersections"]) > 0
    assert hit.any(), "no intersections on the UDF sphere"

    # alpha must respond to the per-level-set table: raising table alphas
    # darkens transmittance on hit rays
    g_hi = g.replace(density_data=g.density_data + 3.0)
    out_hi = volume_render_surface(g_hi, rays, opt)
    t_lo = np.exp(np.asarray(out["log_transmit"]))
    t_hi = np.exp(np.asarray(out_hi["log_transmit"]))
    assert (t_hi[hit] <= t_lo[hit] + 1e-9).all()
    assert (t_hi[hit] < t_lo[hit] - 1e-6).any()

    # gradients of the image land on the (n_lv, 1) table and are finite
    def loss(dens, surf):
        g2 = g.replace(density_data=dens, surface_data=surf)
        return jnp.sum(volume_render_surface(g2, rays, opt)["rgb"])

    gd, gs = jax.grad(loss, argnums=(0, 1))(g.density_data, g.surface_data)
    assert gd.shape == g.density_data.shape
    assert bool(jnp.all(jnp.isfinite(gd))) and float(jnp.abs(gd).sum()) > 0
    assert bool(jnp.all(jnp.isfinite(gs)))

    # packed production path agrees with the dense walk
    outp = volume_render_surface_packed(g, rays, opt, entries_per_ray=32)
    np.testing.assert_allclose(np.asarray(outp["rgb"]), np.asarray(out["rgb"]),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# VOXEL_FACE (reference oracle runs for this type -> differential test)
# ---------------------------------------------------------------------------

def test_voxel_face_matches_reference():
    """Axis-aligned rays: the reference composites samples in x/y/z
    plane-family order (svox2.py:1731-1758, never t-sorted); on +x-aligned
    rays that order IS ascending t and its floor-voxel assignment matches
    the entered voxel, so the two implementations must agree exactly."""
    import torch

    ref = load_reference()
    g = ref.SparseGrid(reso=8, radius=1.0, center=[0.0, 0.0, 0.0], basis_dim=9,
                       device="cpu", surface_type=ref.SURFACE_TYPE_VOXEL_FACE,
                       use_octree=False)
    gen = torch.Generator().manual_seed(0)
    g.density_data.data = torch.randn(g.density_data.shape, generator=gen) * 0.5
    g.sh_data.data = torch.randn(g.sh_data.shape, generator=gen) * 0.5
    g.opt.sigma_thresh = -1e9
    g.opt.stop_thresh = -1.0
    g.opt.near_clip = 0.0
    g.opt.surf_fake_sample = False
    rng = np.random.default_rng(3)
    n = 24
    origins = np.stack([
        np.full(n, -2.5), rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n)
    ], -1).astype(np.float32)
    dirs = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    rays_t = ref.Rays(torch.from_numpy(origins).double(),
                      torch.from_numpy(dirs).double())
    ref_rgb = g._surface_render_gradcheck_lerp(
        rays_t, dtype=torch.double)["rgb"].detach().numpy()

    gj = at.SparseGrid(
        links=jnp.asarray(g.links.numpy()),
        density_data=jnp.asarray(g.density_data.data.numpy(), jnp.float64),
        sh_data=jnp.asarray(g.sh_data.data.numpy(), jnp.float64),
        surface_data=jnp.asarray(g.surface_data.data.numpy(), jnp.float64),
        level_set_data=jnp.zeros((1,), jnp.float64),
        fake_sample_std=None,
        truncated_vol_render_a=jnp.asarray(1.0, jnp.float64),
        radius=jnp.asarray(g.radius.numpy(), jnp.float64),
        center=jnp.asarray(g.center.numpy(), jnp.float64),
        basis_dim=g.basis_dim,
        surface_type=defs.SURFACE_TYPE_VOXEL_FACE,
    )
    rays = at.Rays(jnp.asarray(origins, jnp.float64), jnp.asarray(dirs, jnp.float64))
    opt = at.RenderOptions(**BASE)
    out = volume_render_surface(gj, rays, opt)
    np.testing.assert_allclose(np.asarray(out["rgb"]), ref_rgb, rtol=1e-5,
                               atol=1e-6)
