"""Differential test: JAX surface renderer vs the reference pure-PyTorch
oracle (``_surface_render_gradcheck_lerp``, svox2.py:1596-2857).

This is the contract of the reference's own key test
(test/test_render_gradcheck_surface.py): values and parameter gradients of
the fused renderer must match the autograd oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import alphasurf_tpu as at
from ref_oracle import grid_to_jax, load_reference, make_ref_grid, make_rays


def _ref_render(g, origins, dirs, want_grads=False, **opt_kw):
    import torch

    for k, v in opt_kw.items():
        setattr(g.opt, k, v)
    rays_t = load_reference().Rays(
        torch.from_numpy(origins).double(), torch.from_numpy(dirs).double()
    )
    if want_grads:
        for p in (g.density_data, g.sh_data, g.surface_data):
            if p.grad is not None:
                p.grad = None
    out = g._surface_render_gradcheck_lerp(rays_t, dtype=torch.double)
    rgb = out["rgb"]
    if not want_grads:
        return rgb.detach().numpy()
    loss = rgb.sum()
    loss.backward()
    return (
        rgb.detach().numpy(),
        g.density_data.grad.numpy().copy(),
        g.sh_data.grad.numpy().copy(),
        g.surface_data.grad.numpy().copy(),
    )


def _jax_render(gj, origins, dirs, opt):
    rays = at.Rays(jnp.asarray(origins, jnp.float64), jnp.asarray(dirs, jnp.float64))
    out = at.volume_render_surface(gj, rays, opt)
    return np.asarray(out["rgb"])


def _jax_render_grads(gj, origins, dirs, opt):
    rays = at.Rays(jnp.asarray(origins, jnp.float64), jnp.asarray(dirs, jnp.float64))

    def loss_fn(density, sh, surface):
        g2 = gj.replace(density_data=density, sh_data=sh, surface_data=surface)
        out = at.volume_render_surface(g2, rays, opt)
        return jnp.sum(out["rgb"])

    val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        gj.density_data, gj.sh_data, gj.surface_data
    )
    return val, [np.asarray(g) for g in grads]


BASE_OPT = dict(
    sigma_thresh=-1e9,
    stop_thresh=-1.0,
    near_clip=0.0,
    background_brightness=1.0,
)

# The oracle's l_ss block references ``fake_sample_ids`` unconditionally
# (svox2.py:2550) and so crashes with surf_fake_sample=False. To exercise the
# *no-fake* path we enable fake samples on the oracle but with a vanishing
# std: the Gaussian reweight underflows to exactly 0, so fake samples
# contribute nothing to rgb or gradients.
def _neutralize_fake(g):
    import torch

    g.fake_sample_std = torch.nn.Parameter(torch.tensor([[1e-6]]).double())
    return dict(surf_fake_sample=True, limited_fake_sample=False)


@pytest.mark.parametrize("prune_frac", [0.0, 0.3])
def test_rgb_matches_oracle_basic(prune_frac):
    g = make_ref_grid(reso=8, seed=0, prune_frac=prune_frac)
    origins, dirs = make_rays(24, seed=1)
    ref_rgb = _ref_render(g, origins, dirs, **_neutralize_fake(g))
    gj = grid_to_jax(g, jnp.float64)
    opt = at.RenderOptions(**BASE_OPT)
    got = _jax_render(gj, origins, dirs, opt)
    np.testing.assert_allclose(got, ref_rgb, rtol=1e-5, atol=1e-5)


def test_rgb_matches_oracle_fake_off():
    """TRUE fake-off path vs the oracle (possible since ref_oracle patches
    the oracle's use-before-assign at svox2.py:2550 in memory). Note the
    oracle never implements only_outward_intersect (kernel-only flag), so
    both sides run with it off."""
    g = make_ref_grid(reso=8, seed=4, prune_frac=0.2)
    origins, dirs = make_rays(24, seed=5)
    ref_rgb = _ref_render(
        g, origins, dirs, surf_fake_sample=False, limited_fake_sample=False
    )
    gj = grid_to_jax(g, jnp.float64)
    opt = at.RenderOptions(
        **BASE_OPT, surf_fake_sample=False, only_outward_intersect=False
    )
    got = _jax_render(gj, origins, dirs, opt)
    np.testing.assert_allclose(got, ref_rgb, rtol=1e-5, atol=1e-5)


def test_rgb_matches_oracle_fake_samples():
    g = make_ref_grid(reso=8, seed=2)
    import torch

    g.fake_sample_std = torch.nn.Parameter(torch.tensor([[0.25]]).double())
    gj = grid_to_jax(g, jnp.float64)
    origins, dirs = make_rays(24, seed=3)
    ref_rgb = _ref_render(
        g, origins, dirs, surf_fake_sample=True, limited_fake_sample=False
    )
    opt = at.RenderOptions(
        **BASE_OPT,
        surf_fake_sample=True,
        limited_fake_sample=False,
        surf_fake_sample_min_vox_len=0.0,
    )
    got = _jax_render(gj, origins, dirs, opt)
    np.testing.assert_allclose(got, ref_rgb, rtol=1e-5, atol=1e-5)


def test_rgb_matches_oracle_truncated():
    g = make_ref_grid(reso=8, seed=4)
    g.truncated_vol_render_a = 2.5
    origins, dirs = make_rays(24, seed=5)
    ref_rgb = _ref_render(
        g, origins, dirs, truncated_vol_render=True, trunc_vol_weight_min=1e-10,
        **_neutralize_fake(g),
    )
    gj = grid_to_jax(g, jnp.float64)
    opt = at.RenderOptions(
        **BASE_OPT, truncated_vol_render=True, trunc_vol_weight_min=1e-10
    )
    got = _jax_render(gj, origins, dirs, opt)
    np.testing.assert_allclose(got, ref_rgb, rtol=1e-5, atol=1e-5)


def test_gradients_match_oracle():
    """The gradcheck contract: d(sum rgb)/d{density, sh, surface}."""
    g = make_ref_grid(reso=8, seed=6)
    origins, dirs = make_rays(16, seed=7)
    ref_rgb, ref_gd, ref_gsh, ref_gsurf = _ref_render(
        g, origins, dirs, want_grads=True, **_neutralize_fake(g)
    )
    gj = grid_to_jax(g, jnp.float64)
    opt = at.RenderOptions(**BASE_OPT)
    val, (gd, gsh, gsurf) = _jax_render_grads(gj, origins, dirs, opt)
    np.testing.assert_allclose(float(val), float(ref_rgb.sum()), rtol=1e-6)
    np.testing.assert_allclose(gd, ref_gd, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gsh, ref_gsh, rtol=1e-4, atol=1e-6)
    # surface gradients flow through the cubic root (implicit fn) — the
    # numerically delicate path; the reference itself only guarantees sign
    # agreement on hard rays (test_render_gradcheck_surface.py:137-138),
    # but in f64 with random smooth fields we can compare tightly.
    np.testing.assert_allclose(gsurf, ref_gsurf, rtol=1e-3, atol=1e-5)


def test_f32_close_to_f64():
    """Production dtype sanity: f32 render close to f64, grads finite."""
    g = make_ref_grid(reso=8, seed=8)
    gj64 = grid_to_jax(g, jnp.float64)
    gj32 = grid_to_jax(g, jnp.float32)
    origins, dirs = make_rays(32, seed=9)
    opt = at.RenderOptions(**BASE_OPT)
    rgb64 = _jax_render(gj64, origins, dirs, opt)
    rays32 = at.Rays(jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32))
    rgb32 = np.asarray(at.volume_render_surface(gj32, rays32, opt)["rgb"])
    np.testing.assert_allclose(rgb32, rgb64, rtol=5e-3, atol=5e-3)

    def loss_fn(surface):
        out = at.volume_render_surface(
            gj32.replace(surface_data=surface), rays32, opt
        )
        return jnp.sum(out["rgb"])

    gs = jax.grad(loss_fn)(gj32.surface_data)
    assert np.all(np.isfinite(np.asarray(gs)))


def test_dense_walk_f32_loses_no_crossings():
    """f32 dense-walk regression (round 4): the on-plane band of
    dda.next_crossing must scale with |pos| or f32 roundoff stalls the walk
    at planes until the scan budget runs out — ~6% of rays of this scene
    rendered pure background while the packed renderer (and the f64 walk)
    found their intersections."""
    import jax.numpy as jnp

    from alphasurf_tpu.data.synthetic import make_gt_grid, pose_spherical
    from alphasurf_tpu.render.surface import (
        volume_render_surface,
        volume_render_surface_packed,
    )

    g = make_gt_grid(reso=32)
    cam = at.Camera.make(
        pose_spherical(0.0, 0.0, 2.5), fx=60.0, width=48, height=48
    )
    rays = cam.gen_rays()
    rays = at.Rays(
        rays.origins.astype(jnp.float32), rays.dirs.astype(jnp.float32)
    )
    opt = at.RenderOptions(
        sigma_thresh=-1e9, stop_thresh=-1.0, only_outward_intersect=True
    )
    dense = np.asarray(volume_render_surface(g, rays, opt)["rgb"])
    packed = np.asarray(
        volume_render_surface_packed(g, rays, opt, entries_per_ray=16.0)["rgb"]
    )
    bad = (np.abs(dense - packed).max(-1) > 1e-3).sum()
    assert bad == 0, f"{bad} rays lost crossings in the f32 dense walk"
