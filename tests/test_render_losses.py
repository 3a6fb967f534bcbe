"""Streaming loss accumulators vs the full-cache (oracle-shaped) versions."""
import jax.numpy as jnp
import numpy as np

import alphasurf_tpu as at
from alphasurf_tpu.losses import render_losses as rl
from ref_oracle import grid_to_jax, make_ref_grid, make_rays


def _render(opt_kw=None, cache_size=None):
    g = make_ref_grid(reso=8, seed=11)
    gj = grid_to_jax(g, jnp.float64)
    origins, dirs = make_rays(24, seed=12)
    rays = at.Rays(jnp.asarray(origins, jnp.float64), jnp.asarray(dirs, jnp.float64))
    opt = at.RenderOptions(
        sigma_thresh=-1e9, stop_thresh=-1.0, **(opt_kw or {})
    )
    return at.volume_render_surface(
        gj, rays, opt, return_samples=True, cache_size=cache_size
    )


def test_streaming_matches_cache_losses():
    out = _render(
        dict(surf_fake_sample=True, limited_fake_sample=False,
             surf_fake_sample_min_vox_len=0.0)
    )
    s = out["samples"]
    ray = out["ray_losses"]
    np.testing.assert_allclose(
        float(rl.l_dist(s, include_fake=True)),
        float(rl.l_dist_from_ray_losses(ray, alphas=True)),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        float(rl.l_entropy(s, include_fake=True)),
        float(rl.l_entropy_from_ray_losses(ray, alphas=False)),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        float(rl.l_sparsity(s)),
        float(rl.l_sparsity_from_ray_losses(ray)),
        rtol=1e-7,
    )


def test_bounded_cache_matches_full_when_large():
    out = _render(cache_size=256)
    s = out["samples"]
    c = out["cache"]
    # both compute the same conv-mode / samp-dist losses when K exceeds the
    # per-ray sample count
    np.testing.assert_allclose(
        float(rl.l_conv_mode_samp(s)),
        float(rl.l_conv_mode_samp_from_cache(c)),
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        float(rl.l_samp_dist(s)),
        float(rl.l_samp_dist_from_cache(c)),
        rtol=1e-7, atol=1e-10,
    )
    # cache counts match the number of valid samples
    np.testing.assert_array_equal(
        np.asarray(c["n_cached"]), np.asarray(s["valid"].sum(-1))
    )
