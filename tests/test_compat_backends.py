"""nvol / svox1 compat backends and the extra depth/alpha render outputs."""
import jax
import jax.numpy as jnp
import numpy as np

import alphasurf_tpu as at
from alphasurf_tpu import defs
from alphasurf_tpu.core.rays import Rays


def _scene(reso=24, sigma=30.0):
    """Dense grid with an opaque centered ball (sigma high inside)."""
    g = at.create_grid(reso=reso, basis_dim=1, init_sigma=0.0)
    idx = np.arange(reso, dtype=np.float32)
    X, Y, Z = np.meshgrid(idx, idx, idx, indexing="ij")
    r = np.sqrt((X - reso / 2) ** 2 + (Y - reso / 2) ** 2 + (Z - reso / 2) ** 2)
    dens = np.where(r < reso / 4, sigma, 0.0).reshape(-1, 1).astype(np.float32)
    sh = np.zeros((reso**3, 3), np.float32)
    sh[:, 0] = 0.8  # reddish DC
    return g.replace(
        density_data=jnp.asarray(dens), sh_data=jnp.asarray(sh)
    )


def _rays(n=32):
    rng = np.random.default_rng(0)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(jnp.asarray(-d * 2.0), jnp.asarray(d))


def test_nvol_hits_and_misses():
    g = _scene()
    rays = _rays()
    opt = at.RenderOptions(step_size=0.5, sigma_thresh=1e-8)
    out = at.volume_render_nvol(g, rays, opt)
    rgb = np.asarray(out["rgb"])
    assert np.isfinite(rgb).all()
    # opaque ball: total_alpha saturates at 1, red channel ~ sh*c0+0.5
    a = np.asarray(out["alpha"])
    assert (a > 0.99).all()
    assert (rgb[:, 0] > rgb[:, 1] + 0.1).all()
    # miss rays get pure background
    miss = Rays(jnp.asarray([[5.0, 5.0, 5.0]], jnp.float32),
                jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32))
    out2 = at.volume_render_nvol(g, miss, opt)
    np.testing.assert_allclose(
        np.asarray(out2["rgb"])[0], opt.background_brightness, atol=1e-5
    )


def test_svox1_close_to_cuvol_on_smooth_scene():
    g = _scene()
    rays = _rays()
    opt = at.RenderOptions(step_size=0.25, sigma_thresh=1e-8)
    o1 = at.volume_render_svox1(g, rays, opt)
    o2 = at.volume_render_cuvol(g, rays, opt)
    # nn vs trilerp on a piecewise-constant ball: same saturated color
    np.testing.assert_allclose(
        np.asarray(o1["rgb"]), np.asarray(o2["rgb"]), atol=0.08
    )
    # differentiable
    gr = jax.grad(
        lambda s: jnp.sum(at.volume_render_svox1(g.replace(sh_data=s), rays, opt)["rgb"])
    )(g.sh_data)
    assert float(jnp.abs(gr).sum()) > 0


def test_backend_dispatch():
    g = _scene()
    rays = _rays(8)
    opt = at.RenderOptions(step_size=0.5)
    for name in ("cuvol", "nvol", "svox1"):
        out = at.volume_render(g, rays, opt, backend=name)
        assert np.isfinite(np.asarray(out["rgb"])).all()
    try:
        at.volume_render(g, rays, opt, backend="nope")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_surface_depth_modes_and_alpha():
    g = at.create_grid(
        reso=16, basis_dim=1, surface_type=defs.SURFACE_TYPE_SDF,
        surface_init="single_sphere",
    )
    g = g.replace(surface_data=-g.surface_data,
                  density_data=jnp.full_like(g.density_data, 5.0))
    rays = Rays(jnp.asarray([[0.0, 0.0, -2.0]], jnp.float32),
                jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32))
    opt = at.RenderOptions(sigma_thresh=-1e9, stop_thresh=-1.0,
                           only_outward_intersect=True)
    out = at.volume_render_surface(g, rays, opt, cache_size=16)
    # mode depth = t of max-weight sample: first surface hit (alpha ~ 1)
    d_exp = float(out["depth"][0] / (1 - np.exp(out["log_transmit"][0])))
    d_mode = float(out["depth_mode"][0])
    d_med = float(out["depth_med"][0])
    assert abs(d_mode - d_exp) < 1.0  # grid units
    assert abs(d_med - d_mode) < 1.0
    a = float(out["alpha"][0])
    assert 0.0 < a <= 1.0
    np.testing.assert_allclose(a, 1 - np.exp(float(out["log_transmit"][0])), rtol=1e-6)
