"""Extended train-step coverage: learned basis (MLP + 3D texture), MSI
background, and the extended regularizer set all live inside one jitted
step and actually update their parameters."""
import jax
import jax.numpy as jnp
import numpy as np

import alphasurf_tpu as at
from alphasurf_tpu import defs
from alphasurf_tpu.core import sh as shmod
from alphasurf_tpu.core.rays import Rays
from alphasurf_tpu.train.steps import HParams, StepConfig, init_rms, make_surface_step


def _rays(n=64, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -d * 2.0
    return Rays(jnp.asarray(o), jnp.asarray(d)), jnp.asarray(
        rng.random((n, 3)).astype(np.float32)
    )


def _grid(basis):
    g = at.create_grid(
        reso=16,
        basis_dim=4,
        surface_type=defs.SURFACE_TYPE_SDF,
        surface_init="single_sphere",
        trainable_fake_sample_std=True,
    )
    # nonzero SH so the basis gradient (∝ sh coefficients) is nonzero
    g = g.replace(
        sh_data=jax.random.normal(jax.random.PRNGKey(3), g.sh_data.shape,
                                  g.sh_data.dtype) * 0.1
    )
    if basis == "mlp":
        g = g.replace(
            basis_mlp=shmod.init_basis_mlp(jax.random.PRNGKey(0), 4),
            basis_type=defs.BASIS_TYPE_MLP,
        )
    elif basis == "tex":
        g = g.replace(
            basis_data=shmod.reinit_learned_bases(8, 4, "sh"),
            basis_type=defs.BASIS_TYPE_3D_TEXTURE,
        )
    # tiny MSI background
    R = 8
    bg_links = jnp.arange(2 * R * R, dtype=jnp.int32).reshape(2 * R, R)
    bg_data = jnp.full((2 * R * R, 2, 4), 0.1, jnp.float32)
    return g.replace(background_links=bg_links, background_data=bg_data)


def test_step_trains_basis_and_background():
    for basis in ("mlp", "tex"):
        grid = _grid(basis)
        rms = init_rms(grid)
        cfg = StepConfig(
            opt=at.RenderOptions(),
            renderer="dense",
            max_voxels=24,
            use_norm_match=True,
            use_viscosity=True,
            use_sign_change=True,
            use_lumisphere_tv=True,
        )
        step = make_surface_step(cfg)
        rays, rgb_gt = _rays()
        hp = HParams(
            lr_alpha=jnp.float32(1e-2),
            lr_surface=jnp.float32(1e-2),
            lr_sh=jnp.float32(1e-2),
            lr_basis=jnp.float32(1e-2),
            lr_background=jnp.float32(1e-2),
            lambda_tv_background=jnp.float32(1e-2),
            lambda_tv_background_density=jnp.float32(1e-2),
            lambda_tv_basis=jnp.float32(1e-2),
            lambda_l2_color=jnp.float32(1e-3),
            lambda_norm_match=jnp.float32(1e-3),
            lambda_viscosity=jnp.float32(1e-3),
            lambda_sign_change=jnp.float32(1e-3),
            lambda_tv_lumisphere=jnp.float32(1e-3),
        )
        old_bg = np.asarray(grid.background_data).copy()
        if basis == "mlp":
            old_b = np.asarray(grid.basis_mlp["w1"]).copy()
        else:
            old_b = np.asarray(grid.basis_data).copy()
        g2, rms2, stats = step(grid, rms, rays, rgb_gt, hp, jax.random.PRNGKey(1))
        assert np.isfinite(float(stats["loss"]))
        assert np.isfinite(np.asarray(g2.surface_data)).all()
        # background must move (TV reg guarantees nonzero grad)
        assert np.abs(np.asarray(g2.background_data) - old_bg).max() > 0
        if basis == "mlp":
            assert np.abs(np.asarray(g2.basis_mlp["w1"]) - old_b).max() > 0
        else:
            assert np.abs(np.asarray(g2.basis_data) - old_b).max() > 0
        # second step re-uses the jit cache (pytree structure is stable)
        g3, _, stats2 = step(g2, rms2, rays, rgb_gt, hp, jax.random.PRNGKey(2))
        assert np.isfinite(float(stats2["loss"]))
