"""Regularizer losses vs the reference's Python gradcheck twins."""
import jax
import jax.numpy as jnp
import numpy as np

import alphasurf_tpu as at
from alphasurf_tpu.losses import reg
from ref_oracle import grid_to_jax, make_ref_grid


def _cells(g, n=64, seed=0):
    # contiguous window: the production sampling (reg.sample_cells mirrors
    # svox2.py:6335 contiguous=True) and the contract of the scatter-free
    # reg VJP (core.grid.fetch_links_contiguous)
    rng = np.random.default_rng(seed)
    total = int(np.prod(g.links.shape))
    start = int(rng.integers(0, total - n))
    return (start + np.arange(n)).astype(np.int64)


def test_normal_loss_matches_twin():
    import torch

    g = make_ref_grid(reso=8, seed=0, prune_frac=0.2)
    gj = grid_to_jax(g, jnp.float64)
    cells = _cells(g)
    for con, ign, l1 in [(True, False, False), (False, True, True), (True, True, False)]:
        if g.surface_data.grad is not None:
            g.surface_data.grad = None
        ref_loss = g._surface_normal_loss_grad_check(
            torch.from_numpy(cells), 1.0, device="cpu",
            connectivity_check=con, ignore_empty=ign, use_l1=l1,
        )
        ref_grad = g.surface_data.grad.numpy().copy()

        def loss_fn(surf):
            return reg.surface_normal_loss(
                gj.replace(surface_data=surf), jnp.asarray(cells, jnp.int32),
                connectivity_check=con, ignore_empty=ign, use_l1=l1,
            )

        val, grad = jax.value_and_grad(loss_fn)(gj.surface_data)
        np.testing.assert_allclose(float(val), float(ref_loss), rtol=1e-6)
        # reference twin computes in f32; ours in f64 -> absolute slack
        np.testing.assert_allclose(np.asarray(grad), ref_grad, rtol=1e-4, atol=1e-7)


def test_sparsify_loss_matches_twin():
    import torch

    g = make_ref_grid(reso=8, seed=1, prune_frac=0.1)
    gj = grid_to_jax(g, jnp.float64)
    cells = _cells(g, seed=2)
    for p in (g.density_data, g.surface_data):
        if p.grad is not None:
            p.grad = None
    ref_loss = g._alpha_surf_sparsify_grad_check(
        torch.from_numpy(cells), 0.7, 0.3, True, 0.15, device="cpu"
    )
    ref_gd = g.density_data.grad.numpy().copy()
    ref_gs = g.surface_data.grad.numpy().copy()

    def loss_fn(density, surf):
        return reg.alpha_surf_sparsify_loss(
            gj.replace(density_data=density, surface_data=surf),
            jnp.asarray(cells, jnp.int32), 0.7, 0.3, True, 0.15,
        )

    val, (gd, gs) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        gj.density_data, gj.surface_data
    )
    np.testing.assert_allclose(float(val), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gd), ref_gd, rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gs), ref_gs, rtol=1e-5, atol=1e-10)


def test_tv_loss_basic():
    """Linear field in x: TV per cell = sqrt(1e-5 + slope^2)."""
    g = at.create_grid(8, surface_type=at.defs.SURFACE_TYPE_SDF)
    X = np.zeros((8, 8, 8, 1), np.float64)
    X[..., 0] = np.arange(8)[:, None, None] * 0.5
    gj = g.replace(density_data=jnp.asarray(X.reshape(-1, 1)))
    cells = jnp.asarray(np.arange(7 * 8 * 8), jnp.int32)  # x < 7 region
    val = reg.tv_loss(gj, gj.density_data, cells)
    np.testing.assert_allclose(float(val), np.sqrt(1e-5 + 0.25), rtol=1e-6)

    grad = jax.grad(lambda d: reg.tv_loss(gj.replace(density_data=d), d, cells))(
        gj.density_data
    )
    assert np.all(np.isfinite(np.asarray(grad)))


def test_eikonal_loss_unit_gradient_field():
    g = at.create_grid(8, surface_type=at.defs.SURFACE_TYPE_SDF)
    X = np.zeros((8, 8, 8, 1), np.float64)
    X[..., 0] = np.arange(8)[:, None, None]  # |grad| = 1 in x
    gj = g.replace(surface_data=jnp.asarray(X.reshape(-1, 1)))
    cells = jnp.asarray(np.arange(7 * 8 * 8), jnp.int32)
    val = reg.surface_eikonal_loss(gj, cells, target=1.0)
    np.testing.assert_allclose(float(val), 0.0, atol=1e-10)
