"""Capacity-scaled regularizer sampling (losses/reg.py round-4 redesign):
``sample_present_cells`` windows must reproduce the reference's
lattice-window sums (empties contribute nothing — loss_kernel.cu:747 skips
them), with ``present_norm_scale`` restoring the per-lattice-cell
normalization of svox2.py:6335's sparse_frac sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from alphasurf_tpu import defs
from alphasurf_tpu.core.grid import create_grid
from alphasurf_tpu.losses import reg


def _pruned_grid(reso=12, seed=0, keep_frac=0.4):
    g = create_grid(reso, surface_type=defs.SURFACE_TYPE_SDF, surface_init="sphere")
    rng = np.random.default_rng(seed)
    keep = rng.random(g.links.size) < keep_frac
    links = np.full(g.links.size, -1, np.int32)
    links[keep] = np.arange(int(keep.sum()), dtype=np.int32)
    dens = jnp.asarray(rng.normal(size=(int(keep.sum()), 1)).astype(np.float32))
    surf = jnp.asarray(rng.normal(size=(int(keep.sum()), 1)).astype(np.float32))
    sh = jnp.asarray(rng.normal(size=(int(keep.sum()), g.sh_data.shape[1])).astype(np.float32))
    return g.replace(
        links=jnp.asarray(links.reshape(g.reso)),
        density_data=dens, surface_data=surf, sh_data=sh,
    )


def test_row_coords_of_inverts_links():
    g = _pruned_grid()
    rc = np.asarray(reg.row_coords_of(g))
    links = np.asarray(g.links)
    for j in [0, 1, g.capacity // 2, g.capacity - 1]:
        x, y, z = rc[j]
        assert links[x, y, z] == j


def test_present_window_matches_lattice_window_sum():
    g = _pruned_grid()
    rc = reg.row_coords_of(g)
    key = jax.random.PRNGKey(3)
    frac = 0.2
    cells_p = reg.sample_present_cells(key, g, rc, frac)
    K = cells_p.shape[0]
    assert K == max(1, int(frac * g.capacity))

    # all sampled cells are present, in flat order
    flat_links = np.asarray(g.links).reshape(-1)
    lp = flat_links[np.asarray(cells_p)]
    assert (lp >= 0).all()
    assert (np.diff(np.asarray(cells_p)) > 0).all()

    # the covering lattice window contains exactly the same present cells.
    # Loss VALUES can differ by a constant floor (empty cells contribute
    # sqrt(1e-5) to the TV value but ZERO gradient — and the reference's
    # kernels skip empties entirely, loss_kernel.cu:747), so the contract
    # is GRADIENT-sum equality: grad(mean_lattice) * N == grad(mean_present) * K.
    lo, hi = int(cells_p[0]), int(cells_p[-1])
    cells_l = jnp.arange(lo, hi + 1, dtype=jnp.int32)
    N = hi + 1 - lo

    def gradsum(loss_fn, cells, count):
        def f(dens, surf):
            gg = g.replace(density_data=dens, surface_data=surf)
            return loss_fn(gg, cells) * count
        return jax.grad(f, argnums=(0, 1))(g.density_data, g.surface_data)

    for loss_fn in (
        lambda g, c: reg.tv_loss(g, g.density_data, c),
        lambda g, c: reg.surface_tv_loss(g, c),
        lambda g, c: reg.surface_normal_loss(g, c, True, False, use_l1=True),
        lambda g, c: reg.alpha_surf_sparsify_loss(g, c, 1.0, 0.0),
    ):
        gp = gradsum(loss_fn, cells_p, K)
        gl = gradsum(loss_fn, cells_l, N)
        for a, b in zip(gp, gl):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
            )


def _morton_key(x, y, z, bits=4):
    k = 0
    for b in range(bits):
        k |= ((x >> b) & 1) << (3 * b + 2)
        k |= ((y >> b) & 1) << (3 * b + 1)
        k |= ((z >> b) & 1) << (3 * b)
    return k


def test_present_windows_partition_morton_ordered_links():
    """Round-4 verdict weak #7: for IMPORTED checkpoints the packed rows may
    be Morton-ordered, so a contiguous packed-row window is not a lattice
    window. The invariant that holds for ANY link numbering — and what makes
    the sampling unbiased — is that disjoint packed-row windows PARTITION
    the present set: window gradient-sums add up to the full present-set
    gradient-sum (each present cell appears in exactly one window)."""
    g = _pruned_grid(reso=12, seed=7, keep_frac=0.35)
    # renumber links by Morton rank of the kept cells (svox2 grids built by
    # its own resample are z-curve-ish, not flat-ordered)
    links = np.asarray(g.links)
    xs, ys, zs = np.nonzero(links >= 0)
    order = np.argsort([_morton_key(x, y, z) for x, y, z in zip(xs, ys, zs)])
    new_links = np.full(links.shape, -1, np.int32)
    new_links[xs[order], ys[order], zs[order]] = np.arange(
        len(order), dtype=np.int32)
    rng = np.random.default_rng(8)
    g = g.replace(
        links=jnp.asarray(new_links),
        density_data=jnp.asarray(
            rng.normal(size=(len(order), 1)).astype(np.float32)),
        surface_data=jnp.asarray(
            rng.normal(size=(len(order), 1)).astype(np.float32)),
    )
    rc = reg.row_coords_of(g)

    # row_coords_of must invert Morton links too
    for j in [0, 1, g.capacity // 3, g.capacity - 1]:
        x, y, z = np.asarray(rc[j])
        assert new_links[x, y, z] == j

    # sample_present_cells: correct count, all present, under Morton links
    cells = reg.sample_present_cells(jax.random.PRNGKey(0), g, rc, 0.25)
    assert cells.shape[0] == max(1, int(0.25 * g.capacity))
    assert (np.asarray(new_links).reshape(-1)[np.asarray(cells)] >= 0).all()

    # partition property: disjoint windows of rc tile [0, capacity) — their
    # gradient-sums must add to the all-present-cells gradient-sum
    X, Y, Z = g.reso

    def window_cells(j0, K):
        c = jax.lax.dynamic_slice_in_dim(rc, j0, K, axis=0)
        return (c[:, 0] * Y + c[:, 1]) * Z + c[:, 2]

    def gradsum(cells, count):
        def f(dens, surf):
            gg = g.replace(density_data=dens, surface_data=surf)
            return (reg.tv_loss(gg, gg.density_data, cells)
                    + reg.surface_tv_loss(gg, cells)) * count
        return jax.grad(f, argnums=(0, 1))(g.density_data, g.surface_data)

    K = g.capacity // 4
    parts = []
    j0 = 0
    while j0 < g.capacity:
        k = min(K, g.capacity - j0)
        parts.append(gradsum(window_cells(j0, k), k))
        j0 += k
    total = [sum(np.asarray(p[i]) for p in parts) for i in range(2)]
    all_present = jnp.asarray(
        np.flatnonzero(np.asarray(new_links).reshape(-1) >= 0), jnp.int32)
    full = gradsum(all_present, all_present.shape[0])
    for a, b in zip(total, full):
        np.testing.assert_allclose(a, np.asarray(b), rtol=2e-5, atol=1e-6)


def test_sparsify_empty_cells_differ_documented():
    # alpha_surf_sparsify contributes log(sigmoid(0)) for EMPTY lattice
    # cells in the reference twin (svox2.py:5037) — the present-only window
    # cannot see empties, so the sparsify sums differ by exactly
    # n_empty * log(0.5) * scale_alpha. Document the constant offset.
    g = _pruned_grid()
    rc = reg.row_coords_of(g)
    cells_p = reg.sample_present_cells(jax.random.PRNGKey(5), g, rc, 0.3)
    lo, hi = int(cells_p[0]), int(cells_p[-1])
    cells_l = jnp.arange(lo, hi + 1, dtype=jnp.int32)
    n_lattice = hi + 1 - lo
    n_empty = n_lattice - cells_p.shape[0]
    sum_p = float(reg.alpha_surf_sparsify_loss(g, cells_p, 2.0, 0.0)) * cells_p.shape[0]
    sum_l = float(reg.alpha_surf_sparsify_loss(g, cells_l, 2.0, 0.0)) * n_lattice
    np.testing.assert_allclose(
        sum_l - sum_p, n_empty * 2.0 * np.log(0.5), rtol=1e-5
    )


def test_voxel_occupancy_scatter_path_matches_gather_path():
    """voxel_occupancy(grid, opt, row_coords) (capacity-scatter dense-field
    build) must equal the reso^3-gather path bit for bit."""
    from alphasurf_tpu.core.options import RenderOptions
    from alphasurf_tpu.render.surface import voxel_occupancy

    for st, init in [
        (defs.SURFACE_TYPE_SDF, "sphere"),
        (defs.SURFACE_TYPE_UDF, "sphere"),
        (defs.SURFACE_TYPE_UDF_ALPHA, "single_lv"),
    ]:
        g = _pruned_grid(reso=10, seed=st, keep_frac=0.5)
        base = create_grid(10, surface_type=st, surface_init=init)
        g = g.replace(
            surface_data=base.surface_data[: g.capacity]
            if st != defs.SURFACE_TYPE_UDF_ALPHA else g.surface_data,
            level_set_data=base.level_set_data,
            density_data=g.density_data
            if st != defs.SURFACE_TYPE_UDF_ALPHA
            else jnp.ones((base.level_set_data.shape[0], 1), jnp.float32),
            surface_type=st,
        )
        rc = reg.row_coords_of(g)
        for opt in (
            RenderOptions(sigma_thresh=0.0),
            RenderOptions(sigma_thresh=-1e9, surf_fake_sample=True),
            RenderOptions(sigma_thresh=-1e9, surf_fake_sample=True,
                          limited_fake_sample=True),
        ):
            a = np.asarray(voxel_occupancy(g, opt))
            b = np.asarray(voxel_occupancy(g, opt, rc))
            np.testing.assert_array_equal(a, b, err_msg=f"type={st} opt={opt}")


def test_step_with_row_coords_runs_and_matches_scaleless_gradient_path():
    """The full surface step with row_coords: finite stats, params move,
    and the reg gradients stay nonzero (the reg terms are actually live)."""
    from alphasurf_tpu.core.options import RenderOptions
    from alphasurf_tpu.core.rays import Camera
    from alphasurf_tpu.data.synthetic import make_gt_grid, pose_spherical
    from alphasurf_tpu.train.steps import HParams, StepConfig, init_rms, make_surface_step

    g = make_gt_grid(reso=16)
    g = g.replace(fake_sample_std=jnp.array([[0.1]], jnp.float32))
    rc = reg.row_coords_of(g)
    cam = Camera.make(pose_spherical(30.0, 20.0, 2.7), fx=40.0, width=32, height=32)
    rays = cam.gen_rays()
    opt = RenderOptions(sigma_thresh=-1e9, stop_thresh=1e-7,
                        only_outward_intersect=True)
    cfg = StepConfig(opt=opt, cache_size=None, renderer="packed",
                     entries_per_ray=16.0, tv_sparsity=0.2,
                     tv_surface_sparsity=0.2, norm_surface_sparsity=0.2)
    step = make_surface_step(cfg)
    hp = HParams(lr_alpha=1e-2, lr_surface=1e-3, lr_sh=1e-2,
                 lambda_tv_alpha=1e-3, lambda_tv_surface=1e-3,
                 lambda_normal_l1=1e-4, lambda_l_entropy=1e-4)
    gt = jnp.full((rays.origins.shape[0], 3), 0.5, jnp.float32)
    g0_surf = np.asarray(g.surface_data).copy()
    g2, rms2, stats = step(g, init_rms(g), rays, gt, hp,
                           jax.random.PRNGKey(0), row_coords=rc)
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(np.asarray(g2.surface_data)).all()
    assert np.abs(np.asarray(g2.surface_data) - g0_surf).max() > 0


def test_dense_reg_matches_full_lattice_sampling():
    """surface_tv_loss_dense / surface_normal_loss_dense == the sampled
    versions evaluated over EVERY lattice cell (the recipe's sparsity=1),
    in both value and gradients."""
    g = _pruned_grid(reso=10, seed=2, keep_frac=0.5)
    rc = reg.row_coords_of(g)
    all_cells = jnp.arange(g.links.size, dtype=jnp.int32)

    for dense_fn, samp_fn in [
        (lambda gg: reg.surface_tv_loss_dense(gg, rc, alpha_weighted=False),
         lambda gg: reg.surface_tv_loss(gg, all_cells, alpha_weighted=False)),
        (lambda gg: reg.surface_tv_loss_dense(gg, rc, alpha_weighted=True),
         lambda gg: reg.surface_tv_loss(gg, all_cells, alpha_weighted=True)),
        (lambda gg: reg.surface_normal_loss_dense(gg, rc, True, False, True),
         lambda gg: reg.surface_normal_loss(gg, all_cells, True, False, True)),
        (lambda gg: reg.surface_normal_loss_dense(gg, rc, False, True, False),
         lambda gg: reg.surface_normal_loss(gg, all_cells, False, True, False)),
    ]:
        def with_params(fn):
            def f(surf, dens):
                gg = g.replace(surface_data=surf, density_data=dens)
                return fn(gg)
            return f

        vd, gd = jax.value_and_grad(with_params(dense_fn), argnums=(0, 1))(
            g.surface_data, g.density_data)
        vs, gs = jax.value_and_grad(with_params(samp_fn), argnums=(0, 1))(
            g.surface_data, g.density_data)
        np.testing.assert_allclose(float(vd), float(vs), rtol=1e-5, atol=1e-7)
        for a, b in zip(gd, gs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_dense_reg_slab_chunking(monkeypatch):
    """Multi-chunk slab scan == single chunk (tiny slab forces 3+ chunks)."""
    g = _pruned_grid(reso=13, seed=4, keep_frac=0.5)
    rc = reg.row_coords_of(g)

    def vals():
        return (
            float(reg.surface_tv_loss_dense(g, rc)),
            float(reg.surface_tv_loss_dense(g, rc, alpha_weighted=True)),
            float(reg.surface_normal_loss_dense(g, rc, True, False, True)),
            float(reg.surface_normal_loss_dense(g, rc, False, True, False)),
        )

    ref = vals()
    monkeypatch.setattr(reg, "_SLAB", 4)
    chunked = vals()
    np.testing.assert_allclose(chunked, ref, rtol=1e-5)  # f32 sum-order
