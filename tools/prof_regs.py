"""Bisect the train-step overhead: time fwd+bwd+rmsprop with regularizer
groups enabled one at a time.  Usage: python tools/prof_regs.py [reso]"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import alphasurf_tpu as at
    from alphasurf_tpu.losses import reg
    from alphasurf_tpu.losses import render_losses as rl
    from alphasurf_tpu.optim.rmsprop import rmsprop_step
    from alphasurf_tpu.render import surface as S
    from alphasurf_tpu.train.steps import init_rms
    from bench import build_bench_grid, device_rays

    reso = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = 40960
    epr = 6.0

    grid, occf, row_coords = build_bench_grid(reso)
    origins_all, dirs_all = device_rays(800, 800, fx=880.0)
    mid = origins_all.shape[0] // 2 - batch // 2
    origins = jax.lax.dynamic_slice_in_dim(origins_all, mid, batch)
    dirs = jax.lax.dynamic_slice_in_dim(dirs_all, mid, batch)
    rays = at.Rays(origins, dirs)
    jax.block_until_ready(grid.density_data)

    opt = at.RenderOptions(
        sigma_thresh=-1e9, stop_thresh=1e-7, only_outward_intersect=True,
        surf_fake_sample=True, limited_fake_sample=True,
        truncated_vol_render=True,
    )
    occ = jax.jit(S.voxel_occupancy, static_argnums=1)(grid, opt, row_coords)
    gt = jnp.full((batch, 3), 0.5, jnp.float32)
    key = jax.random.PRNGKey(0)
    rms = init_rms(grid)

    def make_step(which):
        @jax.jit
        def step(grid, rms):
            ks = jax.random.split(key, 6)

            def loss_fn(dd, sh, sf):
                g = grid.replace(density_data=dd, sh_data=sh, surface_data=sf)
                out = S.volume_render_surface_packed(
                    g, rays, opt, entries_per_ray=epr, occupancy=occ,
                    coarse_factor=8, supers_per_ray=epr,
                )
                loss = jnp.mean((out["rgb"] - gt) ** 2)
                if "raylosses" in which:
                    ray_l = out["ray_losses"]
                    loss += 1e-4 * rl.l_entropy_from_ray_losses(ray_l, alphas=False)
                    loss += 1e-4 * rl.l_dist_from_ray_losses(ray_l, alphas=False)
                    loss += 1e-5 * rl.l_inward_norm_from_ray_losses(ray_l)
                if "tv" in which:
                    cells = reg.sample_cells(ks[0], g, 0.01)
                    loss += 1e-5 * reg.tv_loss(g, dd, cells)
                    cells2 = reg.sample_cells(ks[1], g, 0.01)
                    loss += 1e-5 * reg.tv_loss(g, sh, cells2)
                    cells3 = reg.sample_cells(ks[2], g, 0.01)
                    loss += 1e-3 * reg.surface_tv_loss(g, cells3, alpha_weighted=False)
                if "normal" in which:
                    cells = reg.sample_cells(ks[3], g, 0.01)
                    loss += 1e-6 * reg.surface_normal_loss(g, cells, False, False, use_l1=True)
                if "sparsify" in which:
                    cells = reg.sample_cells(ks[4], g, 0.01)
                    loss += reg.alpha_surf_sparsify_loss(g, cells, 1e-6, 1e-6, True, 0.1)
                    loss += 1e-6 * reg.surface_eikonal_loss(g, cells)
                return loss

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
                grid.density_data, grid.sh_data, grid.surface_data)
            if "rms" in which:
                nd, rd = rmsprop_step(grid.density_data, rms["density"], grads[0], 1e-3, 0.95)
                ns, rs = rmsprop_step(grid.sh_data, rms["sh"], grads[1], 1e-3, 0.95)
                nf, rf = rmsprop_step(grid.surface_data, rms["surface"], grads[2], 1e-5, 0.95)
                return loss, (nd, ns, nf)
            return loss, grads

        return step

    variants = [
        ("mse", ()),
        ("mse+rms", ("rms",)),
        ("mse+rms+raylosses", ("rms", "raylosses")),
        ("mse+rms+tv", ("rms", "tv")),
        ("mse+rms+normal", ("rms", "normal")),
        ("mse+rms+sparsify", ("rms", "sparsify")),
        ("ALL", ("rms", "raylosses", "tv", "normal", "sparsify")),
    ]
    for name, which in variants:
        step = make_step(which)
        t0 = time.time()
        out = step(grid, rms)
        jax.block_until_ready(out[0])
        tc = time.time() - t0
        t0 = time.time()
        n = 6
        for _ in range(n):
            out = step(grid, rms)
        jax.block_until_ready(out[0])
        dt = (time.time() - t0) / n
        print(f"{name:22s} {dt*1e3:9.1f} ms  (compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
