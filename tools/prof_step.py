"""Component-level profiling of the packed surface train step on TPU.

Times each stage of the pipeline separately (own jit): occupancy refresh,
phase A (candidate enumeration + pool compaction), phase B forward
(gather/cubic/composite), fwd+bwd, and the full train step. This is the
measurement harness behind PERF.md — run on the real chip:

    python tools/prof_step.py [reso] [batch] [entries_per_ray]
"""
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
    from alphasurf_tpu.render import surface as S
    from alphasurf_tpu.train.steps import HParams, StepConfig, init_rms, make_surface_step
    from bench import build_bench_grid, device_rays

    reso = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 40960
    epr = float(sys.argv[3]) if len(sys.argv) > 3 else 6.0

    t0 = time.time()
    grid, occf, row_coords = build_bench_grid(reso)
    origins_all, dirs_all = device_rays(800, 800, fx=880.0)
    jax.block_until_ready((grid.density_data, origins_all))
    print(f"setup {time.time()-t0:.1f}s occ={occf:.3f} cap={grid.capacity}")

    opt = at.RenderOptions(
        sigma_thresh=-1e9, stop_thresh=1e-7, only_outward_intersect=True,
        surf_fake_sample=True, limited_fake_sample=True,
        truncated_vol_render=True,
    )
    # center-of-image batch: the first rows are empty sky; profiling must
    # exercise real crossings
    mid = origins_all.shape[0] // 2 - batch // 2
    origins = jax.lax.dynamic_slice_in_dim(origins_all, mid, batch)
    dirs = jax.lax.dynamic_slice_in_dim(dirs_all, mid, batch)
    rays = at.Rays(origins, dirs)

    def timed(name, fn, *args, n=8, **kw):
        t0 = time.time()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(n):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n
        print(f"{name:34s} {dt*1e3:9.1f} ms   (compile+1st {tc:.1f}s)")
        return out, dt

    # 1. occupancy
    occ_fn = jax.jit(S.voxel_occupancy, static_argnums=1)
    occ, t_occ = timed("voxel_occupancy", occ_fn, grid, opt, row_coords)

    # 2. phase A only
    @jax.jit
    def phase_a(grid, origins, dirs, occ):
        o, d, shm, tn, tx, ng, rok, dsc = S._prep(grid, rays, opt)
        M = int(batch * epr)
        return S.compact_crossings_packed(
            grid, o, d, jnp.where(rok, tn, 0.0), jnp.where(rok, tx, -1.0),
            occ, M, coarse_factor=8, supers_per_ray=epr,
        )

    pa, t_pa = timed("phase A (enumerate+compact)", phase_a, grid, origins, dirs, occ)
    print(f"   entries used {int(jnp.sum(pa[4]))} / {int(batch*epr)}  overflow={int(pa[6])}")

    # 3. forward only
    @jax.jit
    def fwd(grid, occ):
        out = S.volume_render_surface_packed(
            grid, rays, opt, entries_per_ray=epr, occupancy=occ,
            coarse_factor=8, supers_per_ray=epr,
        )
        return out["rgb"], out["pool_overflow"]

    (rgb, ovf), t_fwd = timed("forward (phase A+B)", fwd, grid, occ)
    print(f"   overflow={int(ovf)}")

    # 4. fwd + bwd
    @jax.jit
    def fwdbwd(grid, occ):
        def loss(dd, sh, sf):
            g = grid.replace(density_data=dd, sh_data=sh, surface_data=sf)
            out = S.volume_render_surface_packed(
                g, rays, opt, entries_per_ray=epr, occupancy=occ,
                coarse_factor=8, supers_per_ray=epr,
            )
            return jnp.mean(out["rgb"] ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(
            grid.density_data, grid.sh_data, grid.surface_data)

    _, t_fb = timed("forward+backward (mse only)", fwdbwd, grid, occ)

    # 5. full train step
    scfg = StepConfig(opt=opt, cache_size=None, renderer="packed",
                      entries_per_ray=epr, supers_per_ray=epr)
    step = make_surface_step(scfg)
    rms = init_rms(grid)
    hp = HParams(lr_alpha=1e-3, lr_surface=1e-5, lr_sh=1e-3,
                 lambda_tv_alpha=1e-5, lambda_tv_surface=1e-3,
                 lambda_normal_l1=1e-6, lambda_l_entropy=1e-4)
    key = jax.random.PRNGKey(0)
    gt = jnp.full((batch, 3), 0.5, jnp.float32)

    # donation: rebind state each call (donated buffers are consumed)
    t0 = time.time()
    g2, r2, stats = step(grid, rms, rays, gt, hp, key, occ=occ, row_coords=row_coords)
    jax.block_until_ready(stats["loss"])
    tc = time.time() - t0
    t0 = time.time()
    n = 4
    for _ in range(n):
        g2, r2, stats = step(g2, r2, rays, gt, hp, key, occ=occ, row_coords=row_coords)
    jax.block_until_ready(stats["loss"])
    t_step = (time.time() - t0) / n
    print(f"{'full train step':34s} {t_step*1e3:9.1f} ms   (compile+1st {tc:.1f}s)")
    print(f"   loss={float(stats['loss']):.4f} overflow={int(stats['pool_overflow'])}")
    print(f"rays/s: fwd {batch/t_fwd:.0f}  fwdbwd {batch/t_fb:.0f}  "
          f"step {batch/t_step:.0f} (occ amortized /16: "
          f"{batch/(t_step + t_occ/16):.0f})")


if __name__ == "__main__":
    main()
