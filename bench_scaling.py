"""Scaling-efficiency benchmark: the full surface train step over a device
mesh at 1/2/4/.../N devices (BASELINE.md protocol 3), via the production
shard_map data-parallel path (device-local pools, grads pmean'd).

STRONG scaling: fixed TOTAL ray batch, split across the mesh. On real
multi-chip hardware ideal strong scaling divides step time by n;
efficiency(n) = t(1) / (n * t(n)). On this environment's virtual CPU mesh
(--xla_force_host_platform_device_count) all "devices" share the same
physical cores, so ideal is t(n) == t(1) and the meaningful metric is the
partitioning overhead t(1)/t(n) (reported as `efficiency`, shared-core
convention) — it validates that the sharded program inserts only the
gradient pmean, not pathological collectives.

Usage: python bench_scaling.py [reso=64] [total_rays=16384]
Prints one JSON line per mesh size plus a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main():
    # default to the virtual CPU mesh (the container pins JAX_PLATFORMS to
    # the single-chip axon relay, which cannot host a mesh); set
    # BENCH_SCALING_PLATFORM=native to keep the environment's platform
    if os.environ.get("BENCH_SCALING_PLATFORM", "cpu") == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_cpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import alphasurf_tpu as at
    from alphasurf_tpu.data.synthetic import make_gt_grid, pose_spherical
    from alphasurf_tpu.parallel.sharding import make_mesh, make_sharded_surface_step
    from alphasurf_tpu.render.surface import voxel_occupancy
    from alphasurf_tpu.train.steps import (
        HParams, StepConfig, init_rms, make_surface_step,
    )

    reso = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    total_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    grid = make_gt_grid(reso=reso, seed=0)
    grid = grid.replace(fake_sample_std=jnp.array([[0.1]], jnp.float32))
    opt = at.RenderOptions(
        sigma_thresh=-1e9, stop_thresh=1e-7, only_outward_intersect=True,
        surf_fake_sample=True, limited_fake_sample=True,
        truncated_vol_render=True,
    )
    cfg = StepConfig(opt=opt, cache_size=None, renderer="packed",
                     entries_per_ray=16.0)
    hp = HParams(
        lr_alpha=1e-3, lr_surface=1e-5, lr_sh=1e-3,
        lambda_tv_alpha=1e-5, lambda_tv_surface=1e-3,
        lambda_normal_l1=1e-6, lambda_l_entropy=1e-4,
    )
    occ = jax.jit(voxel_occupancy, static_argnums=1)(grid, opt)

    # fixed total batch, split across the mesh (strong scaling)
    cam = at.Camera.make(
        pose_spherical(30.0, 20.0, 2.7), fx=96.0, width=256, height=256
    )
    rays_all = cam.gen_rays()
    mid = rays_all.origins.shape[0] // 2 - total_rays // 2
    origins = rays_all.origins[mid : mid + total_rays]
    dirs = rays_all.dirs[mid : mid + total_rays]
    r = at.Rays(origins, dirs)
    gt = jnp.full((total_rays, 3), 0.5, jnp.float32)
    key = jax.random.PRNGKey(0)

    shared_cores = jax.devices()[0].platform == "cpu"

    sizes = []
    n = 1
    while n <= len(jax.devices()):
        sizes.append(n)
        n *= 2

    results = {}
    for n in sizes:
        mesh = make_mesh(n)
        step = make_sharded_surface_step(cfg, mesh)
        g = jax.tree_util.tree_map(jnp.copy, grid)
        rms = init_rms(g)

        t0 = time.time()
        g, rms, stats = step(g, rms, r, gt, hp, key, occ=occ)
        jax.block_until_ready(stats["loss"])
        t_compile = time.time() - t0

        iters = 6
        t0 = time.time()
        for _ in range(iters):
            g, rms, stats = step(g, rms, r, gt, hp, key, occ=occ)
        jax.block_until_ready(stats["loss"])
        dt = (time.time() - t0) / iters
        rays_per_s = total_rays / dt
        if 1 not in results:
            eff = 1.0
        elif shared_cores:
            # virtual mesh on shared cores: ideal is constant wall-clock
            eff = results[1]["t"] / dt
        else:
            eff = results[1]["t"] / (n * dt)
        results[n] = {"rays_per_s": rays_per_s, "eff": eff, "t": dt}
        print(json.dumps({
            "metric": "scaling_rays_per_s",
            "devices": n,
            "value": round(rays_per_s, 1),
            "unit": f"rays/s ({total_rays} total, reso={reso}, "
                    f"{'shared-core virtual mesh' if shared_cores else 'hw'})",
            "efficiency": round(eff, 3),
            "compile_s": round(t_compile, 1),
            "loss": round(float(stats["loss"]), 5),
        }))

    worst = min(r["eff"] for r in results.values())
    print(json.dumps({
        "metric": "scaling_efficiency_min",
        "value": round(worst, 3),
        "unit": f"fraction of ideal, up to {sizes[-1]} devices "
                f"({'shared-core convention' if shared_cores else 'strong'})",
        "vs_baseline": round(worst / 0.8, 2),  # BASELINE target: >=80%
    }))


if __name__ == "__main__":
    main()
