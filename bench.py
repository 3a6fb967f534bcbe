"""Benchmark: fused forward+backward surface-render throughput (rays/s/chip).

Protocol per BASELINE.md: 800x800 rays against a sparse 512^3-recipe-style
grid (here: sphere-shell sparsity like a converged αSurf scene), fused
render + gradient step — the TPU analog of test/test_render_timing.py.
Prints ONE JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_bench_grid(reso=256, shell_frac_target=0.05):
    """Sparse sphere-shell SDF grid approximating a converged scene."""
    import jax.numpy as jnp

    import alphasurf_tpu as at
    from alphasurf_tpu.core.topology import _dilate, _rebuild

    coords = np.stack(
        np.meshgrid(*[np.arange(reso)] * 3, indexing="ij"), axis=-1
    ).astype(np.float32)
    center = reso / 2.0
    r = np.linalg.norm(coords - center, axis=-1)
    sdf = (reso / 4.0 - r) / (reso / 4.0)  # positive inside, ~unit gradient
    keep = np.abs(sdf) < 3.0 / (reso / 4.0)  # shell around the level set
    keep = _dilate(keep, 2)

    g = at.create_grid(reso, radius=1.0, basis_dim=9,
                       surface_type=at.defs.SURFACE_TYPE_SDF)
    dense = {
        "density_data": np.full((reso, reso, reso, 1), 0.5, np.float32),
        "sh_data": np.zeros((reso, reso, reso, 27), np.float32),
        "surface_data": sdf[..., None].astype(np.float32),
    }
    g = _rebuild(g, keep, dense)
    g = g.replace(fake_sample_std=jnp.array([[0.1]], jnp.float32))
    occupancy = float(keep.mean())
    return g, occupancy


def main():
    import jax
    import jax.numpy as jnp

    import alphasurf_tpu as at
    from alphasurf_tpu.data.synthetic import pose_spherical
    from alphasurf_tpu.train.steps import HParams, StepConfig, init_rms, make_surface_step

    reso = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    W = H = 800
    batch = 40000  # rays per step (recipe-scale batches, cycled over image)

    grid, occ = build_bench_grid(reso)
    cam = at.Camera.make(pose_spherical(30.0, 20.0, 2.7), fx=1.1 * W, width=W, height=H)
    rays = cam.gen_rays()
    n_rays = rays.origins.shape[0]

    opt = at.RenderOptions(
        sigma_thresh=-1e9, stop_thresh=1e-7, only_outward_intersect=True,
        surf_fake_sample=True, limited_fake_sample=True,
        truncated_vol_render=True,
    )
    cfg = StepConfig(opt=opt, cache_size=None)
    step = make_surface_step(cfg)
    rms = init_rms(grid)
    hp = HParams(
        lr_alpha=1e-2, lr_surface=1e-4, lr_sh=1e-2,
        lambda_tv_alpha=1e-5, lambda_tv_surface=1e-3,
        lambda_normal_l1=1e-6, lambda_l_entropy=1e-4,
    )
    key = jax.random.PRNGKey(0)
    gt = jnp.full((batch, 3), 0.5, grid.density_data.dtype)

    def run_batch(grid, rms, i):
        s = (i * batch) % (n_rays - batch)
        r = at.Rays(rays.origins[s : s + batch], rays.dirs[s : s + batch])
        return step(grid, rms, r, gt, hp, key)

    # warmup / compile
    grid_w, rms_w, stats = run_batch(grid, rms, 0)
    jax.block_until_ready(stats["loss"])

    n_iters = max(1, (n_rays // batch))
    t0 = time.time()
    g, r = grid_w, rms_w
    for i in range(n_iters):
        g, r, stats = run_batch(g, r, i)
    jax.block_until_ready(stats["loss"])
    dt = time.time() - t0

    rays_per_s = n_iters * batch / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_s_fwd_bwd",
                "value": round(rays_per_s, 1),
                "unit": f"rays/s/chip (reso={reso}, occ={occ:.3f}, batch={batch})",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
