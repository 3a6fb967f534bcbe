"""Recipe-scale end-to-end run on the procedural synthetic scene.

Produces the BASELINE.md rows-1-3 numbers: the three-stage pipeline of
train_eval.sh (Plenoxels cuvol warm start -> init_surface_from_density ->
alphaSurf surface refinement with a 256^3 -> 512^3 upsample) at the recipe
grid sizes and 800x800 image resolution, on the synthetic sphere scene
(no real datasets exist in this environment — zero egress).

Documented deviations from the reference recipe (surface_cuda_syn.yaml):
  * batch 8192 rays (1.6x the reference's 5000) with iteration counts
    scaled down accordingly;
  * alpha-threshold upsampling (no camera-weight sweep) and no visibility
    pruning at surface init — keeps the stage transitions cheap;
  * the scene is the procedural SDF sphere (smooth geometry, SH-4 color),
    whose analytic surface doubles as the chamfer GT.

Run on the TPU worker:
    import tools.recipe_run as R; R.main(out_dir="/tmp/recipe")
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(
    out_dir: str = "/tmp/recipe",
    width: int = 800,
    n_images: int = 25,
    gt_reso: int = 128,
    reso0: int = 256,
    reso1: int = 256,
    reso2: int = 512,
    n_cuvol: int = 600,
    n_surf1: int = 600,
    n_surf2: int = 1800,
    batch: int = 8192,
    n_stages: int = 3,
):
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from alphasurf_tpu.app.config import Config
    from alphasurf_tpu.data.synthetic import SyntheticDataset
    from alphasurf_tpu.train.trainer import Trainer

    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    # analytic chamfer GT: the sphere surface (radius gt_reso/4 voxels =
    # 0.5 world, /(2/3) extractor scene scale)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(20000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    np.save(os.path.join(data_dir, "shape.npy"),
            (d * 0.5 / (2.0 / 3.0)).astype(np.float32))

    t0 = time.time()
    dset = SyntheticDataset(
        split="train", n_images=n_images, width=width, height=width,
        reso=gt_reso, renderer="packed", device_resident=True,
    )
    dset_test = SyntheticDataset(
        split="test", n_images=3, width=width, height=width, reso=gt_reso,
        renderer="packed",
    )
    print(f"dataset {time.time()-t0:.1f}s "
          f"({n_images}x{width}x{width} train rays on device)", flush=True)

    assert n_surf1 == n_cuvol, "upsamples fire at k*upsamp_every = k*n_cuvol"
    # n_stages < 3 truncates the pipeline (e.g. 2 = stop at the end of the
    # 256^3 surface stage, saving that checkpoint for transition debugging)
    reso_list = [[reso0] * 3, [reso1] * 3, [reso2] * 3][:n_stages]
    stage_iters = [n_cuvol, n_surf1, n_surf2][:n_stages]
    n_total = sum(stage_iters)
    ns = n_surf1 + n_surf2  # surface-stage length (reference: 50000)
    cfg = Config(
        train_dir=os.path.join(out_dir, "ckpt"),
        data_dir=data_dir,
        # cuvol warm start at 256^3 like the reference (syn.yaml:1-3) —
        # the packed-pool cuvol renderer (round 5) made this tractable;
        # the 256 -> 256 "upsample" at the first transition is the
        # reference's own density resample+prune before surface init
        reso=reso_list,
        surface_type="sdf",
        batch_size=batch,
        n_iters=n_total,
        no_surface_init_iters=n_cuvol,
        upsamp_every=n_cuvol,
        density_thresh=1.0,
        # surface init: two density level sets like the recipe's [10, 30]
        # but scaled to this scene's trained sigma range, and no camera
        # sweeps (documented deviations)
        surf_init_density_lvs=[2.0, 6.0],
        surf_init_alpha_rescale=0.005,
        visibility_pruning_scale=0.0,  # recipe also disables it
        thresh_type="alpha",           # surface_cuda_syn.yaml
        alpha_upsample_thresh=1e-8,
        # capacity bound at the 512^3 upsample (the reference's
        # max_grid_elements top-k bound, svox2.py:4324): a briefly-trained
        # alpha field barely prunes at 1e-8 — an unbounded upsample kept
        # 32M rows (~20 GB of param+opt state)
        max_grid_elements=6_000_000,
        init_sigma=0.1,
        # plenoxels stage (opt/configs/syn.yaml)
        lr_sigma=3e1, lr_sigma_final=5e-2, lr_sigma_delay_steps=0,
        lr_sigma_decay_steps=n_total,
        lr_sh=1e-2, lr_sh_final=5e-6, lr_sh_decay_steps=n_total * 5,
        lambda_tv=1e-5, lambda_tv_sh=1e-3,
        # surface stage (opt/configs/surface_cuda_syn.yaml, schedule
        # horizons scaled from 50000 reference steps to ns)
        lr_alpha=1e-2, lr_alpha_final=1e-3,
        lr_alpha_delay_steps=n_cuvol + ns // 2, lr_alpha_delay_mult=1e-2,
        lr_alpha_decay_steps=n_cuvol + ns,
        lr_surface=1e-5, lr_surface_final=1e-5,
        lr_surface_delay_steps=n_cuvol + ns // 2, lr_surface_delay_mult=1e-2,
        lr_surface_decay_steps=n_cuvol + ns,
        lr_sh_surf=1e-3, lr_sh_surf_final=1e-3,
        lr_sh_surf_delay_steps=0, lr_sh_surf_decay_steps=n_cuvol + ns,
        # lambda_tv_sh: plenoxels stage wants 1e-3, the surface recipe 0;
        # one shared knob here — the plenoxels value stays on (deviation)
        lambda_tv_alpha=1e-5, lambda_tv_surface=1e-3,
        # full-lattice reg coverage, the recipe value (dispatches to the
        # dense-volume formulation, losses/reg.py *_dense)
        tv_surface_sparsity=1.0, norm_surface_sparsity=1.0,
        surf_normal_loss_lambda_type="const",
        lambda_normal_loss=1e-6, surf_norm_reg_l1=True,
        no_surf_norm_con_check=True,
        lambda_sparsify_alpha=1e-9, lambda_sparsify_surf=0.0,
        sparsify_surf_decrease=True, sparsify_surf_thresh=0.15,
        alpha_surf_sparsify_sparsity=0.05,
        delay_sparsify_surf=n_cuvol + ns // 2,
        lambda_l_entropy=1e-4,
        lambda_conv_mode_samp=0.0,  # deviation: two-pass cache losses off
        only_outward_intersect=True,
        surf_fake_sample=False, limited_fake_sample=True,  # recipe values
        truncated_vol_render=True, trunc_vol_render_lv_remove=True,
        trunc_vol_weight_min=1e-10,
        fs_std_decay_type="linear",
        fake_sample_std=0.1, fake_sample_std_final=1e-6,
        fake_sample_std_decay_steps=n_cuvol + ns,
        fake_sample_std_delay=n_cuvol,
        trunc_vol_a_decay_type="linear",
        truncated_vol_render_a=5.0, truncated_vol_render_a_final=1.0,
        truncated_vol_render_a_decay_steps=n_cuvol + ns // 2,
        truncated_vol_render_a_delay=n_cuvol,
        sigma_thresh=-10000.0, stop_thresh=-10000.0,  # recipe values
        eval_every_iter=0, print_every=100, save_every=-1,
        n_eval_test=3, final_render_eval=False,
        log_pts=True, eval_cf=True, surf_eval_n_sample=3,
        surf_eval_intersect_th=0.1,
        entries_per_ray=8.0, entries_per_ray_max=512.0,
        tune_mode=True, nosphereinit=False,
    )
    tr = Trainer(cfg, dset, dset_test)
    t0 = time.time()
    psnr = tr.train()
    wall = time.time() - t0
    rays_per_s = n_total * batch / wall
    result = {
        "psnr": psnr,
        "wall_s": round(wall, 1),
        "rays_per_s_avg": round(rays_per_s, 1),
        "stages": stage_iters,
        "batch": batch,
        "reso": [r[0] for r in reso_list],
        "capacity_final": int(tr.grid.capacity),
        "forced_steps": tr.n_forced_steps,
    }
    print("RECIPE RESULT " + json.dumps(result), flush=True)
    with open(os.path.join(out_dir, "result.json"), "w") as f:
        json.dump(result, f)
    return result


if __name__ == "__main__":
    main(*sys.argv[1:])
