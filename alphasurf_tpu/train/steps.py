"""Jitted training steps.

The TPU-native re-design of the reference's fused training iteration
(/root/reference/opt/opt.py:786-1152): one jit-compiled function performs
render forward + backward (all auxiliary render losses fused via the
streaming accumulators), cell-sampled regularizers, and the RMSprop update —
the whole iteration is a single XLA computation, the analog of the
reference's kernel sequence (fused render kernel -> reg grad kernels ->
optim kernels) with XLA doing the fusion instead of hand-written CUDA.

Dynamic per-step scalars (learning rates, loss weights, schedule values)
enter through ``HParams`` so the step never retraces.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.grid import SparseGrid
from ..core.options import RenderOptions
from ..core.rays import Rays
from ..losses import reg
from ..losses import render_losses as rl
from ..optim.rmsprop import RMSState, rmsprop_init, rmsprop_step
from ..render.cuvol import volume_render_cuvol
from ..render.surface import volume_render_surface, volume_render_surface_compact


class HParams(NamedTuple):
    """Per-step dynamic scalars (reference: opt.py:693-743 schedules)."""

    lr_sigma: jnp.ndarray = 0.0  # cuvol stage
    lr_alpha: jnp.ndarray = 0.0  # surface stage
    lr_surface: jnp.ndarray = 0.0
    lr_sh: jnp.ndarray = 0.0
    lr_fake_sample_std: jnp.ndarray = 0.0
    img_lambda_l1_ratio: jnp.ndarray = 0.0
    lambda_tv: jnp.ndarray = 0.0
    lambda_tv_sh: jnp.ndarray = 0.0
    lambda_tv_alpha: jnp.ndarray = 0.0
    lambda_tv_surface: jnp.ndarray = 0.0
    lambda_normal_l1: jnp.ndarray = 0.0
    lambda_normal_l2: jnp.ndarray = 0.0
    lambda_sparsify_alpha: jnp.ndarray = 0.0
    lambda_sparsify_surf: jnp.ndarray = 0.0
    lambda_l_dist: jnp.ndarray = 0.0
    lambda_l_dist_a: jnp.ndarray = 0.0
    lambda_l_entropy: jnp.ndarray = 0.0
    lambda_l_entropy_a: jnp.ndarray = 0.0
    lambda_conv_mode_samp: jnp.ndarray = 0.0
    lambda_samp_dist: jnp.ndarray = 0.0
    lambda_sparsity: jnp.ndarray = 0.0
    lambda_eikonal: jnp.ndarray = 0.0
    lambda_fs_std_l1: jnp.ndarray = 0.0
    lambda_fs_std_l2: jnp.ndarray = 0.0
    surface_unfrozen: jnp.ndarray = 1.0  # 0 during surface_init_freeze


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static (trace-time) configuration of a train step."""

    opt: RenderOptions
    max_voxels: Optional[int] = None
    max_steps: Optional[int] = None  # cuvol
    cache_size: Optional[int] = 64
    tv_sparsity: float = 0.01
    tv_sh_sparsity: float = 0.01
    tv_surface_sparsity: float = 0.01
    norm_surface_sparsity: float = 0.01
    sparsify_sparsity: float = 0.01
    norm_con_check: bool = False
    norm_ignore_empty: bool = False
    sparsify_surf_decrease: bool = True
    sparsify_surf_thresh: float = 0.15
    surf_tv_alpha_weighted: bool = False
    rms_beta: float = 0.95
    use_two_pass_losses: bool = False  # enable cache-based conv/samp losses
    compact: bool = True  # occupancy-compacted traversal (production path)
    max_intersect_voxels: int = 64  # K for the compacted path
    voxel_chunk: int = 8  # voxels per scan step in the compacted path


def init_rms(grid: SparseGrid) -> dict:
    rms = {
        "density": rmsprop_init(grid.density_data),
        "sh": rmsprop_init(grid.sh_data),
    }
    if grid.surface_data is not None:
        rms["surface"] = rmsprop_init(grid.surface_data)
    if grid.fake_sample_std is not None:
        rms["fake_sample_std"] = rmsprop_init(grid.fake_sample_std)
    return rms


def make_surface_step(cfg: StepConfig):
    """Build the jitted surface-stage train step."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(grid: SparseGrid, rms: dict, rays: Rays, rgb_gt, hp: HParams, key):
        k_tv, k_tvsh, k_tvsurf, k_norm, k_sp = jax.random.split(key, 5)

        train_fss = grid.fake_sample_std is not None and "fake_sample_std" in rms

        def loss_fn(density, sh, surface, fss):
            g = grid.replace(density_data=density, sh_data=sh, surface_data=surface)
            if train_fss:
                g = g.replace(fake_sample_std=fss)
            cache = cfg.cache_size if cfg.use_two_pass_losses else None
            if cfg.compact:
                out = volume_render_surface_compact(
                    g, rays, cfg.opt,
                    max_intersect_voxels=cfg.max_intersect_voxels,
                    cache_size=cache,
                    voxel_chunk=cfg.voxel_chunk,
                )
            else:
                out = volume_render_surface(
                    g, rays, cfg.opt, max_voxels=cfg.max_voxels, cache_size=cache
                )
            resid = out["rgb"] - rgb_gt
            if rays.masks is not None:
                resid = resid * rays.masks[:, None]
            mse = jnp.mean(resid**2)
            loss = (1.0 - hp.img_lambda_l1_ratio) * mse + hp.img_lambda_l1_ratio * jnp.mean(jnp.abs(resid))

            ray_l = out["ray_losses"]
            loss += hp.lambda_l_dist * rl.l_dist_from_ray_losses(ray_l, alphas=False)
            loss += hp.lambda_l_dist_a * rl.l_dist_from_ray_losses(ray_l, alphas=True)
            loss += hp.lambda_l_entropy * rl.l_entropy_from_ray_losses(ray_l, alphas=False)
            loss += hp.lambda_l_entropy_a * rl.l_entropy_from_ray_losses(ray_l, alphas=True)
            loss += hp.lambda_sparsity * rl.l_sparsity_from_ray_losses(ray_l)
            if cfg.use_two_pass_losses:
                loss += hp.lambda_conv_mode_samp * rl.l_conv_mode_samp_from_cache(out["cache"])
                loss += hp.lambda_samp_dist * rl.l_samp_dist_from_cache(out["cache"])

            # cell-sampled regularizers (opt.py:939-1074)
            cells_tv = reg.sample_cells(k_tv, g, cfg.tv_sparsity)
            loss += hp.lambda_tv_alpha * reg.tv_loss(g, density, cells_tv)
            cells_tvsh = reg.sample_cells(k_tvsh, g, cfg.tv_sh_sparsity)
            loss += hp.lambda_tv_sh * reg.tv_loss(g, sh, cells_tvsh)
            cells_tvs = reg.sample_cells(k_tvsurf, g, cfg.tv_surface_sparsity)
            loss += hp.lambda_tv_surface * reg.surface_tv_loss(
                g, cells_tvs, alpha_weighted=cfg.surf_tv_alpha_weighted
            )
            cells_n = reg.sample_cells(k_norm, g, cfg.norm_surface_sparsity)
            loss += hp.lambda_normal_l1 * reg.surface_normal_loss(
                g, cells_n, cfg.norm_con_check, cfg.norm_ignore_empty, use_l1=True
            )
            loss += hp.lambda_normal_l2 * reg.surface_normal_loss(
                g, cells_n, cfg.norm_con_check, cfg.norm_ignore_empty, use_l1=False
            )
            cells_s = reg.sample_cells(k_sp, g, cfg.sparsify_sparsity)
            loss += reg.alpha_surf_sparsify_loss(
                g, cells_s, hp.lambda_sparsify_alpha, hp.lambda_sparsify_surf,
                cfg.sparsify_surf_decrease, cfg.sparsify_surf_thresh,
            )
            loss += hp.lambda_eikonal * reg.surface_eikonal_loss(g, cells_n)

            if train_fss:
                # L1/L2 reg on fake_sample_std (svox2.py:6073-6075)
                loss += hp.lambda_fs_std_l2 * jnp.sum(fss**2) + hp.lambda_fs_std_l1 * jnp.sum(jnp.abs(fss))
            return loss, mse

        fss_in = grid.fake_sample_std if train_fss else jnp.zeros((1, 1), grid.density_data.dtype)
        (loss, mse), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
            grid.density_data, grid.sh_data, grid.surface_data, fss_in
        )
        g_density, g_sh, g_surface, g_fss = grads

        beta = cfg.rms_beta
        new_density, rms_d = rmsprop_step(
            grid.density_data, rms["density"], g_density, hp.lr_alpha, beta
        )
        new_sh, rms_sh = rmsprop_step(grid.sh_data, rms["sh"], g_sh, hp.lr_sh, beta)
        surf_mask = (
            jnp.any(g_surface != 0, axis=-1, keepdims=True)
            & (hp.surface_unfrozen > 0)
        )
        new_surface, rms_s = rmsprop_step(
            grid.surface_data, rms["surface"], g_surface, hp.lr_surface, beta,
            mask=surf_mask,
        )
        new_grid = grid.replace(
            density_data=new_density, sh_data=new_sh, surface_data=new_surface
        )
        new_rms = {"density": rms_d, "sh": rms_sh, "surface": rms_s}
        if train_fss:
            new_fss, rms_f = rmsprop_step(
                grid.fake_sample_std, rms["fake_sample_std"], g_fss,
                hp.lr_fake_sample_std, beta,
            )
            new_fss = jnp.clip(new_fss, min=1e-8)  # opt.py:1141-1142
            new_grid = new_grid.replace(fake_sample_std=new_fss)
            new_rms["fake_sample_std"] = rms_f

        stats = {"loss": loss, "mse": mse}
        return new_grid, new_rms, stats

    return step


def make_cuvol_step(cfg: StepConfig):
    """Plenoxels warm-start stage step (sigma grid, opt.py:940-947)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(grid: SparseGrid, rms: dict, rays: Rays, rgb_gt, hp: HParams, key):
        k_tv, k_tvsh = jax.random.split(key)

        def loss_fn(density, sh):
            g = grid.replace(density_data=density, sh_data=sh)
            out = volume_render_cuvol(g, rays, cfg.opt, max_steps=cfg.max_steps)
            mse = jnp.mean((out["rgb"] - rgb_gt) ** 2)
            loss = mse
            cells_tv = reg.sample_cells(k_tv, g, cfg.tv_sparsity)
            loss += hp.lambda_tv * reg.tv_loss(g, density, cells_tv)
            cells_tvsh = reg.sample_cells(k_tvsh, g, cfg.tv_sh_sparsity)
            loss += hp.lambda_tv_sh * reg.tv_loss(g, sh, cells_tvsh)
            return loss, mse

        (loss, mse), (g_density, g_sh) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(grid.density_data, grid.sh_data)

        new_density, rms_d = rmsprop_step(
            grid.density_data, rms["density"], g_density, hp.lr_sigma, cfg.rms_beta
        )
        new_sh, rms_sh = rmsprop_step(
            grid.sh_data, rms["sh"], g_sh, hp.lr_sh, cfg.rms_beta
        )
        new_grid = grid.replace(density_data=new_density, sh_data=new_sh)
        new_rms = dict(rms)
        new_rms.update({"density": rms_d, "sh": rms_sh})
        return new_grid, new_rms, {"loss": loss, "mse": mse}

    return step
