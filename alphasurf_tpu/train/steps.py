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
from ..render.cuvol import volume_render_cuvol, volume_render_cuvol_packed
from ..render.surface import (
    volume_render_surface,
    volume_render_surface_compact,
    volume_render_surface_packed,
)


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
    lambda_inward_norm: jnp.ndarray = 0.0
    lambda_density_lap: jnp.ndarray = 0.0
    lambda_udf_var: jnp.ndarray = 0.0
    lambda_fs_std_l1: jnp.ndarray = 0.0
    lambda_fs_std_l2: jnp.ndarray = 0.0
    surface_unfrozen: jnp.ndarray = 1.0  # 0 during surface_init_freeze
    # >0 forces the update through even under pool overflow (used only when
    # the pool is already at its configured cap — degraded but progressing)
    force_apply: jnp.ndarray = 0.0
    # extended regularizers / auxiliary param groups
    lr_basis: jnp.ndarray = 0.0
    lr_background: jnp.ndarray = 0.0
    lambda_tv_background: jnp.ndarray = 0.0
    lambda_tv_background_density: jnp.ndarray = 0.0
    lambda_tv_basis: jnp.ndarray = 0.0
    lambda_l2_color: jnp.ndarray = 0.0
    lambda_norm_match: jnp.ndarray = 0.0
    lambda_viscosity: jnp.ndarray = 0.0
    lambda_sign_change: jnp.ndarray = 0.0
    lambda_tv_lumisphere: jnp.ndarray = 0.0


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
    bg_sparsity: float = 0.01
    lumisphere_sparsity: float = 0.01
    viscosity_eta: float = 1e-2
    # which extended regularizers to trace in (0-lambda still costs compile)
    use_eikonal: bool = False
    use_norm_match: bool = False
    use_viscosity: bool = False
    use_sign_change: bool = False
    use_lumisphere_tv: bool = False
    use_two_pass_losses: bool = False  # enable cache-based conv/samp losses
    renderer: str = "packed"  # 'packed' | 'compact' | 'dense'
    # clamp on the surface gradient (opt.py:932-936). Deviation: the
    # reference clips the render-loss grad before adding reg-kernel grads;
    # here the step is one fused jax.grad, so the clip applies to the total
    surf_grad_abs_max: Optional[float] = None
    max_intersect_voxels: int = 64  # K for the compacted path
    voxel_chunk: int = 8  # voxels per scan step in the compacted path
    entries_per_ray: float = 8.0  # global pool budget for 'packed'
    coarse_factor: int = 8  # supervoxel prefilter for packed phase A
    supers_per_ray: float = 8.0
    # mesh axis name for data-parallel execution under shard_map: each
    # device runs the full packed pipeline on its local ray shard (local
    # pool, local sort/compaction — no cross-device collectives in phase
    # A/B) and only the GRADIENTS cross the mesh via pmean before the
    # replicated optimizer update (SURVEY §2.4(b))
    axis_name: Optional[str] = None

    @property
    def compact(self):  # back-compat alias
        return self.renderer != "dense"


def init_rms(grid: SparseGrid) -> dict:
    rms = {
        "density": rmsprop_init(grid.density_data),
        "sh": rmsprop_init(grid.sh_data),
    }
    if grid.surface_data is not None:
        rms["surface"] = rmsprop_init(grid.surface_data)
    if grid.fake_sample_std is not None:
        rms["fake_sample_std"] = rmsprop_init(grid.fake_sample_std)
    if grid.basis_data is not None:
        rms["basis_data"] = rmsprop_init(grid.basis_data)
    if grid.basis_mlp is not None:
        rms["basis_mlp"] = jax.tree.map(rmsprop_init, grid.basis_mlp)
    if grid.background_data is not None:
        rms["background"] = rmsprop_init(grid.background_data)
    return rms


def _aux_params(grid: SparseGrid, rms: dict) -> dict:
    """Optional trainable groups (learned basis / MSI background), present
    only when both the grid field and its rms state exist (the analog of
    optim_basis_step / optim_background_step, svox2.py:6108-6206)."""
    aux = {}
    if grid.basis_data is not None and "basis_data" in rms:
        aux["basis_data"] = grid.basis_data
    if grid.basis_mlp is not None and "basis_mlp" in rms:
        aux["basis_mlp"] = grid.basis_mlp
    if grid.background_data is not None and "background" in rms:
        aux["background"] = grid.background_data
    return aux


def _apply_aux(grid: SparseGrid, aux: dict) -> SparseGrid:
    if "basis_data" in aux:
        grid = grid.replace(basis_data=aux["basis_data"])
    if "basis_mlp" in aux:
        grid = grid.replace(basis_mlp=aux["basis_mlp"])
    if "background" in aux:
        grid = grid.replace(background_data=aux["background"])
    return grid


def _aux_reg_losses(g: SparseGrid, hp: HParams, cfg: "StepConfig", keys) -> jnp.ndarray:
    """Extended regularizers shared by both stages."""
    k_bg, k_lum, k_aux = keys
    loss = hp.lambda_l2_color * reg.l2_color_loss(g)
    if g.basis_data is not None:
        loss += hp.lambda_tv_basis * reg.basis_tv_loss(g)
    if g.background_data is not None:
        n_bg = g.background_links.size * g.background_data.shape[1]
        cells_bg = jax.random.randint(
            k_bg, (max(1, int(cfg.bg_sparsity * n_bg)),), 0, n_bg, dtype=jnp.int32
        )
        loss += reg.background_tv_loss(
            g, cells_bg, hp.lambda_tv_background, hp.lambda_tv_background_density
        )
    if cfg.use_lumisphere_tv:
        cells_lum = reg.sample_cells(k_lum, g, cfg.lumisphere_sparsity)
        loss += hp.lambda_tv_lumisphere * reg.lumisphere_tv_loss(g, cells_lum, k_aux)
    return loss


def _aux_optim(aux, aux_grads, rms: dict, hp: HParams, beta: float):
    """RMSprop over the optional groups; returns (new_aux, rms updates)."""
    new_aux, upd = {}, {}
    if "basis_data" in aux:
        new_aux["basis_data"], upd["basis_data"] = rmsprop_step(
            aux["basis_data"], rms["basis_data"], aux_grads["basis_data"],
            hp.lr_basis, beta,
        )
    if "basis_mlp" in aux:
        new_mlp, upd_mlp = {}, {}
        for k in aux["basis_mlp"]:
            new_mlp[k], upd_mlp[k] = rmsprop_step(
                aux["basis_mlp"][k], rms["basis_mlp"][k],
                aux_grads["basis_mlp"][k], hp.lr_basis, beta,
            )
        new_aux["basis_mlp"] = new_mlp
        upd["basis_mlp"] = upd_mlp
    if "background" in aux:
        new_aux["background"], upd["background"] = rmsprop_step(
            aux["background"], rms["background"], aux_grads["background"],
            hp.lr_background, beta,
        )
    return new_aux, upd


def make_surface_step(cfg: StepConfig, jit: bool = True):
    """Build the surface-stage train step (jitted unless ``jit=False`` —
    the raw impl is what ``parallel.sharding.make_sharded_surface_step``
    wraps in shard_map)."""

    def step(grid: SparseGrid, rms: dict, rays: Rays, rgb_gt, hp: HParams, key,
             occ=None, row_coords=None):
        k_tv, k_tvsh, k_tvsurf, k_norm, k_sp, k_ext, k_bg, k_lum, k_aux = (
            jax.random.split(key, 9)
        )

        # capacity-scaled regularizer sampling when the packed-row coords
        # are available (Trainer passes them; recomputed per topology).
        # Falls back to the reference's lattice-window sampling, whose cost
        # scales with reso^3 — ~13 s of the 14 s step at 512^3 (PERF.md).
        if row_coords is not None:
            rc = jax.lax.stop_gradient(row_coords)
            reg_scale = reg.present_norm_scale(grid)
            sample = lambda k, g, frac: reg.sample_present_cells(k, g, rc, frac)
        else:
            reg_scale = 1.0
            sample = reg.sample_cells

        train_fss = grid.fake_sample_std is not None and "fake_sample_std" in rms

        def loss_fn(density, sh, surface, fss, aux):
            g = grid.replace(density_data=density, sh_data=sh, surface_data=surface)
            if train_fss:
                g = g.replace(fake_sample_std=fss)
            g = _apply_aux(g, aux)
            cache = cfg.cache_size if cfg.use_two_pass_losses else None
            if cfg.renderer == "packed":
                out = volume_render_surface_packed(
                    g, rays, cfg.opt,
                    entries_per_ray=cfg.entries_per_ray,
                    cache_size=cache,
                    occupancy=occ,
                    coarse_factor=cfg.coarse_factor,
                    supers_per_ray=cfg.supers_per_ray,
                )
            elif cfg.renderer == "compact":
                out = volume_render_surface_compact(
                    g, rays, cfg.opt,
                    max_intersect_voxels=cfg.max_intersect_voxels,
                    cache_size=cache,
                    voxel_chunk=cfg.voxel_chunk,
                    occupancy=occ,
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
            loss += hp.lambda_inward_norm * rl.l_inward_norm_from_ray_losses(ray_l)
            loss += hp.lambda_density_lap * rl.density_lap_from_ray_losses(ray_l)
            loss += hp.lambda_udf_var * rl.udf_var_from_ray_losses(ray_l)
            if cfg.use_two_pass_losses:
                loss += hp.lambda_conv_mode_samp * rl.l_conv_mode_samp_from_cache(out["cache"])
                loss += hp.lambda_samp_dist * rl.l_samp_dist_from_cache(out["cache"])

            # cell-sampled regularizers (opt.py:939-1074)
            cells_tv = sample(k_tv, g, cfg.tv_sparsity)
            loss += reg_scale * hp.lambda_tv_alpha * reg.tv_loss(g, density, cells_tv)
            cells_tvsh = sample(k_tvsh, g, cfg.tv_sh_sparsity)
            loss += reg_scale * hp.lambda_tv_sh * reg.tv_loss(g, sh, cells_tvsh)
            # full-lattice coverage (the recipe sets tv_surface_sparsity =
            # norm_surface_sparsity = 1) dispatches to the DENSE volume
            # formulation: shifted-slice math on a scattered field whose
            # VJP is a gather — sweeping all reso^3 cells by sampling would
            # cost seconds/step (see losses/reg.py)
            dense_ok = row_coords is not None
            if dense_ok and cfg.tv_surface_sparsity >= 0.5:
                loss += hp.lambda_tv_surface * reg.surface_tv_loss_dense(
                    g, rc, alpha_weighted=cfg.surf_tv_alpha_weighted
                )
            else:
                cells_tvs = sample(k_tvsurf, g, cfg.tv_surface_sparsity)
                loss += reg_scale * hp.lambda_tv_surface * reg.surface_tv_loss(
                    g, cells_tvs, alpha_weighted=cfg.surf_tv_alpha_weighted
                )
            if dense_ok and cfg.norm_surface_sparsity >= 0.5:
                loss += hp.lambda_normal_l1 * reg.surface_normal_loss_dense(
                    g, rc, cfg.norm_con_check, cfg.norm_ignore_empty, use_l1=True
                )
                loss += hp.lambda_normal_l2 * reg.surface_normal_loss_dense(
                    g, rc, cfg.norm_con_check, cfg.norm_ignore_empty, use_l1=False
                )
                cells_n = sample(k_norm, g, cfg.norm_surface_sparsity)
            else:
                cells_n = sample(k_norm, g, cfg.norm_surface_sparsity)
                loss += reg_scale * hp.lambda_normal_l1 * reg.surface_normal_loss(
                    g, cells_n, cfg.norm_con_check, cfg.norm_ignore_empty, use_l1=True
                )
                loss += reg_scale * hp.lambda_normal_l2 * reg.surface_normal_loss(
                    g, cells_n, cfg.norm_con_check, cfg.norm_ignore_empty, use_l1=False
                )
            cells_s = sample(k_sp, g, cfg.sparsify_sparsity)
            loss += reg_scale * reg.alpha_surf_sparsify_loss(
                g, cells_s, hp.lambda_sparsify_alpha, hp.lambda_sparsify_surf,
                cfg.sparsify_surf_decrease, cfg.sparsify_surf_thresh,
            )
            if cfg.use_eikonal:
                # traced only when enabled: its (n, 2, 2, 2) neighborhood
                # pads 64x on TPU — 8.9 GB of dead weight at sparsity=1
                loss += reg_scale * hp.lambda_eikonal * reg.surface_eikonal_loss(g, cells_n)

            # extended surface regularizers (traced in only when enabled)
            if cfg.use_norm_match:
                loss += reg_scale * hp.lambda_norm_match * reg.surface_norm_match_loss(g, cells_n)
            if cfg.use_viscosity:
                h = 2.0 * jnp.mean(g.radius) / jnp.mean(g.gsz)
                loss += reg_scale * hp.lambda_viscosity * reg.surface_viscosity_loss(
                    g, cells_n, eta=cfg.viscosity_eta, h=h
                )
            if cfg.use_sign_change:
                cells_sc = sample(k_ext, g, cfg.norm_surface_sparsity)
                loss += reg_scale * hp.lambda_sign_change * reg.surface_sign_change_loss(g, cells_sc)
            loss += _aux_reg_losses(g, hp, cfg, (k_bg, k_lum, k_aux))

            if train_fss:
                # L1/L2 reg on fake_sample_std (svox2.py:6073-6075)
                loss += hp.lambda_fs_std_l2 * jnp.sum(fss**2) + hp.lambda_fs_std_l1 * jnp.sum(jnp.abs(fss))
            overflow = out.get("pool_overflow", jnp.asarray(0, jnp.int32))
            return loss, (mse, overflow)

        fss_in = grid.fake_sample_std if train_fss else jnp.zeros((1, 1), grid.density_data.dtype)
        aux_in = _aux_params(grid, rms)
        (loss, (mse, overflow)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True
        )(grid.density_data, grid.sh_data, grid.surface_data, fss_in, aux_in)
        if cfg.axis_name is not None:
            # data-parallel shard_map: per-shard losses are means over the
            # local rays, so pmean of the grads == the global-batch gradient
            # (reg losses are computed identically on every shard from the
            # replicated params/key, and pmean of identical values is the
            # identity). Everything after this line is replicated math.
            grads = jax.lax.pmean(grads, cfg.axis_name)
            loss = jax.lax.pmean(loss, cfg.axis_name)
            mse = jax.lax.pmean(mse, cfg.axis_name)
            overflow = jax.lax.psum(overflow, cfg.axis_name)
        g_density, g_sh, g_surface, g_fss, g_aux = grads
        if cfg.surf_grad_abs_max is not None:
            thresh = abs(cfg.surf_grad_abs_max)
            g_surface = jnp.clip(g_surface, -thresh, thresh)

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

        new_aux, rms_aux = _aux_optim(aux_in, g_aux, rms, hp, beta)
        new_grid = _apply_aux(new_grid, new_aux)
        new_rms.update(rms_aux)

        # pool overflow => crossings were dropped => gradients are wrong for
        # the tail rays. Refuse to apply the update (keep the old params);
        # the trainer grows the pool and retries the same batch. The CUDA
        # kernel never drops crossings (surf_trav.cu walks to termination),
        # so a polluted update has no reference analog. Only the updated
        # param fields are selected (links/level_sets are untouched).
        keep = (overflow == 0) | (hp.force_apply > 0)
        sel = lambda n, o: jnp.where(keep, n, o)
        new_grid = new_grid.replace(
            density_data=sel(new_grid.density_data, grid.density_data),
            sh_data=sel(new_grid.sh_data, grid.sh_data),
            surface_data=sel(new_grid.surface_data, grid.surface_data),
        )
        if train_fss:
            new_grid = new_grid.replace(
                fake_sample_std=sel(new_grid.fake_sample_std, grid.fake_sample_std)
            )
        for k in list(new_aux):
            if k == "basis_data":
                new_grid = new_grid.replace(
                    basis_data=sel(new_grid.basis_data, grid.basis_data))
            elif k == "basis_mlp":
                new_grid = new_grid.replace(basis_mlp=jax.tree.map(
                    sel, new_grid.basis_mlp, grid.basis_mlp))
            elif k == "background":
                new_grid = new_grid.replace(background_data=sel(
                    new_grid.background_data, grid.background_data))
        new_rms = {
            k: jax.tree.map(sel, v, rms[k]) for k, v in new_rms.items()
        }

        stats = {"loss": loss, "mse": mse, "pool_overflow": overflow}
        return new_grid, new_rms, stats

    if jit:
        return jax.jit(step, donate_argnums=(0, 1))
    return step


def make_cuvol_step(cfg: StepConfig, jit: bool = True):
    """Plenoxels warm-start stage step (sigma grid, opt.py:940-947).

    With ``cfg.renderer == 'packed'`` and a density occupancy passed by the
    trainer, rendering goes through ``volume_render_cuvol_packed`` — the
    pool formulation whose backward scatters 8 rows per occupied VOXEL
    instead of per SAMPLE (the dense fixed-step march's backward was
    scatter-bound at ~13 s/step at 128^3 — PERF.md), which is what makes
    the reference's 256^3 warm start (syn.yaml:1-3) tractable on TPU."""

    def step(grid: SparseGrid, rms: dict, rays: Rays, rgb_gt, hp: HParams, key,
             occ=None, row_coords=None):
        k_tv, k_tvsh, k_bg, k_lum, k_aux = jax.random.split(key, 5)

        if row_coords is not None:
            rc = jax.lax.stop_gradient(row_coords)
            reg_scale = reg.present_norm_scale(grid)
            sample = lambda k, g, frac: reg.sample_present_cells(k, g, rc, frac)
        else:
            reg_scale = 1.0
            sample = reg.sample_cells

        use_packed = cfg.renderer == "packed" and occ is not None

        def loss_fn(density, sh, aux):
            g = grid.replace(density_data=density, sh_data=sh)
            g = _apply_aux(g, aux)
            if use_packed:
                out = volume_render_cuvol_packed(
                    g, rays, cfg.opt,
                    entries_per_ray=cfg.entries_per_ray,
                    occupancy=occ,
                    coarse_factor=cfg.coarse_factor,
                    supers_per_ray=cfg.supers_per_ray,
                )
            else:
                out = volume_render_cuvol(
                    g, rays, cfg.opt, max_steps=cfg.max_steps
                )
            mse = jnp.mean((out["rgb"] - rgb_gt) ** 2)
            loss = mse
            cells_tv = sample(k_tv, g, cfg.tv_sparsity)
            loss += reg_scale * hp.lambda_tv * reg.tv_loss(g, density, cells_tv)
            cells_tvsh = sample(k_tvsh, g, cfg.tv_sh_sparsity)
            loss += reg_scale * hp.lambda_tv_sh * reg.tv_loss(g, sh, cells_tvsh)
            loss += _aux_reg_losses(g, hp, cfg, (k_bg, k_lum, k_aux))
            overflow = out.get("pool_overflow", jnp.asarray(0, jnp.int32))
            return loss, (mse, overflow)

        aux_in = _aux_params(grid, rms)
        (loss, (mse, overflow)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(grid.density_data, grid.sh_data, aux_in)
        if cfg.axis_name is not None:
            grads = jax.lax.pmean(grads, cfg.axis_name)
            loss = jax.lax.pmean(loss, cfg.axis_name)
            mse = jax.lax.pmean(mse, cfg.axis_name)
            overflow = jax.lax.psum(overflow, cfg.axis_name)
        g_density, g_sh, g_aux = grads

        new_density, rms_d = rmsprop_step(
            grid.density_data, rms["density"], g_density, hp.lr_sigma, cfg.rms_beta
        )
        new_sh, rms_sh = rmsprop_step(
            grid.sh_data, rms["sh"], g_sh, hp.lr_sh, cfg.rms_beta
        )
        new_grid = grid.replace(density_data=new_density, sh_data=new_sh)
        new_rms = dict(rms)
        new_rms.update({"density": rms_d, "sh": rms_sh})
        new_aux, rms_aux = _aux_optim(aux_in, g_aux, rms, hp, cfg.rms_beta)
        new_grid = _apply_aux(new_grid, new_aux)
        new_rms.update(rms_aux)

        # overflow => dropped crossings => wrong gradients: keep old params
        # (same contract as the surface step; trainer grows pool + retries)
        keep = (overflow == 0) | (hp.force_apply > 0)
        sel = lambda n, o: jnp.where(keep, n, o)
        new_grid = new_grid.replace(
            density_data=sel(new_grid.density_data, grid.density_data),
            sh_data=sel(new_grid.sh_data, grid.sh_data),
        )
        new_rms = {
            k: jax.tree.map(sel, v, rms[k]) for k, v in new_rms.items()
        }
        stats = {"loss": loss, "mse": mse, "pool_overflow": overflow}
        return new_grid, new_rms, stats

    if jit:
        return jax.jit(step, donate_argnums=(0, 1))
    return step
