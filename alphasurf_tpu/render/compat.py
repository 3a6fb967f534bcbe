"""Compat renderer backends: "nvol" and "svox1".

TPU-native equivalents of the reference's secondary backends:

* ``volume_render_nvol`` — Neural-Volumes-style *additive alpha*
  compositing (/root/reference/svox2/csrc/render_lerp_kernel_nvol.cu:48-105):
  ``total_alpha += 1 - exp(-world_step * sigma)`` clamped at 1, sample weight
  = the clamped increment, background weighted by ``1 - total_alpha``.
* ``volume_render_svox1`` — PlenOctrees/svox1 compat: nearest-neighbor
  sampling (the reference shifts the origin by +0.5 and floors,
  render_svox1_kernel.cu:77-110) with standard exponential transmittance.
  Deviation from the reference: fixed-step marching instead of exact
  cell-boundary stepping (the reference's accel-skip walk); step size is a
  ``RenderOptions.step_size`` fraction of a voxel, so results converge to the
  same integral as step_size -> 0.

Both are bounded ``lax.scan`` marches like the cuvol backend, differentiable
under ``jax.grad``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.grid import SparseGrid, fetch_links, gather_corner_links
from ..core.options import RenderOptions
from ..core.rays import Rays
from ..ops.trilerp import trilerp, voxel_of
from .cuvol import max_steps_for


def _march_setup(grid: SparseGrid, rays: Rays, nn_offset: bool):
    from ..core.sh import eval_basis

    origins = grid.world2grid(rays.origins)
    if nn_offset:
        origins = origins + 0.5  # nn-vs-lerp offset (svox1 kernel :77)
    viewdirs = rays.dirs / jnp.linalg.norm(rays.dirs, axis=-1, keepdims=True)
    gsz = grid.gsz
    dirs = viewdirs * (grid.scaling * gsz)
    delta_scale = 1.0 / jnp.linalg.norm(dirs, axis=-1)
    dirs = dirs * delta_scale[..., None]
    sh_mult = eval_basis(grid, viewdirs)
    safe_dirs = jnp.where(dirs == 0, 1e-12, dirs)
    lo = -0.5 if not nn_offset else 0.0
    hi_off = -0.5 if not nn_offset else -1.0
    t1 = (lo - origins) / safe_dirs
    t2 = (gsz + hi_off - origins) / safe_dirs
    tmin = jnp.where(dirs == 0, -1e9, jnp.minimum(t1, t2))
    tmin = jnp.clip(jnp.max(tmin, axis=-1), min=0.0)
    tmaxs = jnp.where(dirs == 0, 1e9, jnp.maximum(t1, t2))
    tmax = jnp.min(tmaxs, axis=-1)
    return origins, dirs, delta_scale, sh_mult, tmin, tmax


def volume_render_nvol(
    grid: SparseGrid,
    rays: Rays,
    opt: RenderOptions,
    max_steps: int | None = None,
):
    """Additive-alpha ("neural volumes") compositing backend."""
    if max_steps is None:
        max_steps = max_steps_for(grid, opt)
    origins, dirs, delta_scale, sh_mult, tmin, tmax = _march_setup(
        grid, rays, nn_offset=False
    )
    B = origins.shape[0]
    reso = grid.reso

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(carry, k):
        total_alpha, rgb_acc, depth_acc = carry
        t = tmin + k.astype(tmin.dtype) * opt.step_size
        active = t <= tmax

        pos = origins + t[..., None] * dirs
        l, frac = voxel_of(pos, reso)
        links8 = gather_corner_links(grid.links, l)
        sigma = trilerp(fetch_links(grid.density_data, links8), frac)[..., 0]
        rgb_sh = trilerp(fetch_links(grid.sh_data, links8), frac)

        use = active & (sigma > opt.sigma_thresh)
        inc = jnp.where(
            use, 1.0 - jnp.exp(-opt.step_size * delta_scale * jax.nn.relu(sigma)), 0.0
        )
        new_total = jnp.minimum(total_alpha + inc, 1.0)
        weight = new_total - total_alpha  # nvol.cu:88-90

        rgb_sh = rgb_sh.reshape(B, 3, grid.basis_dim)
        rgb = jnp.clip(jnp.sum(sh_mult[:, None, :] * rgb_sh, -1) + 0.5, min=0.0)
        rgb_acc = rgb_acc + weight[..., None] * rgb
        depth_acc = depth_acc + weight * t
        return (new_total, rgb_acc, depth_acc), None

    init = (
        jnp.zeros(B, origins.dtype),
        jnp.zeros((B, 3), origins.dtype),
        jnp.zeros(B, origins.dtype),
    )
    (total_alpha, rgb_acc, depth_acc), _ = jax.lax.scan(
        step, init, jnp.arange(max_steps)
    )
    rgb_out = rgb_acc + (1.0 - total_alpha)[..., None] * opt.background_brightness
    return {
        "rgb": rgb_out,
        "alpha": total_alpha,
        "depth": depth_acc,
        "log_transmit": jnp.log(jnp.clip(1.0 - total_alpha, min=1e-10)),
    }


def volume_render_svox1(
    grid: SparseGrid,
    rays: Rays,
    opt: RenderOptions,
    max_steps: int | None = None,
):
    """Nearest-neighbor (PlenOctrees-style) compat backend."""
    if max_steps is None:
        max_steps = max_steps_for(grid, opt)
    origins, dirs, delta_scale, sh_mult, tmin, tmax = _march_setup(
        grid, rays, nn_offset=True
    )
    B = origins.shape[0]
    X, Y, Z = grid.reso
    flat_links = grid.links.reshape(-1)

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(carry, k):
        log_T, rgb_acc, depth_acc = carry
        t = tmin + k.astype(tmin.dtype) * opt.step_size
        active = t <= tmax

        pos = origins + t[..., None] * dirs
        lx = jnp.clip(pos[:, 0].astype(jnp.int32), 0, X - 1)
        ly = jnp.clip(pos[:, 1].astype(jnp.int32), 0, Y - 1)
        lz = jnp.clip(pos[:, 2].astype(jnp.int32), 0, Z - 1)
        lnk = jnp.take(flat_links, (lx * Y + ly) * Z + lz)
        sigma = fetch_links(grid.density_data, lnk)[..., 0]
        rgb_sh = fetch_links(grid.sh_data, lnk)

        use = active & (sigma > opt.sigma_thresh)
        log_att = jnp.where(
            use, -opt.step_size * delta_scale * jax.nn.relu(sigma), 0.0
        )
        weight = jnp.exp(log_T) * (1.0 - jnp.exp(log_att))

        rgb_sh = rgb_sh.reshape(B, 3, grid.basis_dim)
        rgb = jnp.clip(jnp.sum(sh_mult[:, None, :] * rgb_sh, -1) + 0.5, min=0.0)
        rgb_acc = rgb_acc + weight[..., None] * rgb
        depth_acc = depth_acc + weight * t
        log_T = log_T + log_att
        return (log_T, rgb_acc, depth_acc), None

    init = (
        jnp.zeros(B, origins.dtype),
        jnp.zeros((B, 3), origins.dtype),
        jnp.zeros(B, origins.dtype),
    )
    (log_T, rgb_acc, depth_acc), _ = jax.lax.scan(step, init, jnp.arange(max_steps))
    rgb_out = rgb_acc + jnp.exp(log_T)[..., None] * opt.background_brightness
    return {"rgb": rgb_out, "log_transmit": log_T, "depth": depth_acc}


BACKENDS = {
    "nvol": volume_render_nvol,
    "svox1": volume_render_svox1,
}


def volume_render(grid: SparseGrid, rays: Rays, opt: RenderOptions, backend: str,
                  **kwargs):
    """Backend dispatch, the analog of SparseGrid.volume_render's
    ``backend`` switch (svox2.py:3390-3475)."""
    from .cuvol import volume_render_cuvol
    from .surface import volume_render_surface, volume_render_surface_compact

    table = {
        "cuvol": volume_render_cuvol,
        "nvol": volume_render_nvol,
        "svox1": volume_render_svox1,
        "surface": volume_render_surface,
        "surf_trav": volume_render_surface_compact,
    }
    if backend not in table:
        raise ValueError(f"unknown backend {backend!r} (have {sorted(table)})")
    return table[backend](grid, rays, opt, **kwargs)
