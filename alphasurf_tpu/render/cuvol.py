"""Plenoxels-style density volume renderer ("cuvol" backend).

TPU-native equivalent of ``trace_ray_cuvol``
(/root/reference/svox2/csrc/render_lerp_kernel_cuvol.cu:30-370) and the
Python spec ``_volume_render_gradcheck_lerp``
(/root/reference/svox2/svox2.py:1215-1441).

Design: instead of a per-ray dynamic while-loop, a bounded ``lax.scan`` over
``max_steps`` fixed-size steps with masking past ``tmax`` — rays are padded,
never warp-scheduled. Differentiable end-to-end with ``jax.grad``; each step
is wrapped in ``jax.checkpoint`` so the backward pass re-gathers grid values
instead of storing them (the TPU analog of the CUDA backward's re-traversal,
render_lerp_kernel_cuvol.cu:371).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..core.grid import SparseGrid, fetch_links, gather_corner_links
from ..core.options import RenderOptions
from ..core.rays import Rays
from ..core.sh import eval_sh_bases
from ..ops.trilerp import trilerp, voxel_of


def max_steps_for(grid: SparseGrid, opt: RenderOptions) -> int:
    """Static bound on ray-march steps: grid diagonal / step size."""
    diag = math.sqrt(sum((r - 1) ** 2 for r in grid.reso))
    return int(math.ceil(diag / opt.step_size)) + 2


def volume_render_cuvol(
    grid: SparseGrid,
    rays: Rays,
    opt: RenderOptions,
    max_steps: int | None = None,
    return_depth: bool = False,
    depth_sigma_thresh: float | None = None,
    step_chunk: int = 16,
):
    """Render rays with fixed-step sigma ray-marching.

    :return: dict with 'rgb' (B, 3), 'depth' (B,), and (when
        ``depth_sigma_thresh`` is set) 'depth_sigma_thresh' — the t of the
        first sample whose sigma strictly exceeds the threshold
        (trace_ray_sigma_thresh, render_lerp_kernel_cuvol.cu)
    """
    if max_steps is None:
        max_steps = max_steps_for(grid, opt)

    origins = grid.world2grid(rays.origins)
    viewdirs = rays.dirs / jnp.linalg.norm(rays.dirs, axis=-1, keepdims=True)
    gsz = grid.gsz
    dirs = viewdirs * (grid.scaling * gsz)
    delta_scale = 1.0 / jnp.linalg.norm(dirs, axis=-1)
    dirs = dirs * delta_scale[..., None]

    from ..core.sh import eval_basis

    sh_mult = eval_basis(grid, viewdirs)  # (B, bd)

    # cuvol bounds convention: sample-centered planes at -0.5 / gsz-0.5
    # (svox2.py:1239-1248)
    if opt.use_spheric_clip:
        from ..ops.dda import spheric_bounds

        tmin, tmax = spheric_bounds(grid, origins, dirs, opt.near_clip)
    else:
        safe_dirs = jnp.where(dirs == 0, 1e-12, dirs)
        t1 = (-0.5 - origins) / safe_dirs
        t2 = (gsz - 0.5 - origins) / safe_dirs
        tmin = jnp.where(dirs == 0, -1e9, jnp.minimum(t1, t2))
        tmin = jnp.clip(jnp.max(tmin, axis=-1), min=opt.near_clip)
        tmaxs = jnp.where(dirs == 0, 1e9, jnp.maximum(t1, t2))
        tmax = jnp.min(tmaxs, axis=-1)

    B = origins.shape[0]
    reso = grid.reso

    # one fused (density | sh | pad) row per corner gather, isolated behind
    # an optimization barrier — identical treatment to the surface path's
    # _gather_rows (PERF.md: a fused in-scan gather lowers ~60x slower than
    # the same take as its own kernel; three separate gathers are ~3x one)
    from .surface import _gather_rows

    dtype = origins.dtype
    c = 1 + grid.sh_data.shape[1]
    pad = (-c) % 8
    parts = [grid.density_data, grid.sh_data]
    if pad:
        parts.append(jnp.zeros((grid.capacity, pad), dtype))
    packed = jnp.concatenate(parts, axis=1)

    # V samples march per scan iteration as one wide vector pass: the
    # per-gather-call overhead scales with the TABLE size on TPU (a 128^3
    # links gather costs ~70 ms per call regardless of index count —
    # measured), so it must be amortized over many samples per call
    V = max(1, step_chunk)
    n_chunks = (max_steps + V - 1) // V

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(carry, k0):
        log_T, rgb_acc, depth_acc, t_sig = carry
        ks = k0 * V + jnp.arange(V, dtype=jnp.int32)  # (V,)
        t = tmin[:, None] + ks[None, :].astype(tmin.dtype) * opt.step_size
        active = t <= tmax[:, None]  # (B, V)

        pos = origins[:, None, :] + t[..., None] * dirs[:, None, :]
        l, frac = voxel_of(pos, reso)
        links8 = gather_corner_links(grid.links, l)  # (B, V, 8)
        v8 = _gather_rows(packed, links8, dtype)  # (B, V, 8, C8)
        sigma = trilerp(v8[..., :1], frac)[..., 0]  # (B, V)
        rgb_sh = trilerp(v8[..., 1 : 1 + grid.sh_data.shape[1]], frac)

        world_step = opt.step_size * delta_scale[:, None]
        if opt.last_sample_opaque:
            # force the final in-bounds sample fully opaque
            # (render_lerp_kernel_cuvol.cu:86-88: world_step = 1e9)
            world_step = jnp.where(t + opt.step_size > tmax[:, None], 1e9,
                                   world_step)
        log_att = -world_step * jax.nn.relu(sigma)
        log_att = jnp.where(active, log_att, 0.0)  # (B, V)
        # in-chunk exclusive prefix transmittance (same pattern as the
        # surface compositor's _voxel_pass)
        pre = jnp.cumsum(log_att, axis=1) - log_att
        weight = jnp.exp(log_T[:, None] + pre) * (1.0 - jnp.exp(log_att))

        rgb_sh = rgb_sh.reshape(B, V, 3, grid.basis_dim)
        rgb = jnp.clip(
            jnp.sum(sh_mult[:, None, None, :] * rgb_sh, axis=-1) + 0.5,
            min=0.0,
        )  # (B, V, 3)
        rgb_acc = rgb_acc + jnp.sum(weight[..., None] * rgb, axis=1)
        depth_acc = depth_acc + jnp.sum(weight * t, axis=1)
        log_T = log_T + jnp.sum(log_att, axis=1)
        if depth_sigma_thresh is not None:
            hit = active & (sigma > depth_sigma_thresh)
            t_min = jnp.min(jnp.where(hit, t, jnp.inf), axis=1)
            t_sig = jnp.minimum(t_sig, t_min)
        return (log_T, rgb_acc, depth_acc, t_sig), None

    init = (
        jnp.zeros(B, dtype=origins.dtype),
        jnp.zeros((B, 3), dtype=origins.dtype),
        jnp.zeros(B, dtype=origins.dtype),
        jnp.full(B, jnp.inf, dtype=origins.dtype),
    )
    (log_T, rgb_acc, depth_acc, t_sig), _ = jax.lax.scan(
        step, init, jnp.arange(n_chunks)
    )

    if grid.use_background:
        from .background import render_background

        rgb_acc, log_T = render_background(
            grid, opt, origins, dirs, delta_scale, log_T, rgb_acc
        )
    rgb_out = rgb_acc + jnp.exp(log_T)[..., None] * opt.background_brightness
    out = {"rgb": rgb_out, "log_transmit": log_T, "depth": depth_acc}
    if depth_sigma_thresh is not None:
        out["depth_sigma_thresh"] = jnp.where(
            jnp.isfinite(t_sig), t_sig, 0.0
        )
    return out
