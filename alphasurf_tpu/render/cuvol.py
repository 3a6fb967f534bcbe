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


def density_occupancy(grid: SparseGrid,
                      row_coords: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-voxel bool (X-1, Y-1, Z-1): can this voxel contribute to the
    cuvol march? A sample's sigma is relu(trilerp(corners)) with missing
    corners reading 0 (svox2.py:1016-1038), a convex combination — so a
    voxel whose present corners are all <= 0 provably contributes nothing.
    occ = max over corners of (present ? sigma : -inf) > 0.

    ``row_coords`` enables the scatter-built dense field (one ~90 ns row
    scatter per present vertex instead of reso^3 scalar gathers)."""
    links = grid.links
    present = links >= 0
    if row_coords is not None:
        X, Y, Z = links.shape
        rc = row_coords
        flat_pos = (rc[:, 0] * Y + rc[:, 1]) * Z + rc[:, 2]
        dens = (
            jnp.full((links.size,), -jnp.inf, grid.density_data.dtype)
            .at[flat_pos].set(grid.density_data[:, 0], mode="drop")
            .reshape(links.shape)
        )
    else:
        safe = jnp.clip(links, 0, grid.capacity - 1)
        dens = jnp.where(present, grid.density_data[safe, 0], -jnp.inf)
    out = None
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                s = dens[dx : dens.shape[0] - 1 + dx,
                         dy : dens.shape[1] - 1 + dy,
                         dz : dens.shape[2] - 1 + dz]
                out = s if out is None else jnp.maximum(out, s)
    return out > 0


def _cuvol_bounds(grid, origins, dirs, opt):
    """Sample-domain bounds of the cuvol march: planes at -0.5 / gsz-0.5
    (svox2.py:1239-1248), near-clipped."""
    gsz = grid.gsz
    safe_dirs = jnp.where(dirs == 0, 1e-12, dirs)
    t1 = (-0.5 - origins) / safe_dirs
    t2 = (gsz - 0.5 - origins) / safe_dirs
    tmin = jnp.where(dirs == 0, -1e9, jnp.minimum(t1, t2))
    tmin = jnp.clip(jnp.max(tmin, axis=-1), min=opt.near_clip)
    tmaxs = jnp.where(dirs == 0, 1e9, jnp.maximum(t1, t2))
    tmax = jnp.min(tmaxs, axis=-1)
    return tmin, tmax


def volume_render_cuvol_packed(
    grid: SparseGrid,
    rays: Rays,
    opt: RenderOptions,
    entries_per_ray: float = 16.0,
    occupancy: jnp.ndarray | None = None,
    coarse_factor: int = 8,
    supers_per_ray: float = 8.0,
    depth_sigma_thresh: float | None = None,
):
    """Packed-pool cuvol renderer — the production warm-start path.

    The dense fixed-step march's backward scatters B x steps x 8 corner
    rows per step (~13 s at 128^3, B=40960 — PERF.md), because every sample
    re-gathers its own corners. Here the surface renderer's phase A
    (``compact_crossings_packed``) enumerates only OCCUPIED voxel segments
    into a global pool; each pool entry gathers its 8 corners ONCE and
    evaluates the <= ceil(sqrt(3)/step)+1 fixed-step samples that fall
    inside the segment (same global sample lattice t = tmin + k*step as the
    dense walk, so actives match it sample-for-sample). Backward scatter
    drops from 8 rows/sample to 8 rows/occupied-voxel. Transposed (S, M)
    layout throughout (see volume_render_surface_packed).

    Deviation from the dense walk (documented): samples in the outer
    half-voxel band (outside the VERTEX lattice [0, reso-1] but inside the
    sample domain [-0.5, gsz-0.5]) are dropped — the dense path renders
    them with edge-clamped interpolation. Grids whose boundary voxels are
    empty (every recipe grid) are unaffected.

    :return: dict with 'rgb', 'depth', 'log_transmit', 'n_occupied',
        'pool_overflow' (+ 'depth_sigma_thresh').
    """
    from ..ops import dda
    from .surface import compact_crossings_packed

    origins, dirs, viewdirs, delta_scale = dda.preprocess_rays(
        grid, rays.origins, rays.dirs
    )
    B = origins.shape[0]
    dtype = origins.dtype

    from ..core.sh import eval_basis

    sh_mult = eval_basis(grid, viewdirs)

    if opt.use_spheric_clip:
        from ..ops.dda import spheric_bounds

        tmin_cu, tmax_cu = spheric_bounds(grid, origins, dirs, opt.near_clip)
    else:
        tmin_cu, tmax_cu = _cuvol_bounds(grid, origins, dirs, opt)
    tnear_v, tmax_v = dda.ray_bounds(grid, origins, dirs)
    tnear = jnp.maximum(tnear_v, tmin_cu)
    tmaxp = jnp.minimum(tmax_v, tmax_cu)
    ray_ok = (
        jnp.isfinite(tnear) & jnp.isfinite(tmaxp) & (tnear <= tmaxp)
    )

    occ = density_occupancy(grid) if occupancy is None else occupancy
    occ = jax.lax.stop_gradient(occ)
    M = int(B * entries_per_ray)
    ray_id, l, close_t, far_t, valid, n_occ, drop_count = (
        compact_crossings_packed(
            grid, origins, dirs, jnp.where(ray_ok, tnear, 0.0),
            jnp.where(ray_ok, tmaxp, -1.0), occ, M,
            coarse_factor=coarse_factor, supers_per_ray=supers_per_ray,
        )
    )
    ray_id, close_t, far_t, valid = jax.lax.stop_gradient(
        (ray_id, close_t, far_t, valid)
    )
    rid = jnp.clip(ray_id, 0, B - 1)
    seg_id = ray_id

    # packed (density | sh | pad) rows
    c = 1 + grid.sh_data.shape[1]
    pad = (-c) % 8
    parts = [grid.density_data, grid.sh_data]
    if pad:
        parts.append(jnp.zeros((grid.capacity, pad), dtype))
    packed = jnp.concatenate(parts, axis=1)

    oT = jnp.take(origins, rid, axis=0).T  # (3, M)
    dT = jnp.take(dirs, rid, axis=0).T
    shmT = jnp.take(sh_mult, rid, axis=0).T
    lT = l.T

    # fixed-step samples inside the segment, on the global lattice
    # t = tmin_cu + k * step (identical sample positions to the dense walk)
    step = opt.step_size
    S = int(math.ceil(math.sqrt(3.0) / step)) + 1
    tmin_e = jnp.take(tmin_cu, rid)
    k0 = jnp.ceil((close_t - tmin_e) / step - 1e-9)
    t_slots = (
        tmin_e[None, :]
        + (k0[None, :] + jnp.arange(S, dtype=dtype)[:, None]) * step
    )  # (S, M)
    active = (
        valid[None, :]
        & (t_slots < far_t[None, :])
        & (t_slots >= close_t[None, :] - 1e-9)
    )

    # one corner gather per entry (shared by all its samples)
    X, Y, Z = grid.links.shape
    from ..core.grid import CORNER_OFFSETS

    idx_list = []
    for ci in range(8):
        cx = jnp.clip(lT[0] + int(CORNER_OFFSETS[ci, 0]), 0, X - 1)
        cy = jnp.clip(lT[1] + int(CORNER_OFFSETS[ci, 1]), 0, Y - 1)
        cz = jnp.clip(lT[2] + int(CORNER_OFFSETS[ci, 2]), 0, Z - 1)
        idx_list.append((cx * Y + cy) * Z + cz)
    links8T = jax.lax.optimization_barrier(
        jnp.take(grid.links.reshape(-1), jnp.stack(idx_list, 0).reshape(-1))
    ).reshape(8, M)
    v8T_parts = []
    for ci in range(8):
        lk = links8T[ci]
        rows = jax.lax.optimization_barrier(
            jnp.take(packed, jnp.clip(lk, 0, grid.capacity - 1), axis=0)
        )
        v8T_parts.append(rows.T * (lk >= 0)[None, :].astype(dtype))
    v8T = jnp.stack(v8T_parts, axis=0)  # (8, C8, M)
    sigma8T = v8T[:, 0, :]

    bd = grid.basis_dim
    corner_rgbT = []
    for ch in range(3):
        acc = None
        for b in range(bd):
            term = v8T[:, 1 + ch * bd + b, :] * shmT[b][None, :]
            acc = term if acc is None else acc + term
        corner_rgbT.append(acc)  # (8, M)

    from ..ops.trilerp import trilerp_weights_T

    frac = (
        oT[:, None, :] + t_slots[None, :, :] * dT[:, None, :]
        - lT[:, None, :].astype(dtype)
    )  # (3, S, M)
    frac = jnp.clip(jnp.where(active[None, :, :], frac, 0.5), 0.0, 1.0)
    w8 = trilerp_weights_T(frac)  # (8, S, M)
    sigma = jnp.sum(w8 * sigma8T[:, None, :], axis=0)  # (S, M)
    rgb_s = jnp.stack(
        [
            jnp.clip(
                jnp.sum(w8 * corner_rgbT[ch][:, None, :], axis=0) + 0.5,
                min=0.0,
            )
            for ch in range(3)
        ],
        axis=0,
    )  # (3, S, M)

    world_step = step * jnp.take(delta_scale, rid)  # (M,)
    ws = jnp.broadcast_to(world_step[None, :], (S, M))
    if opt.last_sample_opaque:
        ws = jnp.where(
            t_slots + step > jnp.take(tmax_cu, rid)[None, :], 1e9, ws
        )
    log_att = jnp.where(active, -ws * jax.nn.relu(sigma), 0.0)

    seg_sum = functools.partial(
        jax.ops.segment_sum, num_segments=B, indices_are_sorted=True
    )
    # global exclusive prefix in (entry, slot) order (entries ray-major)
    within = jnp.cumsum(log_att, axis=0) - log_att
    e = jnp.sum(log_att, axis=0)
    cum_e = jnp.cumsum(e) - e
    per_ray = seg_sum(e, seg_id)
    base = jnp.cumsum(per_ray) - per_ray
    pre = within + (cum_e - jnp.take(base, rid))[None, :]
    # invalid entries sit mid-pool with garbage prefixes; clamp like the
    # surface compositor (prefix attenuation is always <= 0)
    weight = jnp.where(
        active, jnp.exp(jnp.minimum(pre, 0.0)) * (1.0 - jnp.exp(log_att)), 0.0
    )

    rgb_acc = jnp.stack(
        [seg_sum(jnp.sum(weight * rgb_s[ch], axis=0), seg_id)
         for ch in range(3)], axis=-1,
    )
    depth_acc = seg_sum(jnp.sum(weight * t_slots, axis=0), seg_id)
    log_T = per_ray

    if grid.use_background:
        from .background import render_background

        rgb_acc, log_T = render_background(
            grid, opt, origins, dirs, delta_scale, log_T, rgb_acc
        )
    rgb_out = rgb_acc + jnp.exp(log_T)[..., None] * opt.background_brightness
    out = {
        "rgb": rgb_out,
        "log_transmit": log_T,
        "depth": depth_acc,
        "n_occupied": n_occ,
        "pool_overflow": drop_count,
    }
    if depth_sigma_thresh is not None:
        seg_min = functools.partial(
            jax.ops.segment_min, num_segments=B, indices_are_sorted=True
        )
        hit = active & (sigma > depth_sigma_thresh)
        t_sig = seg_min(
            jnp.min(jnp.where(hit, t_slots, jnp.inf), axis=0), seg_id
        )
        out["depth_sigma_thresh"] = jnp.where(jnp.isfinite(t_sig), t_sig, 0.0)
    return out


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
