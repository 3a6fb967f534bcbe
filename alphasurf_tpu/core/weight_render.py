"""Camera-sweep grid utilities: max-weight render, max-transmittance render,
mask render, and surface visibility render.

TPU-native equivalents of the reference's misc CUDA kernels used by
resampling and surface initialization:

  * grid_weight_render            misc_kernel.cu:186-283, 888-912
  * sparse_grid_weight_render     misc_kernel.cu:289-401, 914-936
  * sparse_grid_mask_render       misc_kernel.cu:404-508, 938-528
  * sparse_grid_visbility_render_surf   misc_kernel.cu:510-718, 939-952

Design: instead of one CUDA thread per camera ray with atomicMax/atomicAdd
into the grid, rays are processed in fixed-size chunks; a ``lax.scan`` walks
the march/traversal and performs one batched scatter-max/add per step into
the carried grid buffer. Everything is jit-compiled per (chunk, reso) shape.
These run once per upsample/init, not in the training hot loop.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .grid import SparseGrid, gather_corner_links
from ..ops.cubic import cubic_coeffs, cubic_roots


def _ray_chunks(origins, dirs, chunk):
    n = origins.shape[0]
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        o, d = origins[s:e], dirs[s:e]
        if e - s < chunk:
            pad = chunk - (e - s)
            o = np.concatenate([o, np.repeat(o[-1:], pad, 0)])
            d = np.concatenate([d, np.repeat(d[-1:], pad, 0)])
        yield jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def _march_prep(origins, dirs, scaling, offset, size, step_size):
    """Grid-space ray setup identical to grid_trace_ray
    (misc_kernel.cu:200-226): transform coords, unit-length grid dirs,
    world_step, [-0.5, size-0.5] slab bounds starting at t=0."""
    o = origins * scaling + offset
    d = dirs * scaling
    delta_scale = 1.0 / jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d * delta_scale
    world_step = delta_scale[:, 0] * step_size

    safe = jnp.where(d == 0, 1e-12, d)
    t1 = (-0.5 - o) / safe
    t2 = (size - 0.5 - o) / safe
    tmin = jnp.max(jnp.where(d == 0, 0.0, jnp.minimum(t1, t2)), -1)
    tmin = jnp.maximum(tmin, 0.0)
    tmax = jnp.min(jnp.where(d == 0, 2e3, jnp.maximum(t1, t2)), -1)
    tmax = jnp.minimum(tmax, 2e3)
    return o, d, world_step, tmin, tmax


def _voxel_and_frac(o, d, t, size):
    pos = o + t[:, None] * d
    pos = jnp.clip(pos, 0.0, size - 1.0)
    l = jnp.minimum(pos.astype(jnp.int32), (size - 2).astype(jnp.int32))
    return l, pos - l


def _trilerp_dense(vol_flat, size, l, frac):
    """Trilerp a dense (X*Y*Z,) field at voxel l + frac."""
    sx, sy, sz = int(size[0]), int(size[1]), int(size[2])
    base = (l[:, 0] * sy + l[:, 1]) * sz + l[:, 2]
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (frac[:, 0] if dx else 1 - frac[:, 0])
                    * (frac[:, 1] if dy else 1 - frac[:, 1])
                    * (frac[:, 2] if dz else 1 - frac[:, 2])
                )
                out = out + w * jnp.take(vol_flat, base + (dx * sy + dy) * sz + dz)
    return out


def _corner_flat(l, size):
    sy, sz = int(size[1]), int(size[2])
    base = (l[:, 0] * sy + l[:, 1]) * sz + l[:, 2]
    offs = jnp.asarray(
        [0, 1, sz, sz + 1, sy * sz, sy * sz + 1, sy * sz + sz, sy * sz + sz + 1],
        jnp.int32,
    )
    return base[:, None] + offs[None, :]


@functools.partial(jax.jit, static_argnames=("step_size", "n_steps"))
def _dense_weight_chunk(vol, wt, origins, dirs, scaling, offset,
                        step_size: float, stop_thresh, n_steps: int):
    """One ray-chunk of grid_weight_render (misc_kernel.cu:186-283):
    fixed-step sigma march over a dense density volume; scatter-max the
    per-sample weight into the 8 corners of each visited voxel."""
    size = jnp.asarray(vol.shape, jnp.float32)
    vol_flat = vol.reshape(-1)
    o, d, world_step, tmin, tmax = _march_prep(
        origins, dirs, scaling, offset, size, step_size
    )

    def step(carry, k):
        wt, log_T = carry
        t = tmin + k.astype(jnp.float32) * step_size
        active = (t <= tmax) & (jnp.exp(log_T) >= stop_thresh)
        l, frac = _voxel_and_frac(o, d, t, size)
        sigma = _trilerp_dense(vol_flat, vol.shape, l, frac)
        hit = active & (sigma > 1e-8)
        log_att = jnp.where(hit, -world_step * sigma, 0.0)
        w = jnp.where(hit, jnp.exp(log_T) * (1.0 - jnp.exp(log_att)), 0.0)
        flat8 = _corner_flat(l, vol.shape)
        wt = wt.at[flat8].max(w[:, None], mode="drop")
        return (wt, log_T + log_att), None

    (wt, _), _ = jax.lax.scan(
        step, (wt, jnp.zeros(origins.shape[0], jnp.float32)),
        jnp.arange(n_steps),
    )
    return wt


def grid_weight_render(vol, cameras, world_offset, world_scaling,
                       step_size=0.5, stop_thresh=0.2, chunk=65536):
    """Max per-vertex ray weight of a dense density volume over cameras
    (resample's weight-thresholding pass, svox2.py:4063-4091).

    :param vol: (X, Y, Z) density (sampled at the NEW resolution)
    :param cameras: list of core.rays.Camera
    :param world_offset/world_scaling: the grid's world->[0,1] transform
        (``grid.offset`` / ``grid.scaling``, 3-vectors)
    :return: (X, Y, Z) float32 max weight
    """
    vol = jnp.asarray(vol, jnp.float32)
    reso = vol.shape
    gsz = np.asarray(reso, np.float32)
    # offset/scaling exactly as svox2.py:4066-4067 (sample points sit at
    # voxel centers of the new lattice, hence the extra -0.5)
    scaling = jnp.asarray(np.asarray(world_scaling) * gsz, jnp.float32)
    offset = jnp.asarray(np.asarray(world_offset) * gsz - 0.5, jnp.float32)
    diag = math.sqrt(sum((r - 1) ** 2 for r in reso))
    n_steps = int(math.ceil(diag / step_size)) + 2
    wt = jnp.zeros(int(np.prod(reso)), jnp.float32)
    for cam in cameras:
        rays = cam.gen_rays()
        for o, d in _ray_chunks(np.asarray(rays.origins), np.asarray(rays.dirs), chunk):
            wt = _dense_weight_chunk(
                vol, wt, o, d, scaling, offset,
                float(step_size), jnp.float32(stop_thresh), n_steps,
            )
    return wt.reshape(reso)


@functools.partial(jax.jit, static_argnames=("step_size", "n_steps"))
def _sparse_transmit_chunk(links, density, out, origins, dirs, scaling, offset,
                           step_size: float, stop_thresh, n_steps: int):
    """One chunk of sparse_grid_weight_render (misc_kernel.cu:289-401):
    march the sparse grid, scatter-max exp(log_T) (transmittance BEFORE the
    sample) into the 8 corner links."""
    size = jnp.asarray(links.shape, jnp.float32)
    o, d, world_step, tmin, tmax = _march_prep(
        origins, dirs, scaling, offset, size, step_size
    )

    def step(carry, k):
        out, log_T = carry
        t = tmin + k.astype(jnp.float32) * step_size
        active = (t <= tmax) & (jnp.exp(log_T) >= stop_thresh)
        l, frac = _voxel_and_frac(o, d, t, size)
        links8 = gather_corner_links(links, l)  # (B, 8)
        safe = jnp.clip(links8, 0, density.shape[0] - 1)
        v8 = jnp.take(density[:, 0], safe) * (links8 >= 0)
        w = (
            (1 - frac[:, 0:1]) * (1 - frac[:, 1:2]),
            (1 - frac[:, 0:1]) * frac[:, 1:2],
            frac[:, 0:1] * (1 - frac[:, 1:2]),
            frac[:, 0:1] * frac[:, 1:2],
        )
        wz = jnp.concatenate(
            [w[0] * (1 - frac[:, 2:3]), w[0] * frac[:, 2:3],
             w[1] * (1 - frac[:, 2:3]), w[1] * frac[:, 2:3],
             w[2] * (1 - frac[:, 2:3]), w[2] * frac[:, 2:3],
             w[3] * (1 - frac[:, 2:3]), w[3] * frac[:, 2:3]],
            axis=1,
        )
        sigma = jnp.sum(wz * v8, axis=1)
        hit = active & (sigma > 1e-8)
        T = jnp.where(hit, jnp.exp(log_T), 0.0)
        idx = jnp.where(links8 >= 0, links8, out.shape[0])
        out = out.at[idx].max(T[:, None], mode="drop")
        log_att = jnp.where(hit, -world_step * sigma, 0.0)
        return (out, log_T + log_att), None

    (out, _), _ = jax.lax.scan(
        step, (out, jnp.zeros(origins.shape[0], jnp.float32)),
        jnp.arange(n_steps),
    )
    return out


def sparse_grid_weight_render(grid: SparseGrid, cameras, step_size=0.5,
                              stop_thresh=0.0, chunk=65536):
    """Per-vertex max transmittance over camera rays
    (surf_init_type='weight', svox2.py:3122-3146).

    :return: (capacity,) float32
    """
    gsz = np.asarray(grid.reso, np.float32)
    scaling = jnp.asarray(np.asarray(grid.scaling) * gsz, jnp.float32)
    offset = jnp.asarray(np.asarray(grid.offset) * gsz, jnp.float32)
    diag = math.sqrt(sum((r - 1) ** 2 for r in grid.reso))
    n_steps = int(math.ceil(diag / step_size)) + 2
    out = jnp.zeros(grid.capacity, jnp.float32)
    for cam in cameras:
        rays = cam.gen_rays()
        for o, d in _ray_chunks(np.asarray(rays.origins), np.asarray(rays.dirs), chunk):
            out = _sparse_transmit_chunk(
                grid.links, grid.density_data, out, o, d, scaling, offset,
                float(step_size), jnp.float32(stop_thresh), n_steps,
            )
    return out


@jax.jit
def _mask_chunk(links, out, origins, dirs, tnear, tmax):
    """One chunk of sparse_grid_mask_render (misc_kernel.cu:404-508): mark
    the corner links of every voxel the ray crosses (exact voxel enumeration
    instead of the kernel's 0.1-step march)."""
    from ..render.surface import all_crossings

    reso = links.shape
    _, _, seg_valid, (lx, ly, lz), in_bounds = all_crossings(
        reso, origins, dirs, tnear, tmax
    )
    l = jnp.stack([lx, ly, lz], axis=-1)  # (B, S, 3)
    links8 = gather_corner_links(links, l)  # (B, S, 8)
    ok = (seg_valid & in_bounds)[..., None] & (links8 >= 0)
    idx = jnp.where(ok, links8, out.shape[0])
    return out.at[idx].max(jnp.ones_like(idx, jnp.float32), mode="drop")


def sparse_grid_mask_render(grid: SparseGrid, origins_w, dirs_w,
                            near_clip=0.0, chunk=16384):
    """Per-vertex 0/1: is the vertex adjacent to any voxel crossed by the
    given rays? (mask-based pruning, svox2.py:2980-3014).

    :return: (capacity,) float32 in {0, 1}
    """
    from ..ops import dda

    out = jnp.zeros(grid.capacity, jnp.float32)
    for o, d in _ray_chunks(np.asarray(origins_w), np.asarray(dirs_w), chunk):
        og, dg, _, _ = dda.preprocess_rays(grid, o, d)
        tnear, tmax = dda.ray_bounds(grid, og, dg)
        tnear = jnp.maximum(tnear, near_clip)
        ray_ok = jnp.isfinite(tnear) & jnp.isfinite(tmax) & (tnear <= tmax)
        out = _mask_chunk(
            grid.links, out, og, dg,
            jnp.where(ray_ok, tnear, 0.0), jnp.where(ray_ok, tmax, -1.0),
        )
    return out


@jax.jit
def _visibility_chunk(links, surface, level_sets, out, origins, dirs,
                      tnear, tmax):
    """One chunk of sparse_grid_visbility_render_surf (misc_kernel.cu:
    510-718): walk voxels in t-order, add +1 to the corner links of every
    voxel visited before (and including) the first voxel containing a real
    surface intersection."""
    from ..render.surface import all_crossings

    reso = links.shape
    seg_start, seg_end, seg_valid, (lx, ly, lz), in_bounds = all_crossings(
        reso, origins, dirs, tnear, tmax
    )
    B, S = seg_start.shape
    l = jnp.stack([lx, ly, lz], axis=-1)
    links8 = gather_corner_links(links, l)  # (B, S, 8)
    all_present = jnp.all(links8 >= 0, axis=-1)

    safe = jnp.clip(links8, 0, surface.shape[0] - 1)
    surf8 = jnp.take(surface[:, 0], safe) * (links8 >= 0)

    # cubic intersection test per (voxel, level set), kernel :645-716
    u = (
        origins[:, None, :]
        + jnp.maximum(seg_start, 0.0)[..., None] * dirs[:, None, :]
        - l
    )
    f0, f1, f2, f3 = cubic_coeffs(surf8, u, dirs[:, None, :])
    smin = jnp.min(surf8, axis=-1)
    smax = jnp.max(surf8, axis=-1)
    has_hit = jnp.zeros((B, S), bool)
    for i in range(level_sets.shape[0]):
        lv = level_sets[i]
        lv_ok = (lv >= smin) & (lv <= smax)
        roots = cubic_roots(f0 - lv, f1, f2, f3)  # (B, S, 3)
        t_real = jnp.maximum(seg_start, 0.0)[..., None] + roots
        frac = (
            origins[:, None, None, :]
            + t_real[..., None] * dirs[:, None, None, :]
            - l[:, :, None, :]
        )
        in_cube = jnp.all(frac >= 0, -1) & jnp.all(frac <= 1, -1)
        has_hit = has_hit | (
            lv_ok[..., None] & (roots > 0) & in_cube
        ).any(-1)
    has_hit = has_hit & seg_valid & in_bounds & all_present

    # visited = all segments up to and including the first hit
    first_hit = jnp.where(
        jnp.any(has_hit, axis=1), jnp.argmax(has_hit, axis=1), S
    )
    seg_i = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    visited = seg_valid & in_bounds & (seg_i <= first_hit[:, None])

    ok = visited[..., None] & (links8 >= 0)
    idx = jnp.where(ok, links8, out.shape[0])
    return out.at[idx].add(ok.astype(jnp.float32), mode="drop")


def sparse_grid_visibility_render_surf(grid: SparseGrid, cameras,
                                       chunk=16384):
    """Per-vertex visit count before surface occlusion
    (visibility pruning, svox2.py:3204-3221).

    :return: (capacity,) float32 counts
    """
    from ..ops import dda

    out = jnp.zeros(grid.capacity, jnp.float32)
    for cam in cameras:
        rays = cam.gen_rays()
        for o, d in _ray_chunks(np.asarray(rays.origins), np.asarray(rays.dirs), chunk):
            og, dg, _, _ = dda.preprocess_rays(grid, o, d)
            tnear, tmax = dda.ray_bounds(grid, og, dg)
            ray_ok = jnp.isfinite(tnear) & jnp.isfinite(tmax) & (tnear <= tmax)
            out = _visibility_chunk(
                grid.links, grid.surface_data, grid.level_set_data, out,
                og, dg, jnp.where(ray_ok, tnear, 0.0),
                jnp.where(ray_ok, tmax, -1.0),
            )
    return out
