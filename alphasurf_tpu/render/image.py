"""Whole-image rendering in fixed-size ray chunks.

Equivalent of ``volume_render_image`` (svox2.py:3641-3691). Fixed chunk size
keeps a single jit specialization; the last partial chunk is padded. Surface
grids render through the occupancy-compacted traversal (the production fast
path — the reference's surf_trav backend has no image kernel and uses the
batched-ray path, svox2.py:3671-3683); the dense walk remains available via
``compact=False`` for oracle comparisons.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import SparseGrid
from ..core.options import RenderOptions
from ..core.rays import Camera, Rays
from .cuvol import volume_render_cuvol
from .surface import (
    volume_render_surface,
    volume_render_surface_compact,
    voxel_occupancy,
)

_occ_fn = jax.jit(voxel_occupancy, static_argnums=1)


@functools.partial(
    jax.jit,
    static_argnames=("opt", "surface", "max_voxels", "compact",
                     "max_intersect_voxels"),
)
def _render_chunk(grid, origins, dirs, opt, surface: bool, max_voxels,
                  compact: bool, max_intersect_voxels: int, occ=None):
    rays = Rays(origins, dirs)
    if surface:
        if compact:
            out = volume_render_surface_compact(
                grid, rays, opt, max_intersect_voxels=max_intersect_voxels,
                occupancy=occ,
            )
        else:
            out = volume_render_surface(grid, rays, opt, max_voxels=max_voxels)
    else:
        out = volume_render_cuvol(grid, rays, opt)
    return out["rgb"], out["depth"]


def render_image(
    grid: SparseGrid,
    camera: Camera,
    opt: RenderOptions,
    chunk: int = 16384,
    return_depth: bool = False,
    compact: bool = True,
    max_intersect_voxels: int = 64,
):
    """Render a full camera image; returns (H, W, 3) numpy (+ depth)."""
    rays = camera.gen_rays()
    n = rays.origins.shape[0]
    surface = grid.surface_data is not None
    # occupancy once per image, shared by all chunks
    occ = _occ_fn(grid, opt) if (surface and compact) else None
    rgb_out = np.zeros((n, 3), np.float32)
    depth_out = np.zeros((n,), np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        o = np.asarray(rays.origins[s:e])
        d = np.asarray(rays.dirs[s:e])
        if e - s < chunk:  # pad to fixed chunk to avoid re-jit
            pad = chunk - (e - s)
            o = np.concatenate([o, np.repeat(o[-1:], pad, 0)])
            d = np.concatenate([d, np.repeat(d[-1:], pad, 0)])
        rgb, depth = _render_chunk(
            grid, jnp.asarray(o), jnp.asarray(d), opt, surface, None,
            compact, max_intersect_voxels, occ,
        )
        rgb_out[s:e] = np.asarray(rgb)[: e - s]
        depth_out[s:e] = np.asarray(depth)[: e - s]
    rgb_img = rgb_out.reshape(camera.height, camera.width, 3)
    if return_depth:
        return rgb_img, depth_out.reshape(camera.height, camera.width)
    return rgb_img
