"""Whole-image rendering in fixed-size ray chunks.

Equivalent of ``volume_render_image`` (svox2.py:3641-3691). Fixed chunk size
keeps a single jit specialization; the last partial chunk is padded.
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
from .surface import volume_render_surface


@functools.partial(jax.jit, static_argnames=("opt", "surface", "max_voxels"))
def _render_chunk(grid, origins, dirs, opt, surface: bool, max_voxels):
    rays = Rays(origins, dirs)
    if surface:
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
):
    """Render a full camera image; returns (H, W, 3) numpy (+ depth)."""
    rays = camera.gen_rays()
    n = rays.origins.shape[0]
    surface = grid.surface_data is not None
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
            grid, jnp.asarray(o), jnp.asarray(d), opt, surface, None
        )
        rgb_out[s:e] = np.asarray(rgb)[: e - s]
        depth_out[s:e] = np.asarray(depth)[: e - s]
    rgb_img = rgb_out.reshape(camera.height, camera.width, 3)
    if return_depth:
        return rgb_img, depth_out.reshape(camera.height, camera.width)
    return rgb_img
