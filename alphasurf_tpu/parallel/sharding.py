"""Multi-chip sharding: ray-batch data parallelism over a device mesh.

TPU-native replacement for the reference's single-GPU-only execution
(SURVEY.md §2.4 — no distributed capability exists upstream). Strategy:

  * rays (origins/dirs/gt) sharded over the mesh 'data' axis — the analog
    of the warp-per-ray grid launch, across chips;
  * grid parameters + optimizer state replicated; XLA inserts the gradient
    all-reduce (psum over ICI) between backward and the RMSprop update
    automatically from the sharding annotations — no hand-written
    collectives, overlapped by the XLA scheduler;
  * grid tile-sharding for >HBM grids is the planned extension (the
    512^3+ capacity case).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def shard_surface_step(step_fn, mesh: Mesh, axis: str = "data",
                       model_axis: Optional[str] = None):
    """Wrap a train step (grid, rms, rays, rgb_gt, hp, key[, occ]) with
    data-parallel sharding constraints. When ``model_axis`` is given, grid
    parameter rows (the capacity dimension) and their optimizer state are
    additionally tile-sharded over that axis — the >HBM capacity path: each
    chip holds 1/model of the packed voxel rows, row gathers become
    all-gathers over ICI inserted by XLA."""
    repl = NamedSharding(mesh, P())
    rays_sh = NamedSharding(mesh, P(axis))

    def wrapped(grid, rms, rays, rgb_gt, hp, key, occ=None):
        if model_axis is None:
            grid = jax.device_put(grid, repl)
            rms = jax.device_put(rms, repl)
        else:
            grid = shard_grid_params(grid, mesh, model_axis)
            rms = jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x,
                    NamedSharding(mesh, P(model_axis))
                    if hasattr(x, "ndim") and x.ndim == 2
                    and x.shape[0] == grid.capacity else repl,
                ),
                rms,
            )
        rays = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rays_sh), rays
        )
        rgb_gt = jax.device_put(rgb_gt, rays_sh)
        if occ is not None:
            occ = jax.device_put(occ, repl)
            return step_fn(grid, rms, rays, rgb_gt, hp, key, occ=occ)
        return step_fn(grid, rms, rays, rgb_gt, hp, key)

    return wrapped


def shard_grid_params(grid, mesh: Mesh, model_axis: str = "model"):
    """Tile-shard the packed per-vertex arrays over ``model_axis``
    (capacity dim); links and scalars stay replicated. Capacity must divide
    the axis size — pad the grid beforehand if needed."""
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(model_axis))
    cap = grid.capacity

    def put(x):
        if hasattr(x, "ndim") and x.ndim == 2 and x.shape[0] == cap:
            return jax.device_put(x, rows)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, grid)
