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


def shard_surface_step(step_fn, mesh: Mesh, axis: str = "data"):
    """Wrap a train step (grid, rms, rays, rgb_gt, hp, key) -> ... with
    data-parallel sharding constraints."""
    repl = NamedSharding(mesh, P())
    rays_sh = NamedSharding(mesh, P(axis))

    def ray_sharding(rays_tree):
        return jax.tree_util.tree_map(lambda _: rays_sh, rays_tree)

    def wrapped(grid, rms, rays, rgb_gt, hp, key):
        grid = jax.device_put(grid, repl)
        rms = jax.device_put(rms, repl)
        rays = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rays_sh), rays
        )
        rgb_gt = jax.device_put(rgb_gt, rays_sh)
        return step_fn(grid, rms, rays, rgb_gt, hp, key)

    return wrapped
