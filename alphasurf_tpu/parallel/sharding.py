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


def make_sharded_surface_step(cfg, mesh: Mesh, axis: str = "data",
                              kind: str = "surface"):
    """Data-parallel train step via shard_map: each device runs the FULL
    packed render pipeline on its local ray shard — phase A enumeration,
    pool compaction, sort and segment reductions all stay device-local
    (a per-device pool of (B/n)*entries_per_ray, the multi-chip analog of
    the warp-per-ray grid launch) — and only the gradients cross the mesh
    (pmean over ICI, inserted inside the step; see StepConfig.axis_name).

    This is the production multi-chip path. GSPMD auto-partitioning of the
    same step (``shard_surface_step``) lets XLA slice the global pool ops
    (sort/cumsum/searchsorted) across devices, which generates pathological
    all-gathers — measured ~70x slower at 8 devices.
    """
    import dataclasses

    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map

    from ..train.steps import make_cuvol_step, make_surface_step

    cfg = dataclasses.replace(cfg, axis_name=axis)
    maker = make_surface_step if kind == "surface" else make_cuvol_step
    impl = maker(cfg, jit=False)

    repl = P()
    rayspec = P(axis)

    def spec_of(x, s):
        return jax.tree_util.tree_map(lambda _: s, x)

    _cache = {}

    def _build(grid, rms, rays, hp, extras):
        in_specs = (
            spec_of(grid, repl), spec_of(rms, repl), spec_of(rays, rayspec),
            rayspec, spec_of(hp, repl), repl,
        ) + tuple(repl for _ in extras)
        out_specs = (spec_of(grid, repl), spec_of(rms, repl),
                     {"loss": repl, "mse": repl, "pool_overflow": repl})

        def body(grid, rms, rays, rgb_gt, hp, key, *rest):
            return impl(grid, rms, rays, rgb_gt, hp, key,
                        **dict(zip(extras, rest)))

        fn = shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )
        return jax.jit(fn, donate_argnums=(0, 1))

    repl_sh = NamedSharding(mesh, P())
    rays_sh = NamedSharding(mesh, P(axis))

    def wrapped(grid, rms, rays, rgb_gt, hp, key, occ=None, row_coords=None):
        # cache the jitted shard_map by the arg pytree structure (optional
        # kwarg presence / rays.masks presence / rms key set)
        kwargs = {}
        if occ is not None:
            kwargs["occ"] = occ
        if row_coords is not None:
            kwargs["row_coords"] = row_coords
        extras = tuple(sorted(kwargs))
        ck = (extras, rays.masks is not None, tuple(sorted(rms)),
              grid.surface_data is not None)
        if ck not in _cache:
            _cache[ck] = _build(grid, rms, rays, hp, extras)
        # place inputs on the mesh (no-op when already there: params come
        # back replicated from the previous step)
        grid = jax.device_put(grid, repl_sh)
        rms = jax.device_put(rms, repl_sh)
        rays = jax.tree_util.tree_map(lambda x: jax.device_put(x, rays_sh), rays)
        rgb_gt = jax.device_put(rgb_gt, rays_sh)
        args = (grid, rms, rays, rgb_gt, hp, key) + tuple(
            jax.device_put(kwargs[k], repl_sh) for k in extras
        )
        return _cache[ck](*args)

    return wrapped


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

    def wrapped(grid, rms, rays, rgb_gt, hp, key, occ=None, row_coords=None):
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
        kw = {}
        if occ is not None:
            kw["occ"] = jax.device_put(occ, repl)
        if row_coords is not None:
            kw["row_coords"] = jax.device_put(row_coords, repl)
        return step_fn(grid, rms, rays, rgb_gt, hp, key, **kw)

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
