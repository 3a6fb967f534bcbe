"""Checkpoint I/O — npz format bit-compatible with the reference.

``save``/``load`` mirror SparseGrid.save/load
(/root/reference/svox2/svox2.py:4693-4838): same key names, sh stored fp16,
so checkpoints interoperate both ways (a reference Plenoxels ckpt can
warm-start this framework and vice versa).
"""
from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from .. import defs
from ..core.grid import SparseGrid


def save_grid(grid: SparseGrid, path: str, step_id: int = 0, compress: bool = False):
    save_fn = np.savez_compressed if compress else np.savez
    data = {
        "radius": np.asarray(grid.radius, np.float32),
        "center": np.asarray(grid.center, np.float32),
        "links": np.asarray(grid.links),
        "density_data": np.asarray(grid.density_data, np.float32),
        "sh_data": np.asarray(grid.sh_data).astype(np.float16),
        "step_id": step_id,
        "basis_type": grid.basis_type,
        "surface_type": grid.surface_type,
    }
    if grid.surface_data is not None:
        data["surface_data"] = np.asarray(grid.surface_data, np.float32)
    if grid.level_set_data is not None:
        data["level_set_data"] = np.asarray(grid.level_set_data, np.float32)
    if grid.fake_sample_std is not None:
        data["fake_sample_std"] = np.asarray(grid.fake_sample_std, np.float32)
    if grid.background_data is not None:
        data["background_links"] = np.asarray(grid.background_links)
        data["background_data"] = np.asarray(grid.background_data, np.float32)
    if grid.basis_data is not None:
        data["basis_data"] = np.asarray(grid.basis_data, np.float32)
    if grid.basis_mlp is not None:
        for k, v in grid.basis_mlp.items():
            data[f"basis_mlp.{k}"] = np.asarray(v, np.float32)
    save_fn(path, **data)


def load_grid(path: str, dtype=jnp.float32) -> tuple[SparseGrid, int]:
    """Load a checkpoint (ours or the reference's). Returns (grid, step_id)."""
    z = np.load(path, allow_pickle=True)
    sh_data = z["sh_data"].astype(np.float32)
    density_data = z["density_data"].astype(np.float32)
    links = z["links"]

    # normalize to flat-ordered row numbering (this package's invariant:
    # links values increase along the flattened grid, which lets the reg
    # losses use the scatter-free contiguous-window VJP,
    # core.grid.fetch_links_contiguous). External checkpoints (e.g. the
    # reference's Morton-sorted resample output) may violate it.
    lf = links.reshape(-1)
    occ_rows = lf[lf >= 0]
    row_perm = None
    if occ_rows.size and np.any(np.diff(occ_rows) < 0):
        row_perm = occ_rows  # old row id at each flat-ordered position
        sh_data = sh_data[row_perm]
        if density_data.shape[0] == occ_rows.size:
            density_data = density_data[row_perm]
        lf2 = np.full_like(lf, -1)
        lf2[lf >= 0] = np.arange(occ_rows.size, dtype=np.int32)
        links = lf2.reshape(links.shape)
    surface_type = int(z["surface_type"]) if "surface_type" in z else defs.SURFACE_TYPE_NONE
    surface = None
    level_sets = None
    if surface_type != defs.SURFACE_TYPE_NONE and "surface_data" in z:
        sd = z["surface_data"].astype(np.float32)
        if row_perm is not None and sd.shape[0] == row_perm.size:
            sd = sd[row_perm]
        surface = jnp.asarray(sd, dtype)
    if "level_set_data" in z:
        level_sets = jnp.asarray(z["level_set_data"].astype(np.float32), dtype)
    fss = None
    if "fake_sample_std" in z:
        fss = jnp.asarray(z["fake_sample_std"].astype(np.float32), dtype)
    bg_links = bg_data = basis_data = None
    if "background_data" in z:
        bg_links = jnp.asarray(z["background_links"].astype(np.int32))
        bg_data = jnp.asarray(z["background_data"].astype(np.float32), dtype)
    if "basis_data" in z and z["basis_data"].size:
        basis_data = jnp.asarray(z["basis_data"].astype(np.float32), dtype)
    basis_mlp = None
    mlp_keys = [k for k in z.files if k.startswith("basis_mlp.")]
    if mlp_keys:
        basis_mlp = {
            k.split(".", 1)[1]: jnp.asarray(z[k].astype(np.float32), dtype)
            for k in mlp_keys
        }
    radius = z["radius"] if "radius" in z else np.ones(3, np.float32)
    center = z["center"] if "center" in z else np.zeros(3, np.float32)
    grid = SparseGrid(
        links=jnp.asarray(links.astype(np.int32)),
        density_data=jnp.asarray(density_data, dtype),
        sh_data=jnp.asarray(sh_data, dtype),
        surface_data=surface,
        level_set_data=level_sets,
        fake_sample_std=fss,
        truncated_vol_render_a=jnp.asarray(1.0, dtype),
        radius=jnp.asarray(radius, dtype),
        center=jnp.asarray(center, dtype),
        background_links=bg_links,
        background_data=bg_data,
        basis_data=basis_data,
        basis_mlp=basis_mlp,
        basis_dim=sh_data.shape[1] // 3,
        surface_type=surface_type,
        basis_type=int(z["basis_type"]) if "basis_type" in z else defs.BASIS_TYPE_SH,
    )
    step_id = int(z["step_id"]) if "step_id" in z else 0
    return grid, step_id
