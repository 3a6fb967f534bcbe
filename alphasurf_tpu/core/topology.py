"""Sparse-topology mutation: pruning, NeRF->surface init, upsampling.

Host-side (numpy) re-designs of the reference's grid-mutation methods —
these change array *shapes* (capacity), so they live outside jit and trigger
a retrace, exactly as SURVEY.md §7 "hard parts" #4 prescribes:

  * prune_grid            svox2.py:2874-2951 (+ _C.dilate, misc_kernel.cu:24)
  * init_surface_from_density   svox2.py:2954-3225 (density path)
  * resample (upsample)   svox2.py:3963-4418 (simplified, alpha-threshold)
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from .. import defs
from .grid import SparseGrid


def _np(x):
    return np.asarray(x)


def _dense_field(grid: SparseGrid, data) -> np.ndarray:
    """Scatter packed data to a dense (X,Y,Z,C) array, 0 where empty."""
    links = _np(grid.links)
    d = _np(data)
    out = np.zeros(links.shape + (d.shape[-1],), d.dtype)
    mask = links >= 0
    out[mask] = d[links[mask]]
    return out


def _rebuild(grid: SparseGrid, valid_mask: np.ndarray, dense_fields: dict):
    """New links + packed data from a dense keep-mask."""
    reso = _np(grid.links).shape
    flat = valid_mask.reshape(-1)
    links = np.cumsum(flat.astype(np.int32)) - 1
    links[~flat] = -1
    links = links.reshape(reso).astype(np.int32)
    new = {}
    for name, dense in dense_fields.items():
        new[name] = jnp.asarray(dense.reshape(-1, dense.shape[-1])[flat])
    return grid.replace(links=jnp.asarray(links), **new)


def _dilate(mask: np.ndarray, n: int) -> np.ndarray:
    """26-neighborhood binary dilation, n times (_C.dilate)."""
    from scipy import ndimage

    if n <= 0:
        return mask
    struct = np.ones((3, 3, 3), bool)
    return ndimage.binary_dilation(mask, structure=struct, iterations=int(n))


def prune_grid(
    grid: SparseGrid,
    density_raw_thres: float = 1.0,
    dilate: int = 2,
    prune_surf: bool = True,
) -> SparseGrid:
    """Drop vertices with low raw density; in surface mode additionally keep
    only vertices whose surface sign differs from some 27-neighbor
    (svox2.py:2893-2927), then dilate the keep-mask."""
    dens = _dense_field(grid, grid.density_data)
    sh = _dense_field(grid, grid.sh_data)
    valid = dens[..., 0] > density_raw_thres

    fields = {"density_data": dens, "sh_data": sh}
    if grid.surface_data is not None:
        surf = _dense_field(grid, grid.surface_data)
        fields["surface_data"] = surf
        if prune_surf:
            s = surf[..., 0]
            sp = np.pad(s, 1)
            sign_change = np.zeros_like(valid)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        nb = sp[1 + dx : 1 + dx + s.shape[0],
                                1 + dy : 1 + dy + s.shape[1],
                                1 + dz : 1 + dz + s.shape[2]]
                        sign_change |= (s == 0) | (nb == 0) | (np.sign(s) != np.sign(nb))
            valid &= sign_change

    valid = _dilate(valid, dilate)
    return _rebuild(grid, valid, fields)


def grid_h(grid: SparseGrid) -> float:
    """Mean world size of one voxel (svox2.py:3228-3232)."""
    gsz = float(np.mean(_np(grid.links).shape))
    return 2.0 * float(np.mean(_np(grid.radius))) / gsz


def init_surface_from_density(
    grid: SparseGrid,
    density_lvs: List[float] = (0.5,),
    alpha_rescale: Optional[float] = None,
    prune_threshold: float = 1e-8,
    dilate: int = 2,
    zero_lv_density: Optional[float] = None,
    rng: Optional[np.random.Generator] = None,
) -> SparseGrid:
    """Plenoxels-density -> SDF conversion (svox2.py:3054-3118, 'density'
    init path): surface = density - zero_lv; level_sets = density_lvs -
    zero_lv; prune; metric rescale so |grad(surface)| ~= 1 in world units
    (positive-INSIDE sdf convention)."""
    density_lvs = list(density_lvs)
    if zero_lv_density is None:
        zero_lv_density = density_lvs[len(density_lvs) // 2]

    level_sets = np.asarray(density_lvs, np.float32) - zero_lv_density
    surface = _np(grid.density_data).astype(np.float32) - zero_lv_density
    grid = grid.replace(
        surface_data=jnp.asarray(surface),
        level_set_data=jnp.asarray(level_sets),
        surface_type=defs.SURFACE_TYPE_SDF
        if grid.surface_type == defs.SURFACE_TYPE_NONE
        else grid.surface_type,
    )
    grid = prune_grid(grid, prune_threshold, dilate, prune_surf=False)

    # metric rescale by mean finite-difference gradient norm over non-empty
    # cells whose +x/+y/+z neighbors exist (svox2.py:3069-3113)
    links = _np(grid.links)
    surf = _np(grid.surface_data)[:, 0]
    l000 = links[:-1, :-1, :-1]
    l100 = links[1:, :-1, :-1]
    l010 = links[:-1, 1:, :-1]
    l001 = links[:-1, :-1, 1:]
    ok = (l000 >= 0) & (l100 >= 0) & (l010 >= 0) & (l001 >= 0)
    h = grid_h(grid)
    if ok.any():
        g = np.sqrt(
            ((surf[l100[ok]] - surf[l000[ok]]) / h) ** 2
            + ((surf[l010[ok]] - surf[l000[ok]]) / h) ** 2
            + ((surf[l001[ok]] - surf[l000[ok]]) / h) ** 2
        )
        mean_grad = float(g.mean())
        if mean_grad > 0:
            grid = grid.replace(
                surface_data=grid.surface_data / mean_grad,
                level_set_data=grid.level_set_data / mean_grad,
            )
    if alpha_rescale is not None:
        grid = grid.replace(density_data=grid.density_data * alpha_rescale)
    return grid


def upsample(
    grid: SparseGrid,
    new_reso,
    alpha_upsample_thresh: float = -1e9,
    dilate: int = 2,
    use_sigmoid_occupancy: bool = False,
) -> SparseGrid:
    """Resample all fields onto a finer vertex lattice
    (resample_surface, svox2.py:4172-4418, simplified: occupancy from old
    links + raw-alpha threshold, dilated).

    New vertex j maps to old grid coordinate j * gsz_old / gsz_new.
    """
    if isinstance(new_reso, int):
        new_reso = (new_reso,) * 3
    old_reso = _np(grid.links).shape
    scale = np.asarray(old_reso, np.float64) / np.asarray(new_reso, np.float64)

    dens = _dense_field(grid, grid.density_data)
    sh = _dense_field(grid, grid.sh_data)
    occ = (_np(grid.links) >= 0).astype(np.float32)

    coords = np.stack(
        np.meshgrid(*[np.arange(r, dtype=np.float64) for r in new_reso],
                    indexing="ij"),
        axis=-1,
    ) * scale  # (X',Y',Z',3) in old grid coords

    def trilerp_dense(vol, pts):
        from scipy import ndimage

        out = np.stack(
            [
                ndimage.map_coordinates(
                    vol[..., c], [pts[..., 0], pts[..., 1], pts[..., 2]],
                    order=1, mode="nearest",
                )
                for c in range(vol.shape[-1])
            ],
            axis=-1,
        )
        return out

    new_dens = trilerp_dense(dens, coords).astype(np.float32)
    new_sh = trilerp_dense(sh, coords).astype(np.float32)
    new_occ = trilerp_dense(occ[..., None], coords)[..., 0] > 1e-6

    valid = new_occ & (new_dens[..., 0] > alpha_upsample_thresh)
    fields = {"density_data": new_dens, "sh_data": new_sh}
    if grid.surface_data is not None:
        surf = _dense_field(grid, grid.surface_data)
        new_surf = trilerp_dense(surf, coords).astype(np.float32)
        fields["surface_data"] = new_surf
        s = new_surf[..., 0]
        # keep vertices near a level set as well (sign-change vs neighbors)
        near = np.zeros_like(valid)
        for lv in _np(grid.level_set_data):
            sp = np.pad(s - lv, 1, mode="edge")
            for ax in range(3):
                lo = [slice(1, -1)] * 3
                hi = [slice(1, -1)] * 3
                hi[ax] = slice(2, None)
                near |= np.sign(sp[tuple(lo)]) != np.sign(sp[tuple(hi)])
        valid |= near & new_occ
    valid = _dilate(valid, dilate)

    fake = np.full(new_reso, -1, np.int32)
    stub = grid.replace(links=jnp.asarray(fake))
    return _rebuild(stub, valid, fields)
