"""Iso-surface geometry extraction.

  * ``extract_iso_points`` — exact port of the reference's per-cell
    axis-ray cubic extraction (``cubic_extract_iso_pts``,
    /root/reference/svox2/csrc/svox2_kernel.cu:248-382; Python wrapper
    svox2.py:4525-4579): inside each occupied voxel shoot n^2 rays along
    each axis, solve the surface cubic, keep the first root in [0,1] whose
    trilerped density passes the threshold. Fully vectorized with vmap
    instead of a thread per cell.

  * ``extract_mesh`` — marching-tetrahedra mesh of the surface field
    (replaces the reference's PyMCubes dependency, svox2.py:4583-4689,
    which is unavailable here; MT needs no 256-entry case tables and
    produces a watertight triangulation of the same iso-surface).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import SparseGrid, fetch_links, gather_corner_links
from ..ops.cubic import cubic_coeffs, cubic_roots
from ..ops.trilerp import trilerp_weights


def occupied_cells(grid: SparseGrid) -> np.ndarray:
    """Flat ids of cells whose 8 corners all exist (host-side)."""
    links = np.asarray(grid.links)
    ok = np.ones(tuple(s - 1 for s in links.shape), bool)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ok &= links[dx : links.shape[0] - 1 + dx,
                            dy : links.shape[1] - 1 + dy,
                            dz : links.shape[2] - 1 + dz] >= 0
    X, Y, Z = links.shape
    idx = np.nonzero(ok.reshape(-1))[0]
    # convert cell-grid flat index back to link-grid flat index convention
    cx, cy, cz = np.unravel_index(idx, (X - 1, Y - 1, Z - 1))
    return (cx * Y + cy) * Z + cz


def _extract_cell_points(grid: SparseGrid, cells: jnp.ndarray, n_sample: int,
                         density_thresh: float, surf_lv_set: float):
    """(n_cells, 3*n_sample^2, 3) grid-space points; NaN where none."""
    X, Y, Z = grid.reso
    z = cells % Z
    xy = cells // Z
    y = xy % Y
    x = xy // Y
    l = jnp.stack([x, y, z], axis=-1)
    links8 = gather_corner_links(grid.links, l)
    field = grid.surface_data if grid.surface_data is not None else grid.density_data
    lv = surf_lv_set if grid.surface_data is not None else density_thresh
    s8 = fetch_links(field, links8)[..., 0] - lv  # (n, 8)
    d8 = fetch_links(grid.density_data, links8)[..., 0]  # (n, 8)
    ok = jnp.all(links8 >= 0, axis=-1)

    offs = jnp.arange(n_sample, dtype=s8.dtype) / max(n_sample - 1, 1)
    p1, p2 = jnp.meshgrid(offs, offs, indexing="ij")
    p1 = p1.reshape(-1)
    p2 = p2.reshape(-1)  # (m,)
    m = p1.shape[0]

    pts_all = []
    for axis in range(3):
        d = jnp.zeros((m, 3), s8.dtype).at[:, axis].set(1.0)
        o = jnp.zeros((m, 3), s8.dtype)
        o1, o2 = [a for a in range(3) if a != axis]
        o = o.at[:, o1].set(p1).at[:, o2].set(p2)
        # (n, m) cubics
        f0, f1, f2, f3 = cubic_coeffs(
            s8[:, None, :], o[None, :, :], d[None, :, :]
        )
        roots = cubic_roots(f0, f1, f2, f3)  # (n, m, 3)
        pos = o[None, :, None, :] + roots[..., None] * d[None, :, None, :]
        in01 = (roots >= 0.0) & (roots <= 1.0)
        w8 = trilerp_weights(jnp.clip(pos, 0.0, 1.0))  # (n, m, 3, 8)
        dens = jnp.einsum("nmrk,nk->nmr", w8, d8)
        valid = in01 & (dens >= density_thresh) & ok[:, None, None]
        # first valid root per (cell, ray) — mirrors the kernel's break
        first = jnp.argmax(valid, axis=-1)
        any_v = jnp.any(valid, axis=-1)
        sel = jnp.take_along_axis(pos, first[..., None, None], axis=2)[:, :, 0, :]
        sel = jnp.where(any_v[..., None], sel + l[:, None, :].astype(s8.dtype),
                        jnp.nan)
        pts_all.append(sel)
    return jnp.concatenate(pts_all, axis=1)  # (n, 3m, 3)


def extract_iso_points(
    grid: SparseGrid,
    n_sample: int = 5,
    density_thresh: float = 0.0,
    surf_lv_set: float = 0.0,
    cells: Optional[np.ndarray] = None,
    batch: int = 65536,
    to_world: bool = True,
    scene_scale: float = 1.0,
) -> np.ndarray:
    """All iso-surface points of the grid (equivalent of
    SparseGrid.extract_pts, svox2.py:4552-4579). Returns (N, 3) numpy."""
    if cells is None:
        cells = occupied_cells(grid)
    fn = jax.jit(_extract_cell_points, static_argnums=(2,))
    out = []
    for s in range(0, len(cells), batch):
        chunk = cells[s : s + batch]
        if len(chunk) < batch and s > 0:
            pad = batch - len(chunk)
            chunk = np.concatenate([chunk, np.full(pad, chunk[-1])])
            pts = np.asarray(
                fn(grid, jnp.asarray(chunk, jnp.int32), n_sample,
                   density_thresh, surf_lv_set)
            )[: len(cells) - s]
        else:
            pts = np.asarray(
                fn(grid, jnp.asarray(chunk, jnp.int32), n_sample,
                   density_thresh, surf_lv_set)
            )
        out.append(pts.reshape(-1, 3))
    pts = np.concatenate(out, axis=0)
    pts = pts[~np.isnan(pts).any(axis=-1)]
    if to_world:
        gsz = np.asarray(grid.reso, np.float64)
        radius = np.asarray(grid.radius)
        center = np.asarray(grid.center)
        pts = pts * (2.0 * radius / gsz) + (center - radius)
        pts = pts / scene_scale
    return pts.astype(np.float32)


# ------------------------- marching tetrahedra -----------------------------

# 6-tetrahedra decomposition of the cube (corner indices in reference order:
# z fastest — 0:000 1:001 2:010 3:011 4:100 5:101 6:110 7:111)
_TETS = np.array(
    [[0, 5, 1, 3], [0, 5, 3, 7], [0, 5, 7, 4], [0, 7, 3, 2], [0, 7, 2, 6], [0, 7, 6, 4]],
    dtype=np.int32,
)
_CORNERS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], dtype=np.float64
)


def marching_tetrahedra(field: np.ndarray, level: float = 0.0,
                        use_native: bool = True):
    """Triangulate the ``field == level`` iso-surface of a dense (X,Y,Z)
    scalar field. Returns (verts (V,3) in grid coords, faces (F,3)).

    Dispatches to the threaded C++ implementation (csrc/native.cpp) when
    available; the NumPy path below is the differential-test oracle."""
    if use_native:
        from ..utils import native

        out = native.marching_tetrahedra(field, level)
        if out is not None:
            return out
    X, Y, Z = field.shape
    f = field - level
    # all cells
    cx, cy, cz = np.meshgrid(
        np.arange(X - 1), np.arange(Y - 1), np.arange(Z - 1), indexing="ij"
    )
    base = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)  # (C,3)
    corner_vals = np.stack(
        [f[base[:, 0] + int(c[0]), base[:, 1] + int(c[1]), base[:, 2] + int(c[2])]
         for c in _CORNERS],
        axis=-1,
    )  # (C,8)
    # quick reject: cells with all same sign
    mixed = ~((corner_vals > 0).all(-1) | (corner_vals < 0).all(-1))
    base = base[mixed]
    corner_vals = corner_vals[mixed]

    verts = []
    for tet in _TETS:
        v = corner_vals[:, tet]  # (C,4)
        p = _CORNERS[tet][None, :, :] + base[:, None, :]  # (C,4,3)
        inside = v < 0
        n_in = inside.sum(-1)

        def interp(pa, pb, va, vb):
            t = va / (va - vb + 1e-30)
            return pa + t[:, None] * (pb - pa)

        # case: exactly 1 inside -> 1 triangle; 2 inside -> quad (2 tris);
        # 3 inside -> 1 triangle (complement)
        for k in (1, 3):
            sel = n_in == k
            if not sel.any():
                continue
            vv, pp = v[sel], p[sel]
            ins = (vv < 0) if k == 1 else (vv >= 0)
            ai = np.argmax(ins, axis=-1)
            a_val = np.take_along_axis(vv, ai[:, None], 1)[:, 0]
            a_pos = np.take_along_axis(pp, ai[:, None, None], 1)[:, 0]
            # the 3 non-selected tet vertices (selected one sorts last)
            others = np.argsort(ins * 10 + np.arange(4)[None, :], axis=-1)[:, :3]
            tri = []
            for oi in range(3):
                b = others[:, oi]
                b_val = np.take_along_axis(vv, b[:, None], 1)[:, 0]
                b_pos = np.take_along_axis(pp, b[:, None, None], 1)[:, 0]
                tri.append(interp(a_pos, b_pos, a_val, b_val))
            verts.append(np.stack(tri, axis=1))
        sel = n_in == 2
        if sel.any():
            vv, pp = v[sel], p[sel]
            ins = vv < 0
            # pairs (in, out)
            ii = np.argsort(~ins, axis=-1)[:, :2]  # two inside
            oo = np.argsort(ins, axis=-1)[:, :2]  # two outside
            e = {}
            for a in range(2):
                for b in range(2):
                    av = np.take_along_axis(vv, ii[:, a][:, None], 1)[:, 0]
                    ap = np.take_along_axis(pp, ii[:, a][:, None, None], 1)[:, 0]
                    bv = np.take_along_axis(vv, oo[:, b][:, None], 1)[:, 0]
                    bp = np.take_along_axis(pp, oo[:, b][:, None, None], 1)[:, 0]
                    e[(a, b)] = interp(ap, bp, av, bv)
            verts.append(np.stack([e[(0, 0)], e[(0, 1)], e[(1, 1)]], axis=1))
            verts.append(np.stack([e[(0, 0)], e[(1, 1)], e[(1, 0)]], axis=1))

    if not verts:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int32)
    tris = np.concatenate(verts, axis=0)  # (T,3,3)
    V = tris.reshape(-1, 3)
    F = np.arange(len(V), dtype=np.int32).reshape(-1, 3)
    return V, F


def extract_mesh(
    grid: SparseGrid,
    path: Optional[str] = None,
    level: float = 0.0,
    density_thresh: Optional[float] = None,
    to_world: bool = True,
):
    """Dense-sample the surface field and triangulate (svox2.py:4583-4689).
    Note: the reference SDF is positive INSIDE, so 'inside' = field > level;
    we negate before triangulating. Writes OBJ if path given."""
    from ..core.topology import _dense_field

    field = _dense_field(grid, grid.surface_data)[..., 0]
    links = np.asarray(grid.links)
    field = np.where(links >= 0, field, -np.inf)  # empty = outside
    V, F = marching_tetrahedra(-field, -level)
    if density_thresh is not None and len(V):
        from ..ops.trilerp import sample_grid

        dens = np.asarray(
            sample_grid(grid, jnp.asarray(V, jnp.float32), grid_coords=True,
                        want_colors=False)[0]
        )[:, 0]
        keep3 = (dens >= density_thresh).reshape(-1, 3).all(-1)
        F = F[keep3]
    if to_world and len(V):
        gsz = np.asarray(grid.reso, np.float64)
        V = V * (2.0 * np.asarray(grid.radius) / gsz) + (
            np.asarray(grid.center) - np.asarray(grid.radius)
        )
    if path is not None:
        with open(path, "w") as fh:
            for v in V:
                fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for f3 in F:
                fh.write(f"f {f3[0]+1} {f3[1]+1} {f3[2]+1}\n")
    return V, F
