"""Device-side resample/upsample — the stage-transition fast path.

TPU re-design of the reference's device resample (svox2.py:3963-4418, which
drives ``_C.sample_grid_raw_alpha`` / ``misc_kernel.cu:888-1082``). The host
implementations in ``core.topology`` build ~16 GB of dense numpy fields at
512^3 and trilerp 134M points on the host — a 20-40 minute stage transition
through the relay (PERF.md "Known cost"). Here everything except two scalar
pulls (the keep count) stays on device:

  * dense vertex fields are built by a capacity-sized row SCATTER
    (the voxel_occupancy trick — ~90 ns/row, not reso^3 scalar gathers);
  * the new-lattice trilerp is three separable 1-D interpolation MATMULS
    (the lattice is an affine map per axis, so resampling is
    ``Mx @ vol @ My^T @ Mz^T`` — MXU work, not gather work);
  * thresholding + 26-neighborhood dilation are a compare plus a
    ``lax.reduce_window`` max-pool ((2n+1)^3 Chebyshev window == n
    iterations of scipy's full 3^3 structuring element);
  * new links are a device cumsum over the keep mask; only the keep COUNT
    (one scalar) is pulled to host to fix the new capacity (static shape);
  * per-channel values for kept cells are a ``lax.scan`` over channels:
    scatter old rows dense -> separable resize -> gather kept ids.

``max_elements`` uses a two-pass histogram quantile on device (exact
``jnp.sort`` below 4M elements): the reference's top-k bound
(svox2.py:4091-4105) needs only "a threshold that keeps <= K cells", so the
upper edge of the sub-bin containing the k-th value is taken (guaranteed
<= K, off by at most range/4096^2 in threshold).

Semantics deviations from ``core.topology`` (both documented here and
covered by the host==device differential test ``tests/test_topology_device``):
  * ``non_expanding`` uses an emptiness-indicator channel (kept cells whose
    interpolation gives the indicator weight > 0 are dropped) instead of
    NaN poisoning — identical except for measure-zero points that land
    exactly on an old lattice plane with an empty far corner.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .grid import SparseGrid


def _interp_matrix(curr: int, new: int, centered: bool) -> np.ndarray:
    """(new, curr) 1-D linear interpolation matrix with the reference
    kernel's clamping (topology._trilerp_dense / svox2_kernel.cu:128-134):
    coords clipped to [0, curr-1], base index to curr-2."""
    if centered:
        fact = 0.5 * curr / new
        x = np.linspace(fact - 0.5, curr - fact - 0.5, new, dtype=np.float64)
    else:
        x = np.linspace(0.0, curr - 0.5, new, dtype=np.float64)
    x = np.clip(x, 0.0, curr - 1.0)
    l = np.minimum(x.astype(np.int64), curr - 2)
    f = (x - l).astype(np.float32)
    m = np.zeros((new, curr), np.float32)
    m[np.arange(new), l] = 1.0 - f
    m[np.arange(new), l + 1] = f
    return m


def _cell_matrix(curr: int, new: int, centered: bool) -> np.ndarray:
    """(new, curr) 0/1 matrix marking BOTH corners (l, l+1) of the cell
    containing each new point — used for the exact ``non_expanding``
    emptiness test: the host/CUDA trilerp NaN-poisons a sample when ANY of
    its cell's corners is empty, even at interpolation weight 0."""
    if centered:
        fact = 0.5 * curr / new
        x = np.linspace(fact - 0.5, curr - fact - 0.5, new, dtype=np.float64)
    else:
        x = np.linspace(0.0, curr - 0.5, new, dtype=np.float64)
    x = np.clip(x, 0.0, curr - 1.0)
    l = np.minimum(x.astype(np.int64), curr - 2)
    m = np.zeros((new, curr), np.float32)
    m[np.arange(new), l] = 1.0
    m[np.arange(new), l + 1] = 1.0
    return m


def _resize3(vol: jnp.ndarray, mx, my, mz) -> jnp.ndarray:
    """Separable trilinear lattice resample: (X,Y,Z) -> (Xn,Yn,Zn)."""
    v = jnp.einsum("ai,ijk->ajk", mx, vol)
    v = jnp.einsum("bj,ajk->abk", my, v)
    return jnp.einsum("ck,abk->abc", mz, v)


def _flat_pos(links: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """(capacity,) flat lattice position of each packed row (any link
    numbering; cf. losses.reg.row_coords_of)."""
    flat = links.reshape(-1)
    pos = jnp.nonzero(flat >= 0, size=capacity, fill_value=0)[0]
    lk = jnp.take(flat, pos)
    return jnp.zeros((capacity,), pos.dtype).at[lk].set(pos)


def _dense_channel(fpos, col, fill, n3):
    return jnp.full((n3,), fill, col.dtype).at[fpos].set(col, mode="drop")


@functools.partial(jax.jit, static_argnames=("new_reso", "fill"))
def _resize_channel_j(links, fpos, col, new_reso, fill, mx, my, mz):
    dense = _dense_channel(fpos, col, fill, links.size).reshape(links.shape)
    return _resize3(dense, mx, my, mz)


@functools.partial(jax.jit, static_argnames=("dilate",))
def _mask_pass_j(crit, thresh, dilate):
    mask = crit >= thresh
    if dilate > 0:
        w = 2 * int(dilate) + 1
        mask = jax.lax.reduce_window(
            mask.astype(jnp.float32), jnp.float32(0.0), jax.lax.max,
            (w, w, w), (1, 1, 1), "SAME",
        ) > 0.0
    return mask, jnp.sum(mask.astype(jnp.int32))


@jax.jit
def _lv_band_mask_j(surf_new, level_sets):
    """Vertex mask of the level-set crossing band: the 8 corners of every
    voxel whose trilerped-surface corner hull straddles some level set.

    The reference's alpha-threshold keep rule assumes the alpha support and
    the surface contours stay aligned (true after its 50k-iter schedule);
    at shorter schedules they drift apart and the alpha mask amputates the
    crossing shell — the round-4 512^3 collapse (occ 0.28 -> 0.0002 at the
    transition). ORing this band in preserves every renderable crossing.
    """
    def corners(v, fn):
        out = None
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    s = v[dx : v.shape[0] - 1 + dx,
                          dy : v.shape[1] - 1 + dy,
                          dz : v.shape[2] - 1 + dz]
                    out = s if out is None else fn(out, s)
        return out

    smin = corners(surf_new, jnp.minimum)
    smax = corners(surf_new, jnp.maximum)
    straddle = jnp.zeros(smin.shape, bool)
    for i in range(level_sets.shape[0]):
        lv = level_sets[i]
        straddle = straddle | ((lv >= smin) & (lv <= smax))
    # voxel mask -> corner-vertex mask: max-pool with a 2^3 window whose
    # padding places vertex (i,j,k) over voxels (i-1..i, ...)
    return jax.lax.reduce_window(
        straddle.astype(jnp.float32), jnp.float32(0.0), jax.lax.max,
        (2, 2, 2), (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
    ) > 0.0


@functools.partial(jax.jit, static_argnames=("n",))
def _links_pass_j(mask, n):
    flat = mask.reshape(-1)
    links = jnp.cumsum(flat.astype(jnp.int32)) - 1
    links = jnp.where(flat, links, -1).reshape(mask.shape)
    kept = jnp.nonzero(flat, size=n, fill_value=0)[0]
    return links, kept


@functools.partial(jax.jit, static_argnames=("new_reso",))
def _gather_channels_j(links, fpos, cols, fills, kept, new_reso, mx, my, mz):
    """cols (C, cap), fills (C,) -> (C, N) values at kept new-lattice ids."""
    n3 = links.size

    def body(_, cf):
        col, fill = cf
        dense = _dense_channel(fpos, col, fill, n3).reshape(links.shape)
        newv = _resize3(dense, mx, my, mz)
        return 0, jnp.take(newv.reshape(-1), kept)

    _, out = jax.lax.scan(body, 0, (cols, fills))
    return out


def _kth_largest_thresh(crit_flat: jnp.ndarray, k: int, thresh: float) -> float:
    """Raise ``thresh`` so at most k elements of crit are >= it
    (svox2.py:4091-4105). Exact via sort for small inputs; two-pass
    histogram upper-edge (guaranteed <= k) for large ones."""
    size = crit_flat.size
    if k <= 0 or k >= size:
        return thresh
    n_over = int(jnp.sum(crit_flat >= thresh))
    if n_over <= k:
        return thresh
    if size <= (1 << 22):
        s = jnp.sort(crit_flat)
        return max(thresh, float(s[size - k]))
    lo, hi = float(crit_flat.min()), float(crit_flat.max())
    for _ in range(2):
        if hi <= lo:
            return max(thresh, lo)
        h = jnp.histogram(crit_flat, bins=4096, range=(lo, hi))[0]
        # find the bin containing the k-th largest; elements above `hi` of
        # the current range were counted in previous rounds via n_above
        cum_from_top = np.cumsum(np.asarray(h)[::-1])[::-1]
        n_above_range = int(jnp.sum(crit_flat > hi))
        tot = cum_from_top + n_above_range
        binw = (hi - lo) / 4096
        idx = int(np.searchsorted(-tot, -k))  # first bin with tot <= k
        # k-th largest lies in bin idx-1 (or below lo if idx == 0)
        if idx == 0:
            return max(thresh, lo)
        lo2 = lo + (idx - 1) * binw
        hi2 = lo + idx * binw
        lo, hi = lo2, hi2
    return max(thresh, hi)


def _make_mats(curr_reso, new_reso, centered):
    return [
        jnp.asarray(_interp_matrix(int(c), int(n), centered))
        for c, n in zip(curr_reso, new_reso)
    ]


@functools.partial(jax.jit, static_argnames=("thresh", "dilate", "prune_surf"))
def _prune_mask_j(links, fpos, dens_col, surf_col, thresh, dilate, prune_surf):
    n3 = links.size
    dens = _dense_channel(fpos, dens_col, 0.0, n3).reshape(links.shape)
    valid = dens > thresh
    if prune_surf and surf_col is not None:
        s = _dense_channel(fpos, surf_col, 0.0, n3).reshape(links.shape)
        sp = jnp.pad(s, 1)
        sign_change = jnp.zeros_like(valid)
        zero = s == 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    nb = jax.lax.dynamic_slice(
                        sp, (1 + dx, 1 + dy, 1 + dz), s.shape
                    )
                    sign_change = sign_change | zero | (nb == 0) | (
                        jnp.sign(s) != jnp.sign(nb)
                    )
        valid = valid & sign_change
    mask, count = _mask_pass_j(
        valid.astype(jnp.float32), jnp.float32(0.5), dilate
    )
    return mask, count


@functools.partial(jax.jit, static_argnames=("n",))
def _prune_gather_j(links, mask, cols, n):
    """Rebuild rows WITHOUT interpolation: kept cells take their old row
    (zeros where the old link was empty — host _dense_field fill)."""
    links_new, kept = _links_pass_j(mask, n)
    old_lk = jnp.take(links.reshape(-1), kept)
    safe = jnp.clip(old_lk, 0, cols.shape[1] - 1)
    vals = jnp.take(cols, safe, axis=1) * (old_lk >= 0)[None, :].astype(
        cols.dtype
    )
    return links_new, vals


def prune_grid_device(
    grid: SparseGrid,
    density_raw_thres: float = 1.0,
    dilate: int = 2,
    prune_surf: bool = True,
) -> SparseGrid:
    """Device-side ``topology.prune_grid`` (svox2.py:2874-2951)."""
    cap = grid.capacity
    fpos = _flat_pos(grid.links, cap)
    surf_col = None
    do_surf = prune_surf and grid.surface_data is not None
    mask, count = _prune_mask_j(
        grid.links, fpos, grid.density_data[:, 0],
        grid.surface_data[:, 0] if do_surf else None,
        float(density_raw_thres), int(dilate), do_surf,
    )
    n = int(count)
    cols = [grid.density_data.T, grid.sh_data.T]
    if grid.surface_data is not None:
        cols.append(grid.surface_data.T)
    links_new, vals = _prune_gather_j(
        grid.links, mask, jnp.concatenate(cols, axis=0), n
    )
    C_sh = grid.sh_data.shape[1]
    out = dict(
        links=links_new,
        density_data=vals[0:1].T,
        sh_data=vals[1 : 1 + C_sh].T,
    )
    if grid.surface_data is not None:
        out["surface_data"] = vals[1 + C_sh :].T
    return grid.replace(**out)


@jax.jit
def _fd_grad_norm_j(links, fpos, surf_col, h):
    """Mean finite-difference gradient norm over cells whose 000/100/010/001
    links are all present (topology._metric_rescale)."""
    n3 = links.size
    p = (links >= 0).astype(jnp.float32)
    s = _dense_channel(fpos, surf_col, 0.0, n3).reshape(links.shape)
    p000 = p[:-1, :-1, :-1]
    ok = (
        p000 * p[1:, :-1, :-1] * p[:-1, 1:, :-1] * p[:-1, :-1, 1:]
    )
    s000 = s[:-1, :-1, :-1]
    g = jnp.sqrt(
        ((s[1:, :-1, :-1] - s000) / h) ** 2
        + ((s[:-1, 1:, :-1] - s000) / h) ** 2
        + ((s[:-1, :-1, 1:] - s000) / h) ** 2
    )
    cnt = jnp.sum(ok)
    return jnp.sum(g * ok) / jnp.maximum(cnt, 1.0), cnt


def metric_rescale_device(grid: SparseGrid) -> SparseGrid:
    """Device-side ``topology._metric_rescale`` (svox2.py:3069-3113)."""
    from .topology import grid_h

    fpos = _flat_pos(grid.links, grid.capacity)
    mean_grad, cnt = _fd_grad_norm_j(
        grid.links, fpos, grid.surface_data[:, 0],
        jnp.float32(grid_h(grid)),
    )
    if int(cnt) == 0:
        return grid
    mg = float(mean_grad)
    if mg <= 0:
        return grid
    return grid.replace(
        surface_data=grid.surface_data / mg,
        level_set_data=grid.level_set_data / mg,
    )


def resample_device(
    grid: SparseGrid,
    new_reso,
    sigma_thresh: float = 5.0,
    weight_thresh: float = 0.01,
    dilate: int = 2,
    cameras=None,
    weight_render_stop_thresh: float = 0.2,
    max_elements: int = 0,
    last_sample_opaque: bool = False,
) -> SparseGrid:
    """Device-side ``topology.resample`` (density/cuvol grids,
    voxel-center lattice — svox2.py:3963-4167)."""
    if isinstance(new_reso, int):
        new_reso = (new_reso,) * 3
    new_reso = tuple(int(r) for r in new_reso)
    curr_reso = grid.links.shape
    mx, my, mz = _make_mats(curr_reso, new_reso, centered=True)
    cap = grid.capacity
    fpos = _flat_pos(grid.links, cap)

    dens_new = _resize_channel_j(
        grid.links, fpos, grid.density_data[:, 0], new_reso, 0.0, mx, my, mz
    )
    if cameras is not None:
        from .weight_render import grid_weight_render

        crit = grid_weight_render(
            dens_new, cameras, grid.offset, grid.scaling,
            stop_thresh=weight_render_stop_thresh,
        )
        thresh = _kth_largest_thresh(crit.reshape(-1), max_elements, weight_thresh)
    else:
        crit = dens_new
        thresh = _kth_largest_thresh(
            crit.reshape(-1), max_elements, sigma_thresh
        )
    if last_sample_opaque:
        crit = crit.at[:, :, -1].set(jnp.inf)
    mask, count = _mask_pass_j(crit, thresh, int(dilate))
    n = int(count)
    links_new, kept = _links_pass_j(mask, n)

    C_sh = grid.sh_data.shape[1]
    cols = jnp.concatenate(
        [grid.density_data.T, grid.sh_data.T], axis=0
    )  # (1+C_sh, cap)
    fills = jnp.zeros((1 + C_sh,), cols.dtype)
    vals = _gather_channels_j(
        grid.links, fpos, cols, fills, kept, new_reso, mx, my, mz
    )
    return grid.replace(
        links=links_new,
        density_data=vals[0:1].T,
        sh_data=vals[1:].T,
    )


def resample_surface_device(
    grid: SparseGrid,
    new_reso,
    alpha_thresh: float = 1e-6,
    weight_thresh: float = 0.01,
    dilate: int = 2,
    cameras=None,
    weight_render_stop_thresh: float = 0.2,
    max_elements: int = 0,
    alpha_empty_val: float = -20.0,
    non_expanding: bool = False,
    sigmoid_alpha: bool = False,
    keep_lv_band: bool = False,
) -> SparseGrid:
    """Device-side ``topology.resample_surface`` (surface grids, vertex
    lattice — svox2.py:4172-4418). ``keep_lv_band`` additionally keeps the
    corners of level-set-straddling voxels (see _lv_band_mask_j)."""
    if isinstance(new_reso, int):
        new_reso = (new_reso,) * 3
    new_reso = tuple(int(r) for r in new_reso)
    curr_reso = grid.links.shape
    mx, my, mz = _make_mats(curr_reso, new_reso, centered=False)
    cap = grid.capacity
    fpos = _flat_pos(grid.links, cap)

    empty_alpha = float(alpha_empty_val) if sigmoid_alpha else 0.0
    dens_new = _resize_channel_j(
        grid.links, fpos, grid.density_data[:, 0], new_reso, empty_alpha,
        mx, my, mz,
    )
    if cameras is not None:
        from .weight_render import grid_weight_render

        crit = grid_weight_render(
            dens_new, cameras, grid.offset, grid.scaling,
            stop_thresh=weight_render_stop_thresh,
        )
        thresh = _kth_largest_thresh(crit.reshape(-1), max_elements, weight_thresh)
    else:
        crit = dens_new
        at = float(alpha_thresh)
        if sigmoid_alpha:
            at = float(np.log(at / (1.0 - at)))
        thresh = _kth_largest_thresh(crit.reshape(-1), max_elements, at)
    mask, count = _mask_pass_j(crit, thresh, int(dilate))
    if keep_lv_band and grid.level_set_data is not None:
        surf_new = _resize_channel_j(
            grid.links, fpos, grid.surface_data[:, 0], new_reso, -1.0,
            mx, my, mz,
        )
        mask = mask | _lv_band_mask_j(surf_new, grid.level_set_data)
        count = jnp.sum(mask.astype(jnp.int32))
    n = int(count)
    links_new, kept = _links_pass_j(mask, n)

    C_sh = grid.sh_data.shape[1]
    cols = [grid.density_data.T, grid.sh_data.T, grid.surface_data.T]
    fills = [empty_alpha, *([0.0] * C_sh), -1.0]
    vals = _gather_channels_j(
        grid.links, fpos, jnp.concatenate(cols, axis=0),
        jnp.asarray(fills, grid.surface_data.dtype), kept, new_reso,
        mx, my, mz,
    )
    if non_expanding:
        # emptiness spread through cell-membership matrices: > 0 iff some
        # corner of the containing cell was empty (exact NaN semantics)
        ex, ey, ez = [
            jnp.asarray(_cell_matrix(int(c), int(n), False))
            for c, n in zip(curr_reso, new_reso)
        ]
        touched = _gather_channels_j(
            grid.links, fpos,
            jnp.zeros((1, cap), grid.surface_data.dtype),
            jnp.ones((1,), grid.surface_data.dtype), kept, new_reso,
            ex, ey, ez,
        )[0]
        keep = touched <= 0.0
        n2 = int(jnp.sum(keep))
        # AND the per-kept-cell flags back into the dense mask, rebuild
        mask2 = (
            mask.reshape(-1).astype(jnp.int32)
            .at[kept].min(keep.astype(jnp.int32))
            .reshape(mask.shape) > 0
        )
        links_new, _ = _links_pass_j(mask2, n2)
        sel = jnp.nonzero(keep, size=n2, fill_value=0)[0]
        vals = vals[:, sel]
    return grid.replace(
        links=links_new,
        density_data=vals[0:1].T,
        sh_data=vals[1 : 1 + C_sh].T,
        surface_data=vals[1 + C_sh : 2 + C_sh].T,
    )
