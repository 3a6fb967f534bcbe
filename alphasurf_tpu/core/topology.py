"""Sparse-topology mutation: pruning, NeRF->surface init, resampling.

Host-side (numpy) re-designs of the reference's grid-mutation methods —
these change array *shapes* (capacity), so they live outside jit and trigger
a retrace, exactly as SURVEY.md §7 "hard parts" #4 prescribes:

  * prune_grid            svox2.py:2874-2951 (+ _C.dilate, misc_kernel.cu:24)
  * init_surface_from_density   svox2.py:2954-3225 (density, weight, mask
                                pruning, visibility pruning paths)
  * resample              svox2.py:3963-4167 (sigma/weight thresh,
                                max_elements topk bound)
  * resample_surface      svox2.py:4172-4418 (alpha/weight thresh,
                                non_expanding, max_elements)

The camera-sweep passes (weight render, visibility, mask) run on device via
``core.weight_render``.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from .. import defs
from .grid import SparseGrid


def _np(x):
    return np.asarray(x)


def _dense_field(grid: SparseGrid, data, fill=0.0) -> np.ndarray:
    """Scatter packed data to a dense (X,Y,Z,C) array, ``fill`` where empty
    (the MAYBE_READ_LINK_D default semantics, svox2_kernel.cu:138)."""
    links = _np(grid.links)
    d = _np(data)
    out = np.full(links.shape + (d.shape[-1],), fill, d.dtype)
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


def _trilerp_dense(vol: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Trilerp a dense (X,Y,Z,C) field at grid-coordinate points (N,3) with
    the reference kernel's clamping (svox2_kernel.cu:128-134). NaN corner
    values poison the result exactly like the CUDA lerp does."""
    reso = vol.shape[:3]
    p = pts.copy()
    for i in range(3):
        p[:, i] = np.clip(p[:, i], 0.0, reso[i] - 1.0)
    l = np.minimum(p.astype(np.int64), np.asarray(reso, np.int64) - 2)
    f = p - l
    out = np.zeros((p.shape[0], vol.shape[-1]), vol.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                out += w[:, None] * vol[l[:, 0] + dx, l[:, 1] + dy, l[:, 2] + dz]
    return out


def prune_grid(
    grid: SparseGrid,
    density_raw_thres: float = 1.0,
    dilate: int = 2,
    prune_surf: bool = True,
) -> SparseGrid:
    """Drop vertices with low raw density; in surface mode additionally keep
    only vertices whose surface sign differs from some 27-neighbor
    (svox2.py:2893-2927), then dilate the keep-mask. Large grids dispatch
    to the device implementation."""
    if int(np.prod(_np(grid.links).shape)) >= _DEVICE_DISPATCH_SIZE:
        from .topology_device import prune_grid_device

        return prune_grid_device(grid, density_raw_thres, dilate, prune_surf)
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


def _metric_rescale(grid: SparseGrid) -> SparseGrid:
    """Rescale surface + level sets by the mean finite-difference gradient
    norm over non-empty cells (svox2.py:3069-3113). Large grids dispatch to
    the device implementation."""
    if int(np.prod(_np(grid.links).shape)) >= _DEVICE_DISPATCH_SIZE:
        from .topology_device import metric_rescale_device

        return metric_rescale_device(grid)
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
    return grid


def init_surface_from_density(
    grid: SparseGrid,
    density_lvs: List[float] = (0.5,),
    alpha_rescale: Optional[float] = None,
    prune_threshold: float = 1e-8,
    dilate: int = 2,
    zero_lv_density: Optional[float] = None,
    init_type: str = "density",
    weight_init_cams=None,
    visibility_pruning_scale: float = 0.0,
    mask_pruning_rays=None,
    rng: Optional[np.random.Generator] = None,
) -> SparseGrid:
    """Plenoxels-density -> SDF conversion (svox2.py:2954-3225):
    surface = density - zero_lv (optionally weighted by max camera
    transmittance when init_type='weight'); level_sets = density_lvs -
    zero_lv; prune; metric rescale so |grad(surface)| ~= 1 in world units
    (positive-INSIDE sdf convention); optional mask-based density pruning
    and visibility-based surface pruning."""
    density_lvs = list(density_lvs)
    if zero_lv_density is None:
        zero_lv_density = density_lvs[len(density_lvs) // 2]

    if mask_pruning_rays is not None:
        # zero out density of cells never touched by foreground rays and of
        # cells touched by known-background rays (svox2.py:2981-3014)
        from .weight_render import sparse_grid_mask_render

        m = _np(
            getattr(mask_pruning_rays, "masks", None)
            if getattr(mask_pruning_rays, "masks", None) is not None
            else mask_pruning_rays.mask
        ).astype(bool)
        o = _np(mask_pruning_rays.origins)
        d = _np(mask_pruning_rays.dirs)
        if m.any():
            obj = np.asarray(sparse_grid_mask_render(grid, o[m], d[m]))
            grid = grid.replace(
                density_data=grid.density_data * jnp.asarray(obj)[:, None]
            )
        if (~m).any():
            empty = np.asarray(sparse_grid_mask_render(grid, o[~m], d[~m]))
            grid = grid.replace(
                density_data=grid.density_data
                * jnp.asarray(1.0 - empty)[:, None]
            )

    level_sets = np.asarray(density_lvs, np.float32) - zero_lv_density
    surface = _np(grid.density_data).astype(np.float32) - zero_lv_density
    if init_type == "weight":
        # weight-based init: density scaled by per-vertex max transmittance
        # before the zero-level shift (svox2.py:3122-3148)
        assert weight_init_cams, "init_type='weight' requires cameras"
        from .weight_render import sparse_grid_weight_render

        wt = np.asarray(sparse_grid_weight_render(grid, weight_init_cams))
        surface = (
            _np(grid.density_data).astype(np.float32) * wt[:, None]
            - zero_lv_density
        )
    grid = grid.replace(
        surface_data=jnp.asarray(surface),
        level_set_data=jnp.asarray(level_sets),
        surface_type=defs.SURFACE_TYPE_SDF
        if grid.surface_type == defs.SURFACE_TYPE_NONE
        else grid.surface_type,
    )
    grid = prune_grid(grid, prune_threshold, dilate, prune_surf=False)
    grid = _metric_rescale(grid)
    if alpha_rescale is not None:
        grid = grid.replace(density_data=grid.density_data * alpha_rescale)

    if visibility_pruning_scale > 0 and weight_init_cams:
        # push surfaces of rarely-visible vertices strongly outside
        # (svox2.py:3204-3221; threshold = scale * max visit count)
        from .weight_render import sparse_grid_visibility_render_surf

        vis = np.asarray(sparse_grid_visibility_render_surf(grid, weight_init_cams))
        thresh = visibility_pruning_scale * float(vis.max())
        if thresh > 0:
            surf = _np(grid.surface_data).copy()
            surf_min = float(surf.min())
            low = vis < thresh
            surf[low, 0] = (vis[low] - thresh) / thresh * surf_min
            grid = grid.replace(surface_data=jnp.asarray(surf))
    return grid


def _bound_thresh_by_topk(vals: np.ndarray, thresh: float, max_elements: int):
    """Raise ``thresh`` so at most max_elements cells pass
    (svox2.py:4091-4105)."""
    if max_elements > 0 and max_elements < vals.size:
        mask = vals >= thresh
        if max_elements < np.count_nonzero(mask):
            kth = np.partition(vals.reshape(-1), vals.size - max_elements)[
                vals.size - max_elements
            ]
            thresh = max(thresh, float(kth))
    return thresh


def _new_lattice_points(curr_reso, new_reso, centered: bool) -> np.ndarray:
    """Sample lattice of the new grid expressed in old grid coords.

    centered=True: resample's voxel-center lattice (svox2.py:4012-4031);
    centered=False: resample_surface's vertex lattice (svox2.py:4229-4247).
    """
    axes = []
    for i in range(3):
        if centered:
            fact = 0.5 * curr_reso[i] / new_reso[i]
            axes.append(np.linspace(fact - 0.5, curr_reso[i] - fact - 0.5,
                                    new_reso[i], dtype=np.float64))
        else:
            axes.append(np.linspace(0.0, curr_reso[i] - 0.5, new_reso[i],
                                    dtype=np.float64))
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    return pts.reshape(-1, 3).astype(np.float32)


# Above this many lattice points (old or new), dispatch to the device-side
# implementation (core.topology_device): the host numpy path builds dense
# fields of that size and trilerps them point-by-point — 20-40 min at 512^3
# through the relay, vs seconds on chip (round-4 verdict item 2).
_DEVICE_DISPATCH_SIZE = 2 ** 21  # 128^3


def _use_device(curr_reso, new_reso) -> bool:
    import numpy as _npmod

    return max(
        int(_npmod.prod(curr_reso)), int(_npmod.prod(new_reso))
    ) >= _DEVICE_DISPATCH_SIZE


def resample(
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
    """Resample+sparsify a density (cuvol) grid onto a new lattice
    (svox2.py:3963-4167). Thresholds by sigma, or by max camera ray weight
    when cameras are given; ``max_elements`` bounds capacity via top-k.
    Large grids dispatch to the device implementation."""
    if isinstance(new_reso, int):
        new_reso = (new_reso,) * 3
    new_reso = tuple(int(r) for r in new_reso)
    if _use_device(_np(grid.links).shape, new_reso):
        from .topology_device import resample_device

        return resample_device(
            grid, new_reso, sigma_thresh=sigma_thresh,
            weight_thresh=weight_thresh, dilate=dilate, cameras=cameras,
            weight_render_stop_thresh=weight_render_stop_thresh,
            max_elements=max_elements, last_sample_opaque=last_sample_opaque,
        )
    curr_reso = _np(grid.links).shape
    pts = _new_lattice_points(curr_reso, new_reso, centered=True)

    dens_dense = _dense_field(grid, grid.density_data)
    vals_density = _trilerp_dense(dens_dense, pts).reshape(new_reso)

    if cameras is not None:
        from .weight_render import grid_weight_render

        max_wt = np.asarray(grid_weight_render(
            vals_density, cameras, _np(grid.offset), _np(grid.scaling),
            stop_thresh=weight_render_stop_thresh,
        ))
        weight_thresh = _bound_thresh_by_topk(max_wt, weight_thresh, max_elements)
        mask = max_wt >= weight_thresh
    else:
        sigma_thresh = _bound_thresh_by_topk(vals_density, sigma_thresh, max_elements)
        mask = vals_density >= sigma_thresh
        if last_sample_opaque:
            mask[:, :, -1] = True

    mask = _dilate(mask, dilate)
    sh_dense = _dense_field(grid, grid.sh_data)
    flat = mask.reshape(-1)
    vals_sh = _trilerp_dense(sh_dense, pts[flat])

    new_dens = vals_density.reshape(-1, 1)[flat]
    fields = {
        "density_data": np.zeros(new_reso + (1,), np.float32),
        "sh_data": np.zeros(new_reso + (grid.sh_data.shape[1],), np.float32),
    }
    fields["density_data"].reshape(-1, 1)[flat] = new_dens
    fields["sh_data"].reshape(-1, grid.sh_data.shape[1])[flat] = vals_sh
    stub = grid.replace(links=jnp.asarray(np.full(new_reso, -1, np.int32)))
    return _rebuild(stub, mask, fields)


def resample_surface(
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
    """Resample+sparsify a surface grid (svox2.py:4172-4418). Thresholds by
    raw alpha (sigmoid thresholds converted via logit, :4324-4326), or by
    max camera ray weight; ``non_expanding`` drops new vertices whose
    interpolation touched any previously-empty vertex (NaN default surf,
    :4357-4383); ``max_elements`` bounds capacity via top-k.
    ``keep_lv_band`` additionally keeps the corners of voxels whose
    trilerped-surface hull straddles a level set — the alpha-threshold
    rule alone amputates the crossing shell when the alpha support and the
    surface contours have drifted apart (under-converged grids; see
    topology_device._lv_band_mask_j). Large grids dispatch to the device
    implementation."""
    if isinstance(new_reso, int):
        new_reso = (new_reso,) * 3
    new_reso = tuple(int(r) for r in new_reso)
    if _use_device(_np(grid.links).shape, new_reso):
        from .topology_device import resample_surface_device

        return resample_surface_device(
            grid, new_reso, alpha_thresh=alpha_thresh,
            weight_thresh=weight_thresh, dilate=dilate, cameras=cameras,
            weight_render_stop_thresh=weight_render_stop_thresh,
            max_elements=max_elements, alpha_empty_val=alpha_empty_val,
            non_expanding=non_expanding, sigmoid_alpha=sigmoid_alpha,
            keep_lv_band=keep_lv_band,
        )
    curr_reso = _np(grid.links).shape
    pts = _new_lattice_points(curr_reso, new_reso, centered=False)

    empty_alpha = alpha_empty_val if sigmoid_alpha else 0.0
    dens_dense = _dense_field(grid, grid.density_data, fill=empty_alpha)
    vals_density = _trilerp_dense(dens_dense, pts).reshape(new_reso)

    if cameras is not None:
        from .weight_render import grid_weight_render

        max_wt = np.asarray(grid_weight_render(
            vals_density, cameras, _np(grid.offset), _np(grid.scaling),
            stop_thresh=weight_render_stop_thresh,
        ))
        weight_thresh = _bound_thresh_by_topk(max_wt, weight_thresh, max_elements)
        mask = max_wt >= weight_thresh
    else:
        if sigmoid_alpha:
            alpha_thresh = float(np.log(alpha_thresh / (1.0 - alpha_thresh)))
        alpha_thresh = _bound_thresh_by_topk(vals_density, alpha_thresh, max_elements)
        mask = vals_density >= alpha_thresh

    mask = _dilate(mask, dilate)
    if keep_lv_band and grid.level_set_data is not None:
        surf_for_band = _dense_field(grid, grid.surface_data, fill=-1.0)
        band_surf = _trilerp_dense(surf_for_band, pts)[:, 0].reshape(new_reso)
        smin = band_surf
        smax = band_surf
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    s = band_surf[dx:new_reso[0] - 1 + dx,
                                  dy:new_reso[1] - 1 + dy,
                                  dz:new_reso[2] - 1 + dz]
                    if (dx, dy, dz) == (0, 0, 0):
                        smin, smax = s.copy(), s.copy()
                    else:
                        np.minimum(smin, s, out=smin)
                        np.maximum(smax, s, out=smax)
        straddle = np.zeros(smin.shape, bool)
        for lv in _np(grid.level_set_data):
            straddle |= (lv >= smin) & (lv <= smax)
        band = np.zeros(new_reso, bool)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    band[dx:new_reso[0] - 1 + dx,
                         dy:new_reso[1] - 1 + dy,
                         dz:new_reso[2] - 1 + dz] |= straddle
        mask = mask | band
    flat = mask.reshape(-1)

    sh_dense = _dense_field(grid, grid.sh_data)
    surf_dense = _dense_field(
        grid, grid.surface_data, fill=np.nan if non_expanding else -1.0
    )
    vals_sh = _trilerp_dense(sh_dense, pts[flat])
    vals_surf = _trilerp_dense(surf_dense, pts[flat])

    if non_expanding:
        # drop samples that interpolated across previously-pruned vertices
        keep = ~np.isnan(vals_surf[:, 0])
        valid_ids = np.flatnonzero(flat)
        flat[valid_ids] = keep
        mask = flat.reshape(new_reso)
        vals_sh = vals_sh[keep]
        vals_surf = vals_surf[keep]

    new_dens = vals_density.reshape(-1, 1)[flat]
    fields = {
        "density_data": np.zeros(new_reso + (1,), np.float32),
        "sh_data": np.zeros(new_reso + (grid.sh_data.shape[1],), np.float32),
        "surface_data": np.zeros(new_reso + (1,), np.float32),
    }
    fields["density_data"].reshape(-1, 1)[flat] = new_dens
    fields["sh_data"].reshape(-1, grid.sh_data.shape[1])[flat] = vals_sh
    fields["surface_data"].reshape(-1, 1)[flat] = vals_surf
    stub = grid.replace(links=jnp.asarray(np.full(new_reso, -1, np.int32)))
    return _rebuild(stub, mask, fields)


def upsample(
    grid: SparseGrid,
    new_reso,
    alpha_upsample_thresh: float = -1e9,
    dilate: int = 2,
    cameras=None,
    weight_thresh: float = 0.01,
    max_elements: int = 0,
    non_expanding: bool = False,
    sigmoid_alpha: bool = False,
    keep_lv_band: bool = False,
) -> SparseGrid:
    """Upsample dispatch used by the trainer: resample_surface for surface
    grids, resample for density grids (opt.py:1256-1272)."""
    if grid.surface_data is not None:
        return resample_surface(
            grid, new_reso, alpha_thresh=alpha_upsample_thresh,
            weight_thresh=weight_thresh, dilate=dilate, cameras=cameras,
            max_elements=max_elements, non_expanding=non_expanding,
            sigmoid_alpha=sigmoid_alpha, keep_lv_band=keep_lv_band,
        )
    return resample(
        grid, new_reso, sigma_thresh=alpha_upsample_thresh,
        weight_thresh=weight_thresh, dilate=dilate, cameras=cameras,
        max_elements=max_elements,
    )


def sparsify_background(
    grid: SparseGrid, sigma_thresh: float = 1.0, dilate: int = 1
) -> SparseGrid:
    """Prune MSI background cells whose sigma falls below ``sigma_thresh``
    (svox2.py:4422-4444): per-(cell, layer) mask, dilated in the 2D
    background-link plane, any-layer reduced, links rebuilt."""
    if grid.background_data is None:
        return grid
    links = _np(grid.background_links).copy()
    data = _np(grid.background_data)
    H, W = links.shape
    n_layers = data.shape[1]
    sigma_mask = np.zeros((H * W, n_layers), bool)
    nonempty = links.reshape(-1) >= 0
    sigma_mask[nonempty] = data[links.reshape(-1)[nonempty], :, -1] >= sigma_thresh
    sigma_mask = sigma_mask.reshape(H, W, n_layers)
    for _ in range(int(dilate)):
        m = sigma_mask
        grown = m.copy()
        grown[1:] |= m[:-1]
        grown[:-1] |= m[1:]
        grown[:, 1:] |= m[:, :-1]
        grown[:, :-1] |= m[:, 1:]
        grown[..., 1:] |= m[..., :-1]
        grown[..., :-1] |= m[..., 1:]
        sigma_mask = grown
    keep = sigma_mask.any(-1) & nonempty.reshape(H, W)
    old_rows = links[keep]
    new_links = np.full((H, W), -1, np.int32)
    new_links[keep] = np.arange(keep.sum(), dtype=np.int32)
    return grid.replace(
        background_links=jnp.asarray(new_links),
        background_data=jnp.asarray(data[old_rows]),
    )


def resize_basis(grid: SparseGrid, basis_dim: int) -> SparseGrid:
    """Change the SH basis dimension in place (svox2.py:4447-4481 'resize'):
    shared coefficients are remapped per color channel, new ones zeroed.
    Optimizer state must be re-initialized by the caller (the reference
    nulls sh_rms)."""
    from .sh import MAX_SH_BASIS

    root = int(round(basis_dim ** 0.5))
    assert root * root == basis_dim, "basis_dim (SH) must be a square number"
    assert 1 <= basis_dim <= MAX_SH_BASIS
    old_bd = grid.basis_dim
    old = _np(grid.sh_data)
    new = np.zeros((old.shape[0], 3 * basis_dim), old.dtype)
    m = min(old_bd, basis_dim)
    for c in range(3):
        new[:, c * basis_dim : c * basis_dim + m] = (
            old[:, c * old_bd : c * old_bd + m]
        )
    return grid.replace(sh_data=jnp.asarray(new), basis_dim=basis_dim)
