"""Cell-sampled regularizer losses.

TPU-native replacements for the reference's in-place gradient kernels
(/root/reference/svox2/csrc/loss_kernel.cu) and their Python gradcheck twins
(svox2.py:5029-5651). The reference hand-writes each loss's gradient and
atomically accumulates it into grad buffers; here each regularizer is a
*differentiable loss* over a random cell subset — ``jax.grad`` of
``loss = mse + sum(lambda_i * reg_i)`` produces the same accumulated
gradients, fused by XLA into the backward pass.

All functions take flat cell ids (the analog of ``_get_rand_cells``,
svox2.py:6335) so per-step cost matches the reference's ``sparse_frac``
sampling. Two samplers exist:

  * ``sample_cells`` — a contiguous window of LATTICE cells (the
    reference's exact distribution, svox2.py:6335 contiguous=True).
    Its cost scales with reso^3 regardless of occupancy: at the 512^3
    recipe, 1% = 1.34M cells of which ~98% are empty and contribute
    nothing, yet still pay ~12.6 ns per gathered element on TPU — the
    regularizers were ~13 s of the 14 s train step (PERF.md round 4).
  * ``sample_present_cells`` — the production sampler: a contiguous
    window of PRESENT cells (packed-row order), which is the same
    contiguous lattice window minus the empty cells that the reference's
    kernels skip anyway. Cost scales with CAPACITY (the reference's
    effective work). Callers rescale the returned mean by
    ``present_norm_scale`` so gradients keep the reference's
    per-lattice-cell normalization.

All fetches use the generic masked gather (scatter-add VJP). With
capacity-scaled sampling the scatters are small; no fetch relies on
stream monotonicity (the round-3 contiguous-VJP fast path and its
silent-wrong-gradient contract are gone).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.grid import SparseGrid, fetch_links


def _fetch_cells(data: jnp.ndarray, links: jnp.ndarray) -> jnp.ndarray:
    """fetch_links for link arrays of shape (n,) or (n, *offsets)."""
    return fetch_links(data, links)


def sample_cells(key, grid: SparseGrid, sparse_frac: float) -> jnp.ndarray:
    """Random contiguous window of flat cell ids covering ``sparse_frac``
    of the link grid — the reference's sampling (svox2.py:6335-6352,
    contiguous=True). Deviation: no wraparound at the end of the grid —
    the start is drawn from [0, n - count] instead (same marginal
    coverage, simpler indexing)."""
    n = int(grid.links.size)
    count = max(1, min(n, int(sparse_frac * n)))
    start = jax.random.randint(key, (), 0, n - count + 1, dtype=jnp.int32)
    return start + jnp.arange(count, dtype=jnp.int32)


def row_coords_of(grid: SparseGrid) -> jnp.ndarray:
    """(capacity, 3) int32: lattice coords of each packed data row. Works
    for any link numbering (flat-order from this package's builders, or
    Morton from imported checkpoints). O(reso^3) — compute once per
    topology change (the Trainer caches it next to the occupancy)."""
    X, Y, Z = grid.reso
    flat = grid.links.reshape(-1)
    present = flat >= 0
    pos = jnp.nonzero(present, size=grid.capacity, fill_value=0)[0]
    lk = jnp.take(flat, pos)
    z = (pos % Z).astype(jnp.int32)
    y = ((pos // Z) % Y).astype(jnp.int32)
    x = (pos // (Z * Y)).astype(jnp.int32)
    coords = jnp.stack([x, y, z], axis=-1)
    return jnp.zeros((grid.capacity, 3), jnp.int32).at[lk].set(coords)


def present_norm_scale(grid: SparseGrid) -> float:
    """Rescale factor for losses over ``sample_present_cells`` windows:
    a window of K present cells stands for a lattice window of expected
    length K / occupancy_fraction, and the reference normalizes by the
    LATTICE cell count (empties included) — so multiply the present-cell
    mean by capacity / links.size."""
    return grid.capacity / float(grid.links.size)


def sample_present_cells(
    key, grid: SparseGrid, row_coords: jnp.ndarray, sparse_frac: float
) -> jnp.ndarray:
    """Contiguous window of PRESENT cells: K = sparse_frac * capacity rows
    starting at a random packed-row offset, returned as flat lattice ids.
    With flat-ordered links this is exactly ``sample_cells``'s lattice
    window restricted to its present members (which are the only cells
    that contribute — the reference kernels skip empties,
    loss_kernel.cu:747); combine with ``present_norm_scale``."""
    cap = grid.capacity
    K = max(1, min(cap, int(sparse_frac * cap)))
    j0 = jax.random.randint(key, (), 0, cap - K + 1, dtype=jnp.int32)
    coords = jax.lax.dynamic_slice_in_dim(row_coords, j0, K, axis=0)
    X, Y, Z = grid.reso
    return (coords[:, 0] * Y + coords[:, 1]) * Z + coords[:, 2]


def _cells_to_xyz(cells, reso):
    X, Y, Z = reso
    z = cells % Z
    xy = cells // Z
    y = xy % Y
    x = xy // Y
    return x, y, z


def _link_at(links, x, y, z):
    """links[x,y,z] with out-of-bounds -> -1."""
    X, Y, Z = links.shape
    ok = (x >= 0) & (x < X) & (y >= 0) & (y < Y) & (z >= 0) & (z < Z)
    xs = jnp.clip(x, 0, X - 1)
    ys = jnp.clip(y, 0, Y - 1)
    zs = jnp.clip(z, 0, Z - 1)
    flat = (xs * Y + ys) * Z + zs
    lnk = jnp.take(links.reshape(-1), flat, axis=0)
    return jnp.where(ok, lnk, -1)


def tv_loss(
    grid: SparseGrid,
    data: jnp.ndarray,
    cells: jnp.ndarray,
    start_dim: int = 0,
    end_dim: Optional[int] = None,
):
    """Total variation over sampled cells (tv_grad_sparse,
    loss_kernel.cu:739-809): forward differences to +x/+y/+z neighbors,
    sqrt over axes per channel, averaged over cells.
    """
    end_dim = data.shape[-1] if end_dim is None else end_dim
    x, y, z = _cells_to_xyz(cells, grid.reso)
    l0 = _link_at(grid.links, x, y, z)
    lx = _link_at(grid.links, x + 1, y, z)
    ly = _link_at(grid.links, x, y + 1, z)
    lz = _link_at(grid.links, x, y, z + 1)
    v0 = _fetch_cells(data, l0)[..., start_dim:end_dim]
    vx = _fetch_cells(data, lx)[..., start_dim:end_dim]
    vy = _fetch_cells(data, ly)[..., start_dim:end_dim]
    vz = _fetch_cells(data, lz)[..., start_dim:end_dim]
    ok = (l0 >= 0)[..., None]
    okx = ok & (lx >= 0)[..., None]
    oky = ok & (ly >= 0)[..., None]
    okz = ok & (lz >= 0)[..., None]
    dx = jnp.where(okx, vx - v0, 0.0)
    dy = jnp.where(oky, vy - v0, 0.0)
    dz = jnp.where(okz, vz - v0, 0.0)
    per_cell = jnp.sqrt(1e-5 + dx * dx + dy * dy + dz * dz).sum(-1)
    return jnp.mean(per_cell)


def surface_tv_loss(
    grid: SparseGrid,
    cells: jnp.ndarray,
    alpha_weighted: bool = False,
    ignore_edge: bool = True,
):
    """TV on the surface scalar field (surf_tv_grad_sparse,
    loss_kernel.cu:810-895), optionally weighted by activated alpha."""
    x, y, z = _cells_to_xyz(cells, grid.reso)
    l0 = _link_at(grid.links, x, y, z)
    lx = _link_at(grid.links, x + 1, y, z)
    ly = _link_at(grid.links, x, y + 1, z)
    lz = _link_at(grid.links, x, y, z + 1)
    s0 = _fetch_cells(grid.surface_data, l0)[..., 0]
    sx = _fetch_cells(grid.surface_data, lx)[..., 0]
    sy = _fetch_cells(grid.surface_data, ly)[..., 0]
    sz = _fetch_cells(grid.surface_data, lz)[..., 0]
    ok = l0 >= 0
    dx = jnp.where(ok & (lx >= 0), sx - s0, 0.0)
    dy = jnp.where(ok & (ly >= 0), sy - s0, 0.0)
    dz = jnp.where(ok & (lz >= 0), sz - s0, 0.0)
    per_cell = jnp.sqrt(1e-5 + dx * dx + dy * dy + dz * dz)
    if alpha_weighted:
        a0 = jax.nn.sigmoid(_fetch_cells(grid.density_data, l0)[..., 0])
        per_cell = per_cell * jax.lax.stop_gradient(a0)
    return jnp.mean(per_cell)


def _cell_normal(surf, x, y, z):
    """Cell-corner-averaged gradient of the surface field; ``surf`` is a
    (cells, 3, 3, 3) neighborhood tensor (svox2.py:5226-5231 semantics,
    vectorized). Offsets index into the local neighborhood."""
    def S(i, j, k):
        return surf[:, i, j, k]

    dx = ((S(x + 1, y, z) + S(x + 1, y, z + 1) + S(x + 1, y + 1, z) + S(x + 1, y + 1, z + 1))
          - (S(x, y, z) + S(x, y, z + 1) + S(x, y + 1, z) + S(x, y + 1, z + 1))) / 4
    dy = ((S(x, y + 1, z) + S(x, y + 1, z + 1) + S(x + 1, y + 1, z) + S(x + 1, y + 1, z + 1))
          - (S(x, y, z) + S(x, y, z + 1) + S(x + 1, y, z) + S(x + 1, y, z + 1))) / 4
    dz = ((S(x, y, z + 1) + S(x, y + 1, z + 1) + S(x + 1, y, z + 1) + S(x + 1, y + 1, z + 1))
          - (S(x, y, z) + S(x, y + 1, z) + S(x + 1, y, z) + S(x + 1, y + 1, z))) / 4
    return jnp.stack([dx, dy, dz], axis=-1)


def surface_normal_loss(
    grid: SparseGrid,
    cells: jnp.ndarray,
    connectivity_check: bool = True,
    ignore_empty: bool = False,
    use_l1: bool = False,
):
    """Normal-consistency regularizer (surface_normal_grad_sparse,
    loss_kernel.cu:245-616; Python twin svox2.py:5165-5349).

    For each sampled cell: the cell normal (corner-averaged finite
    difference) vs its +x/+y/+z neighbors', L1 or squared-L2 difference of
    the *normalized* normals, masked by vertex existence, optional surface
    connectivity across the shared face, and optional both-cells-empty
    skip; per-cell mean over surviving axes, mean over cells.
    """
    x, y, z = _cells_to_xyz(cells, grid.reso)
    n = cells.shape[0]

    # 3x3x3 neighborhood of vertex links / surface values per cell
    offs = jnp.arange(3)
    ox, oy, oz = jnp.meshgrid(offs, offs, offs, indexing="ij")
    lx = x[:, None, None, None] + ox[None]
    ly = y[:, None, None, None] + oy[None]
    lz = z[:, None, None, None] + oz[None]
    links = _link_at(grid.links, lx, ly, lz)  # (n,3,3,3)
    surf = _fetch_cells(grid.surface_data, links)[..., 0]  # (n,3,3,3)

    def exists(i, j, k):
        """All 8 vertices of the cell at local offset (i,j,k) exist."""
        m = jnp.ones(n, dtype=bool)
        for di in (0, 1):
            for dj in (0, 1):
                for dk in (0, 1):
                    m = m & (links[:, i + di, j + dj, k + dk] >= 0)
        return m

    def empty(i, j, k):
        vals = jnp.stack(
            [surf[:, i + di, j + dj, k + dk]
             for di in (0, 1) for dj in (0, 1) for dk in (0, 1)],
            axis=-1,
        )
        return jnp.all(vals <= 0, -1) | jnp.all(vals >= 0, -1)

    n000 = _cell_normal(surf, 0, 0, 0)
    n001 = _cell_normal(surf, 0, 0, 1)
    n010 = _cell_normal(surf, 0, 1, 0)
    n100 = _cell_normal(surf, 1, 0, 0)

    def unit(v):
        # safe normalize: subgradient 0 at v = 0 (like torch.norm), no NaNs
        sq = jnp.sum(v * v, axis=-1, keepdims=True)
        nrm = jnp.sqrt(jnp.where(sq > 1e-20, sq, 1e-20))
        return v / jnp.maximum(nrm, 1e-10)

    N000, N001, N010, N100 = unit(n000), unit(n001), unit(n010), unit(n100)
    if use_l1:
        dz_ = jnp.sum(jnp.abs(N001 - N000), -1)
        dy_ = jnp.sum(jnp.abs(N010 - N000), -1)
        dx_ = jnp.sum(jnp.abs(N100 - N000), -1)
    else:
        dz_ = jnp.sum((N001 - N000) ** 2, -1)
        dy_ = jnp.sum((N010 - N000) ** 2, -1)
        dx_ = jnp.sum((N100 - N000) ** 2, -1)

    m000, m001, m010, m100 = exists(0, 0, 0), exists(0, 0, 1), exists(0, 1, 0), exists(1, 0, 0)

    if connectivity_check:
        def face_con(vals):
            mn = jnp.min(vals, -1, keepdims=True)
            mx = jnp.max(vals, -1, keepdims=True)
            inr = (grid.level_set_data[None, :] >= mn) & (
                grid.level_set_data[None, :] <= mx
            )
            return jnp.any(inr, -1)

        con001 = face_con(jnp.stack(
            [surf[:, 0, 0, 1], surf[:, 0, 1, 1], surf[:, 1, 0, 1], surf[:, 1, 1, 1]], -1))
        con010 = face_con(jnp.stack(
            [surf[:, 0, 1, 0], surf[:, 0, 1, 1], surf[:, 1, 1, 0], surf[:, 1, 1, 1]], -1))
        con100 = face_con(jnp.stack(
            [surf[:, 1, 0, 0], surf[:, 1, 0, 1], surf[:, 1, 1, 0], surf[:, 1, 1, 1]], -1))
    else:
        con001 = con010 = con100 = jnp.ones(n, dtype=bool)

    if ignore_empty:
        e000, e001, e010, e100 = empty(0, 0, 0), empty(0, 0, 1), empty(0, 1, 0), empty(1, 0, 0)
    else:
        e000 = e001 = e010 = e100 = jnp.zeros(n, dtype=bool)

    skip_z = (~m001) | (~m000) | (~con001) | (e000 & e001)
    skip_y = (~m010) | (~m000) | (~con010) | (e000 & e010)
    skip_x = (~m100) | (~m000) | (~con100) | (e000 & e100)

    count = 3.0 - skip_z - skip_y - skip_x
    dz_ = jnp.where(skip_z, 0.0, dz_)
    dy_ = jnp.where(skip_y, 0.0, dy_)
    dx_ = jnp.where(skip_x, 0.0, dx_)
    per_cell = jnp.where(count != 0, (dx_ + dy_ + dz_) / jnp.where(count == 0, 1.0, count), 0.0)
    return jnp.mean(per_cell)


def alpha_surf_sparsify_loss(
    grid: SparseGrid,
    cells: jnp.ndarray,
    scale_alpha: float,
    scale_surf: float,
    surf_decrease: bool = True,
    surf_thresh: float = 0.01,
):
    """Joint alpha/surface sparsifier (alpha_surf_sparsify_grad_sparse,
    loss_kernel.cu:665-738; twin svox2.py:5029-5051):
    log-sigmoid push on raw alpha + a surface push (weighted by detached
    sigmoid(-alpha)) where alpha is already low."""
    x, y, z = _cells_to_xyz(cells, grid.reso)
    l0 = _link_at(grid.links, x, y, z)
    a_raw = _fetch_cells(grid.density_data, l0)[..., 0]
    s = _fetch_cells(grid.surface_data, l0)[..., 0]
    # empty cells fetch zeros and contribute log(sigmoid(0)) like the twin
    # (svox2.py:5037-5048); their gradients are blocked by the masked gather
    # log_sigmoid == log(sigmoid(x)) but stable for very negative raw alphas
    # (sigmoid underflow would give log(0) = -inf, poisoning 0-lambda sums)
    alpha_loss = jax.nn.log_sigmoid(a_raw)
    w = jax.lax.stop_gradient(jax.nn.sigmoid(-a_raw))
    surf_loss = jnp.where(a_raw < surf_thresh, w * s, 0.0)
    if not surf_decrease:
        surf_loss = -surf_loss
    return jnp.mean(scale_alpha * alpha_loss + scale_surf * surf_loss)


def _dense_field(grid: SparseGrid, rows: jnp.ndarray,
                 row_coords: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Scatter packed per-vertex values onto the dense lattice (X, Y, Z).

    The scatter's VJP is a GATHER at the same positions, so dense-volume
    losses have no backward scatter at all — the TPU answer to the
    reference's full-lattice regularizer passes (tv_surface_sparsity = 1,
    norm_surface_sparsity = 1 in surface_cuda_syn.yaml, where the CUDA
    kernels sweep all reso^3 cells every step, loss_kernel.cu:747)."""
    X, Y, Z = grid.reso
    flat_pos = (row_coords[:, 0] * Y + row_coords[:, 1]) * Z + row_coords[:, 2]
    base = jnp.full((X * Y * Z,), fill, rows.dtype)
    return base.at[flat_pos].set(rows, mode="drop").reshape(X, Y, Z)


_SLAB = 64  # x-planes per dense-loss chunk: bounds live volume temporaries


def _slab_scan(X: int, ext: int, body, *vols):
    """Sum ``body(slabs..., x0)`` over x-slabs of the dense volumes.

    The shifted-slice formulation keeps ~20 full (X,Y,Z) f32 temporaries
    live through the backward at once — 25 GB at 512^3. Chunking over
    x-slabs inside a scan with a checkpointed body bounds the live set to
    the slab size; each body sees ``_SLAB + ext`` planes (padded past the
    end; the body masks rows >= its valid count).
    """
    CH = min(_SLAB, X)
    n_chunks = -(-X // CH)
    padded = [
        jnp.pad(v, ((0, n_chunks * CH + ext - v.shape[0]),) + ((0, 0),) * (v.ndim - 1))
        for v in vols
    ]

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(acc, i):
        x0 = i * CH
        slabs = [
            jax.lax.dynamic_slice_in_dim(v, x0, CH + ext, axis=0)
            for v in padded
        ]
        return acc + body(*slabs, x0), None

    acc, _ = jax.lax.scan(
        step, jnp.zeros((), vols[0].dtype if vols[0].dtype != jnp.bool_
                        else jnp.float32),
        jnp.arange(n_chunks),
    )
    return acc


def surface_tv_loss_dense(grid: SparseGrid, row_coords: jnp.ndarray,
                          alpha_weighted: bool = False):
    """Full-lattice surface TV — every cell, matching the recipe's
    tv_surface_sparsity = 1 (surf_tv_grad_sparse over all cells). Value
    convention matches ``surface_tv_loss`` over cells = arange(links.size)
    including its sqrt(1e-5) floor on empty cells (zero gradient).
    Computed in x-slab chunks (see _slab_scan)."""
    surf = _dense_field(grid, grid.surface_data[:, 0], row_coords)
    present = grid.links >= 0
    X, Y, Z = grid.reso
    pres_f = present.astype(surf.dtype)
    if alpha_weighted:
        aw = jax.lax.stop_gradient(jax.nn.sigmoid(
            _dense_field(grid, grid.density_data[:, 0], row_coords)))
    else:
        aw = None

    def body(*args):
        if aw is None:
            s, p, x0 = args
            a = None
        else:
            s, p, a, x0 = args
        CH = s.shape[0] - 1
        ok0 = p[:-1] > 0
        # +x neighbor: the padded plane past X-1 is absent -> zero diff
        dx = jnp.where(ok0 & (p[1:] > 0), s[1:] - s[:-1], 0.0)
        dy = jnp.where(ok0[:, :-1] & (p[:-1, 1:] > 0),
                       s[:-1, 1:] - s[:-1, :-1], 0.0)
        dz = jnp.where(ok0[..., :-1][:, :, :] & (p[:-1, :, 1:] > 0),
                       s[:-1, :, 1:] - s[:-1, :, :-1], 0.0)
        dy = jnp.pad(dy, ((0, 0), (0, 1), (0, 0)))
        dz = jnp.pad(dz, ((0, 0), (0, 0), (0, 1)))
        per_cell = jnp.sqrt(1e-5 + dx * dx + dy * dy + dz * dz)
        if a is not None:
            per_cell = per_cell * a[:-1]
        row_ok = (x0 + jnp.arange(CH)) < X  # mask pad rows past the lattice
        return jnp.sum(per_cell * row_ok[:, None, None])

    vols = (surf, pres_f) + (() if aw is None else (aw,))
    total = _slab_scan(X, 1, body, *vols)
    return total / grid.links.size


def surface_normal_loss_dense(
    grid: SparseGrid,
    row_coords: jnp.ndarray,
    connectivity_check: bool = True,
    ignore_empty: bool = False,
    use_l1: bool = False,
):
    """Full-lattice normal-consistency regularizer — every cell, matching
    the recipe's norm_surface_sparsity = 1. Same math as
    ``surface_normal_loss``; neighborhood fetches become shifted slices of
    the dense surface/presence volumes (zero gathers, zero scatters),
    computed in x-slab chunks (see _slab_scan — the unchunked version kept
    ~20 full volumes live through the backward, 25 GB at 512^3)."""
    surf_full = _dense_field(grid, grid.surface_data[:, 0], row_coords)
    pres_full = (grid.links >= 0).astype(surf_full.dtype)
    X, Y, Z = grid.reso
    total = _slab_scan(
        X, 2,
        lambda s, p, x0: _normal_slab(grid, s, p, x0, connectivity_check,
                                      ignore_empty, use_l1),
        surf_full, pres_full,
    )
    # the sampled version averages over its cell list; the full lattice is
    # links.size cells — cells whose 3x3x3 window leaves the grid contribute
    # 0 there (out-of-bounds links are -1 -> skip), so pad-normalize
    return total / grid.links.size


def _normal_slab(grid, surf, present, x0, connectivity_check, ignore_empty,
                 use_l1):
    """Per-slab normal-consistency sum: ``surf``/``present`` carry CH+2
    x-planes; cells are the CH base rows (masked past the lattice)."""
    CH = surf.shape[0] - 2
    X, Y, Z = grid.reso

    def sl(v, dx, dy, dz):
        return v[dx : dx + CH, dy : dy + Y - 2, dz : dz + Z - 2]

    def cell_normal(bx, by, bz):
        """Corner-averaged gradient of the cell at base offset (bx,by,bz)
        within the 3-wide window (same math as _cell_normal)."""
        def S(i, j, k):
            return sl(surf, bx + i, by + j, bz + k)

        dx = ((S(1, 0, 0) + S(1, 0, 1) + S(1, 1, 0) + S(1, 1, 1))
              - (S(0, 0, 0) + S(0, 0, 1) + S(0, 1, 0) + S(0, 1, 1))) / 4
        dy = ((S(0, 1, 0) + S(0, 1, 1) + S(1, 1, 0) + S(1, 1, 1))
              - (S(0, 0, 0) + S(0, 0, 1) + S(1, 0, 0) + S(1, 0, 1))) / 4
        dz = ((S(0, 0, 1) + S(0, 1, 1) + S(1, 0, 1) + S(1, 1, 1))
              - (S(0, 0, 0) + S(0, 1, 0) + S(1, 0, 0) + S(1, 1, 0))) / 4
        return dx, dy, dz

    def exists(bx, by, bz):
        m = None
        for di in (0, 1):
            for dj in (0, 1):
                for dk in (0, 1):
                    s = sl(present, bx + di, by + dj, bz + dk) > 0
                    m = s if m is None else m & s
        return m

    def empty(bx, by, bz):
        mn = mx = None
        for di in (0, 1):
            for dj in (0, 1):
                for dk in (0, 1):
                    s = sl(surf, bx + di, by + dj, bz + dk)
                    mn = s if mn is None else jnp.minimum(mn, s)
                    mx = s if mx is None else jnp.maximum(mx, s)
        return (mx <= 0) | (mn >= 0)

    def unit(v3):
        sq = v3[0] ** 2 + v3[1] ** 2 + v3[2] ** 2
        nrm = jnp.sqrt(jnp.where(sq > 1e-20, sq, 1e-20))
        nrm = jnp.maximum(nrm, 1e-10)
        return tuple(c / nrm for c in v3)

    N000 = unit(cell_normal(0, 0, 0))
    N001 = unit(cell_normal(0, 0, 1))
    N010 = unit(cell_normal(0, 1, 0))
    N100 = unit(cell_normal(1, 0, 0))

    if use_l1:
        dz_ = sum(jnp.abs(a - b) for a, b in zip(N001, N000))
        dy_ = sum(jnp.abs(a - b) for a, b in zip(N010, N000))
        dx_ = sum(jnp.abs(a - b) for a, b in zip(N100, N000))
    else:
        dz_ = sum((a - b) ** 2 for a, b in zip(N001, N000))
        dy_ = sum((a - b) ** 2 for a, b in zip(N010, N000))
        dx_ = sum((a - b) ** 2 for a, b in zip(N100, N000))

    m000 = exists(0, 0, 0)
    m001 = exists(0, 0, 1)
    m010 = exists(0, 1, 0)
    m100 = exists(1, 0, 0)

    if connectivity_check:
        def face_con(vals):
            mn = jnp.minimum(jnp.minimum(vals[0], vals[1]),
                             jnp.minimum(vals[2], vals[3]))
            mx = jnp.maximum(jnp.maximum(vals[0], vals[1]),
                             jnp.maximum(vals[2], vals[3]))
            con = None
            for i in range(grid.level_set_data.shape[0]):
                lv = grid.level_set_data[i]
                c = (lv >= mn) & (lv <= mx)
                con = c if con is None else con | c
            return con

        con001 = face_con([sl(surf, 0, 0, 1), sl(surf, 0, 1, 1),
                           sl(surf, 1, 0, 1), sl(surf, 1, 1, 1)])
        con010 = face_con([sl(surf, 0, 1, 0), sl(surf, 0, 1, 1),
                           sl(surf, 1, 1, 0), sl(surf, 1, 1, 1)])
        con100 = face_con([sl(surf, 1, 0, 0), sl(surf, 1, 0, 1),
                           sl(surf, 1, 1, 0), sl(surf, 1, 1, 1)])
    else:
        ones = jnp.ones_like(m000)
        con001 = con010 = con100 = ones

    if ignore_empty:
        e000, e001 = empty(0, 0, 0), empty(0, 0, 1)
        e010, e100 = empty(0, 1, 0), empty(1, 0, 0)
    else:
        zeros = jnp.zeros_like(m000)
        e000 = e001 = e010 = e100 = zeros

    skip_z = (~m001) | (~m000) | (~con001) | (e000 & e001)
    skip_y = (~m010) | (~m000) | (~con010) | (e000 & e010)
    skip_x = (~m100) | (~m000) | (~con100) | (e000 & e100)

    count = 3.0 - skip_z - skip_y - skip_x
    dz_ = jnp.where(skip_z, 0.0, dz_)
    dy_ = jnp.where(skip_y, 0.0, dy_)
    dx_ = jnp.where(skip_x, 0.0, dx_)
    per_cell = jnp.where(
        count != 0, (dx_ + dy_ + dz_) / jnp.where(count == 0, 1.0, count), 0.0
    )
    row_ok = (x0 + jnp.arange(CH)) < X - 2
    return jnp.sum(per_cell * row_ok[:, None, None])


def surface_norm_match_loss(grid: SparseGrid, cells: jnp.ndarray):
    """Match the surface-field gradient direction to the raw-alpha gradient
    direction (_surface_norm_match_loss_grad_check, svox2.py:5474-5521).
    Out-of-bounds/empty neighbors default to the center value (zero diff)."""
    x, y, z = _cells_to_xyz(cells, grid.reso)
    l0 = _link_at(grid.links, x, y, z)
    lx = _link_at(grid.links, x + 1, y, z)
    ly = _link_at(grid.links, x, y + 1, z)
    lz = _link_at(grid.links, x, y, z + 1)
    ok = l0 >= 0

    def diffs(data):
        v0 = _fetch_cells(data, l0)[..., 0]
        dx = jnp.where(lx >= 0, _fetch_cells(data, lx)[..., 0] - v0, 0.0)
        dy = jnp.where(ly >= 0, _fetch_cells(data, ly)[..., 0] - v0, 0.0)
        dz = jnp.where(lz >= 0, _fetch_cells(data, lz)[..., 0] - v0, 0.0)
        g = jnp.stack([dx, dy, dz], -1)
        # safe normalize matching torch clamp_min(sqrt, 1e-8) backward:
        # below the clamp the denominator is constant (no grad), no NaN at 0
        sq = jnp.sum(g * g, -1, keepdims=True)
        nrm = jnp.sqrt(jnp.where(sq > 1e-16, sq, 1e-16))
        return g / jnp.maximum(nrm, 1e-8)

    surf_n = diffs(grid.surface_data)
    alpha_n = diffs(grid.density_data)
    per_cell = jnp.where(ok, jnp.sum((surf_n - alpha_n) ** 2, -1), 0.0)
    # reference normalizes by the full sample count, incl. filtered cells
    return jnp.sum(per_cell) / cells.shape[0]


def surface_viscosity_loss(
    grid: SparseGrid, cells: jnp.ndarray, eta: float = 1e-2, h: float = 1.0
):
    """Viscosity-regularized eikonal loss
    (_surface_viscosity_loss_grad_check, svox2.py:5525-5594):
    ((|central-diff grad| - 1) * sign(s0) - eta * laplacian)^2 over interior
    cells whose 6-neighborhood is fully occupied. ``h`` is the grid spacing
    (reference _get_h)."""
    x, y, z = _cells_to_xyz(cells, grid.reso)
    l0 = _link_at(grid.links, x, y, z)
    lpx, lmx = _link_at(grid.links, x + 1, y, z), _link_at(grid.links, x - 1, y, z)
    lpy, lmy = _link_at(grid.links, x, y + 1, z), _link_at(grid.links, x, y - 1, z)
    lpz, lmz = _link_at(grid.links, x, y, z + 1), _link_at(grid.links, x, y, z - 1)
    ok = (l0 >= 0) & (lpx >= 0) & (lmx >= 0) & (lpy >= 0) & (lmy >= 0) & (lpz >= 0) & (lmz >= 0)

    def S(l):
        return _fetch_cells(grid.surface_data, l)[..., 0]

    s0 = S(l0)
    spx, smx, spy, smy, spz, smz = S(lpx), S(lmx), S(lpy), S(lmy), S(lpz), S(lmz)
    g2 = (
        ((spx - smx) / (2 * h)) ** 2
        + ((spy - smy) / (2 * h)) ** 2
        + ((spz - smz) / (2 * h)) ** 2
    )
    gnorm = jnp.sqrt(jnp.maximum(g2, 1e-8))
    lap = (spx + smx + spy + smy + spz + smz - 6.0 * s0) / (h * h)
    vis = ((gnorm - 1.0) * jnp.sign(s0) - eta * lap) ** 2
    return jnp.sum(jnp.where(ok, vis, 0.0)) / cells.shape[0]


def surface_sign_change_loss(grid: SparseGrid, cells: jnp.ndarray):
    """Penalize surface sign changes to +x/+y/+z neighbors
    (_surface_sign_change_grad_check, svox2.py:5597-5651): where
    s0*sn < 0, accumulate (s0 + sn) * reso/256, averaged over the axes that
    changed sign, mean over cells.

    Faithful detail: the reference twin indexes ``surface_data[links]``
    without masking empty cells, so a -1 link wraps to the LAST data row
    (python negative indexing). We reproduce that via modulo indexing.
    Out-of-bounds neighbors default to the center value (never a sign
    change), matching the twin's detached-default path."""
    x, y, z = _cells_to_xyz(cells, grid.reso)
    X, Y, Z = grid.reso
    cap = grid.surface_data.shape[0]

    def fetch_wrap(xs, ys, zs):
        flat = (jnp.clip(xs, 0, X - 1) * Y + jnp.clip(ys, 0, Y - 1)) * Z + jnp.clip(zs, 0, Z - 1)
        lnk = jnp.take(grid.links.reshape(-1), flat)
        return jnp.take(grid.surface_data[:, 0], lnk % cap)

    s0 = fetch_wrap(x, y, z)
    total = jnp.zeros_like(s0)
    count = jnp.zeros_like(s0)
    for (xs, ys, zs), inb, r in (
        ((x + 1, y, z), x + 1 < X, X),
        ((x, y + 1, z), y + 1 < Y, Y),
        ((x, y, z + 1), z + 1 < Z, Z),
    ):
        sn = jnp.where(inb, fetch_wrap(xs, ys, zs), s0)
        hit = (s0 * sn < 0.0) & inb
        total = total + jnp.where(hit, (s0 + sn) * (r / 256.0), 0.0)
        count = count + hit
    per_cell = jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)
    return jnp.mean(per_cell)


def l2_color_loss(grid: SparseGrid):
    """L2 regularization on SH coefficients
    (inplace_l2_color_grad, svox2.py:5897-5928): 0.5*mean row-sum so the
    gradient is sh_data / capacity, matching the in-place kernel."""
    return 0.5 * jnp.sum(grid.sh_data**2) / grid.sh_data.shape[0]


def background_tv_loss(
    grid: SparseGrid,
    cells_bg: jnp.ndarray,
    scaling: float,
    scaling_density: Optional[float] = None,
):
    """TV over the MSI background (msi_tv_grad_sparse, loss_kernel.cu:980;
    inplace_tv_background_grad svox2.py:5930-5957): sampled (link, layer)
    cells diffed to +u (wrapping), +v and +layer neighbors; color channels
    scaled by ``scaling``, the density channel by ``scaling_density``."""
    if grid.background_data is None:
        return 0.0
    if scaling_density is None:
        scaling_density = scaling
    links = grid.background_links  # (2R, R)
    data = grid.background_data  # (n_links, nlayers, 4)
    W, H = links.shape
    nlayers = data.shape[1]
    # decompose flat cell id -> (u, v, layer)
    layer = cells_bg % nlayers
    uv = cells_bg // nlayers
    v = uv % H
    u = (uv // H) % W
    l0 = jnp.take(links.reshape(-1), u * H + v)
    lu = jnp.take(links.reshape(-1), ((u + 1) % W) * H + v)
    lv_ = jnp.take(links.reshape(-1), u * H + jnp.minimum(v + 1, H - 1))

    def fetch(l, lay):
        safe = jnp.clip(l, 0, data.shape[0] - 1)
        rows = jnp.take(data, safe, axis=0)  # (n, nlayers, 4)
        val = jnp.take_along_axis(rows, lay[:, None, None], axis=1)[:, 0]
        return val * (l >= 0)[:, None].astype(data.dtype)

    v0 = fetch(l0, layer)
    du = jnp.where((lu >= 0)[:, None], fetch(lu, layer) - v0, 0.0)
    dv = jnp.where((lv_ >= 0)[:, None], fetch(lv_, layer) - v0, 0.0)
    layer_n = jnp.minimum(layer + 1, nlayers - 1)
    dl = fetch(l0, layer_n) - v0
    tv = jnp.sqrt(1e-5 + du**2 + dv**2 + dl**2)  # (n, 4)
    per_cell = scaling * tv[:, :3].sum(-1) + scaling_density * tv[:, 3]
    ok = (l0 >= 0).astype(tv.dtype)
    return jnp.mean(per_cell * ok)


def basis_tv_loss(grid: SparseGrid):
    """TV on the learned 3D-texture basis
    (inplace_tv_basis_grad, svox2.py:5959-5970) — dense, autograd in the
    reference too."""
    if grid.basis_data is None:
        return 0.0
    bd = grid.basis_data
    return jnp.mean(
        jnp.sqrt(
            1e-5
            + (bd[:-1, :-1, 1:] - bd[:-1, :-1, :-1]) ** 2
            + (bd[:-1, 1:, :-1] - bd[:-1, :-1, :-1]) ** 2
            + (bd[1:, :-1, :-1] - bd[:-1, :-1, :-1]) ** 2
        ).sum(-1)
    )


def lumisphere_tv_loss(
    grid: SparseGrid,
    cells: jnp.ndarray,
    key,
    dir_factor: float = 1.0,
    dir_perturb_radians: float = 0.05,
):
    """View-dependent color TV (lumisphere_tv_grad_sparse,
    loss_kernel.cu:1067; inplace_tv_lumisphere_grad svox2.py:5822-5895):
    evaluate each sampled cell's SH color along one random direction, TV to
    the +x/+y/+z neighbors' colors along the same direction, plus an
    angular term against a slightly perturbed direction."""
    from ..core.sh import eval_sh_bases

    k_dir, k_axis = jax.random.split(key)
    d = jax.random.normal(k_dir, (3,))
    d = d / jnp.linalg.norm(d)
    sh_mult = eval_sh_bases(grid.basis_dim, d[None])[0]  # (bd,)
    # small-angle perturbation via Rodrigues' formula
    axis = jax.random.normal(k_axis, (3,))
    axis = axis / jnp.linalg.norm(axis) * dir_perturb_radians
    th = jnp.linalg.norm(axis)
    k = axis / jnp.maximum(th, 1e-12)
    d_p = (
        d * jnp.cos(th)
        + jnp.cross(k, d) * jnp.sin(th)
        + k * jnp.dot(k, d) * (1 - jnp.cos(th))
    )
    sh_mult_u = eval_sh_bases(grid.basis_dim, d_p[None])[0]

    x, y, z = _cells_to_xyz(cells, grid.reso)
    l0 = _link_at(grid.links, x, y, z)
    bd = grid.basis_dim

    def color(l, mult):
        sh = _fetch_cells(grid.sh_data, l).reshape(-1, 3, bd)
        return jnp.sum(sh * mult, -1)  # (n, 3)

    c0 = color(l0, sh_mult)
    loss = jnp.zeros(cells.shape[0])
    for ln in (
        _link_at(grid.links, x + 1, y, z),
        _link_at(grid.links, x, y + 1, z),
        _link_at(grid.links, x, y, z + 1),
    ):
        cn = color(ln, sh_mult)
        ok = ((l0 >= 0) & (ln >= 0)).astype(c0.dtype)
        loss = loss + ok * jnp.sqrt(1e-5 + jnp.sum((cn - c0) ** 2, -1))
    if dir_factor > 0.0:
        c0_u = color(l0, sh_mult_u)
        ok0 = (l0 >= 0).astype(c0.dtype)
        loss = loss + dir_factor * ok0 * jnp.sqrt(
            1e-5 + jnp.sum((c0_u - c0) ** 2, -1)
        )
    return jnp.mean(loss)


def surface_eikonal_loss(grid: SparseGrid, cells: jnp.ndarray, target: float = 1.0):
    """Eikonal regularizer |grad| -> target on sampled cells
    (svox2.py:5352 twin; kernel marked NYI in the reference)."""
    x, y, z = _cells_to_xyz(cells, grid.reso)
    offs = jnp.arange(2)
    ox, oy, oz = jnp.meshgrid(offs, offs, offs, indexing="ij")
    links = _link_at(
        grid.links,
        x[:, None, None, None] + ox[None],
        y[:, None, None, None] + oy[None],
        z[:, None, None, None] + oz[None],
    )
    surf = _fetch_cells(grid.surface_data, links)[..., 0]  # (n,2,2,2)
    ok = jnp.all(links.reshape(links.shape[0], -1) >= 0, -1)
    dx = jnp.mean(surf[:, 1] - surf[:, 0], axis=(-1, -2))
    dy = jnp.mean(surf[:, :, 1] - surf[:, :, 0], axis=(-1, -2))
    dz = jnp.mean(surf[:, :, :, 1] - surf[:, :, :, 0], axis=(-1, -2))
    gnorm = jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-12)
    return jnp.mean(jnp.where(ok, (gnorm - target) ** 2, 0.0))
