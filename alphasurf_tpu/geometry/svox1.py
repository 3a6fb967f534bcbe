"""Export a density/SH grid as an svox (v1) N3Tree checkpoint.

Equivalent of ``SparseGrid.to_svox1`` (svox2.py:4840-4888), which builds a
`svox.N3Tree` in-process. svox is not a dependency here, so the octree is
constructed directly in numpy and written in N3Tree's .npz layout
(`data_dim`, `data_format`, `invradius3`, `offset`, `child`, `data` — the
field set `svox.N3Tree.save` produces): branching factor 2, nodes refined
wherever a 2x2x2 block contains an occupied voxel, leaf data = (3*basis_dim
SH coefficients | density), `child` holding relative node offsets.

Only cubic power-of-two density grids are supported, like the reference
(`is_cubic_pow2` assert); surface grids are rejected exactly as the
reference raises NotImplementedError for them.
"""
from __future__ import annotations

import numpy as np


def to_svox1_npz(grid, out_path: str):
    import jax.numpy as jnp  # noqa: F401  (grid fields are jax arrays)

    reso = grid.links.shape
    assert reso[0] == reso[1] == reso[2], "grid must be cubic"
    L = int(np.log2(reso[0]))
    assert 2 ** L == reso[0], "grid must be power-of-two"
    if grid.surface_data is not None:
        raise NotImplementedError(
            "surface grids cannot be exported to svox1 (svox2.py:4886)"
        )

    links = np.asarray(grid.links)
    sh = np.asarray(grid.sh_data, np.float32)
    density = np.asarray(grid.density_data, np.float32)
    data_dim = sh.shape[1] + 1

    # occupancy pyramid: occ[l] has side 2^l (l = L is the voxel level)
    occ = [None] * (L + 1)
    occ[L] = links >= 0
    for l in range(L - 1, -1, -1):
        s = occ[l + 1]
        n = s.shape[0] // 2
        occ[l] = s.reshape(n, 2, n, 2, n, 2).any(axis=(1, 3, 5))

    # top-down node construction. A node at depth d covers a block of side
    # 2^(L-d); its 8 cells have side 2^(L-d-1). Cells of side > 1 that are
    # occupied become child nodes; side-1 cells are voxels (leaf data).
    nodes = [(0, 0, 0, 0)]  # (depth, bx, by, bz) in units of blocks
    node_index = {(0, 0, 0, 0): 0}
    children_of = []
    head = 0
    while head < len(nodes):
        d, bx, by, bz = nodes[head]
        cells = []
        cell_side_level = d + 1  # cells live on the 2^(d+1) lattice
        for cx in range(2):
            for cy in range(2):
                for cz in range(2):
                    cb = (2 * bx + cx, 2 * by + cy, 2 * bz + cz)
                    if cell_side_level < L and occ[cell_side_level][cb]:
                        key = (d + 1, *cb)
                        if key not in node_index:
                            node_index[key] = len(nodes)
                            nodes.append(key)
                        cells.append(node_index[key])
                    else:
                        cells.append(0)  # leaf
        children_of.append(cells)
        head += 1

    N = len(nodes)
    child = np.zeros((N, 2, 2, 2), np.int32)
    data = np.zeros((N, 2, 2, 2, data_dim), np.float16)
    for i, (d, bx, by, bz) in enumerate(nodes):
        cells = children_of[i]
        k = 0
        for cx in range(2):
            for cy in range(2):
                for cz in range(2):
                    ci = cells[k]
                    k += 1
                    if ci:
                        child[i, cx, cy, cz] = ci - i  # relative pointer
                    elif d + 1 == L:
                        v = (2 * bx + cx, 2 * by + cy, 2 * bz + cz)
                        lk = links[v]
                        if lk >= 0:
                            data[i, cx, cy, cz, :-1] = sh[lk]
                            data[i, cx, cy, cz, -1] = density[lk, 0]

    radius = np.asarray(grid.radius, np.float32)
    center = np.asarray(grid.center, np.float32)
    invradius3 = 0.5 / radius
    offset = 0.5 * (1.0 - center / radius)
    np.savez_compressed(
        out_path,
        data_dim=np.int64(data_dim),
        data_format=f"SH{grid.basis_dim}",
        invradius3=invradius3,
        offset=offset,
        child=child,
        data=data,
    )
    return {"n_nodes": N, "data_dim": data_dim}
