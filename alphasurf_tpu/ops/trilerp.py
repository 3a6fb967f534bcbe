"""Trilinear interpolation over the sparse grid.

Gather-based equivalents of the reference's trilerp device functions
(/root/reference/svox2/csrc/include/render_util.cuh:73-157) and the
Python fallback (svox2.py:1285-1320). All functions are batched over an
arbitrary leading shape and differentiate cleanly — the backward pass is
XLA's scatter-add, replacing the CUDA ``atomicAdd`` accumulation
(render_util.cuh:95-155).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.grid import SparseGrid, fetch_links, gather_corner_links


def trilerp_weights(pos: jnp.ndarray) -> jnp.ndarray:
    """Corner weights for fractional position ``pos`` in [0,1]^3.

    :param pos: (..., 3)
    :return: (..., 8) in reference corner order (z fastest)
    """
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    ix, iy, iz = 1.0 - x, 1.0 - y, 1.0 - z
    return jnp.stack(
        [
            ix * iy * iz,
            ix * iy * z,
            ix * y * iz,
            ix * y * z,
            x * iy * iz,
            x * iy * z,
            x * y * iz,
            x * y * z,
        ],
        axis=-1,
    )


def trilerp_weights_T(posT: jnp.ndarray) -> jnp.ndarray:
    """``trilerp_weights`` with the component/corner axes LEADING
    (posT (3, ...) -> (8, ...)) — transposed-layout path; a trailing 8
    would tile-pad to 128 lanes on TPU."""
    x, y, z = posT[0], posT[1], posT[2]
    ix, iy, iz = 1.0 - x, 1.0 - y, 1.0 - z
    return jnp.stack(
        [
            ix * iy * iz,
            ix * iy * z,
            ix * y * iz,
            ix * y * z,
            x * iy * iz,
            x * iy * z,
            x * y * iz,
            x * y * z,
        ],
        axis=0,
    )


def trilerp(vals8: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Interpolate corner values.

    :param vals8: (..., 8, C)
    :param pos: (..., 3) fractional position
    :return: (..., C)
    """
    w = trilerp_weights(pos)
    # elementwise multiply-reduce (VPU) — einsum here lowers to per-point
    # 8xC matmuls that pad catastrophically on the MXU
    return jnp.sum(w[..., None] * vals8, axis=-2)


def voxel_of(pos: jnp.ndarray, reso) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Clamp a grid-space position into the lattice and split into
    (voxel base l, fractional offset), mirroring svox2.py:1271-1283."""
    gsz = jnp.asarray(reso, dtype=pos.dtype)
    pos = jnp.clip(pos, 0.0, gsz - 1.0)
    l = jnp.clip(pos.astype(jnp.int32), 0, jnp.asarray(reso, jnp.int32) - 2)
    return l, pos - l.astype(pos.dtype)


def sample_grid(
    grid: SparseGrid,
    points: jnp.ndarray,
    grid_coords: bool = False,
    want_colors: bool = True,
    want_surface: bool = False,
):
    """Trilinear sampling of grid fields at world (or grid) points.

    Equivalent of ``SparseGrid.sample`` (svox2.py:1040-1213) /
    ``_C.sample_grid`` (csrc/svox2_kernel.cu:11-120).

    :return: tuple of (density, [colors], [surface]) each (..., C)
    """
    pts = points if grid_coords else grid.world2grid(points)
    l, frac = voxel_of(pts, grid.reso)
    links8 = gather_corner_links(grid.links, l)
    out = [trilerp(fetch_links(grid.density_data, links8), frac)]
    if want_colors:
        out.append(trilerp(fetch_links(grid.sh_data, links8), frac))
    if want_surface and grid.surface_data is not None:
        out.append(trilerp(fetch_links(grid.surface_data, links8), frac))
    return tuple(out)
