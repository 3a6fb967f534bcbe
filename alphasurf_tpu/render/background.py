"""Multi-sphere-image (MSI) background model.

Port of the reference's background rendering: equirect-mapped concentric
spheres outside the foreground grid, composited with the remaining
transmittance after the foreground pass
(/root/reference/svox2/svox2.py:1353-1441 and
csrc/render_lerp_kernel_surf_trav.cu:2914-3139;
ConcentricSpheresIntersector: svox2/utils.py:374-418;
xyz2equirect: svox2/utils.py:603).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.grid import SparseGrid
from ..core.options import RenderOptions
from ..core.sh import SH_C0


def xyz2equirect(xyz, reso: int):
    """Unit direction -> equirect uv (svox2/utils.py:603)."""
    lat = jnp.arcsin(jnp.clip(xyz[..., 1], -1.0, 1.0))
    lon = jnp.arctan2(xyz[..., 0], xyz[..., 2])
    u = reso * 2 * (0.5 + lon / (2 * jnp.pi))
    v = reso * (0.5 - lat / jnp.pi)
    return jnp.stack([u, v], axis=-1)


def render_background(
    grid: SparseGrid,
    opt: RenderOptions,
    origins_grid,
    dirs_grid,
    delta_scale,
    log_T,
    rgb_acc,
):
    """Composite the MSI background behind the foreground.

    :param origins_grid/dirs_grid: rays in grid coordinates (unit dirs)
    :param delta_scale: per-ray grid->world step scale
    :param log_T: remaining log transmittance after the foreground pass
    :param rgb_acc: accumulated foreground rgb
    :return: (rgb_acc, log_T) updated
    """
    nlayers = grid.background_nlayers
    bg_reso = grid.background_reso
    gsz = grid.gsz

    # to unit-sphere coordinates (ConcentricSpheresIntersector ctor)
    sphere_scaling = 2.0 / gsz
    origins = (origins_grid + 0.5) * sphere_scaling - 1.0
    dirs = dirs_grid * sphere_scaling
    inorm = 1.0 / jnp.linalg.norm(dirs, axis=-1)
    world_step_scale = delta_scale * inorm
    dirs = dirs * inorm[..., None]

    q2a = 2 * jnp.sum(dirs * dirs, -1)
    qb = 2 * jnp.sum(origins * dirs, -1)
    f_det = qb * qb - 2 * q2a * jnp.sum(origins * origins, -1)

    def intersect(r):
        det = f_det + 2 * q2a * (r * r)
        ok = det >= 0
        t = jnp.where(ok, (-qb + jnp.sqrt(jnp.clip(det, min=0.0))) / q2a, 0.0)
        return ok, t

    inner_radius = jnp.clip(
        jnp.linalg.norm(jnp.cross(origins, dirs), axis=-1) + 1e-3, min=1.0
    )
    # per-ray inner radius: reference intersects at each ray's own radius
    det = f_det + 2 * q2a * inner_radius * inner_radius
    t_last = jnp.where(det >= 0, (-qb + jnp.sqrt(jnp.clip(det, min=0.0))) / q2a, 0.0)

    n_steps = int(nlayers / opt.step_size) + 2
    layer_scale = (nlayers - 1) / (n_steps + 1)

    links = grid.background_links
    data = grid.background_data  # (capbg, nlayers, 4)

    def fetch(lx, ly, lz):
        lnk = links[lx, ly]
        safe = jnp.clip(lnk, 0, data.shape[0] - 1)
        v = data[safe, lz]
        return v * (lnk >= 0)[..., None].astype(v.dtype)

    rgb = rgb_acc
    lt = log_T
    tl = t_last
    for i in range(n_steps):
        r = n_steps / (n_steps - i - 0.5)
        ok, t = intersect(r)
        active = ok & (r >= inner_radius)
        t_mid = 0.5 * (t + tl)
        sphpos = origins + t_mid[..., None] * dirs
        invr_mid = 1.0 / jnp.linalg.norm(sphpos, axis=-1)
        sphpos = sphpos * invr_mid[..., None]

        xy = xyz2equirect(sphpos, bg_reso)
        z = jnp.clip((1.0 - invr_mid) * nlayers - 0.5, 0.0, nlayers - 1)
        pts = jnp.concatenate([xy, z[..., None]], axis=-1)
        l = pts.astype(jnp.int32)
        lx = jnp.clip(l[..., 0], 0, 2 * bg_reso - 1)
        ly = jnp.clip(l[..., 1], 0, bg_reso - 1)
        lz = jnp.clip(l[..., 2], 0, max(nlayers - 2, 0))
        wb = pts - jnp.stack([lx, ly, lz], -1).astype(pts.dtype)
        wa = 1.0 - wb
        lnx = (lx + 1) % (2 * bg_reso)
        lny = (ly + 1) % bg_reso
        lnz = lz + 1

        v000 = fetch(lx, ly, lz)
        v001 = fetch(lx, ly, lnz)
        v010 = fetch(lx, lny, lz)
        v011 = fetch(lx, lny, lnz)
        v100 = fetch(lnx, ly, lz)
        v101 = fetch(lnx, ly, lnz)
        v110 = fetch(lnx, lny, lz)
        v111 = fetch(lnx, lny, lnz)
        c00 = v000 * wa[:, 2:] + v001 * wb[:, 2:]
        c01 = v010 * wa[:, 2:] + v011 * wb[:, 2:]
        c10 = v100 * wa[:, 2:] + v101 * wb[:, 2:]
        c11 = v110 * wa[:, 2:] + v111 * wb[:, 2:]
        c0 = c00 * wa[:, 1:2] + c01 * wb[:, 1:2]
        c1 = c10 * wa[:, 1:2] + c11 * wb[:, 1:2]
        rgba = c0 * wa[:, :1] + c1 * wb[:, :1]

        log_att = jnp.where(
            active,
            -world_step_scale * jax.nn.relu(rgba[:, -1]) * (t - tl),
            0.0,
        )
        weight = jnp.exp(lt) * (1.0 - jnp.exp(log_att))
        col = jnp.clip(rgba[:, :3] * SH_C0 + 0.5, min=0.0)
        rgb = rgb + jnp.where(active[..., None], col * weight[..., None], 0.0)
        lt = lt + log_att
        tl = jnp.where(active, t, tl)

    return rgb, lt
