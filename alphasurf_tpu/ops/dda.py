"""Ray setup and bounded DDA voxel traversal.

TPU-native replacement for the reference's two traversal schemes:
  * the adaptive plane-stepping host loop (svox2.py:1451-1593), and
  * the in-kernel DDA walk of ``trace_ray_surf_trav``
    (/root/reference/svox2/csrc/render_lerp_kernel_surf_trav.cu:37-562).

Dynamic, data-dependent ``while`` loops don't fit XLA's compilation model, so
traversal here is a *bounded* ``lax.scan`` of ``max_voxels`` steps with masks
past ``tmax`` — rays are padded/masked, never warp-scheduled (SURVEY.md §7).
All functions operate in grid coordinates with unit-length direction vectors.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS_INT = 1e-6


def preprocess_rays(grid, origins_w, dirs_w):
    """World rays -> grid-space rays.

    Matches svox2.py:1631-1642: origins to grid coords; dirs scaled by
    (scaling * gsz) then renormalized to unit length. ``delta_scale`` converts
    grid-space t-units back to world distances (used by sigma integration).
    """
    origins = grid.world2grid(origins_w)
    viewdirs = dirs_w / jnp.linalg.norm(dirs_w, axis=-1, keepdims=True)
    dirs = viewdirs * (grid.scaling * grid.gsz)
    delta_scale = 1.0 / jnp.linalg.norm(dirs, axis=-1)
    dirs = dirs * delta_scale[..., None]
    return origins, dirs, viewdirs, delta_scale


def ray_bounds(grid, origins, dirs, atol=1e-6):
    """Entry/exit t of each ray with the vertex lattice [0, gsz-1]^3.

    Mirrors svox2.py:1651-1665: candidate plane hits, drop negative-t and
    out-of-lattice hits, tnear = min valid, tmax = max valid; tnear = 0 for
    origins already inside.
    """
    gsz = grid.gsz
    safe_dirs = jnp.where(dirs == 0, 1e-12, dirs)
    ts_lo = (0.0 - origins) / safe_dirs
    ts_hi = (gsz - 1.0 - origins) / safe_dirs
    ts = jnp.concatenate([ts_lo, ts_hi], axis=-1)  # (B, 6)
    pts = origins[..., None, :] + ts[..., :, None] * dirs[..., None, :]
    inside = jnp.all(pts <= gsz - 1.0 + 1e-6, axis=-1) & jnp.all(
        pts >= -1e-6, axis=-1
    )
    valid = (ts >= 0) & inside
    tnear = jnp.min(jnp.where(valid, ts, jnp.inf), axis=-1)
    tmax = jnp.max(jnp.where(valid, ts, -jnp.inf), axis=-1)
    origin_inside = grid.within_grid(origins, atol=atol)
    tnear = jnp.where(origin_inside, 0.0, tnear)
    return tnear, tmax


def spheric_bounds(grid, origins, dirs, near_clip):
    """Concentric-sphere ray clip (use_spheric_clip).

    Mirrors ray_find_bounds (render_util.cuh:661-681): normalize grid coords
    to [-1, 1], intersect the unit sphere (far root -> tmax) and the
    (1 - near_clip) sphere (near root -> tmin). Returned t's are in grid
    t-units (the affine map preserves the ray parameter). Rays that miss
    either sphere get (tmin, tmax) = (1e-9, 0) i.e. empty.
    """
    s = 2.0 / grid.gsz
    o = (origins + 0.5) * s - 1.0
    d = dirs * s
    q2a = 2.0 * jnp.sum(d * d, axis=-1)
    qb = 2.0 * jnp.sum(o * d, axis=-1)
    f = qb * qb - 2.0 * q2a * jnp.sum(o * o, axis=-1)
    det_far = f + 2.0 * q2a
    det_near = f + 2.0 * q2a * (1.0 - near_clip) ** 2
    ok = (det_far >= 0) & (det_near >= 0)
    safe_q = jnp.where(q2a == 0, 1.0, q2a)
    tmax = (-qb + jnp.sqrt(jnp.clip(det_far, min=0.0))) / safe_q
    tmin = (-qb - jnp.sqrt(jnp.clip(det_near, min=0.0))) / safe_q
    tmin = jnp.where(ok, tmin, 1e-9)
    tmax = jnp.where(ok, tmax, 0.0)
    return tmin, tmax


def next_crossing(origins, dirs, t, atol=_EPS_INT):
    """t of the next axis-plane crossing after ``t``.

    Equivalent of ``find_next_intersection`` (svox2.py:1451-1505) minus the
    in-grid check (callers compare against tmax instead).

    The on-plane band scales with |position|: f32 roundoff of o + t*d is
    relative (~1.2e-7 * |pos|), and a sub-roundoff absolute band makes the
    walk stall at planes in ~1e-6 increments until the scan budget runs
    out — rays then silently lose all later crossings (~6% of rays at
    64^3 before this fix; plane spacing is 1.0, so a scaled band of
    ~2e-6 * |pos| can never merge two distinct planes).
    """
    pos = origins + t[..., None] * dirs
    tol = atol * 2.0 * (1.0 + jnp.abs(pos))
    fl = jnp.floor(pos)
    on_plane = jnp.abs(fl - pos) <= tol
    ce = jnp.ceil(pos)
    on_plane_c = jnp.abs(ce - pos) <= tol
    next_up = jnp.where(on_plane_c, ce + 1.0, ce)
    next_dn = jnp.where(on_plane, fl - 1.0, fl)
    next_plane = jnp.where(dirs >= 0, next_up, next_dn)
    safe_dirs = jnp.where(dirs == 0, 1e-12, dirs)
    steps = (next_plane - pos) / safe_dirs
    steps = jnp.where((steps <= 0) | (dirs == 0) | ~jnp.isfinite(steps), jnp.inf, steps)
    return t + jnp.min(steps, axis=-1)


def voxel_between(origins, dirs, t0, t1, reso):
    """Voxel containing the midpoint of segment [t0, t1]
    (``find_mid_voxel``, svox2.py:1507-1513)."""
    tm = 0.5 * (t0 + t1)
    pos = origins + tm[..., None] * dirs
    l = jnp.floor(pos).astype(jnp.int32)
    in_bounds = jnp.all(l >= 0, axis=-1) & jnp.all(
        l <= jnp.asarray(reso, jnp.int32) - 2, axis=-1
    )
    return l, in_bounds


def voxel_plane_ts(origins, dirs, l):
    """Entry (close) and exit (far) t of ray with voxel ``l``'s slab.

    Mirrors svox2.py:1976-1980: close plane per axis is l + (d<0), far plane
    l + (d>=0); close_t = max over axes, far_t = min.
    """
    lf = l.astype(origins.dtype)
    neg = dirs < 0
    close_planes = lf + neg.astype(origins.dtype)
    far_planes = lf + (~neg).astype(origins.dtype)
    safe_dirs = jnp.where(dirs == 0, 1e-12, dirs)
    ct = (close_planes - origins) / safe_dirs
    ft = (far_planes - origins) / safe_dirs
    ct = jnp.where(jnp.isfinite(ct), ct, -jnp.inf)
    ft = jnp.where(jnp.isfinite(ft), ft, jnp.inf)
    return jnp.max(ct, axis=-1), jnp.min(ft, axis=-1)
