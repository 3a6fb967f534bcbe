"""αSurf surface renderer — the core of the framework.

TPU-native re-design of the fused CUDA renderer ``trace_ray_surf_trav``
(/root/reference/svox2/csrc/render_lerp_kernel_surf_trav.cu:37-562) and its
Python spec ``_surface_render_gradcheck_lerp``
(/root/reference/svox2/svox2.py:1596-2857).

Two execution strategies share one voxel-processing core (``_voxel_pass``):

  * ``volume_render_surface`` — bounded DDA ``lax.scan``: one step per
    plane crossing, masked past ray exit. Exact reference semantics; used
    as the oracle-comparable path and for tests.

  * ``volume_render_surface_compact`` — the production TPU path. Phase A
    computes ALL axis-plane crossing t's in closed form (three arithmetic
    sequences), sorts them, derives each segment's voxel, gathers a 1-byte
    per-voxel occupancy (precomputed from links + corner alpha threshold +
    level-set range — the exact analog of the kernel's skip conditions,
    surf_trav.cu:216-239/273-277), and compacts the first K occupied
    segments per ray. Phase B runs the heavy gather/cubic/composite scan
    over only those K slots. Because skipped voxels provably contribute
    nothing (trilinear values stay inside the corner hull), the result is
    bit-equal to the dense walk while doing ~max_voxels/K times less heavy
    work.

Gradients: ``jax.grad`` end-to-end; each scan step is ``jax.checkpoint``-ed
so the backward re-gathers instead of storing residuals — the analog of the
CUDA backward's re-traversal (surf_trav.cu:1710-2914).

Per-ray auxiliary losses stream out of the scan as O(1) accumulators
(replacing the kernel's 64-sample ring buffer, surf_trav.cu:407-414); an
optional bounded first-K cache serves the two-pass losses.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .. import defs
from ..core.grid import (
    CORNER_OFFSETS, SparseGrid, fetch_links, gather_corner_links,
)
from ..core.options import RenderOptions
from ..core.rays import Rays
from ..core.sh import eval_sh_bases
from ..ops import dda
from ..ops.cubic import cubic_coeffs, cubic_coeffs_T, cubic_roots, cubic_roots_T
from ..ops.trilerp import trilerp_weights, trilerp_weights_T

_UDF_TYPES = (
    defs.SURFACE_TYPE_UDF,
    defs.SURFACE_TYPE_UDF_ALPHA,
    defs.SURFACE_TYPE_UDF_FAKE_SAMPLE,
)


def max_voxels_for(grid: SparseGrid) -> int:
    """Static bound on DDA steps: a ray crosses at most ~sum(reso) planes."""
    return int(sum(r - 1 for r in grid.reso)) + 2


def surf_alpha_act(raw, activation_type: int):
    """Alpha activation (render_util.cuh:2138-2156; svox2.py:2322-2326)."""
    if activation_type == defs.SIGMOID_FN:
        return jax.nn.sigmoid(raw)
    return 1.0 - jnp.exp(-jax.nn.relu(raw))


def trunc_vol_render_rw(intersect_ids, a, weight_min):
    """Truncated-vol-render cosine ramp (svox2.py:4740-4746;
    render_util.cuh:2157-2190)."""
    x = jnp.clip(a - intersect_ids.astype(jnp.result_type(a, jnp.float32)), 0.0, 1.0)
    return jnp.clip(0.5 * (1.0 - jnp.cos(jnp.pi * x)), min=weight_min)


def trilerp_field_grad(vals8, pos):
    """Gradient of the trilinear field w.r.t. position (compute_field_grad,
    render_util.cuh:2191; svox2.py:2573-2578)."""
    s000, s001, s010, s011, s100, s101, s110, s111 = [
        vals8[..., i] for i in range(8)
    ]
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    c00 = s000 * (1 - z) + s001 * z
    c01 = s010 * (1 - z) + s011 * z
    c10 = s100 * (1 - z) + s101 * z
    c11 = s110 * (1 - z) + s111 * z
    c0 = c00 * (1 - y) + c01 * y
    c1 = c10 * (1 - y) + c11 * y
    gx = c1 - c0
    gy = x * (c11 - c10) + (1 - x) * (c01 - c00)
    gz = x * (y * (s111 - s110) + (1 - y) * (s101 - s100)) + (1 - x) * (
        y * (s011 - s010) + (1 - y) * (s001 - s000)
    )
    return jnp.stack([gx, gy, gz], axis=-1)


# ---------------------------------------------------------------------------
# Shared per-voxel processing core
# ---------------------------------------------------------------------------

def _init_state(B, dtype, cache_size, ray_ok):
    zb = jnp.zeros(B, dtype)
    acc = {
        k: zb
        for k in (
            "l_dist", "l_dist_a", "A_a", "S_a", "A_w", "S_w",
            "l_entropy", "l_entropy_a", "sp_logsig", "sp_logsig_w", "sp_w",
            "l_inward", "lap_sum", "lap_cnt", "udf_var_sum", "udf_var_cnt",
        )
    }
    if cache_size is not None:
        acc["c_ts"] = jnp.zeros((B, cache_size), dtype)
        acc["c_alphas"] = jnp.zeros((B, cache_size), dtype)
        acc["c_weights"] = jnp.zeros((B, cache_size), dtype)
        acc["c_fake"] = jnp.zeros((B, cache_size), bool)
        acc["n_cached"] = jnp.zeros(B, jnp.int32)
    return {
        "log_T": zb,
        "rgb": jnp.zeros((B, 3), dtype),
        "depth": zb,
        "normal": jnp.zeros((B, 3), dtype),
        "wmax": zb,  # mode-depth tracking (trace_ray_mode_term_surf_trav)
        "t_mode": zb,
        "cnt": jnp.zeros(B, jnp.int32),
        "alive": ray_ok,
        "acc": acc,
    }


def pack_grid_data(grid: SparseGrid) -> jnp.ndarray:
    """Concatenate (density | surface | sh | pad) into one row-gatherable
    array [cap, C8] (C8 = channels padded to a multiple of 8). One fused
    row gather is ~3x faster than three separate gathers on TPU.

    Layout per surface type: the surface block is ``surface_data.shape[1]``
    channels (1 for SDF/UDF, 4 for PLANE); for UDF_ALPHA the density block
    is a zero placeholder (the real alphas live per level set in the
    (n_lv, 1) density_data and are looked up by level-set index, not
    gathered per corner — svox2.py:2318)."""
    dtype = grid.sh_data.dtype
    if grid.surface_type == defs.SURFACE_TYPE_UDF_ALPHA:
        dens = jnp.zeros((grid.capacity, 1), dtype)
    else:
        dens = grid.density_data
    parts = [dens, grid.surface_data, grid.sh_data]
    c = 1 + grid.surface_data.shape[1] + grid.sh_data.shape[1]
    pad = (-c) % 8
    if pad:
        parts.append(jnp.zeros((grid.capacity, pad), dtype))
    return jnp.concatenate(parts, axis=1)


def _gather_rows(packed: jnp.ndarray, links8: jnp.ndarray, dtype) -> jnp.ndarray:
    """Isolated row gather: flat indices + an optimization barrier so XLA
    emits one standalone gather kernel (a fused in-scan gather lowers ~60x
    slower than the same take as its own kernel — see PERF.md)."""
    safe = jnp.clip(links8, 0, packed.shape[0] - 1)
    rows = jnp.take(packed, safe.reshape(-1), axis=0)
    rows = jax.lax.optimization_barrier(rows)
    v8 = rows.reshape(*links8.shape, packed.shape[1])
    return v8 * (links8 >= 0)[..., None].astype(dtype)


def _voxel_samples(
    grid: SparseGrid,
    opt: RenderOptions,
    origins,
    dirs,
    sh_mult,
    near_grid_t,
    l,
    close_t,
    far_t,
    vox_ok,
    packed,
):
    """Per-voxel sample computation shared by the scan compositor
    (_voxel_pass) and the packed compositor (volume_render_surface_packed):
    corner gathers, cubic intersections, fake samples. Leading dims are
    (B, V); the slot axis S = 3*n_lv (+1 fake) is flattened voxel-major.

    :return: dict of (B, V*S[,C]) slot arrays (t, alpha [pre-truncation],
        rgb, contrib, fake, snorm, snorm_in, counted) + per-voxel values
        used by the udf-var accumulator.
    """
    B, V = close_t.shape
    dtype = origins.dtype
    n_lv = grid.level_set_data.shape[0]
    o3 = origins[:, None, :]  # (B,1,3) broadcast over voxels
    d3 = dirs[:, None, :]
    o4 = origins[:, None, None, :]  # (B,1,1,3) broadcast over (voxel, slot)
    d4 = dirs[:, None, None, :]

    n_surf_c = grid.surface_data.shape[1]
    links8 = gather_corner_links(grid.links, l)  # (B, V, 8)
    all_present = jnp.all(links8 >= 0, axis=-1)
    vox_ok = vox_ok & all_present

    v8 = _gather_rows(packed, links8, dtype)  # (B, V, 8, C8)
    alpha8 = v8[..., 0]  # (B, V, 8)
    # corner raw-alpha prefilter (surf_trav.cu:230-239); UDF_ALPHA stores
    # alphas per level set, not per corner, so the test is done per slot
    if grid.surface_type != defs.SURFACE_TYPE_UDF_ALPHA:
        vox_ok = vox_ok & jnp.any(alpha8 >= opt.sigma_thresh, axis=-1)

    surf8 = v8[..., 1]  # (B, V, 8) scalar field (first channel for PLANE)
    if grid.surface_type in _UDF_TYPES:
        surf8 = jax.nn.softplus(surf8)
    sh8 = v8[..., 1 + n_surf_c : 1 + n_surf_c + 3 * grid.basis_dim]

    u = o3 + close_t[..., None] * d3 - l.astype(dtype)  # (B, V, 3)
    f0, f1, f2, f3 = cubic_coeffs(surf8, u, d3)  # each (B, V)
    smin = jnp.min(surf8, axis=-1)
    smax = jnp.max(surf8, axis=-1)

    fs_std = (
        grid.fake_sample_std[0, 0]
        if grid.fake_sample_std is not None
        else jnp.asarray(1.0, dtype)
    )

    # Precontract SH coefficients with the per-ray basis once per voxel:
    # rgb(frac) = clip(sum_k w8_k(frac) * c_k + 0.5) where
    # c_k = sum_b sh8[k, ch*bd+b] * sh_mult[b]  — 8x3 per ray, reused by all
    # sample slots. Elementwise multiply-reduce (VPU), never a tiny matmul,
    # and never a (..., 8, 3, bd) reshape: a layout-changing reshape copy
    # gets tile-padded (3, bd) -> (8, 128) on TPU — a 16x memory blowup
    # that OOM'd the 256^3 recipe step. Slice+reduce fuses instead.
    bd = grid.basis_dim
    corner_rgb = jnp.stack(
        [
            jnp.sum(
                sh8[..., c * bd : (c + 1) * bd]
                * sh_mult[:, None, None, :], axis=-1
            )
            for c in range(3)
        ],
        axis=-1,
    )  # (B, V, 8, 3)

    if grid.surface_type == defs.SURFACE_TYPE_VOXEL_FACE:
        # one sample per voxel crossing at the entry plane; alpha is the
        # 000-corner raw value through a hard sigmoid, rgb trilerped at the
        # crossing point (svox2.py:1670-1745). Samples outside the strict
        # lattice interior are dropped like the reference's within_grid
        # filter (svox2.py:1686, atol=1e-6) — this excludes entries at the
        # grid boundary (tnear). Deliberate deviations from the reference
        # debug path: compositing is t-ordered (the reference composites in
        # x/y/z plane-family order) and the voxel is the one being ENTERED
        # for negative directions (the reference floors the on-plane
        # position, yielding the exited voxel).
        epos = o3 + close_t[..., None] * d3  # (B, V, 3) grid coords
        gsz = jnp.asarray(grid.reso, dtype)
        inside = jnp.all(epos >= 1e-6, -1) & jnp.all(
            epos <= gsz - 1.0 - 1e-6, -1
        )
        efrac = epos - l.astype(dtype)
        efrac = jnp.clip(jnp.where(vox_ok[..., None], efrac, 0.5), 0.0, 1.0)
        ew8 = trilerp_weights(efrac)  # (B, V, 8)
        ergb = jnp.clip(jnp.sum(ew8[..., None] * corner_rgb, axis=2) + 0.5,
                        min=0.0)
        ealpha = jax.nn.sigmoid(alpha8[..., 0])  # corner 000, svox2.py:1726
        contrib = vox_ok & inside & (close_t >= near_grid_t)
        return {
            "t": close_t,
            "alpha": ealpha,
            "rgb": ergb,
            "contrib": contrib,
            "fake": jnp.zeros_like(contrib),
            "snorm": jnp.zeros((B, V, 3), dtype),
            "snorm_in": jnp.zeros((B, V, 3), dtype),
            "counted": contrib.astype(jnp.int32),
            "vox_ok": vox_ok,
            "surf8": surf8,
            "n_slots": 1,
        }

    # ---- real intersections ----
    if grid.surface_type == defs.SURFACE_TYPE_PLANE:
        # plane surface: mean of the 8 corner planes (a,b,c,d), d clamped
        # so the plane stays near its voxel, single linear root in GLOBAL
        # grid coords (svox2.py:2254-2288)
        plane = jnp.mean(v8[..., 1:5], axis=2)  # (B, V, 4)
        abc = plane[..., :3]
        xyz_term = jnp.sum((l.astype(dtype) + 0.5) * abc, -1)
        th = 0.3
        dpl = jnp.clip(plane[..., 3], -th - xyz_term, th - xyz_term)
        denom = jnp.sum(abc * d3, -1)
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        t_pl = -(jnp.sum(abc * o3, -1) + dpl) / denom  # global t (B, V)
        roots = (t_pl - close_t)[..., None]  # (B, V, 1) slot axis
        lv_ok_s = vox_ok[..., None] & (t_pl[..., None] > 0)
        vox_has_surf = vox_ok
        # accept roots at/just before the slab entry (the reference's
        # validity is purely spatial: sample within [l, l+1])
        root_pos = roots > -1e-6
        plane_grad = abc
    else:
        root_chunks, lv_ok_list = [], []
        for i in range(n_lv):
            lv = grid.level_set_data[i]
            lv_ok = vox_ok & (lv >= smin) & (lv <= smax)  # (B, V)
            lv_ok_list.append(lv_ok)
            root3 = cubic_roots(f0 - lv, f1, f2, f3)  # (B, V, 3)
            root_chunks.append(root3)
        roots = jnp.concatenate(root_chunks, axis=2)  # (B, V, 3*n_lv)
        lv_ok_s = jnp.concatenate(
            [g[..., None].repeat(3, axis=2) for g in lv_ok_list], axis=2
        )  # (B, V, 3*n_lv)
        vox_has_surf = jnp.any(jnp.stack(lv_ok_list, -1), -1)  # (B, V)
        root_pos = roots > 0
        plane_grad = None

    t_real = close_t[..., None] + roots  # global t per slot (B, V, S0)
    frac = o4 + t_real[..., None] * d4 - l[:, :, None, :].astype(dtype)
    in_cube = jnp.all(frac >= 0, -1) & jnp.all(frac <= 1, -1)
    geo_ok = lv_ok_s & root_pos & in_cube & (t_real >= near_grid_t)
    # vox_has_sample set before outward test (surf_trav.cu:348)
    vox_has_sample = jnp.any(geo_ok, axis=-1)  # (B, V)
    frac_safe = jnp.clip(jnp.where(geo_ok[..., None], frac, 0.5), 0.0, 1.0)
    if plane_grad is not None:
        sgrad = jnp.broadcast_to(
            plane_grad[:, :, None, :], (*frac_safe.shape[:3], 3)
        )
    else:
        sgrad = trilerp_field_grad(surf8[:, :, None, :], frac_safe)  # (B,V,S0,3)
    if opt.only_outward_intersect:
        geo_ok = geo_ok & (jnp.sum(sgrad * d4, axis=-1) > 0)
    nsq = jnp.sum(sgrad * sgrad, axis=-1, keepdims=True)
    snorm_s = -sgrad / jnp.sqrt(jnp.where(nsq > 1e-20, nsq, 1e-20))

    w8 = trilerp_weights(frac_safe)  # (B, V, S0, 8)
    raw_a = jnp.sum(w8 * alpha8[:, :, None, :], axis=-1)  # (B, V, S0)
    if grid.surface_type == defs.SURFACE_TYPE_UDF_ALPHA:
        # one learnable alpha per level set, looked up by the slot's level
        # set instead of trilerped (svox2.py:2318-2322)
        lv_alpha = grid.density_data[:, 0]  # (n_lv,)
        raw_a = jnp.broadcast_to(
            jnp.repeat(lv_alpha, 3)[None, None, :], raw_a.shape
        )
    if opt.no_surf_grad_from_sh:
        # Cut the color->surface gradient path through the SH interpolation
        # position (surf_trav.cu:2250-2264 guarded by no_surf_grad_from_sh);
        # the alpha->position path stays live (:2352-2359 is unconditional).
        w8_sh = trilerp_weights(jax.lax.stop_gradient(frac_safe))
    else:
        w8_sh = w8
    # per-channel corner reduce (no (B,V,S,8,3) intermediate — see the
    # corner_rgb layout note above)
    rgb_s = jnp.clip(
        jnp.stack(
            [
                jnp.sum(w8_sh * corner_rgb[:, :, None, :, c], axis=-1)
                for c in range(3)
            ],
            axis=-1,
        ) + 0.5,
        min=0.0,
    )  # (B, V, S0, 3)
    contrib = geo_ok & (raw_a > opt.sigma_thresh)
    alpha_s = surf_alpha_act(raw_a, opt.alpha_activation_type)
    t_s = t_real
    fake_s = jnp.zeros(contrib.shape, bool)
    counted = geo_ok
    snorm_in = snorm_s

    # ---- fake sample (surf_trav.cu:423-541), appended as each voxel's last
    # slot (slot order keeps voxel-major compositing order intact).
    # Scalar surface fields only: the Gaussian reweight is defined on the
    # trilinear surface value (PLANE has no such field; the reference's
    # fake-sample branch likewise assumes scalar corners). ----
    if opt.surf_fake_sample and grid.surface_type != defs.SURFACE_TYPE_PLANE:
        take = vox_ok & ~vox_has_sample & (
            (far_t - close_t) > opt.surf_fake_sample_min_vox_len
        )
        if opt.limited_fake_sample:
            take = take & vox_has_surf
        tf = 0.5 * (close_t + far_t)  # (B, V)
        ffrac = o3 + tf[..., None] * d3 - l.astype(dtype)
        ffrac = jnp.clip(jnp.where(take[..., None], ffrac, 0.5), 0.0, 1.0)
        fw8 = trilerp_weights(ffrac)  # (B, V, 8)
        fraw = jnp.sum(fw8 * alpha8, axis=-1)
        frgb = jnp.clip(jnp.sum(fw8[..., None] * corner_rgb, axis=2) + 0.5, min=0.0)
        mu = jnp.mean(surf8, axis=-1)
        var = jnp.mean((surf8 - mu[..., None]) ** 2, axis=-1)
        std = jnp.sqrt(jnp.clip(var, min=1e-9))
        if not opt.fake_sample_normalize_surf:
            std = jnp.ones_like(std)
        s_norm = jnp.sum(fw8 * (surf8 / std[..., None]), axis=-1)
        # signed distance to nearest level set (surf_trav.cu:486-490)
        dists = s_norm[..., None] - grid.level_set_data[None, None, :]
        amin = jnp.argmin(jnp.abs(dists), axis=-1)
        fake_dist = jnp.take_along_axis(dists, amin[..., None], axis=-1)[..., 0]
        if grid.surface_type == defs.SURFACE_TYPE_UDF_ALPHA:
            # nearest level set's learnable alpha (svox2.py:2318)
            fraw = jnp.take(grid.density_data[:, 0], amin)
        take = take & (fraw > opt.sigma_thresh)
        falpha = surf_alpha_act(fraw, opt.alpha_activation_type)
        falpha = falpha * jnp.exp(-0.5 * (fake_dist / fs_std) ** 2)
        t_s = jnp.concatenate([t_s, tf[..., None]], axis=2)
        alpha_s = jnp.concatenate([alpha_s, falpha[..., None]], axis=2)
        rgb_s = jnp.concatenate([rgb_s, frgb[:, :, None, :]], axis=2)
        contrib = jnp.concatenate([contrib, take[..., None]], axis=2)
        fake_s = jnp.concatenate(
            [fake_s, jnp.ones((B, V, 1), bool)], axis=2
        )
        # surface normal at the fake-sample position: used only by the
        # inward-norm loss (the oracle computes surf_grad for fake samples
        # too, svox2.py:2563-2582); the rendered normal map keeps real
        # intersections only (trace_ray_normal semantics)
        fgrad = trilerp_field_grad(surf8, ffrac)  # (B, V, 3)
        fnsq = jnp.sum(fgrad * fgrad, axis=-1, keepdims=True)
        fsnorm = -fgrad / jnp.sqrt(jnp.where(fnsq > 1e-20, fnsq, 1e-20))
        snorm_in = jnp.concatenate(
            [snorm_s, fsnorm[:, :, None, :]], axis=2
        )
        snorm_s = jnp.concatenate(
            [snorm_s, jnp.zeros((B, V, 1, 3), dtype)], axis=2
        )
        counted = jnp.concatenate(
            [counted, jnp.zeros((B, V, 1), bool)], axis=2
        )

    # ---- flatten (voxel, slot) -> composite axis, voxel-major ----
    S = contrib.shape[2]
    VS = V * S
    out = {
        "t": t_s.reshape(B, VS),
        "alpha": alpha_s.reshape(B, VS),  # PRE-truncation
        "rgb": rgb_s.reshape(B, VS, 3),
        "contrib": contrib.reshape(B, VS),
        "fake": fake_s.reshape(B, VS),
        "snorm": snorm_s.reshape(B, VS, 3),
        "snorm_in": snorm_in.reshape(B, VS, 3),
        "counted": counted.reshape(B, VS).astype(jnp.int32),
        "vox_ok": vox_ok,
        "surf8": surf8,
        "n_slots": S,
    }
    if grid.surface_type in _UDF_TYPES:
        out["lv_ok"] = jnp.stack(lv_ok_list, -1)  # (B, V, n_lv)
    return out


def trilerp_field_grad_T(vals8T, posT):
    """``trilerp_field_grad`` with corner/component axes LEADING
    (vals8T (8, ...broadcastable), posT (3, ...) -> (3, ...))."""
    s000, s001, s010, s011, s100, s101, s110, s111 = [
        vals8T[i] for i in range(8)
    ]
    x, y, z = posT[0], posT[1], posT[2]
    c00 = s000 * (1 - z) + s001 * z
    c01 = s010 * (1 - z) + s011 * z
    c10 = s100 * (1 - z) + s101 * z
    c11 = s110 * (1 - z) + s111 * z
    c0 = c00 * (1 - y) + c01 * y
    c1 = c10 * (1 - y) + c11 * y
    gx = c1 - c0
    gy = x * (c11 - c10) + (1 - x) * (c01 - c00)
    gz = x * (y * (s111 - s110) + (1 - y) * (s101 - s100)) + (1 - x) * (
        y * (s011 - s010) + (1 - y) * (s001 - s000)
    )
    return jnp.stack([gx, gy, gz], axis=0)


def _voxel_samples_T(
    grid: SparseGrid,
    opt: RenderOptions,
    oT,
    dT,
    shmT,
    near_grid_t,
    lT,
    close_t,
    far_t,
    vox_ok,
    packed,
):
    """Transposed-layout twin of ``_voxel_samples`` for the packed pool:
    the pool axis M is MINOR everywhere (slot arrays (S, M), vectors
    (3, S, M), corner data (8, C, M)), so every intermediate tiles cleanly
    onto the TPU's (8, 128) layout. The original (M, 1, S, 8)-style shapes
    put an 8-or-smaller axis in the 128-lane position — a 16-21x pad that
    bounded the recipe pool at ~260k entries (round-4 verdict weak #3 /
    PERF.md "Phase-B memory envelope"). Same math, same reference
    citations as ``_voxel_samples``; V is specialized to 1 (one voxel per
    pool entry).

    :param oT/dT: (3, M) ray origin/direction per pool entry
    :param shmT: (basis_dim, M) SH basis values
    :param lT: (3, M) int32 voxel coords
    :param close_t/far_t/vox_ok: (M,)
    :return: dict of (S, M) slot arrays (t, alpha [pre-truncation],
        contrib, fake, counted), (3, S, M) vectors (rgb, snorm, snorm_in),
        plus vox_ok, surf8T (8, M), n_slots.
    """
    M = close_t.shape[0]
    dtype = oT.dtype
    n_lv = grid.level_set_data.shape[0]
    n_surf_c = grid.surface_data.shape[1]
    X, Y, Z = grid.links.shape
    offs = CORNER_OFFSETS

    idx_list = []
    for c in range(8):
        cx = jnp.clip(lT[0] + int(offs[c, 0]), 0, X - 1)
        cy = jnp.clip(lT[1] + int(offs[c, 1]), 0, Y - 1)
        cz = jnp.clip(lT[2] + int(offs[c, 2]), 0, Z - 1)
        idx_list.append((cx * Y + cy) * Z + cz)
    links8T = jax.lax.optimization_barrier(
        jnp.take(grid.links.reshape(-1), jnp.stack(idx_list, 0).reshape(-1))
    ).reshape(8, M)
    all_present = jnp.all(links8T >= 0, axis=0)
    vox_ok = vox_ok & all_present

    # one fused row gather for all 8 corners (8M rows in a single take:
    # one gather kernel forward, ONE scatter-add in the VJP instead of 8),
    # then transposed to the flat-corner-row layout (8, C8, M)
    cap = packed.shape[0]
    rows = jax.lax.optimization_barrier(
        jnp.take(packed, jnp.clip(links8T.reshape(-1), 0, cap - 1), axis=0)
    )  # (8M, C8)
    v8T = rows.reshape(8, M, -1).transpose(0, 2, 1) * (
        (links8T >= 0)[:, None, :].astype(dtype)
    )  # (8, C8, M)
    alpha8T = v8T[:, 0, :]  # (8, M)
    if grid.surface_type != defs.SURFACE_TYPE_UDF_ALPHA:
        vox_ok = vox_ok & jnp.any(alpha8T >= opt.sigma_thresh, axis=0)

    surf8T = v8T[:, 1, :]  # (8, M)
    if grid.surface_type in _UDF_TYPES:
        surf8T = jax.nn.softplus(surf8T)

    fs_std = (
        grid.fake_sample_std[0, 0]
        if grid.fake_sample_std is not None
        else jnp.asarray(1.0, dtype)
    )

    # corner colors: c_k = sum_b sh8[k, ch*bd+b] * sh_mult[b] — explicit
    # multiply-accumulate over the 3*bd channel slices (VPU; see the
    # corner_rgb layout note in _voxel_samples)
    bd = grid.basis_dim
    sh_base = 1 + n_surf_c
    corner_rgbT = []  # per channel: (8, M)
    for ch in range(3):
        acc_rgb = None
        for b in range(bd):
            term = v8T[:, sh_base + ch * bd + b, :] * shmT[b][None, :]
            acc_rgb = term if acc_rgb is None else acc_rgb + term
        corner_rgbT.append(acc_rgb)

    if grid.surface_type == defs.SURFACE_TYPE_VOXEL_FACE:
        # see the VOXEL_FACE notes in _voxel_samples (svox2.py:1670-1745)
        epos = oT + close_t[None, :] * dT  # (3, M) grid coords
        gszT = jnp.asarray(grid.reso, dtype)[:, None]
        inside = jnp.all(epos >= 1e-6, 0) & jnp.all(
            epos <= gszT - 1.0 - 1e-6, 0
        )
        efrac = epos - lT.astype(dtype)
        efrac = jnp.clip(jnp.where(vox_ok[None, :], efrac, 0.5), 0.0, 1.0)
        ew8 = trilerp_weights_T(efrac)  # (8, M)
        ergb = jnp.stack(
            [
                jnp.clip(jnp.sum(ew8 * corner_rgbT[ch], axis=0) + 0.5, min=0.0)
                for ch in range(3)
            ],
            axis=0,
        )  # (3, M)
        ealpha = jax.nn.sigmoid(alpha8T[0])
        contrib = vox_ok & inside & (close_t >= near_grid_t)
        return {
            "t": close_t[None, :],
            "alpha": ealpha[None, :],
            "rgb": ergb[:, None, :],
            "contrib": contrib[None, :],
            "fake": jnp.zeros((1, M), bool),
            "snorm": jnp.zeros((3, 1, M), dtype),
            "snorm_in": jnp.zeros((3, 1, M), dtype),
            "counted": contrib[None, :].astype(jnp.int32),
            "vox_ok": vox_ok,
            "surf8T": surf8T,
            "n_slots": 1,
        }

    # ---- real intersections ----
    if grid.surface_type == defs.SURFACE_TYPE_PLANE:
        # see the PLANE notes in _voxel_samples (svox2.py:2254-2288)
        plane = jnp.mean(v8T[:, 1:5, :], axis=0)  # (4, M)
        abc = plane[:3]  # (3, M)
        xyz_term = jnp.sum((lT.astype(dtype) + 0.5) * abc, axis=0)
        th = 0.3
        dpl = jnp.clip(plane[3], -th - xyz_term, th - xyz_term)
        denom = jnp.sum(abc * dT, axis=0)
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        t_pl = -(jnp.sum(abc * oT, axis=0) + dpl) / denom  # (M,)
        roots = (t_pl - close_t)[None, :]  # (1, M)
        lv_ok_s = vox_ok[None, :] & (t_pl[None, :] > 0)
        vox_has_surf = vox_ok
        root_pos = roots > -1e-6
        plane_grad = abc
        lv_ok_list = None
    else:
        smin = jnp.min(surf8T, axis=0)
        smax = jnp.max(surf8T, axis=0)
        f0, f1, f2, f3 = cubic_coeffs_T(
            surf8T, oT + close_t[None, :] * dT - lT.astype(dtype), dT
        )
        root_chunks, lv_ok_list = [], []
        for i in range(n_lv):
            lv = grid.level_set_data[i]
            lv_ok = vox_ok & (lv >= smin) & (lv <= smax)  # (M,)
            lv_ok_list.append(lv_ok)
            root_chunks.append(cubic_roots_T(f0 - lv, f1, f2, f3))  # (3, M)
        roots = jnp.concatenate(root_chunks, axis=0)  # (S0, M)
        lv_ok_s = jnp.concatenate(
            [jnp.broadcast_to(g[None, :], (3, M)) for g in lv_ok_list], axis=0
        )
        vox_has_surf = jnp.any(jnp.stack(lv_ok_list, 0), 0)
        root_pos = roots > 0
        plane_grad = None

    t_real = close_t[None, :] + roots  # (S0, M)
    frac = (
        oT[:, None, :] + t_real[None, :, :] * dT[:, None, :]
        - lT[:, None, :].astype(dtype)
    )  # (3, S0, M)
    in_cube = jnp.all(frac >= 0, 0) & jnp.all(frac <= 1, 0)
    geo_ok = lv_ok_s & root_pos & in_cube & (t_real >= near_grid_t)
    vox_has_sample = jnp.any(geo_ok, axis=0)  # (M,)
    frac_safe = jnp.clip(jnp.where(geo_ok[None, :, :], frac, 0.5), 0.0, 1.0)
    if plane_grad is not None:
        sgrad = jnp.broadcast_to(plane_grad[:, None, :], frac_safe.shape)
    else:
        sgrad = trilerp_field_grad_T(surf8T[:, None, :], frac_safe)
    if opt.only_outward_intersect:
        geo_ok = geo_ok & (jnp.sum(sgrad * dT[:, None, :], axis=0) > 0)
    nsq = jnp.sum(sgrad * sgrad, axis=0, keepdims=True)
    snorm_s = -sgrad / jnp.sqrt(jnp.where(nsq > 1e-20, nsq, 1e-20))

    w8 = trilerp_weights_T(frac_safe)  # (8, S0, M)
    raw_a = jnp.sum(w8 * alpha8T[:, None, :], axis=0)  # (S0, M)
    if grid.surface_type == defs.SURFACE_TYPE_UDF_ALPHA:
        lv_alpha = grid.density_data[:, 0]  # (n_lv,)
        raw_a = jnp.broadcast_to(
            jnp.repeat(lv_alpha, 3)[:, None], raw_a.shape
        )
    if opt.no_surf_grad_from_sh:
        w8_sh = trilerp_weights_T(jax.lax.stop_gradient(frac_safe))
    else:
        w8_sh = w8
    rgb_s = jnp.stack(
        [
            jnp.clip(
                jnp.sum(w8_sh * corner_rgbT[ch][:, None, :], axis=0) + 0.5,
                min=0.0,
            )
            for ch in range(3)
        ],
        axis=0,
    )  # (3, S0, M)
    contrib = geo_ok & (raw_a > opt.sigma_thresh)
    alpha_s = surf_alpha_act(raw_a, opt.alpha_activation_type)
    t_s = t_real
    fake_s = jnp.zeros(contrib.shape, bool)
    counted = geo_ok
    snorm_in = snorm_s

    if opt.surf_fake_sample and grid.surface_type != defs.SURFACE_TYPE_PLANE:
        # fake sample (surf_trav.cu:423-541); see _voxel_samples notes
        take = vox_ok & ~vox_has_sample & (
            (far_t - close_t) > opt.surf_fake_sample_min_vox_len
        )
        if opt.limited_fake_sample:
            take = take & vox_has_surf
        tf = 0.5 * (close_t + far_t)  # (M,)
        ffrac = oT + tf[None, :] * dT - lT.astype(dtype)  # (3, M)
        ffrac = jnp.clip(jnp.where(take[None, :], ffrac, 0.5), 0.0, 1.0)
        fw8 = trilerp_weights_T(ffrac)  # (8, M)
        fraw = jnp.sum(fw8 * alpha8T, axis=0)
        frgb = jnp.stack(
            [
                jnp.clip(jnp.sum(fw8 * corner_rgbT[ch], axis=0) + 0.5, min=0.0)
                for ch in range(3)
            ],
            axis=0,
        )  # (3, M)
        mu = jnp.mean(surf8T, axis=0)
        var = jnp.mean((surf8T - mu[None, :]) ** 2, axis=0)
        std = jnp.sqrt(jnp.clip(var, min=1e-9))
        if not opt.fake_sample_normalize_surf:
            std = jnp.ones_like(std)
        s_norm = jnp.sum(fw8 * (surf8T / std[None, :]), axis=0)
        dists = s_norm[None, :] - grid.level_set_data[:, None]  # (n_lv, M)
        amin = jnp.argmin(jnp.abs(dists), axis=0)  # (M,)
        fake_dist = jnp.take_along_axis(dists, amin[None, :], axis=0)[0]
        if grid.surface_type == defs.SURFACE_TYPE_UDF_ALPHA:
            fraw = jnp.take(grid.density_data[:, 0], amin)
        take = take & (fraw > opt.sigma_thresh)
        falpha = surf_alpha_act(fraw, opt.alpha_activation_type)
        falpha = falpha * jnp.exp(-0.5 * (fake_dist / fs_std) ** 2)
        t_s = jnp.concatenate([t_s, tf[None, :]], axis=0)
        alpha_s = jnp.concatenate([alpha_s, falpha[None, :]], axis=0)
        rgb_s = jnp.concatenate([rgb_s, frgb[:, None, :]], axis=1)
        contrib = jnp.concatenate([contrib, take[None, :]], axis=0)
        fake_s = jnp.concatenate([fake_s, jnp.ones((1, M), bool)], axis=0)
        fgrad = trilerp_field_grad_T(surf8T, ffrac)  # (3, M)
        fnsq = jnp.sum(fgrad * fgrad, axis=0, keepdims=True)
        fsnorm = -fgrad / jnp.sqrt(jnp.where(fnsq > 1e-20, fnsq, 1e-20))
        snorm_in = jnp.concatenate([snorm_s, fsnorm[:, None, :]], axis=1)
        snorm_s = jnp.concatenate(
            [snorm_s, jnp.zeros((3, 1, M), dtype)], axis=1
        )
        counted = jnp.concatenate([counted, jnp.zeros((1, M), bool)], axis=0)

    out = {
        "t": t_s,
        "alpha": alpha_s,  # PRE-truncation
        "rgb": rgb_s,
        "contrib": contrib,
        "fake": fake_s,
        "snorm": snorm_s,
        "snorm_in": snorm_in,
        "counted": counted.astype(jnp.int32),
        "vox_ok": vox_ok,
        "surf8T": surf8T,
        "n_slots": contrib.shape[0],
    }
    if grid.surface_type in _UDF_TYPES:
        out["lv_ok"] = jnp.stack(lv_ok_list, 0)  # (n_lv, M)
    return out


def _accumulate_sample_losses_T(grid, opt, acc, dT, smp, dtype):
    """Transposed twin of ``_accumulate_sample_losses``: slot arrays are
    (S, M), vectors (3, S, M); reductions run over the slot axis 0 and
    produce (M,) per-entry sums."""
    contrib = smp["contrib"]
    alpha_pre = smp["alpha"]
    in_dot = jnp.sum(
        jax.lax.stop_gradient(smp["snorm_in"]) * dT[:, None, :], axis=0
    )
    acc["l_inward"] = acc["l_inward"] + jnp.sum(
        jnp.where(contrib, alpha_pre * jnp.maximum(in_dot, 0.0) ** 2, 0.0), 0
    )
    p_lap = jnp.exp(-alpha_pre) + jnp.exp(-(1.0 - alpha_pre))
    acc["lap_sum"] = acc["lap_sum"] + jnp.sum(
        jnp.where(contrib, -jnp.log(p_lap), 0.0), 0
    )
    acc["lap_cnt"] = acc["lap_cnt"] + jnp.sum(contrib, 0).astype(dtype)
    if grid.surface_type in _UDF_TYPES:
        n_lv = grid.level_set_data.shape[0]
        vox_ok = smp["vox_ok"]
        surf8T = smp["surf8T"]
        if opt.surf_fake_sample and not opt.limited_fake_sample:
            n_lv_hull = jnp.where(vox_ok, float(n_lv), 0.0).astype(dtype)
        else:
            n_lv_hull = jnp.sum(smp["lv_ok"].astype(dtype), 0)
            if grid.surface_type == defs.SURFACE_TYPE_UDF_FAKE_SAMPLE:
                n_lv_hull = jnp.maximum(n_lv_hull, 1.0)
        mu_v = jnp.mean(surf8T, axis=0)
        var_v = jnp.sum((surf8T - mu_v[None, :]) ** 2, axis=0) / 7.0
        acc["udf_var_sum"] = acc["udf_var_sum"] + jnp.where(
            vox_ok, jnp.maximum(n_lv_hull - 1.0, 0.0) * var_v, 0.0
        )
        acc["udf_var_cnt"] = acc["udf_var_cnt"] + vox_ok.astype(dtype)
    return acc


def _accumulate_sample_losses(grid, opt, acc, dirs_s, smp, dtype):
    """Streaming inward-norm / density-lap / udf-var accumulators shared by
    both compositors. ``dirs_s`` broadcasts against the (B|M, VS) slots."""
    contrib = smp["contrib"]
    alpha_pre = smp["alpha"]
    # l_inward_norm (svox2.py:2559-2590): alpha * relu(dot(n, d))^2 summed
    # over samples; normal detached
    in_dot = jnp.sum(
        jax.lax.stop_gradient(smp["snorm_in"]) * dirs_s, axis=-1
    )
    acc["l_inward"] = acc["l_inward"] + jnp.sum(
        jnp.where(contrib, alpha_pre * jnp.maximum(in_dot, 0.0) ** 2, 0.0), 1
    )
    # density_lap_loss (svox2.py:2608-2617): -log(e^-a + e^-(1-a)), meaned
    # over samples in _finalize
    p_lap = jnp.exp(-alpha_pre) + jnp.exp(-(1.0 - alpha_pre))
    acc["lap_sum"] = acc["lap_sum"] + jnp.sum(
        jnp.where(contrib, -jnp.log(p_lap), 0.0), 1
    )
    acc["lap_cnt"] = acc["lap_cnt"] + jnp.sum(contrib, 1).astype(dtype)
    # udf_var_loss (svox2.py:2597-2606): clamp(n_lv_in_hull - 1, 0) *
    # var(8 corners, unbiased), meaned over candidate voxels
    if grid.surface_type in _UDF_TYPES:
        n_lv = grid.level_set_data.shape[0]
        vox_ok = smp["vox_ok"]
        surf8 = smp["surf8"]
        if opt.surf_fake_sample and not opt.limited_fake_sample:
            # unrestricted fake samples: the oracle considers every level
            # set per voxel (svox2.py:2017-2019)
            n_lv_hull = jnp.where(vox_ok, float(n_lv), 0.0).astype(dtype)
        else:
            n_lv_hull = jnp.sum(smp["lv_ok"].astype(dtype), -1)
            if grid.surface_type == defs.SURFACE_TYPE_UDF_FAKE_SAMPLE:
                # no set in hull -> nearest set is used (svox2.py:2021-2027)
                n_lv_hull = jnp.maximum(n_lv_hull, 1.0)
        mu_v = jnp.mean(surf8, axis=-1)
        var_v = jnp.sum((surf8 - mu_v[..., None]) ** 2, axis=-1) / 7.0
        acc["udf_var_sum"] = acc["udf_var_sum"] + jnp.sum(
            jnp.where(vox_ok, jnp.maximum(n_lv_hull - 1.0, 0.0) * var_v, 0.0), 1
        )
        acc["udf_var_cnt"] = acc["udf_var_cnt"] + jnp.sum(vox_ok, 1).astype(dtype)
    return acc


def _voxel_pass(
    grid: SparseGrid,
    opt: RenderOptions,
    origins,
    dirs,
    sh_mult,
    near_grid_t,
    state: dict,
    l,
    close_t,
    far_t,
    vox_ok,
    cache_size,
    return_slots: bool,
    packed=None,
):
    """Process a chunk of V voxels for every ray: find intersections,
    composite, update streaming losses. ``l`` is (B, V, 3); ``close_t``,
    ``far_t``, ``vox_ok`` are (B, V). Voxels within the chunk are composited
    in slot order (voxel-major), so a chunk of V behaves exactly like V
    sequential single-voxel passes. Returns (state, slot_ys or None)."""
    B, V = close_t.shape
    dtype = origins.dtype

    log_T = state["log_T"]
    rgb_acc = state["rgb"]
    depth_acc = state["depth"]
    normal_acc = state["normal"]
    acc = state["acc"]
    cnt_in = state["cnt"]

    if packed is None:
        packed = pack_grid_data(grid)
    smp = _voxel_samples(
        grid, opt, origins, dirs, sh_mult, near_grid_t, l, close_t, far_t,
        vox_ok & state["alive"][:, None], packed,
    )
    S = smp["n_slots"]
    VS = V * S
    t_s = smp["t"]
    alpha_s = smp["alpha"]
    rgb_s = smp["rgb"]
    contrib = smp["contrib"]
    fake_s = smp["fake"]
    snorm_s = smp["snorm"]
    counted_i = smp["counted"]

    acc = _accumulate_sample_losses(grid, opt, acc, dirs[:, None, :], smp, dtype)

    # running intersection index (kernel's ++intersect_i, slot-ordered);
    # fake samples use the post-voxel count minus one (svox2.py:2356)
    exc_cnt = (
        cnt_in[:, None] + jnp.cumsum(counted_i, axis=1) - counted_i
    ).astype(jnp.int32)
    if opt.truncated_vol_render:
        ids = exc_cnt - fake_s.astype(jnp.int32)
        rw = trunc_vol_render_rw(
            ids, grid.truncated_vol_render_a, opt.trunc_vol_weight_min
        )
        alpha_s = alpha_s * rw
    cnt = (cnt_in + jnp.sum(counted_i, axis=1)).astype(jnp.int32)

    # ---- stop_thresh: kill voxels whose entry transmittance is below the
    # threshold (the dense walk's per-voxel `alive` check; log-attenuation is
    # monotone so the unmasked prefix decides death exactly) ----
    if opt.stop_thresh > 0:
        one_m0 = jnp.where(
            contrib, jnp.clip(1.0 - jnp.where(contrib, alpha_s, 0.0),
                              1e-7, 1.0 - 1e-7), 1.0
        )
        att_v = jnp.sum(jnp.log(one_m0).reshape(B, V, S), axis=2)  # (B, V)
        entry_v = log_T[:, None] + jnp.cumsum(att_v, axis=1) - att_v
        alive_v = entry_v > math.log(opt.stop_thresh)
        contrib = contrib & alive_v[..., None].repeat(S, 2).reshape(B, VS)

    # ---- vectorized composite along the flattened slot axis ----
    alpha_s = jnp.where(contrib, alpha_s, 0.0)
    # pcnt = -log(1 - alpha) with the oracle's clamp (svox2.py:2423)
    one_m = jnp.where(contrib, jnp.clip(1.0 - alpha_s, 1e-7, 1.0 - 1e-7), 1.0)
    log_att = jnp.log(one_m)
    cum_prev = jnp.cumprod(one_m, axis=1) / one_m  # exclusive prefix product
    weight_s = jnp.where(
        contrib, jnp.exp(log_T)[:, None] * cum_prev * (1.0 - one_m), 0.0
    )
    rgb_acc = rgb_acc + jnp.sum(weight_s[..., None] * rgb_s, axis=1)
    depth_acc = depth_acc + jnp.sum(weight_s * t_s, axis=1)
    normal_acc = normal_acc + jnp.sum(weight_s[..., None] * snorm_s, axis=1)
    log_T = log_T + jnp.sum(log_att, axis=1)

    # mode depth: t of the globally max-weight sample
    # (trace_ray_mode_term_surf_trav, surf_trav.cu:796-1003)
    w_best = jnp.max(weight_s, axis=1)
    t_best = jnp.take_along_axis(t_s, jnp.argmax(weight_s, axis=1)[:, None], 1)[:, 0]
    upd_mode = w_best > state["wmax"]
    wmax_new = jnp.where(upd_mode, w_best, state["wmax"])
    t_mode_new = jnp.where(upd_mode, t_best, state["t_mode"])

    # ---- streaming losses, vectorized with within-step exclusive prefixes --
    if opt.fake_sample_l_dist:
        inc = contrib
    else:
        inc = contrib & ~fake_s
    a_i = jnp.where(inc, alpha_s, 0.0)
    w_i = jnp.where(inc, weight_s, 0.0)
    preA = jnp.cumsum(a_i, axis=1) - a_i  # exclusive within-step prefixes
    preS = jnp.cumsum(a_i * t_s, axis=1) - a_i * t_s
    preAw = jnp.cumsum(w_i, axis=1) - w_i
    preSw = jnp.cumsum(w_i * t_s, axis=1) - w_i * t_s
    acc["l_dist_a"] = acc["l_dist_a"] + jnp.sum(
        a_i * (t_s * (acc["A_a"][:, None] + preA) - acc["S_a"][:, None] - preS), 1
    )
    acc["l_dist"] = acc["l_dist"] + jnp.sum(
        w_i * (t_s * (acc["A_w"][:, None] + preAw) - acc["S_w"][:, None] - preSw), 1
    )
    acc["A_a"] = acc["A_a"] + jnp.sum(a_i, 1)
    acc["S_a"] = acc["S_a"] + jnp.sum(a_i * t_s, 1)
    acc["A_w"] = acc["A_w"] + jnp.sum(w_i, 1)
    acc["S_w"] = acc["S_w"] + jnp.sum(w_i * t_s, 1)
    acc["l_entropy"] = acc["l_entropy"] + jnp.sum(
        jnp.where(w_i > 0, -w_i * jnp.log(jnp.clip(w_i, min=1e-8)), 0.0), 1
    )
    acc["l_entropy_a"] = acc["l_entropy_a"] + jnp.sum(
        jnp.where(a_i > 0, -a_i * jnp.log(jnp.clip(a_i, min=1e-8)), 0.0), 1
    )
    logsig = jnp.where(
        contrib,
        jnp.log(jnp.clip(-jnp.log(jnp.clip(1.0 - alpha_s, min=1e-8)), min=1e-8)),
        0.0,
    )
    w_sg = jax.lax.stop_gradient(jnp.where(contrib, weight_s, 0.0))
    acc["sp_logsig"] = acc["sp_logsig"] + jnp.sum(logsig, 1)
    acc["sp_logsig_w"] = acc["sp_logsig_w"] + jnp.sum(logsig * w_sg, 1)
    acc["sp_w"] = acc["sp_w"] + jnp.sum(w_sg, 1)

    if cache_size is not None:
        # Bounded first-K sample cache, written as one batched scatter-add
        # per buffer (the analog of the kernel's l_dist_max_sample ring
        # buffer, surf_trav.cu:407-414). Per-slot target index = running
        # count + exclusive prefix of contrib; overflow writes go to the
        # out-of-bounds column K and are dropped.
        K = cache_size
        n0 = acc["n_cached"]
        contrib_i2 = contrib.astype(jnp.int32)
        idx = n0[:, None] + jnp.cumsum(contrib_i2, axis=1) - contrib_i2
        ok = contrib & (idx < K)
        col = jnp.where(ok, idx, K)
        rows = jax.lax.broadcasted_iota(jnp.int32, col.shape, 0)

        def scat(buf, vals):
            return buf.at[rows, col].add(jnp.where(ok, vals, 0.0), mode="drop")

        acc["c_ts"] = scat(acc["c_ts"], t_s)
        acc["c_alphas"] = scat(acc["c_alphas"], alpha_s)
        acc["c_weights"] = scat(acc["c_weights"], weight_s)
        fake_f = scat(jnp.zeros((B, K), dtype), fake_s.astype(dtype))
        acc["c_fake"] = acc["c_fake"] | (fake_f > 0)
        acc["n_cached"] = (n0 + jnp.sum(ok, axis=1)).astype(jnp.int32)

    alive = state["alive"]
    if opt.stop_thresh > 0:
        alive = alive & (log_T > math.log(opt.stop_thresh))

    new_state = {
        "log_T": log_T,
        "rgb": rgb_acc,
        "depth": depth_acc,
        "normal": normal_acc,
        "wmax": wmax_new,
        "t_mode": t_mode_new,
        "cnt": cnt,
        "alive": alive,
        "acc": acc,
    }
    ys = None
    if return_slots:
        ys = (
            jnp.where(contrib, t_s, 0.0),
            alpha_s,
            weight_s,
            fake_s & contrib,
            contrib,
        )
    return new_state, ys


def _finalize(grid, opt, state, cache_size, samples_ys=None, bg_rays=None):
    B = state["rgb"].shape[0]
    log_T = state["log_T"]
    acc = state["acc"]
    rgb_fg = state["rgb"]
    if grid.use_background and bg_rays is not None:
        from .background import render_background

        origins, dirs, delta_scale = bg_rays
        rgb_fg, log_T = render_background(
            grid, opt, origins, dirs, delta_scale, log_T, rgb_fg
        )
    rgb_out = rgb_fg + jnp.exp(log_T)[..., None] * opt.background_brightness
    out = {
        "rgb": rgb_out,
        "depth": state["depth"],
        "depth_mode": state["t_mode"],
        "normal": state["normal"],
        "alpha": 1.0 - jnp.exp(state["log_T"]),  # trace_ray_alpha
        "log_transmit": log_T,
        "n_intersections": state["cnt"],
        "ray_losses": {
            k: acc[k]
            for k in (
                "l_dist", "l_dist_a", "l_entropy", "l_entropy_a",
                "sp_logsig", "sp_logsig_w", "sp_w",
                "l_inward", "lap_sum", "lap_cnt", "udf_var_sum", "udf_var_cnt",
            )
        },
    }
    if cache_size is not None:
        out["cache"] = {
            "ts": acc["c_ts"],
            "alphas": acc["c_alphas"],
            "weights": acc["c_weights"],
            "fake_mask": acc["c_fake"],
            "n_cached": acc["n_cached"],
        }
        # median depth from the first-K sample cache
        # (trace_ray_med_term semantics: t where cumulative weight crosses
        # half the total); 0 when no cached sample reaches the target.
        cw = acc["c_weights"]
        cum = jnp.cumsum(cw, axis=1)
        target = 0.5 * cum[:, -1:]
        crossed = cum >= jnp.maximum(target, 1e-12)
        idx = jnp.argmax(crossed, axis=1)
        has = jnp.any(crossed, axis=1) & (cum[:, -1] > 0)
        out["depth_med"] = jnp.where(
            has, jnp.take_along_axis(acc["c_ts"], idx[:, None], 1)[:, 0], 0.0
        )
    if samples_ys is not None:
        def flat(y):
            return jnp.moveaxis(y, 0, 1).reshape(B, -1)

        out["samples"] = {
            "ts": flat(samples_ys[0]),
            "alphas": flat(samples_ys[1]),
            "weights": flat(samples_ys[2]),
            "fake_mask": flat(samples_ys[3]),
            "valid": flat(samples_ys[4]),
        }
    return out


def _prep(grid, rays, opt):
    origins, dirs, viewdirs, delta_scale = dda.preprocess_rays(
        grid, rays.origins, rays.dirs
    )
    tnear, tmax = dda.ray_bounds(grid, origins, dirs)
    if opt.use_spheric_clip:
        # sphere is inscribed in the lattice box, so intersecting the two
        # bounds equals the reference's sphere-only clip (render_util.cuh:661)
        sp_near, sp_max = dda.spheric_bounds(grid, origins, dirs, opt.near_clip)
        tnear = jnp.maximum(tnear, sp_near)
        tmax = jnp.minimum(tmax, sp_max)
    from ..core.sh import eval_basis

    sh_mult = eval_basis(grid, viewdirs)
    near_grid_t = (
        0.0 if opt.use_spheric_clip
        else opt.near_clip * jnp.mean(grid.scaling * grid.gsz)
    )
    ray_ok = jnp.isfinite(tnear) & jnp.isfinite(tmax) & (tnear <= tmax)
    return origins, dirs, sh_mult, tnear, tmax, near_grid_t, ray_ok, delta_scale


# ---------------------------------------------------------------------------
# Strategy 1: bounded DDA scan (oracle-exact walk)
# ---------------------------------------------------------------------------

def volume_render_surface(
    grid: SparseGrid,
    rays: Rays,
    opt: RenderOptions,
    max_voxels: int | None = None,
    return_samples: bool = False,
    cache_size: int | None = None,
):
    """Render rays with the dense DDA walk. See module docstring.

    :return: dict with 'rgb' (B,3), 'depth', 'log_transmit',
        'ray_losses' (streaming accumulators), optional 'cache' (bounded
        first-K sample cache), optional 'samples' (full caches, tests only).
    """
    assert grid.surface_data is not None, "surface grid required"
    if max_voxels is None:
        max_voxels = max_voxels_for(grid)

    (origins, dirs, sh_mult, tnear, tmax, near_grid_t, ray_ok,
     delta_scale) = _prep(grid, rays, opt)
    B = origins.shape[0]
    dtype = origins.dtype
    t0 = jnp.where(ray_ok, tnear, 0.0)
    packed = pack_grid_data(grid)

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(carry, _):
        t, state = carry
        next_t = dda.next_crossing(origins, dirs, t)
        has_next = jnp.isfinite(next_t)
        seg_ok = state["alive"] & has_next & (t < tmax - 1e-9)
        next_t_safe = jnp.where(has_next, next_t, t + 1.0)
        l, in_bounds = dda.voxel_between(
            origins, dirs, jnp.where(seg_ok, t, 0.0),
            jnp.where(seg_ok, next_t_safe, 1.0), grid.reso,
        )
        close_t, far_t = dda.voxel_plane_ts(origins, dirs, l)
        state, ys = _voxel_pass(
            grid, opt, origins, dirs, sh_mult, near_grid_t, state,
            l[:, None, :], close_t[:, None], far_t[:, None],
            (seg_ok & in_bounds)[:, None], cache_size, return_samples,
            packed=packed,
        )
        state["alive"] = state["alive"] & (next_t_safe < tmax + 1e-6) & has_next
        t_new = jnp.where(seg_ok, next_t_safe, t)
        return (t_new, state), ys

    init = (t0, _init_state(B, dtype, cache_size, ray_ok))
    (_, state), ys = jax.lax.scan(step, init, None, length=max_voxels)
    return _finalize(grid, opt, state, cache_size, ys if return_samples else None,
                     bg_rays=(origins, dirs, delta_scale))


# ---------------------------------------------------------------------------
# Strategy 2: occupancy-compacted traversal (production path)
# ---------------------------------------------------------------------------

def voxel_occupancy(grid: SparseGrid, opt: RenderOptions,
                    row_coords: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-voxel bool (X-1, Y-1, Z-1): can this voxel contribute anything?

    Exact analog of the kernel's skip conditions: all 8 corner links present
    (surf_trav.cu:216-221), some corner raw alpha >= sigma_thresh (:230-239),
    and — unless unrestricted fake samples are on — some level set within
    the corner min/max hull (:273-277; trilinear values can't leave the
    hull, so voxels failing this provably produce no samples).

    ``row_coords`` (losses.reg.row_coords_of) enables the fast dense-field
    build: a capacity-sized row SCATTER (~90 ns/row) instead of two
    reso^3-sized scalar GATHERS (~12.6 ns/element x 134M each at 512^3 —
    3.4 s of the 3.65 s refresh).
    """
    links = grid.links
    # dense vertex fields
    present = links >= 0
    if row_coords is not None:
        X, Y, Z = links.shape
        rc = row_coords
        flat_pos = (rc[:, 0] * Y + rc[:, 1]) * Z + rc[:, 2]
        if grid.surface_type == defs.SURFACE_TYPE_UDF_ALPHA:
            dens_row = jnp.full(
                (grid.capacity,), jnp.max(grid.density_data),
                grid.surface_data.dtype,
            )
        else:
            dens_row = grid.density_data[:, 0]
        surf_row = grid.surface_data[:, 0]
        if grid.surface_type in _UDF_TYPES:
            surf_row = jax.nn.softplus(surf_row)
        base = jnp.concatenate(
            [
                jnp.full((links.size, 1), -jnp.inf, surf_row.dtype),
                jnp.zeros((links.size, 1), surf_row.dtype),
            ],
            axis=1,
        )
        dense = base.at[flat_pos].set(
            jnp.stack([dens_row, surf_row], axis=-1), mode="drop"
        )
        dens = dense[:, 0].reshape(links.shape)
        surf = dense[:, 1].reshape(links.shape)
    else:
        safe = jnp.clip(links, 0, grid.capacity - 1)
        if grid.surface_type == defs.SURFACE_TYPE_UDF_ALPHA:
            # per-level-set alphas: the corner test degenerates to a scalar
            dens = jnp.where(
                present, jnp.max(grid.density_data), -jnp.inf
            )
        else:
            dens = jnp.where(present, grid.density_data[safe, 0], -jnp.inf)
        surf = jnp.where(present, grid.surface_data[safe, 0], 0.0)
        if grid.surface_type in _UDF_TYPES:
            surf = jax.nn.softplus(surf)

    def corners(v, reduce_fn, init):
        out = None
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    s = v[dx : v.shape[0] - 1 + dx,
                          dy : v.shape[1] - 1 + dy,
                          dz : v.shape[2] - 1 + dz]
                    out = s if out is None else reduce_fn(out, s)
        return out

    all_present = corners(present, jnp.logical_and, None)
    any_alpha = corners(dens, jnp.maximum, None) >= opt.sigma_thresh
    occ = all_present & any_alpha
    # the level-set hull filter only applies to scalar surface fields;
    # PLANE voxels always carry a (d-clamped) in-voxel plane and
    # VOXEL_FACE samples every crossing (svox2.py:1670-1745, 2254-2288)
    scalar_surface = grid.surface_type not in (
        defs.SURFACE_TYPE_PLANE, defs.SURFACE_TYPE_VOXEL_FACE
    )
    if scalar_surface and not (opt.surf_fake_sample and not opt.limited_fake_sample):
        smin = corners(surf, jnp.minimum, None)
        smax = corners(surf, jnp.maximum, None)
        lv = grid.level_set_data
        has_surf = jnp.zeros_like(occ)
        for i in range(lv.shape[0]):
            has_surf = has_surf | ((lv[i] >= smin) & (lv[i] <= smax))
        occ = occ & has_surf
    return occ


def all_crossings(reso, origins, dirs, tnear, tmax):
    """Sorted axis-plane crossings: every voxel segment of every ray.

    :return: seg_start, seg_end (B, S), seg_valid (B, S),
        (lx, ly, lz) clipped voxel coords (B, S), in_bounds (B, S)
    """
    dtype = origins.dtype
    INF = jnp.asarray(jnp.inf, dtype)

    ts_parts = []
    for a in range(3):
        planes = jnp.arange(1, reso[a] - 1, dtype=dtype)  # interior planes
        da = dirs[:, a : a + 1]
        safe = jnp.where(da == 0, 1e-12, da)
        t = (planes[None, :] - origins[:, a : a + 1]) / safe
        t = jnp.where(
            (da != 0) & (t > tnear[:, None] + 1e-9) & (t < tmax[:, None] - 1e-9),
            t, INF,
        )
        ts_parts.append(t)
    ts = jnp.concatenate(
        [tnear[:, None]] + ts_parts, axis=1
    )  # (B, S+1) segment starts
    ts = jnp.sort(ts, axis=1)
    seg_start = ts
    seg_end = jnp.concatenate(
        [ts[:, 1:], jnp.where(jnp.isfinite(ts[:, -1:]), tmax[:, None], INF)],
        axis=1,
    )
    seg_end = jnp.minimum(seg_end, tmax[:, None])
    seg_valid = (
        jnp.isfinite(seg_start) & jnp.isfinite(seg_end)
        & (seg_end > seg_start + 1e-9)
    )

    tmid = 0.5 * (seg_start + jnp.where(seg_valid, seg_end, seg_start))
    pos = origins[:, None, :] + tmid[..., None] * dirs[:, None, :]
    l = jnp.floor(pos).astype(jnp.int32)
    in_bounds = jnp.all(l >= 0, axis=-1) & jnp.all(
        l <= jnp.asarray(reso, jnp.int32) - 2, axis=-1
    )
    lx = jnp.clip(l[..., 0], 0, reso[0] - 2)
    ly = jnp.clip(l[..., 1], 0, reso[1] - 2)
    lz = jnp.clip(l[..., 2], 0, reso[2] - 2)
    return seg_start, seg_end, seg_valid, (lx, ly, lz), in_bounds


def compact_crossings(grid, origins, dirs, tnear, tmax, occ, K: int):
    """Phase A: sorted plane crossings -> first K occupied segments.

    :return: l (B,K,3), close_t (B,K), far_t (B,K), valid (B,K),
        n_occupied (B,) (for overflow monitoring)
    """
    B = origins.shape[0]
    dtype = origins.dtype
    reso = grid.reso

    seg_start, seg_end, seg_valid, (lx, ly, lz), in_bounds = all_crossings(
        reso, origins, dirs, tnear, tmax
    )
    flat = (lx * (reso[1] - 1) + ly) * (reso[2] - 1) + lz
    # f32 gather: bool/int8 gathers scalarize on TPU (~100x slower)
    occ_f = jnp.take(occ.reshape(-1).astype(dtype), flat)
    occ_seg = (occ_f > 0.5) & seg_valid & in_bounds

    n_occupied = jnp.sum(occ_seg, axis=1)
    # first-K occupied segments in t-order via top_k on position keys
    S = occ_seg.shape[1]
    Keff = min(K, S)
    iota = jax.lax.broadcasted_iota(jnp.int32, occ_seg.shape, 1)
    keys = jnp.where(occ_seg, iota, S + 1)
    neg_top, order = jax.lax.top_k(-keys, Keff)  # K smallest keys, ascending
    if Keff < K:  # tiny grids: pad to the requested K
        neg_top = jnp.pad(neg_top, ((0, 0), (0, K - Keff)), constant_values=-(S + 1))
        order = jnp.pad(order, ((0, 0), (0, K - Keff)))
    valid = -neg_top <= S
    # one packed take_along_axis instead of five scattered ones
    # (voxel coords < 2^24 so they are exact in f32)
    packed_seg = jnp.stack(
        [seg_start, seg_end, lx.astype(dtype), ly.astype(dtype), lz.astype(dtype)],
        axis=-1,
    )
    sel = jnp.take_along_axis(packed_seg, order[..., None], axis=1)
    close_t = jnp.where(valid, sel[..., 0], 0.0)
    far_t = jnp.where(valid, sel[..., 1], 0.0)
    l_k = sel[..., 2:5].astype(jnp.int32)
    return l_k, close_t, far_t, valid, n_occupied


def pack_occupancy_bits(occ: jnp.ndarray) -> jnp.ndarray:
    """Bit-pack a bool occupancy volume along z into f32-bitcast uint32
    words: (X, Y, Z) -> (X, Y, ceil(Z/32)) f32. The packed table is 32x
    smaller (2 MB at 256^3), so the 31M-candidate occupancy gather becomes
    cache-resident instead of a random sweep of a 67 MB volume — and f32
    gathers stay on the fast path (int/bool gathers scalarize on TPU)."""
    X, Y, Z = occ.shape
    W = (Z + 31) // 32
    pad = W * 32 - Z
    o = jnp.pad(occ, ((0, 0), (0, 0), (0, pad))).reshape(X, Y, W, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    words = jnp.sum(o.astype(jnp.uint32) * weights, axis=-1, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(words, jnp.float32)


def _occ_bit_lookup(occ_bits: jnp.ndarray, lx, ly, lz) -> jnp.ndarray:
    """Test occupancy bits for voxel coords via the packed f32 table."""
    W = occ_bits.shape[2]
    widx = (lx * occ_bits.shape[1] + ly) * W + lz // 32
    w = jnp.take(occ_bits.reshape(-1), widx)
    bits = jax.lax.bitcast_convert_type(w, jnp.uint32)
    return ((bits >> (lz.astype(jnp.uint32) & 31)) & 1) == 1


def _pool_compact(count_row, M: int):
    """Gather-based dense compaction: given per-row candidate hit counts
    (R, C) (inclusive cumsum along C), map pool slot m -> (row, col) of its
    m-th global hit. Returns (row (M,), col (M,), valid (M,)).

    Two-level search (round-5 verdict item 6): per-gather-CALL overhead on
    TPU scales with the TABLE size, so ~11 binary-search rounds over the
    full (R, C) table (125 MB at the 512^3 fine level) cost 134 ms. Level
    1 binary-searches the 32x smaller chunk-end table; level 2 fetches the
    winning chunk's 32 counts as ONE 128-byte row gather (the fast path)
    and resolves the position with an in-register compare-count."""
    R, C = count_row.shape
    n_r = count_row[:, -1]
    base = jnp.cumsum(n_r) - n_r
    total = base[-1] + n_r[-1]

    m = jax.lax.iota(jnp.int32, M)
    valid = m < total
    r_m = jnp.searchsorted(base, m, side="right").astype(jnp.int32) - 1
    r_m = jnp.clip(r_m, 0, R - 1)
    j_m = m - jnp.take(base, r_m)

    CH = 32
    Cw = (C + CH - 1) // CH
    pad = Cw * CH - C
    if pad:
        # pad with the row total so padded positions never win the search
        cnt = jnp.concatenate(
            [count_row, jnp.repeat(count_row[:, -1:], pad, axis=1)], axis=1
        )
    else:
        cnt = count_row
    chunk_end = cnt[:, CH - 1 :: CH]  # (R, Cw) inclusive count at chunk end
    ce_flat = chunk_end.reshape(-1)
    lo = jnp.zeros(M, jnp.int32)
    hi = jnp.full(M, Cw - 1, jnp.int32)
    for _ in range(int(math.ceil(math.log2(max(Cw, 2)))) + 1):
        mid = (lo + hi) // 2
        v = jnp.take(ce_flat, r_m * Cw + mid)
        ge = v >= j_m + 1
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, jnp.minimum(mid + 1, Cw - 1))
    c_m = hi
    rows = jax.lax.optimization_barrier(
        jnp.take(cnt.reshape(R * Cw, CH), r_m * Cw + c_m, axis=0)
    )  # (M, CH)
    pos = jnp.sum((rows < j_m[:, None] + 1).astype(jnp.int32), axis=1)
    col = jnp.clip(c_m * CH + pos, 0, C - 1)
    return r_m, col, valid


_SNAP_TOL = 1e-5  # grid units; > f32 roundoff of o + t*d at t ~ grid diag


def _cross_coord(origin_b, dir_b, t, tie_crossed, scale=1.0):
    """Voxel coordinate along a NON-crossed axis b for a candidate at
    time t, in units of ``scale`` voxels.

    This is the corner-crossing guard of the closed-form candidate
    enumeration: when a ray crosses two planes at nearly the same t, each
    (unsorted) candidate recomputes the other axes by flooring o + t*d,
    and f32 roundoff can land on the wrong side of the just-crossed plane
    — the true diagonal voxel is then either never enumerated (its
    contribution lost) or enumerated twice. Within _SNAP_TOL of a plane
    the side is decided by comparing CROSSING TIMES instead (computed with
    the same formula as the candidates' own t's, so the comparison is
    exact in f32); exact t-ties are broken by ``tie_crossed`` so exactly
    one candidate claims the diagonal voxel.

    :param tie_crossed: bool (broadcastable) — treat t_q == t as crossed
    """
    pb = (origin_b + t * dir_b) / scale
    fl = jnp.floor(pb)
    q = jnp.round(pb)
    near = jnp.abs(pb - q) < _SNAP_TOL
    safe = jnp.where(dir_b == 0, 1e-12, dir_b)
    t_q = (q * scale - origin_b) / safe
    crossed = (t_q < t) | ((t_q == t) & tie_crossed)
    coord = jnp.where(
        dir_b > 0,
        q - 1.0 + crossed.astype(pb.dtype),
        q - crossed.astype(pb.dtype),
    )
    return jnp.where(near & (dir_b != 0), coord, fl).astype(jnp.int32)


def _entry_candidate(origins, dirs, t_in, slack=1e-9, scale=1.0):
    """Voxel at a segment entry point. Near-plane coordinates are resolved
    by crossing time: planes crossed at or before t_in (+``slack``, the
    enumeration's exclusion band, so crossings skipped by the strict
    ``t > t_in + 1e-9`` filters are owned by the entry voxel) put the
    entry in the voxel ahead."""
    out = []
    for b in range(3):
        o_b, d_b = origins[:, b : b + 1], dirs[:, b : b + 1]
        pb = (o_b + t_in[:, None] * d_b) / scale
        fl = jnp.floor(pb)
        q = jnp.round(pb)
        near = jnp.abs(pb - q) < _SNAP_TOL
        safe = jnp.where(d_b == 0, 1e-12, d_b)
        t_q = (q * scale - o_b) / safe
        crossed = t_q <= t_in[:, None] + slack
        coord = jnp.where(
            d_b > 0,
            q - 1.0 + crossed.astype(pb.dtype),
            q - crossed.astype(pb.dtype),
        )
        out.append(jnp.where(near & (d_b != 0), coord, fl).astype(jnp.int32))
    return jnp.concatenate(out, axis=-1)


def _packed_phase_a_coarse(grid, origins, dirs, tnear, tmax, occ, M: int,
                           factor: int, supers_per_ray: float):
    """Two-level candidate enumeration: supervoxel (factor^3 blocks)
    crossings against a pooled coarse occupancy first, then fine plane
    candidates only inside occupied supervoxel segments. Cuts the
    per-candidate occupancy lookups ~(reso/(factor * mean_supers))x —
    the 31M-element gather was the single largest cost of a train step."""
    B = origins.shape[0]
    dtype = origins.dtype
    reso = grid.reso
    F = factor
    nvox = [r - 1 for r in reso]
    ncoarse = [(n + F - 1) // F for n in nvox]

    # coarse occupancy = blockwise any(occ)
    occ_pad = jnp.pad(
        occ,
        [(0, c * F - n) for c, n in zip(ncoarse, nvox)],
    )
    occ_c = (
        occ_pad.reshape(ncoarse[0], F, ncoarse[1], F, ncoarse[2], F)
        .any(axis=(1, 3, 5))
    )
    bits_c = pack_occupancy_bits(occ_c)
    bits_f = pack_occupancy_bits(occ)

    # ---- level 0: supervoxel candidates (planes at multiples of F) ----
    # each candidate carries the crossed axis (-1 for the tnear entry) so
    # the fine-level entry voxel can be snapped EXACTLY on that axis —
    # re-deriving it by flooring o + t*d loses the boundary voxel to f32
    # roundoff (~2e-6 at t~40) and silently drops real crossings
    c_t, c_l, c_ok, c_ax = [], [], [], []
    l0 = _entry_candidate(origins, dirs, tnear) // F
    c_t.append(tnear[:, None])
    c_l.append(l0[:, None, :])
    c_ok.append((tmax > tnear + 1e-9)[:, None])
    c_ax.append(jnp.full((B, 1), -1, jnp.int32))
    for a in range(3):
        planes = jnp.arange(1, ncoarse[a], dtype=dtype) * F  # fine coords
        da = dirs[:, a : a + 1]
        safe = jnp.where(da == 0, 1e-12, da)
        t = (planes[None, :] - origins[:, a : a + 1]) / safe
        ok = (da != 0) & (t > tnear[:, None] + 1e-9) & (t < tmax[:, None] - 1e-9)
        ls = []
        for b in range(3):
            if b == a:
                ls.append(
                    (jnp.arange(1, ncoarse[a], dtype=dtype)[None, :]
                     - (da < 0)).astype(jnp.int32)
                )
            else:
                # coarse units: corner crossings at supervoxel boundaries
                # resolved by crossing time (see _cross_coord)
                ls.append(_cross_coord(
                    origins[:, b : b + 1], dirs[:, b : b + 1], t,
                    tie_crossed=b < a, scale=float(F),
                ))
        c_t.append(jnp.where(ok, t, 0.0))
        c_l.append(jnp.stack(ls, axis=-1))
        c_ok.append(ok)
        c_ax.append(jnp.full((B, t.shape[1]), a, jnp.int32))
    t0_all = jnp.concatenate(c_t, axis=1)
    l0_all = jnp.concatenate(c_l, axis=1)
    ok0_all = jnp.concatenate(c_ok, axis=1)
    ax0_all = jnp.concatenate(c_ax, axis=1)

    nc = jnp.asarray(ncoarse, jnp.int32)
    inb0 = jnp.all(l0_all >= 0, -1) & jnp.all(l0_all <= nc - 1, -1)
    lc0 = jnp.clip(l0_all, 0, nc - 1)
    hit0 = _occ_bit_lookup(bits_c, lc0[..., 0], lc0[..., 1], lc0[..., 2])
    occ0 = hit0 & ok0_all & inb0

    M1 = int(B * supers_per_ray)
    cnt0 = jnp.cumsum(occ0.astype(jnp.int32), axis=1)
    r1, c1, v1 = _pool_compact(cnt0, M1)
    C0 = t0_all.shape[1]
    fe0 = r1 * C0 + c1
    sl = jnp.take(lc0.reshape(-1, 3), fe0, axis=0)  # supervoxel (M1, 3)
    st_in = jnp.where(v1, jnp.take(t0_all.reshape(-1), fe0), 0.0)
    sax = jnp.take(ax0_all.reshape(-1), fe0)  # crossed axis per supersegment
    sray = jnp.where(v1, r1, B).astype(jnp.int32)
    srid = jnp.clip(sray, 0, B - 1)
    so = jnp.take(origins, srid, axis=0)
    sd = jnp.take(dirs, srid, axis=0)
    # supervoxel slab exit in fine coords
    slf = (sl * F).astype(dtype)
    far_planes = slf + jnp.where(sd < 0, 0.0, float(F))
    safe_d = jnp.where(sd == 0, 1.0, sd)
    st_out = jnp.min(
        jnp.where(sd != 0, (far_planes - so) / safe_d, jnp.inf), axis=-1
    )
    st_out = jnp.minimum(st_out, jnp.take(tmax, srid))

    # ---- level 1: fine candidates inside each occupied supersegment ----
    # entry candidate + the F-1 interior planes per axis
    f_t, f_l, f_ok = [], [], []
    fl_entry = _entry_candidate(so, sd, st_in)
    # exact coordinate along the crossed axis: entering supervoxel sl
    # through its low plane (d>0) puts the ray in fine voxel sl*F; through
    # its high plane (d<0) in sl*F + F-1 — integer arithmetic, no roundoff
    exact = sl * F + (sd < 0).astype(jnp.int32) * (F - 1)
    fl_entry = jnp.where(
        sax[:, None] == jnp.arange(3, dtype=jnp.int32)[None, :],
        exact, fl_entry,
    )
    f_t.append(st_in[:, None])
    f_l.append(fl_entry[:, None, :])
    f_ok.append((v1 & (st_out > st_in + 1e-9))[:, None])
    for a in range(3):
        j = jnp.arange(1, F, dtype=dtype)[None, :]  # (1, F-1)
        p = slf[:, a : a + 1] + j  # fine plane positions
        da = sd[:, a : a + 1]
        safe = jnp.where(da == 0, 1e-12, da)
        t = (p - so[:, a : a + 1]) / safe
        ok = (
            v1[:, None] & (da != 0)
            & (t > st_in[:, None] + 1e-9) & (t < st_out[:, None] - 1e-9)
            & (p >= 1) & (p <= jnp.asarray(reso[a] - 2, dtype))
        )
        ls = []
        for b in range(3):
            if b == a:
                ls.append((p - (da < 0)).astype(jnp.int32))
            else:
                ls.append(_cross_coord(
                    so[:, b : b + 1], sd[:, b : b + 1], t, tie_crossed=b < a,
                ))
        f_t.append(jnp.where(ok, t, 0.0))
        f_l.append(jnp.stack(ls, axis=-1))
        f_ok.append(ok)
    t1_all = jnp.concatenate(f_t, axis=1)  # (M1, C1)
    l1_all = jnp.concatenate(f_l, axis=1)
    ok1_all = jnp.concatenate(f_ok, axis=1)

    nv = jnp.asarray(nvox, jnp.int32)
    inb1 = jnp.all(l1_all >= 0, -1) & jnp.all(l1_all <= nv - 1, -1)
    lc1 = jnp.clip(l1_all, 0, nv - 1)
    hit1 = _occ_bit_lookup(bits_f, lc1[..., 0], lc1[..., 1], lc1[..., 2])
    occ1 = hit1 & ok1_all & inb1
    n_occupied = jax.ops.segment_sum(
        jnp.sum(occ1, axis=1), sray, num_segments=B, indices_are_sorted=True
    )

    cnt1 = jnp.cumsum(occ1.astype(jnp.int32), axis=1)
    r2, c2, valid = _pool_compact(cnt1, M)
    C1 = t1_all.shape[1]
    fe1 = r2 * C1 + c2
    ray_id = jnp.where(valid, jnp.take(sray, r2), B).astype(jnp.int32)
    valid = valid & (ray_id < B)
    t_e = jnp.where(valid, jnp.take(t1_all.reshape(-1), fe1), 0.0)
    l_e = jnp.take(lc1.reshape(-1, 3), fe1, axis=0)

    # true drop count: fine hits beyond the entry pool M, plus coarse hits
    # beyond the supersegment pool M1 (those hide an unknown number of fine
    # crossings, so any sv overflow also demands pool growth). Degenerate
    # entries later invalidated by _finish_packed_pool were never capacity
    # drops and must NOT count (phantom overflow would ratchet the
    # trainer's budgets for nothing).
    overflow = (
        jnp.maximum(jnp.sum(occ1) - M, 0)
        + jnp.maximum(jnp.sum(occ0) - M1, 0)
    )
    return _finish_packed_pool(
        grid, origins, dirs, tmax, ray_id, t_e, l_e, valid, n_occupied, B
    ) + (overflow,)


def _finish_packed_pool(grid, origins, dirs, tmax, ray_id, t_e, l_e, valid,
                        n_occupied, B):
    """Common tail: order the pool by (ray, t), derive far planes from the
    voxel slab, final validity."""
    ray_s, t_s2, lx_s, ly_s, lz_s, val_s = jax.lax.sort(
        (ray_id, t_e, l_e[:, 0], l_e[:, 1], l_e[:, 2],
         valid.astype(jnp.int32)),
        num_keys=2,
    )
    l_e = jnp.stack([lx_s, ly_s, lz_s], axis=-1)
    valid = val_s > 0
    rid = jnp.clip(ray_s, 0, B - 1)

    o_e = jnp.take(origins, rid, axis=0)
    d_e = jnp.take(dirs, rid, axis=0)
    _, far_slab = dda.voxel_plane_ts(o_e, d_e, l_e)
    far_t = jnp.minimum(far_slab, jnp.take(tmax, rid))
    valid = valid & (far_t > t_s2 + 1e-9)
    ray_id = jnp.where(valid, ray_s, B)
    close_t = jnp.where(valid, t_s2, 0.0)
    far_t = jnp.where(valid, far_t, 0.0)
    return ray_id, l_e, close_t, far_t, valid, n_occupied


def compact_crossings_packed(grid, origins, dirs, tnear, tmax, occ, M: int,
                             coarse_factor: int = 0,
                             supers_per_ray: float = 8.0):
    """Phase A, packed: ALL occupied (ray, voxel) crossings of the batch
    compacted into one global entry pool of static size M, in (ray-major,
    t-ascending) order — no per-ray padding. ``coarse_factor`` > 1 routes
    through the two-level supervoxel enumeration.

    :return: ray_id (M,) int32 (== B for empty slots), l (M, 3),
        close_t/far_t (M,), valid (M,), n_occupied (B,)
    """
    if coarse_factor and coarse_factor > 1 and min(grid.reso) - 1 > coarse_factor:
        return _packed_phase_a_coarse(
            grid, origins, dirs, tnear, tmax, occ, M, coarse_factor,
            supers_per_ray,
        )
    B = origins.shape[0]
    dtype = origins.dtype
    reso = grid.reso

    # --- candidate segments: NO merge/sort of the 3 crossing sequences.
    # Each axis crossing identifies its following voxel in closed form
    # (coordinate along the crossed axis = plane index, others = snapped
    # floor at the crossing — see _snap_floor for the corner-crossing
    # guard); the segment's far plane comes from the voxel slab itself.
    # The tnear entry segment is the extra candidate per ray. ---
    cand_t, cand_l, cand_ok = [], [], []

    l0 = _entry_candidate(origins, dirs, tnear)
    cand_t.append(tnear[:, None])
    cand_l.append(l0[:, None, :])
    cand_ok.append((tmax > tnear + 1e-9)[:, None])

    for a in range(3):
        planes = jnp.arange(1, reso[a] - 1, dtype=dtype)  # (Pa,)
        da = dirs[:, a : a + 1]
        safe = jnp.where(da == 0, 1e-12, da)
        t = (planes[None, :] - origins[:, a : a + 1]) / safe  # (B, Pa)
        ok = (da != 0) & (t > tnear[:, None] + 1e-9) & (t < tmax[:, None] - 1e-9)
        la = (planes[None, :] - (da < 0)).astype(jnp.int32)  # crossed axis
        ls = []
        for b in range(3):
            if b == a:
                ls.append(la)
            else:
                ls.append(_cross_coord(
                    origins[:, b : b + 1], dirs[:, b : b + 1], t,
                    tie_crossed=b < a,
                ))
        cand_t.append(jnp.where(ok, t, 0.0))
        cand_l.append(jnp.stack(ls, axis=-1))
        cand_ok.append(ok)

    t_all = jnp.concatenate(cand_t, axis=1)  # (B, C)
    l_all = jnp.concatenate(cand_l, axis=1)  # (B, C, 3)
    ok_all = jnp.concatenate(cand_ok, axis=1)
    C = t_all.shape[1]

    in_bounds = jnp.all(l_all >= 0, axis=-1) & jnp.all(
        l_all <= jnp.asarray(reso, jnp.int32) - 2, axis=-1
    )
    lc = jnp.clip(l_all, 0, jnp.asarray(reso, jnp.int32) - 2)
    occ_bits = pack_occupancy_bits(occ)
    occ_hit = _occ_bit_lookup(occ_bits, lc[..., 0], lc[..., 1], lc[..., 2])
    occ_seg = occ_hit & ok_all & in_bounds
    n_occupied = jnp.sum(occ_seg, axis=1)

    # gather-based dense compaction into the global pool (ray-major): pool
    # slot m -> (ray via searchsorted over per-ray bases, candidate via
    # binary search over the row's running count). No big scatter/sort —
    # TPU scatters over the 31M candidate list were the phase-A bottleneck.
    cnt_row = jnp.cumsum(occ_seg.astype(jnp.int32), axis=1)
    r_m, c_m, valid = _pool_compact(cnt_row, M)
    fe = r_m * C + c_m
    ray_id = jnp.where(valid, r_m, B).astype(jnp.int32)

    t_e = jnp.where(valid, jnp.take(t_all.reshape(-1), fe), 0.0)
    l_e = jnp.take(lc.reshape(-1, 3), fe, axis=0)

    overflow = jnp.maximum(jnp.sum(n_occupied) - M, 0)
    return _finish_packed_pool(
        grid, origins, dirs, tmax, ray_id, t_e, l_e, valid, n_occupied, B
    ) + (overflow,)


def volume_render_surface_packed(
    grid: SparseGrid,
    rays: Rays,
    opt: RenderOptions,
    entries_per_ray: float = 8.0,
    cache_size: int | None = None,
    occupancy: jnp.ndarray | None = None,
    return_intersections: bool = False,
    coarse_factor: int = 8,
    supers_per_ray: float = 8.0,
    depth_sigma_thresh: float | None = None,
):
    """Packed production renderer: identical math to
    ``volume_render_surface_compact`` but with the per-ray K-slot padding
    replaced by a single global pool of M = B * entries_per_ray occupied
    crossings. Phase B work scales with the TRUE number of crossings
    (typically 2-8 per ray on converged scenes) instead of K=32, and the
    sequential scan disappears: compositing prefix products become one
    global cumsum minus per-ray bases (entries are ray-major sorted), ray
    reductions become sorted segment sums.

    Matches the dense walk exactly while the batch's total occupied
    crossings fit in M ('n_occupied' reports per-ray truth)."""
    assert grid.surface_data is not None, "surface grid required"
    (origins, dirs, sh_mult, tnear, tmax, near_grid_t, ray_ok,
     delta_scale) = _prep(grid, rays, opt)
    B = origins.shape[0]
    dtype = origins.dtype
    M = int(B * entries_per_ray)

    occ = voxel_occupancy(grid, opt) if occupancy is None else occupancy
    occ = jax.lax.stop_gradient(occ)
    ray_id, l, close_t, far_t, valid, n_occ, drop_count = compact_crossings_packed(
        grid, origins, dirs, jnp.where(ray_ok, tnear, 0.0),
        jnp.where(ray_ok, tmax, -1.0), occ, M,
        coarse_factor=coarse_factor, supers_per_ray=supers_per_ray,
    )
    ray_id, close_t, far_t, valid = jax.lax.stop_gradient(
        (ray_id, close_t, far_t, valid)
    )
    rid = jnp.clip(ray_id, 0, B - 1)  # gather index (invalid -> ray 0)
    seg_id = ray_id  # segment index (invalid -> B, dropped)

    packed = pack_grid_data(grid)
    # transposed layout throughout phase B: the pool axis M is MINOR (TPU
    # lane axis) in every intermediate — slot arrays (S0, M), vectors
    # (3, S0, M) — so nothing tile-pads (the old (M, S0)/(M, 1, S, 8)
    # shapes padded their small trailing axis to 128 lanes, a 16-21x
    # memory/bandwidth hit that bounded the pool at ~260k entries)
    oT = jnp.take(origins, rid, axis=0).T    # (3, M)
    dT = jnp.take(dirs, rid, axis=0).T
    shmT = jnp.take(sh_mult, rid, axis=0).T  # (basis_dim, M)
    lT = l.T                                 # (3, M)

    smp = _voxel_samples_T(
        grid, opt, oT, dT, shmT, near_grid_t, lT, close_t, far_t, valid,
        packed,
    )
    S0 = smp["n_slots"]
    t_s = smp["t"]          # (S0, M)
    alpha_s = smp["alpha"]
    rgb_s = smp["rgb"]      # (3, S0, M)
    contrib = smp["contrib"]
    fake_s = smp["fake"]
    snorm_s = smp["snorm"]
    counted_i = smp["counted"]

    seg_sum = functools.partial(
        jax.ops.segment_sum, num_segments=B, indices_are_sorted=True
    )
    seg_max = functools.partial(
        jax.ops.segment_max, num_segments=B, indices_are_sorted=True
    )

    def ray_excl_prefix(x):
        """Per-ray exclusive prefix in (entry, slot) order of an (S0, M)
        slot array; returns (S0, M) prefixes and (B,) ray sums. Entries are
        ray-major sorted, so the global order is: slots of entries < m,
        then slots < s of entry m."""
        within = jnp.cumsum(x, axis=0) - x          # exclusive within entry
        e = jnp.sum(x, axis=0)                      # (M,) entry totals
        cum_e = jnp.cumsum(e) - e                   # exclusive over entries
        per_ray = seg_sum(e, seg_id)
        base = jnp.cumsum(per_ray) - per_ray
        return within + (cum_e - jnp.take(base, rid))[None, :], per_ray

    # running intersection index (kernel's ++intersect_i)
    exc_cnt, cnt = ray_excl_prefix(counted_i)
    if opt.truncated_vol_render:
        ids = exc_cnt.astype(jnp.int32) - fake_s.astype(jnp.int32)
        rw = trunc_vol_render_rw(
            ids, grid.truncated_vol_render_a, opt.trunc_vol_weight_min
        )
        alpha_trunc = alpha_s * rw
    else:
        alpha_trunc = alpha_s

    # stop_thresh: voxel-entry transmittance kill (dense-walk semantics)
    one_m0 = jnp.where(
        contrib,
        jnp.clip(1.0 - jnp.where(contrib, alpha_trunc, 0.0), 1e-7, 1.0 - 1e-7),
        1.0,
    )
    if opt.stop_thresh > 0:
        la_e = jnp.sum(jnp.log(one_m0), axis=0)  # (M,) per-entry attenuation
        cum_e = jnp.cumsum(la_e)
        per_ray_e = seg_sum(la_e, seg_id)
        base_e = jnp.cumsum(per_ray_e) - per_ray_e
        entry_pre = cum_e - la_e - jnp.take(base_e, rid)
        alive = entry_pre > math.log(opt.stop_thresh)
        contrib = contrib & alive[None, :]

    # composite
    alpha_c = jnp.where(contrib, alpha_trunc, 0.0)
    one_m = jnp.where(contrib, jnp.clip(1.0 - alpha_c, 1e-7, 1.0 - 1e-7), 1.0)
    log_att = jnp.log(one_m)
    pre_att, log_T = ray_excl_prefix(log_att)
    # clamp: true prefix attenuation is always <= 0, but entries invalidated
    # AFTER the (ray, t) sort sit mid-pool with seg_id=B while rid clips to
    # B-1, making their pre_att garbage-positive — exp would overflow to inf
    # and inf * 0 poisons the whole compositor with NaN
    weight_s = jnp.where(
        contrib, jnp.exp(jnp.minimum(pre_att, 0.0)) * (1.0 - one_m), 0.0
    )

    rgb_acc = jnp.stack(
        [seg_sum(jnp.sum(weight_s * rgb_s[ch], axis=0), seg_id)
         for ch in range(3)], axis=-1,
    )  # (B, 3)
    depth_acc = seg_sum(jnp.sum(weight_s * t_s, axis=0), seg_id)
    normal_acc = jnp.stack(
        [seg_sum(jnp.sum(weight_s * snorm_s[ch], axis=0), seg_id)
         for ch in range(3)], axis=-1,
    )

    # mode depth: t of the per-ray max-weight sample
    w_best_e = jnp.max(weight_s, axis=0)
    t_best_e = jnp.take_along_axis(
        t_s, jnp.argmax(weight_s, axis=0)[None, :], 0
    )[0]
    wmax = seg_max(w_best_e, seg_id)
    wmax = jnp.maximum(wmax, 0.0)
    is_best = (w_best_e >= jnp.take(wmax, rid)) & (w_best_e > 0)
    t_mode = seg_max(jnp.where(is_best, t_best_e, -jnp.inf), seg_id)
    t_mode = jnp.where(jnp.isfinite(t_mode), t_mode, 0.0)

    seg_min = functools.partial(
        jax.ops.segment_min, num_segments=B, indices_are_sorted=True
    )
    INF = jnp.asarray(jnp.inf, dtype)
    # cache-free median depth: first t where cumulative weight crosses half
    # the ray total (trace_ray_med_term semantics; the dense path needs the
    # bounded sample cache for this, here the global prefix gives it free)
    preW, totW = ray_excl_prefix(weight_s)
    med_hit = (
        contrib
        & ((preW + weight_s) >= 0.5 * jnp.take(totW, rid)[None, :])
        & (jnp.take(totW, rid)[None, :] > 1e-12)
    )
    t_med = seg_min(jnp.min(jnp.where(med_hit, t_s, INF), axis=0), seg_id)
    t_med = jnp.where(jnp.isfinite(t_med), t_med, 0.0)

    # sigma-thresh depth: first REAL intersection whose activated alpha
    # exceeds the threshold (trace_ray_sigma_thresh, surf_trav.cu:1003-1109
    # — walks intersections in order, no fake samples, pre-truncation alpha)
    if depth_sigma_thresh is not None:
        st_hit = contrib & ~fake_s & (alpha_s > depth_sigma_thresh)
        t_sig = seg_min(
            jnp.min(jnp.where(st_hit, t_s, INF), axis=0), seg_id
        )
        t_sig = jnp.where(jnp.isfinite(t_sig), t_sig, 0.0)

    # streaming losses
    acc = _init_state(B, dtype, cache_size, ray_ok)["acc"]
    if opt.fake_sample_l_dist:
        inc = contrib
    else:
        inc = contrib & ~fake_s
    a_i = jnp.where(inc, alpha_c, 0.0)
    w_i = jnp.where(inc, weight_s, 0.0)
    preA, A_a = ray_excl_prefix(a_i)
    preS, S_a = ray_excl_prefix(a_i * t_s)
    preAw, A_w = ray_excl_prefix(w_i)
    preSw, S_w = ray_excl_prefix(w_i * t_s)
    acc["l_dist_a"] = seg_sum(
        jnp.sum(a_i * (t_s * preA - preS), axis=0), seg_id
    )
    acc["l_dist"] = seg_sum(
        jnp.sum(w_i * (t_s * preAw - preSw), axis=0), seg_id
    )
    acc["A_a"], acc["S_a"], acc["A_w"], acc["S_w"] = A_a, S_a, A_w, S_w
    acc["l_entropy"] = seg_sum(
        jnp.sum(jnp.where(w_i > 0, -w_i * jnp.log(jnp.clip(w_i, min=1e-8)), 0.0), 0),
        seg_id,
    )
    acc["l_entropy_a"] = seg_sum(
        jnp.sum(jnp.where(a_i > 0, -a_i * jnp.log(jnp.clip(a_i, min=1e-8)), 0.0), 0),
        seg_id,
    )
    logsig = jnp.where(
        contrib,
        jnp.log(jnp.clip(-jnp.log(jnp.clip(1.0 - alpha_c, min=1e-8)), min=1e-8)),
        0.0,
    )
    w_sg = jax.lax.stop_gradient(jnp.where(contrib, weight_s, 0.0))
    acc["sp_logsig"] = seg_sum(jnp.sum(logsig, 0), seg_id)
    acc["sp_logsig_w"] = seg_sum(jnp.sum(logsig * w_sg, 0), seg_id)
    acc["sp_w"] = seg_sum(jnp.sum(w_sg, 0), seg_id)

    # inward / lap / udf accumulators: per-entry sums then segment-reduce
    acc_e = {
        k: jnp.zeros(M, dtype)
        for k in ("l_inward", "lap_sum", "lap_cnt", "udf_var_sum", "udf_var_cnt")
    }
    acc_e = _accumulate_sample_losses_T(grid, opt, acc_e, dT, smp, dtype)
    for k in ("l_inward", "lap_sum", "lap_cnt", "udf_var_sum", "udf_var_cnt"):
        acc[k] = seg_sum(acc_e[k], seg_id)

    if cache_size is not None:
        K = cache_size
        contrib_i2 = contrib.astype(jnp.int32)
        idxf, _ = ray_excl_prefix(contrib_i2)
        idx = idxf.astype(jnp.int32)
        ok = contrib & (idx < K)
        colr = jnp.where(ok, idx, K)
        rows = jnp.broadcast_to(seg_id[None, :], (S0, M))
        rows = jnp.where(ok, rows, B)

        def scat(buf, vals):
            return buf.at[rows, colr].add(jnp.where(ok, vals, 0.0), mode="drop")

        acc["c_ts"] = scat(acc["c_ts"], t_s)
        acc["c_alphas"] = scat(acc["c_alphas"], alpha_c)
        acc["c_weights"] = scat(acc["c_weights"], weight_s)
        fake_f = scat(jnp.zeros((B, K), dtype), fake_s.astype(dtype))
        acc["c_fake"] = acc["c_fake"] | (fake_f > 0)
        acc["n_cached"] = jnp.minimum(
            seg_sum(jnp.sum(contrib_i2, axis=0), seg_id), K
        ).astype(jnp.int32)

    state = {
        "log_T": log_T,
        "rgb": rgb_acc,
        "depth": depth_acc,
        "normal": normal_acc,
        "wmax": wmax,
        "t_mode": t_mode,
        "cnt": cnt.astype(jnp.int32),
        "alive": ray_ok,
        "acc": acc,
    }
    out = _finalize(grid, opt, state, cache_size, None,
                    bg_rays=(origins, dirs, delta_scale))
    out["n_occupied"] = n_occ
    out["n_entries_used"] = jnp.sum(valid)
    # entries actually dropped by pool capacity (>0 means renders/grads are
    # wrong for tail rays — the trainer must grow budgets and retry; the
    # step function refuses to apply an update when this fires)
    out["pool_overflow"] = drop_count
    out["depth_med"] = t_med  # cache-free; overrides _finalize's cached one
    if depth_sigma_thresh is not None:
        out["depth_sigma_thresh"] = t_sig
    if return_intersections:
        # real-intersection point cloud in world coords, the 'intersections'
        # / 'intersect_alphas' output of the oracle (svox2.py:2746-2761)
        # consumed by the camera-trajectory extractor (exract_points.py);
        # (S0, M) -> (M, S0) flattening keeps the original entry-major order
        pts_grid = (
            oT[:, None, :] + t_s[None, :, :] * dT[:, None, :]
        )  # (3, S0, M)
        out["intersections"] = {
            "pts": grid.grid2world(
                jnp.transpose(pts_grid, (2, 1, 0)).reshape(-1, 3)
            ),
            "alpha": alpha_s.T.reshape(-1),
            "weight": weight_s.T.reshape(-1),
            "mask": (contrib & ~fake_s).T.reshape(-1),
        }
    return out


def volume_render_surface_compact(
    grid: SparseGrid,
    rays: Rays,
    opt: RenderOptions,
    max_intersect_voxels: int = 64,
    cache_size: int | None = None,
    return_samples: bool = False,
    unroll: int = 1,
    voxel_chunk: int = 8,
    occupancy: jnp.ndarray | None = None,
):
    """Occupancy-compacted renderer (production path). Result matches
    ``volume_render_surface`` exactly as long as no ray crosses more than
    ``max_intersect_voxels`` occupied voxels; 'n_occupied' in the output
    reports the true per-ray count for overflow monitoring.

    ``voxel_chunk`` voxels are processed per scan step as one wide vector
    pass (gathers hoisted into a single isolated take per chunk); the scan
    only carries the O(1) compositing state between chunks.

    ``occupancy`` may be passed in precomputed (from ``voxel_occupancy``) to
    amortize the O(reso^3) recompute across steps / image chunks — the
    analog of the reference's accel structure being refreshed only on
    topology changes (svox2.py:4483-4490). Phase A (occupancy + crossing
    compaction) carries no gradient to any trainable parameter, so it is
    wrapped in stop_gradient to keep the backward graph small."""
    assert grid.surface_data is not None, "surface grid required"
    (origins, dirs, sh_mult, tnear, tmax, near_grid_t, ray_ok,
     delta_scale) = _prep(grid, rays, opt)
    B = origins.shape[0]
    dtype = origins.dtype

    occ = voxel_occupancy(grid, opt) if occupancy is None else occupancy
    occ = jax.lax.stop_gradient(occ)
    l_k, close_k, far_k, valid_k, n_occ = compact_crossings(
        grid, origins, dirs, jnp.where(ray_ok, tnear, 0.0),
        jnp.where(ray_ok, tmax, -1.0), occ, max_intersect_voxels,
    )
    close_k, far_k, valid_k = jax.lax.stop_gradient((close_k, far_k, valid_k))
    packed = pack_grid_data(grid)

    K = l_k.shape[1]
    V = max(1, min(voxel_chunk, K))
    if K % V:  # pad to a whole number of chunks with invalid voxels
        pad = V - K % V
        l_k = jnp.pad(l_k, ((0, 0), (0, pad), (0, 0)))
        close_k = jnp.pad(close_k, ((0, 0), (0, pad)))
        far_k = jnp.pad(far_k, ((0, 0), (0, pad)))
        valid_k = jnp.pad(valid_k, ((0, 0), (0, pad)))
        K += pad
    n_chunks = K // V

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(state, xs):
        l, close_t, far_t, valid = xs
        state, ys = _voxel_pass(
            grid, opt, origins, dirs, sh_mult, near_grid_t, state,
            l, close_t, far_t, valid & ray_ok[:, None], cache_size,
            return_samples, packed=packed,
        )
        return state, ys

    init = _init_state(B, dtype, cache_size, ray_ok)

    def chunked(a):
        # (B, K, ...) -> (n_chunks, B, V, ...)
        return jnp.moveaxis(
            a.reshape(B, n_chunks, V, *a.shape[2:]), 1, 0
        )

    xs = (chunked(l_k), chunked(close_k), chunked(far_k), chunked(valid_k))
    state, ys = jax.lax.scan(step, init, xs, unroll=unroll)
    out = _finalize(grid, opt, state, cache_size, ys if return_samples else None,
                    bg_rays=(origins, dirs, delta_scale))
    out["n_occupied"] = n_occ
    return out
