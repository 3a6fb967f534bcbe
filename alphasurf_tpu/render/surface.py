"""αSurf surface renderer — the core of the framework.

TPU-native re-design of the fused CUDA renderer ``trace_ray_surf_trav``
(/root/reference/svox2/csrc/render_lerp_kernel_surf_trav.cu:37-562) and its
Python spec ``_surface_render_gradcheck_lerp``
(/root/reference/svox2/svox2.py:1596-2857).

Algorithm per ray:
  1. DDA-walk the sparse voxel grid (bounded ``lax.scan`` of ``max_voxels``
     plane-crossing steps, masked past ray exit — replaces the CUDA warp
     while-loop).
  2. In each occupied voxel, the trilinear surface field along the ray is a
     cubic in t; solve it analytically per level set (ops/cubic.py) with the
     ray re-origined at the voxel entry for conditioning.
  3. Take alpha-composited samples exactly at valid in-voxel roots (strictly
     positive t, inside the unit cube, optional outward-normal test); where a
     voxel has no valid intersection, take one Gaussian-reweighted "fake
     sample" at the segment midpoint.
  4. Composite with log-transmittance; optional truncated-vol-render
     reweighting by running intersection index.

Gradients: ``jax.grad`` end-to-end. Each scan step is ``jax.checkpoint``-ed so
the backward pass re-gathers and re-solves instead of storing per-step
residuals — the exact analog of the CUDA backward's re-traversal
(surf_trav.cu:1710-2914), expressed in 5 lines instead of 1200.

Sample caches (t, alpha, weight, fake-mask per sample slot) stream out of the
scan for the auxiliary losses (l_dist, l_entropy, ...), replacing the
kernel's fixed 64-sample ring buffer (surf_trav.cu:407-414) — the streaming
cumsum formulation in losses/render_losses.py has no sample cap.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .. import defs
from ..core.grid import SparseGrid, fetch_links, gather_corner_links
from ..core.options import RenderOptions
from ..core.rays import Rays
from ..core.sh import eval_sh_bases
from ..ops import dda
from ..ops.cubic import cubic_coeffs, cubic_roots
from ..ops.trilerp import trilerp_weights

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
    render_util.cuh:2157-2190). ``intersect_ids`` may be float or int."""
    x = jnp.clip(a - intersect_ids.astype(jnp.result_type(a, jnp.float32)), 0.0, 1.0)
    return jnp.clip(0.5 * (1.0 - jnp.cos(jnp.pi * x)), min=weight_min)


def trilerp_field_grad(vals8, pos):
    """Gradient of the trilinear field w.r.t. position (compute_field_grad,
    render_util.cuh:2191; svox2.py:2573-2578).

    :param vals8: (..., 8), :param pos: (..., 3) in-cube fraction
    :return: (..., 3)
    """
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


def volume_render_surface(
    grid: SparseGrid,
    rays: Rays,
    opt: RenderOptions,
    max_voxels: int | None = None,
    return_samples: bool = False,
    cache_size: int | None = None,
):
    """Render rays against the surface grid.

    :param return_samples: emit full per-sample caches (tests/debug only —
        O(max_voxels) memory per ray)
    :param cache_size: if set, keep a bounded per-ray cache of the first K
        samples (t, alpha, weight, fake) for the two-pass losses
        (l_conv_mode_samp / l_samp_dist) — the analog of the kernel's
        ``l_dist_max_sample`` ring buffer (surf_trav.cu:407-414)
    :return: dict with
        'rgb' (B, 3), 'depth' (B,), 'log_transmit' (B,),
        'ray_losses': per-ray streaming loss accumulators, each (B,):
            'l_dist' / 'l_dist_a' (weights/alpha distortion, Σ_{i<j} terms),
            'l_entropy' / 'l_entropy_a', and the l_sparsity pieces
            'sp_logsig', 'sp_logsig_w', 'sp_w' (combined by
            losses.render_losses.l_sparsity_from_ray_losses)
        'cache': bounded sample cache dict (if cache_size), each (B, K)
        'samples': full caches (if return_samples), each (B, S)
    """
    assert grid.surface_data is not None, "surface grid required"
    if max_voxels is None:
        max_voxels = max_voxels_for(grid)
    n_lv = grid.level_set_data.shape[0]

    origins, dirs, viewdirs, _ = dda.preprocess_rays(grid, rays.origins, rays.dirs)
    tnear, tmax = dda.ray_bounds(grid, origins, dirs)
    sh_mult = eval_sh_bases(grid.basis_dim, viewdirs)  # (B, bd)

    B = origins.shape[0]
    dtype = origins.dtype
    reso = grid.reso
    near_grid_t = opt.near_clip * jnp.mean(grid.scaling * grid.gsz)

    ray_ok = jnp.isfinite(tnear) & jnp.isfinite(tmax) & (tnear <= tmax)
    t0 = jnp.where(ray_ok, tnear, 0.0)

    use_udf_act = grid.surface_type in _UDF_TYPES
    fs_std = (
        grid.fake_sample_std[0, 0]
        if grid.fake_sample_std is not None
        else jnp.asarray(1.0, dtype)
    )

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def step(carry, _):
        t = carry["t"]
        log_T = carry["log_T"]
        rgb_acc = carry["rgb"]
        depth_acc = carry["depth"]
        real_cnt = carry["cnt"]
        alive = carry["alive"]
        acc = carry["acc"]

        next_t = dda.next_crossing(origins, dirs, t)
        has_next = jnp.isfinite(next_t)
        seg_ok = alive & has_next & (t < tmax - 1e-9)
        next_t_safe = jnp.where(has_next, next_t, t + 1.0)

        l, in_bounds = dda.voxel_between(
            origins, dirs, jnp.where(seg_ok, t, 0.0),
            jnp.where(seg_ok, next_t_safe, 1.0), reso,
        )
        links8 = gather_corner_links(grid.links, l)
        all_present = jnp.all(links8 >= 0, axis=-1)
        vox_ok = seg_ok & in_bounds & all_present

        alpha8 = fetch_links(grid.density_data, links8)[..., 0]  # (B, 8)
        # corner raw-alpha prefilter (surf_trav.cu:230-239)
        vox_ok = vox_ok & jnp.any(alpha8 >= opt.sigma_thresh, axis=-1)

        surf8 = fetch_links(grid.surface_data, links8)[..., 0]  # (B, 8)
        if use_udf_act:
            surf8 = jax.nn.softplus(surf8)
        sh8 = fetch_links(grid.sh_data, links8)  # (B, 8, 3*bd)

        close_t, far_t = dda.voxel_plane_ts(origins, dirs, l)
        u = origins + close_t[..., None] * dirs - l.astype(dtype)
        f0, f1, f2, f3 = cubic_coeffs(surf8, u, dirs)
        smin = jnp.min(surf8, axis=-1)
        smax = jnp.max(surf8, axis=-1)

        def sample_at(frac):
            """alpha-raw, rgb at in-voxel fraction ``frac`` (B, 3)."""
            w8 = trilerp_weights(frac)  # (B, 8)
            raw_a = jnp.sum(w8 * alpha8, axis=-1)
            shv = jnp.einsum("bk,bkc->bc", w8, sh8).reshape(B, 3, grid.basis_dim)
            rgb = jnp.clip(
                jnp.sum(sh_mult[:, None, :] * shv, axis=-1) + 0.5, min=0.0
            )
            return raw_a, rgb

        # ---- real intersections: static loop over level sets x 3 roots ----
        vox_has_sample = jnp.zeros(B, dtype=bool)
        vox_has_surf = jnp.zeros(B, dtype=bool)
        slot_data = []  # (t_global, rwalpha, contrib) per slot, in order

        cnt = real_cnt
        for i in range(n_lv):
            lv = grid.level_set_data[i]
            lv_ok = vox_ok & (lv >= smin) & (lv <= smax)
            vox_has_surf = vox_has_surf | lv_ok
            roots = cubic_roots(f0 - lv, f1, f2, f3)  # (B, 3)
            for j in range(3):
                st = roots[:, j]
                pos = origins + (close_t + st)[..., None] * dirs
                frac = pos - l.astype(dtype)
                in_cube = jnp.all(frac >= 0, axis=-1) & jnp.all(frac <= 1, axis=-1)
                geo_ok = lv_ok & (st > 0) & in_cube & (
                    (close_t + st) >= near_grid_t
                )
                # vox_has_sample set before outward test (surf_trav.cu:348)
                vox_has_sample = vox_has_sample | geo_ok
                if opt.only_outward_intersect:
                    sgrad = trilerp_field_grad(surf8, frac)
                    # keep only normal-facing-camera hits (surf_trav.cu:350-367)
                    geo_ok = geo_ok & (
                        jnp.sum(sgrad * dirs, axis=-1) > 0
                    )
                frac_safe = jnp.clip(jnp.where(geo_ok[..., None], frac, 0.5), 0.0, 1.0)
                raw_a, rgb = sample_at(frac_safe)
                cnt = cnt + geo_ok.astype(jnp.int32)  # ++intersect_i
                contrib = geo_ok & (raw_a > opt.sigma_thresh)
                alpha = surf_alpha_act(raw_a, opt.alpha_activation_type)
                if opt.truncated_vol_render:
                    rw = trunc_vol_render_rw(
                        cnt - 1, grid.truncated_vol_render_a,
                        opt.trunc_vol_weight_min,
                    )
                    alpha = alpha * rw
                slot_data.append((close_t + st, alpha, rgb, contrib, False))

        # ---- fake sample (surf_trav.cu:423-541) ----
        if opt.surf_fake_sample:
            take = vox_ok & ~vox_has_sample & (
                (far_t - close_t) > opt.surf_fake_sample_min_vox_len
            )
            if opt.limited_fake_sample:
                take = take & vox_has_surf
            tf = 0.5 * (close_t + far_t)
            frac = origins + tf[..., None] * dirs - l.astype(dtype)
            frac_safe = jnp.clip(jnp.where(take[..., None], frac, 0.5), 0.0, 1.0)
            raw_a, rgb = sample_at(frac_safe)
            take = take & (raw_a > opt.sigma_thresh)
            alpha = surf_alpha_act(raw_a, opt.alpha_activation_type)

            mu = jnp.mean(surf8, axis=-1)
            var = jnp.mean((surf8 - mu[..., None]) ** 2, axis=-1)
            std = jnp.sqrt(jnp.clip(var, min=1e-9))
            if not opt.fake_sample_normalize_surf:
                std = jnp.ones_like(std)
            w8 = trilerp_weights(frac_safe)
            s_norm = jnp.sum(w8 * (surf8 / std[..., None]), axis=-1)
            # signed distance to nearest level set; the kernel compares the
            # std-normalized field against raw level-set values
            # (surf_trav.cu:486-490) — reproduced exactly
            dists = s_norm[..., None] - grid.level_set_data[None, :]
            amin = jnp.argmin(jnp.abs(dists), axis=-1)
            fake_dist = jnp.take_along_axis(dists, amin[..., None], axis=-1)[..., 0]
            alpha = alpha * jnp.exp(-0.5 * (fake_dist / fs_std) ** 2)
            if opt.truncated_vol_render:
                rw = trunc_vol_render_rw(
                    cnt - 1, grid.truncated_vol_render_a, opt.trunc_vol_weight_min
                )
                alpha = alpha * rw
            slot_data.append((tf, alpha, rgb, take, True))

        # ---- sequential composite over slots + streaming loss updates ----
        ts_slots, a_slots, w_slots, fake_slots, valid_slots = [], [], [], [], []
        for t_s, alpha, rgb, contrib, is_fake in slot_data:
            alpha = jnp.where(contrib, alpha, 0.0)
            # pcnt = -log(1 - alpha) with the oracle's clamp (svox2.py:2423)
            one_m = jnp.clip(1.0 - alpha, 1e-7, 1.0 - 1e-7)
            log_att = jnp.where(contrib, jnp.log(one_m), 0.0)
            weight = jnp.where(contrib, jnp.exp(log_T) * (1.0 - one_m), 0.0)
            rgb_acc = rgb_acc + weight[..., None] * rgb
            depth_acc = depth_acc + weight * t_s
            log_T = log_T + log_att

            # streaming per-ray losses (exact, no sample cap — replaces the
            # kernel's 64-sample cache, surf_trav.cu:2143-2300)
            inc = contrib & (opt.fake_sample_l_dist or not is_fake)
            a_i = jnp.where(inc, alpha, 0.0)
            w_i = jnp.where(inc, weight, 0.0)
            # distortion: sum_{i<j} x_i x_j (t_j - t_i), streamed via
            # exclusive running sums (ascending-t order is guaranteed)
            acc["l_dist_a"] = acc["l_dist_a"] + a_i * (t_s * acc["A_a"] - acc["S_a"])
            acc["A_a"] = acc["A_a"] + a_i
            acc["S_a"] = acc["S_a"] + a_i * t_s
            acc["l_dist"] = acc["l_dist"] + w_i * (t_s * acc["A_w"] - acc["S_w"])
            acc["A_w"] = acc["A_w"] + w_i
            acc["S_w"] = acc["S_w"] + w_i * t_s
            # entropy: -x log x
            acc["l_entropy"] = acc["l_entropy"] + jnp.where(
                w_i > 0, -w_i * jnp.log(jnp.clip(w_i, min=1e-8)), 0.0
            )
            acc["l_entropy_a"] = acc["l_entropy_a"] + jnp.where(
                a_i > 0, -a_i * jnp.log(jnp.clip(a_i, min=1e-8)), 0.0
            )
            # sparsity pieces: sigma = -log(1-a); loss needs
            # sum_j log(sigma_j) * (1 - w_j / sum(w)) with detached weights
            logsig = jnp.where(
                contrib,
                jnp.log(jnp.clip(-jnp.log(jnp.clip(1.0 - alpha, min=1e-8)), min=1e-8)),
                0.0,
            )
            w_sg = jax.lax.stop_gradient(jnp.where(contrib, weight, 0.0))
            acc["sp_logsig"] = acc["sp_logsig"] + logsig
            acc["sp_logsig_w"] = acc["sp_logsig_w"] + logsig * w_sg
            acc["sp_w"] = acc["sp_w"] + w_sg

            if cache_size is not None:
                K = cache_size
                slot_idx = jnp.clip(acc["n_cached"], 0, K - 1)
                write = contrib & (acc["n_cached"] < K)
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
                    == slot_idx[:, None]
                ) & write[:, None]
                ohf = onehot.astype(dtype)
                acc["c_ts"] = acc["c_ts"] + ohf * t_s[:, None]
                acc["c_alphas"] = acc["c_alphas"] + ohf * alpha[:, None]
                acc["c_weights"] = acc["c_weights"] + ohf * weight[:, None]
                acc["c_fake"] = acc["c_fake"] | (onehot & is_fake)
                acc["n_cached"] = acc["n_cached"] + write.astype(jnp.int32)

            if return_samples:
                ts_slots.append(jnp.where(contrib, t_s, 0.0))
                a_slots.append(alpha)
                w_slots.append(weight)
                fake_slots.append(jnp.full(B, is_fake) & contrib)
                valid_slots.append(contrib)

        if opt.stop_thresh > 0:
            alive = alive & (log_T > math.log(opt.stop_thresh))
        alive = alive & (next_t_safe < tmax + 1e-6) & has_next

        new_carry = {
            "t": jnp.where(seg_ok, next_t_safe, t),
            "log_T": log_T,
            "rgb": rgb_acc,
            "depth": depth_acc,
            "cnt": cnt,
            "alive": alive,
            "acc": acc,
        }
        if return_samples:
            ys = (
                jnp.stack(ts_slots, axis=-1),
                jnp.stack(a_slots, axis=-1),
                jnp.stack(w_slots, axis=-1),
                jnp.stack(fake_slots, axis=-1),
                jnp.stack(valid_slots, axis=-1),
            )
        else:
            ys = None
        return new_carry, ys

    zb = jnp.zeros(B, dtype)
    acc0 = {
        k: zb
        for k in (
            "l_dist", "l_dist_a", "A_a", "S_a", "A_w", "S_w",
            "l_entropy", "l_entropy_a", "sp_logsig", "sp_logsig_w", "sp_w",
        )
    }
    if cache_size is not None:
        acc0["c_ts"] = jnp.zeros((B, cache_size), dtype)
        acc0["c_alphas"] = jnp.zeros((B, cache_size), dtype)
        acc0["c_weights"] = jnp.zeros((B, cache_size), dtype)
        acc0["c_fake"] = jnp.zeros((B, cache_size), bool)
        acc0["n_cached"] = jnp.zeros(B, jnp.int32)
    init = {
        "t": t0,
        "log_T": zb,
        "rgb": jnp.zeros((B, 3), dtype),
        "depth": zb,
        "cnt": jnp.zeros(B, jnp.int32),
        "alive": ray_ok,
        "acc": acc0,
    }
    final, ys = jax.lax.scan(step, init, None, length=max_voxels)
    log_T = final["log_T"]
    rgb_acc = final["rgb"]
    depth_acc = final["depth"]
    cnt = final["cnt"]
    acc = final["acc"]

    rgb_out = rgb_acc + jnp.exp(log_T)[..., None] * opt.background_brightness

    out = {
        "rgb": rgb_out,
        "depth": depth_acc,
        "log_transmit": log_T,
        "n_intersections": cnt,
        "ray_losses": {
            k: acc[k]
            for k in (
                "l_dist", "l_dist_a", "l_entropy", "l_entropy_a",
                "sp_logsig", "sp_logsig_w", "sp_w",
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
    if return_samples:
        # ys: each (max_voxels, B, slots) -> (B, max_voxels * slots)
        def flat(y):
            return jnp.moveaxis(y, 0, 1).reshape(B, -1)

        out["samples"] = {
            "ts": flat(ys[0]),
            "alphas": flat(ys[1]),
            "weights": flat(ys[2]),
            "fake_mask": flat(ys[3]),
            "valid": flat(ys[4]),
        }
    return out
