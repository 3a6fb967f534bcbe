"""Auxiliary per-ray losses computed from render sample caches.

Equivalents of the inline losses of ``_surface_render_gradcheck_lerp``
(/root/reference/svox2/svox2.py:2455-2533) and the fused loss gradients in
``trace_ray_surf_trav_backward`` (surf_trav.cu:2143-2400).

All functions take the ``samples`` dict emitted by
``render.surface.volume_render_surface`` (each array (B, S)) and are fully
differentiable. ``l_dist`` uses a streaming cumsum identity instead of the
reference's O(S^2) pairwise matrix (svox2.py:2463-2470) — exact for samples
in ascending-t order (which the DDA traversal guarantees), with no
``l_dist_max_sample=64`` cap (surf_trav.cu:3858-3860).
"""
from __future__ import annotations

import jax.numpy as jnp


def _maybe_drop_fake(samples, include_fake: bool):
    if include_fake:
        return samples["alphas"], samples["weights"], samples["ts"], samples["valid"]
    keep = samples["valid"] & ~samples["fake_mask"]
    zero = keep.astype(samples["alphas"].dtype)
    return (
        samples["alphas"] * zero,
        samples["weights"] * zero,
        samples["ts"] * zero,
        keep,
    )


def l_dist(samples, include_fake: bool = True):
    """mipnerf-360 distortion on alphas (svox2.py:2466-2472).

    Reference: sum_{i,j} a_i a_j |t_i - t_j|, then mean over rays / 2.
    Streaming identity (ascending t): sum_{i<j} a_i a_j (t_j - t_i)
      = sum_j a_j (t_j A_j - S_j), A/S = exclusive cumsums of a, a*t.
    """
    a, _, t, _ = _maybe_drop_fake(samples, include_fake)
    A = jnp.cumsum(a, axis=-1) - a
    S = jnp.cumsum(a * t, axis=-1) - a * t
    per_ray = jnp.sum(a * (t * A - S), axis=-1)
    return jnp.mean(per_ray)


def l_entropy(samples, include_fake: bool = True):
    """InfoNeRF-style entropy on unnormalized weights (svox2.py:2479-2487)."""
    _, w, _, _ = _maybe_drop_fake(samples, include_fake)
    term = jnp.where(w > 0.0, -w * jnp.log(jnp.clip(w, min=1e-8)), 0.0)
    return jnp.mean(jnp.sum(term, axis=-1))


def l_dist_alpha(samples, include_fake: bool = True):
    """Alias — the reference's l_dist already uses alphas (svox2.py:2466)."""
    return l_dist(samples, include_fake)


def l_conv_mode_samp(samples):
    """Convergence-to-mode loss (svox2.py:2495-2503): sum |t_i - t_mode|
    over real samples, t_mode = t of the max-weight sample."""
    w = samples["weights"]
    t = samples["ts"]
    mode_ids = jnp.argmax(w, axis=-1)
    t_mode = jnp.take_along_axis(t, mode_ids[..., None], axis=-1)
    mask = samples["valid"] & ~samples["fake_mask"] & (samples["alphas"] > 1e-8)
    return jnp.sum(jnp.where(mask, jnp.abs(t - t_mode), 0.0))


def l_samp_dist(samples):
    """Sample-distance concentration loss (svox2.py:2509-2515). The
    normalized alphas are detached in the reference — mirrored with
    stop_gradient."""
    import jax

    a, _, t, valid = _maybe_drop_fake(samples, True)
    na = a / jnp.clip(jnp.sum(a, axis=-1, keepdims=True), min=1e-8)
    na = jax.lax.stop_gradient(na)
    mean_dist = jnp.sum(na * t, axis=-1, keepdims=True)
    per_ray = jnp.sum(jnp.where(valid, jnp.abs(mean_dist - t), 0.0), axis=-1)
    return jnp.mean(per_ray)


def l_sparsity(samples):
    """Weight-sparsity loss (svox2.py:2523-2527), restricted to real samples
    (kernel semantics, surf_trav.cu:2286-2300)."""
    import jax

    a = samples["alphas"]
    w = samples["weights"]
    valid = samples["valid"]
    nw = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True), min=1e-10)
    nw = jax.lax.stop_gradient(nw)
    sigma = -jnp.log(jnp.clip(1.0 - a, min=1e-8))
    term = jnp.log(jnp.clip(sigma, min=1e-8)) * (1.0 - nw)
    return jnp.sum(jnp.where(valid, term, 0.0))


# ---------------------------------------------------------------------------
# Streaming variants: combine the per-ray accumulators emitted by the
# renderer ('ray_losses' output) into scalars. Exact equivalents of the
# cache-based functions above, with no sample cap and O(1) memory per ray.
# ---------------------------------------------------------------------------

def l_dist_from_ray_losses(ray_losses, alphas: bool = True):
    key = "l_dist_a" if alphas else "l_dist"
    return jnp.mean(ray_losses[key])


def l_entropy_from_ray_losses(ray_losses, alphas: bool = False):
    key = "l_entropy_a" if alphas else "l_entropy"
    return jnp.mean(ray_losses[key])


def l_sparsity_from_ray_losses(ray_losses):
    """sum_j log(sigma_j) (1 - w_j / sum w), weights detached
    (svox2.py:2523-2527)."""
    tot_w = jnp.clip(jnp.sum(ray_losses["sp_w"]), min=1e-10)
    per_ray_w = jnp.clip(ray_losses["sp_w"], min=1e-10)
    return jnp.sum(ray_losses["sp_logsig"] - ray_losses["sp_logsig_w"] / per_ray_w)


def l_inward_norm_from_ray_losses(ray_losses):
    """Inward-normal penalty (svox2.py:2559-2590): mean over rays of the
    per-ray sum of alpha * relu(dot(normal, dir))^2 (normals detached)."""
    return jnp.mean(ray_losses["l_inward"])


def density_lap_from_ray_losses(ray_losses):
    """Bimodal alpha prior (svox2.py:2608-2617) from streaming sums: mean
    over all samples of -log(e^-a + e^-(1-a)), shifted positive."""
    n = jnp.clip(jnp.sum(ray_losses["lap_cnt"]), min=1.0)
    loss = jnp.sum(ray_losses["lap_sum"]) / n
    return loss + jnp.log(jnp.exp(jnp.asarray(-1.0, loss.dtype)) + 1.0)


def udf_var_from_ray_losses(ray_losses):
    """UDF per-voxel corner variance weighted by extra level sets in hull
    (svox2.py:2597-2606), meaned over candidate voxels."""
    n = jnp.clip(jnp.sum(ray_losses["udf_var_cnt"]), min=1.0)
    return jnp.sum(ray_losses["udf_var_sum"]) / n


def l_conv_mode_samp_from_cache(cache):
    """Convergence-to-mode from the bounded cache (svox2.py:2495-2503)."""
    w = cache["weights"]
    t = cache["ts"]
    mode_ids = jnp.argmax(w, axis=-1)
    t_mode = jnp.take_along_axis(t, mode_ids[..., None], axis=-1)
    valid = _cache_valid(cache)
    mask = valid & ~cache["fake_mask"] & (cache["alphas"] > 1e-8)
    return jnp.sum(jnp.where(mask, jnp.abs(t - t_mode), 0.0))


def l_samp_dist_from_cache(cache):
    """Sample-distance concentration from the bounded cache
    (svox2.py:2509-2515)."""
    import jax as _jax

    a = cache["alphas"]
    t = cache["ts"]
    na = a / jnp.clip(jnp.sum(a, axis=-1, keepdims=True), min=1e-8)
    na = _jax.lax.stop_gradient(na)
    mean_dist = jnp.sum(na * t, axis=-1, keepdims=True)
    valid = _cache_valid(cache)
    per_ray = jnp.sum(jnp.where(valid, jnp.abs(mean_dist - t), 0.0), axis=-1)
    return jnp.mean(per_ray)


def _cache_valid(cache):
    """Written-slot mask of the bounded cache: slot k valid iff k < n_cached."""
    K = cache["ts"].shape[-1]
    return (
        jnp.arange(K, dtype=cache["n_cached"].dtype)[None, :]
        < cache["n_cached"][:, None]
    )


def density_lap_loss(samples):
    """Bimodal alpha prior (svox2.py:2608-2617): mean over samples of
    -log(exp(-a) + exp(-(1-a))), shifted positive."""
    a = samples["alphas"]
    valid = samples["valid"]
    p_lap = jnp.exp(-a) + jnp.exp(-(1.0 - a))
    n = jnp.clip(jnp.sum(valid), min=1)
    loss = jnp.sum(jnp.where(valid, -jnp.log(p_lap), 0.0)) / n
    return loss + jnp.log(jnp.exp(jnp.asarray(-1.0, a.dtype)) + 1.0)
