"""Ray/trilinear-isosurface intersection: cubic coefficients and roots.

The trilinear interpolant of 8 corner scalars along a ray is a cubic in t.
This module builds the cubic coefficients (equivalent of
``surface_to_cubic_equation_01``, /root/reference/svox2/csrc/include/
render_util.cuh:789-848, and the Python spec svox2.py:1987-2009) and solves
for real roots analytically with the trigonometric (Vieta) method
(render_util.cuh:1126-1203; svox2.py:2078-2164).

Gradients: the reference hand-derives per-root-type closed-form gradients
(``calc_cubic_root_grad_vieta``, render_util.cuh:1206-1704) in double
precision. Here roots get their gradient by *implicit differentiation*
instead: if f(t) = 0 then dt/df_i = -t^i / f'(t). This is mathematically
identical but numerically far better conditioned in f32 (no acos/cbrt
derivative chains), which is what makes the TPU fp32-first design viable
(SURVEY.md §7 "hard parts" #1).

Everything is vectorized over an arbitrary batch shape and safe under
``jax.grad`` (double-where guards; no NaNs from inactive branches).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NO_ROOT = -1.0  # marker for "no root in this slot" (matches svox2.py:2051)
_ATOL = 1e-10
_EPS = 1e-10
_ROOT_MAX = 1e4  # roots are voxel-relative; anything larger is degenerate


def cubic_coeffs(s8: jnp.ndarray, u: jnp.ndarray, d: jnp.ndarray):
    """Coefficients of f(t) = trilinear(s8)(u + t d).

    :param s8: (..., 8) corner scalars in reference order (z fastest)
    :param u: (..., 3) ray origin offset inside the voxel (origin - l),
        typically evaluated at the voxel entry point so roots are well
        conditioned (the "_01" re-origin trick, render_util.cuh:789)
    :param d: (..., 3) unit grid-space direction
    :return: (f0, f1, f2, f3) each (...,) with
        f(t) = f3 t^3 + f2 t^2 + f1 t + f0
    """
    return _cubic_coeffs_comps(
        [s8[..., i] for i in range(8)],
        (u[..., 0], u[..., 1], u[..., 2]),
        (d[..., 0], d[..., 1], d[..., 2]),
    )


def cubic_coeffs_T(s8T: jnp.ndarray, uT: jnp.ndarray, dT: jnp.ndarray):
    """``cubic_coeffs`` with the corner/component axes LEADING
    (s8T (8, ...), uT/dT (3, ...)) — the packed renderer's transposed
    layout; avoids trailing small axes that tile-pad on TPU."""
    return _cubic_coeffs_comps(
        [s8T[i] for i in range(8)],
        (uT[0], uT[1], uT[2]),
        (dT[0], dT[1], dT[2]),
    )


def _cubic_coeffs_comps(s, u, d):
    s000, s001, s010, s011, s100, s101, s110, s111 = s
    ux, uy, uz = u
    vx, vy, vz = d

    # lerp along z at the four xy corner columns (svox2.py:1987-1995)
    a00 = s000 * (1 - uz) + s001 * uz
    a01 = s010 * (1 - uz) + s011 * uz
    a10 = s100 * (1 - uz) + s101 * uz
    a11 = s110 * (1 - uz) + s111 * uz

    b00 = s001 - s000
    b01 = s011 - s010
    b10 = s101 - s100
    b11 = s111 - s110

    c0 = a00 * (1 - uy) + a01 * uy
    c1 = a10 * (1 - uy) + a11 * uy

    d0 = -(a00 * vy - vz * b00 * (1 - uy)) + (a01 * vy + vz * b01 * uy)
    d1 = -(a10 * vy - vz * b10 * (1 - uy)) + (a11 * vy + vz * b11 * uy)

    e0 = vy * vz * (b01 - b00)
    e1 = vy * vz * (b11 - b10)

    f3 = (e1 - e0) * vx
    f2 = -d0 * vx + e0 * (1 - ux) + d1 * vx + e1 * ux
    f1 = -c0 * vx + d0 * (1 - ux) + c1 * vx + d1 * ux
    f0 = c0 * (1 - ux) + c1 * ux
    return f0, f1, f2, f3


def _cubic_roots_raw(f0, f1, f2, f3, axis=-1):
    """Closed-form real roots; slots without a root hold NO_ROOT.
    ``axis`` picks where the 3-root axis goes (-1, or 0 for the packed
    renderer's transposed layout — a trailing 3 would tile-pad to 128
    lanes on TPU).

    Branch structure mirrors svox2.py:2078-2158 (which is what the CUDA
    Vieta solver implements): degenerate linear/quadratic handling with
    atol=1e-10, then the trigonometric three-real-root case and the
    one-real-root (Cardano-style) case. Root order within a slot triple is
    ascending for quad/cubic — matching the reference's composite order.
    """
    dtype = f0.dtype
    z = jnp.zeros_like(f0)

    is3 = jnp.abs(f3) >= _ATOL
    is2 = ~is3 & (jnp.abs(f2) >= _ATOL)
    is1 = ~is3 & ~is2 & (jnp.abs(f1) >= _ATOL)

    # ---- linear: f1 t + f0 = 0
    t_lin = -f0 / jnp.where(is1, f1, 1.0)

    # ---- quadratic: f2 t^2 + f1 t + f0 = 0
    qb = jnp.where(is2, f2, 1.0)
    D = f1 * f1 - 4.0 * f2 * f0
    has2 = is2 & (D > 0)
    sqrtD = jnp.sqrt(jnp.where(has2, D, 0.0))
    q0 = (-f1 - sqrtD) / (2.0 * qb)
    q1 = (-f1 + sqrtD) / (2.0 * qb)
    t_q0 = jnp.minimum(q0, q1)
    t_q1 = jnp.maximum(q0, q1)

    # ---- cubic (normalized): t^3 + b t^2 + c t + d = 0
    cf3 = jnp.where(is3, f3, 1.0)
    b = f2 / cf3
    c = f1 / cf3
    d = f0 / cf3
    Q = (b * b - 3.0 * c) / 9.0
    R = (2.0 * b**3 - 9.0 * b * c + 27.0 * d) / 54.0

    three_real = is3 & (R * R < Q**3)
    Qs = jnp.where(three_real, Q, 1.0)  # safe: three_real implies Q > 0
    sqrtQ = jnp.sqrt(Qs)
    arg = jnp.clip(R / (sqrtQ**3), -1.0 + _EPS, 1.0 - _EPS)
    theta = jnp.arccos(arg)
    pi = jnp.asarray(jnp.pi, dtype)
    t_c0 = -2.0 * sqrtQ * jnp.cos(theta / 3.0) - b / 3.0
    t_c1 = -2.0 * sqrtQ * jnp.cos((theta - 2.0 * pi) / 3.0) - b / 3.0
    t_c2 = -2.0 * sqrtQ * jnp.cos((theta + 2.0 * pi) / 3.0) - b / 3.0

    one_real = is3 & ~three_real
    disc = jnp.where(one_real, R * R - Q**3, 1.0)
    A = -jnp.sign(R) * (jnp.abs(R) + jnp.sqrt(jnp.clip(disc, 1e-8))) ** (1.0 / 3.0)
    Bv = jnp.where(A == 0.0, 0.0, Q / jnp.where(A == 0.0, 1.0, A))
    t_s = A + Bv - b / 3.0

    r0 = jnp.where(
        three_real, t_c0,
        jnp.where(one_real, t_s, jnp.where(has2, t_q0, jnp.where(is1, t_lin, 0.0))),
    )
    r1 = jnp.where(three_real, t_c1, jnp.where(has2, t_q1, 0.0))
    r2 = jnp.where(three_real, t_c2, 0.0)
    up = (lambda a: a[..., None]) if axis == -1 else (lambda a: a[None])
    roots = jnp.stack([r0, r1, r2], axis=axis)
    has = jnp.stack(
        [three_real | one_real | has2 | is1, three_real | has2, three_real],
        axis=axis,
    )
    # Newton polish: the closed-form solution loses up to ~1e-2 of the root
    # in f32 when the cubic is near-degenerate (f3 ~ 1e-6 after
    # cancellation gives root spreads of 1e4), and XLA's fusion choices
    # make the error context-dependent — the same coefficients produced a
    # root 0.02 too large inside a lax.scan, pushing an intersection out of
    # its voxel (the reference solves in double for exactly this reason,
    # surf_trav.cu:257-305). The polynomial itself is well conditioned at
    # simple roots, so two Newton steps restore ~1e-7 accuracy; steps are
    # clamped and skipped near f' ~ 0 (multiple roots).
    for _ in range(2):
        ft = eval_cubic(roots, up(f0), up(f1), up(f2), up(f3))
        fp = eval_cubic_deriv(roots, up(f1), up(f2), up(f3))
        ok = jnp.abs(fp) > 1e-6
        step = jnp.where(ok, ft / jnp.where(ok, fp, 1.0), 0.0)
        roots = roots - jnp.clip(step, -0.5, 0.5)
    # Roots are in voxel-entry-relative t (the _01 re-origin trick), so any
    # geometrically meaningful root is O(1). Near-degenerate coefficients
    # (|f1| ~ atol after cancellation) produce astronomically large "roots"
    # whose powers overflow f32 in the implicit-diff JVP (t^3 = inf ->
    # 0 * inf = NaN in masked gradients). Discard them here: they can never
    # pass the in-voxel check anyway. The explicit ``has`` mask (not a
    # sentinel compare) is returned because a genuine root can equal the
    # -1.0 sentinel exactly after polishing.
    has = has & (jnp.abs(roots) < _ROOT_MAX)
    return jnp.where(has, roots, NO_ROOT), has


@jax.custom_jvp
def cubic_roots(f0, f1, f2, f3):
    """Real roots of f3 t^3 + f2 t^2 + f1 t + f0 = 0, shape (..., 3).

    Slots without a real root hold NO_ROOT (-1). Gradients flow to the
    coefficients by implicit differentiation (see module docstring).
    """
    return _cubic_roots_raw(f0, f1, f2, f3)[0]


@cubic_roots.defjvp
def _cubic_roots_jvp(primals, tangents):
    f0, f1, f2, f3 = primals
    df0, df1, df2, df3 = tangents
    t, valid = _cubic_roots_raw(f0, f1, f2, f3)
    # powers only of valid roots: NO_ROOT slots would otherwise feed
    # 0 * t^3 products that turn into NaN when t overflows
    ts = jnp.where(valid, t, 0.0)
    # f'(t) = 3 f3 t^2 + 2 f2 t + f1
    fp = 3.0 * f3[..., None] * ts * ts + 2.0 * f2[..., None] * ts + f1[..., None]
    # guard near-degenerate (double) roots: |f'| clamped away from 0
    fp_safe = jnp.where(jnp.abs(fp) < _EPS, jnp.sign(fp) * _EPS + (fp == 0) * _EPS, fp)
    df = (
        df0[..., None]
        + df1[..., None] * ts
        + df2[..., None] * ts * ts
        + df3[..., None] * ts * ts * ts
    )
    dt = jnp.where(valid, -df / fp_safe, 0.0)
    return t, dt


@jax.custom_jvp
def cubic_roots_T(f0, f1, f2, f3):
    """Transposed-layout ``cubic_roots``: root axis LEADING, shape (3, ...).

    The packed renderer keeps the pool axis minor (lane axis on TPU); a
    (M, 3) root array would tile-pad 3 -> 128 lanes (43x memory). Same math
    and the same implicit-diff JVP as ``cubic_roots``."""
    return _cubic_roots_raw(f0, f1, f2, f3, axis=0)[0]


@cubic_roots_T.defjvp
def _cubic_roots_T_jvp(primals, tangents):
    f0, f1, f2, f3 = primals
    df0, df1, df2, df3 = tangents
    t, valid = _cubic_roots_raw(f0, f1, f2, f3, axis=0)
    ts = jnp.where(valid, t, 0.0)
    fp = 3.0 * f3[None] * ts * ts + 2.0 * f2[None] * ts + f1[None]
    fp_safe = jnp.where(
        jnp.abs(fp) < _EPS, jnp.sign(fp) * _EPS + (fp == 0) * _EPS, fp
    )
    df = df0[None] + df1[None] * ts + df2[None] * ts * ts + df3[None] * ts**3
    dt = jnp.where(valid, -df / fp_safe, 0.0)
    return t, dt


def eval_cubic(t, f0, f1, f2, f3):
    """Evaluate f at t (Horner)."""
    return ((f3 * t + f2) * t + f1) * t + f0


def eval_cubic_deriv(t, f1, f2, f3):
    """Evaluate f'(t) = 3 f3 t^2 + 2 f2 t + f1."""
    return (3.0 * f3 * t + 2.0 * f2) * t + f1
