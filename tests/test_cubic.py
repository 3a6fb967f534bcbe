"""Cubic solver: roots vs numpy, coefficients vs direct evaluation,
implicit-differentiation gradients vs finite differences."""
import jax
import jax.numpy as jnp
import numpy as np

from alphasurf_tpu.ops.cubic import (
    NO_ROOT,
    cubic_coeffs,
    cubic_roots,
    eval_cubic,
)
from alphasurf_tpu.ops.trilerp import trilerp


def _np_real_roots(f0, f1, f2, f3, atol=1e-10):
    coeffs = [f3, f2, f1, f0]
    while len(coeffs) > 1 and abs(coeffs[0]) < atol:
        coeffs = coeffs[1:]
    if len(coeffs) <= 1:
        return np.array([])
    r = np.roots(coeffs)
    return np.sort(r[np.abs(r.imag) < 1e-7].real)


def test_roots_match_numpy():
    rng = np.random.default_rng(0)
    n = 500
    fs = rng.standard_normal((n, 4)) * np.array([1.0, 1.0, 1.0, 0.3])
    # inject degenerate cases
    fs[:50, 3] = 0.0
    fs[50:100, 2:] = 0.0
    fs[100:110, 1:] = 0.0
    ts = np.asarray(
        cubic_roots(
            jnp.asarray(fs[:, 0]),
            jnp.asarray(fs[:, 1]),
            jnp.asarray(fs[:, 2]),
            jnp.asarray(fs[:, 3]),
        )
    )
    for i in range(n):
        expected = _np_real_roots(*fs[i])
        got = np.sort(ts[i][ts[i] != NO_ROOT])
        # solver may return fewer roots at hard discriminant boundaries;
        # every returned root must be a true root
        for t in got:
            val = fs[i, 0] + fs[i, 1] * t + fs[i, 2] * t**2 + fs[i, 3] * t**3
            scale = max(1.0, np.max(np.abs(fs[i])) * max(1.0, abs(t)) ** 3)
            assert abs(val) / scale < 1e-3, (i, t, val, fs[i])
        if len(expected) and len(got) == len(expected):
            np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_root_count_generic():
    """For well-separated roots the solver finds all of them."""
    rng = np.random.default_rng(1)
    for _ in range(100):
        roots = np.sort(rng.uniform(-3, 3, 3))
        if np.min(np.diff(roots)) < 0.2:
            continue
        f3 = rng.uniform(0.5, 2.0) * rng.choice([-1, 1])
        # (t-r0)(t-r1)(t-r2) * f3
        c = np.poly(roots) * f3
        ts = np.asarray(cubic_roots(jnp.asarray(c[3]), jnp.asarray(c[2]),
                                    jnp.asarray(c[1]), jnp.asarray(c[0])))
        got = np.sort(ts[ts != NO_ROOT])
        assert len(got) == 3
        np.testing.assert_allclose(got, roots, rtol=1e-4, atol=1e-4)


def test_coeffs_match_trilerp_along_ray():
    rng = np.random.default_rng(2)
    s8 = jnp.asarray(rng.standard_normal((16, 8)))
    u = jnp.asarray(rng.uniform(0, 1, (16, 3)))
    d = rng.standard_normal((16, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    f0, f1, f2, f3 = cubic_coeffs(s8, u, d)
    for t in (0.0, 0.1, 0.37, 0.8):
        pos = u + t * d
        direct = trilerp(s8[..., None], pos)[..., 0]
        via_cubic = eval_cubic(t, f0, f1, f2, f3)
        np.testing.assert_allclose(
            np.asarray(via_cubic), np.asarray(direct), rtol=1e-4, atol=1e-5
        )


def test_root_gradients_vs_finite_diff():
    rng = np.random.default_rng(3)
    # cubics with 3 well-separated roots
    roots = np.array([[-2.0, 0.5, 1.7], [-1.0, 0.2, 2.5]])
    for r in roots:
        c = np.poly(r)  # monic: t^3 + c1 t^2 + c2 t + c3
        fs = np.array([c[3], c[2], c[1], c[0]], dtype=np.float64)

        def first_root(f):
            t = cubic_roots(f[0], f[1], f[2], f[3])
            return t[0]

        g = jax.grad(first_root)(jnp.asarray(fs))
        eps = 1e-5
        for i in range(4):
            fp = fs.copy()
            fp[i] += eps
            fm = fs.copy()
            fm[i] -= eps
            fd = (first_root(jnp.asarray(fp)) - first_root(jnp.asarray(fm))) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-3, atol=1e-4)


def test_no_nan_gradients_on_invalid():
    """Slots without roots must produce zero (not NaN) gradients."""
    fs = jnp.asarray([1.0, 0.0, 0.0, 0.0])  # constant: no roots

    def s(f):
        return jnp.sum(cubic_roots(f[0], f[1], f[2], f[3]))

    g = jax.grad(s)(fs)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), 0.0)
