"""Real spherical-harmonic basis evaluation (degrees 0..4).

TPU-native equivalent of ``eval_sh_bases``
(/root/reference/svox2/utils.py:119-166) and the device-side ``calc_sh``
(/root/reference/svox2/csrc/include/render_util.cuh:405). Pure jnp; fully
vectorized and differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
SH_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)

MAX_SH_BASIS = 10


def eval_learned_basis(basis_data: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Learned 3D-texture basis: trilerp ``basis_data`` (R,R,R,bd) at the
    unit direction embedded in the cube (svox2.py:6404-6410,
    _eval_learned_bases)."""
    R = basis_data.shape[0]
    pos = (dirs * 0.5 + 0.5) * (R - 1)
    pos = jnp.clip(pos, 0.0, R - 1)
    l = jnp.clip(pos.astype(jnp.int32), 0, R - 2)
    f = pos - l
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[..., 0] if dx else 1 - f[..., 0])
                    * (f[..., 1] if dy else 1 - f[..., 1])
                    * (f[..., 2] if dz else 1 - f[..., 2])
                )
                out = out + w[..., None] * basis_data[
                    l[..., 0] + dx, l[..., 1] + dy, l[..., 2] + dz
                ]
    return out


def posenc(x: jnp.ndarray, num_freqs: int, include_identity: bool = True):
    """NeRF positional encoding sin/cos at octave frequencies
    (svox2/utils.py:496-513). x: (..., D) -> (..., D*(2*num_freqs[+1]))."""
    if num_freqs <= 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # (F,)
    ang = x[..., None, :] * freqs[:, None]  # (..., F, D)
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_identity:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


MLP_POSENC_DEG = 4  # mlp_posenc_size default (svox2.py:649)


def init_basis_mlp(key, basis_dim: int, hidden: int = 64, posenc_deg: int = MLP_POSENC_DEG):
    """Parameters of the learned-basis MLP (BASIS_TYPE_MLP, svox2.py:963-976):
    posenc(dir) -> hidden -> relu -> basis_dim. Returned as a plain dict
    pytree so it rides inside SparseGrid and trains with the rest."""
    import jax

    in_dim = 3 * (2 * posenc_deg + 1)
    k1, k2 = jax.random.split(key)
    s1 = (2.0 / in_dim) ** 0.5
    s2 = (2.0 / hidden) ** 0.5
    return {
        "w0": jax.random.normal(k1, (in_dim, hidden), jnp.float32) * s1,
        "b0": jnp.zeros((hidden,), jnp.float32),
        "w1": jax.random.normal(k2, (hidden, basis_dim), jnp.float32) * s2,
        "b1": jnp.zeros((basis_dim,), jnp.float32),
    }


def eval_basis_mlp(params: dict, dirs: jnp.ndarray, posenc_deg: int = MLP_POSENC_DEG):
    """Evaluate the learned-basis MLP at unit directions
    (_eval_basis_mlp, svox2.py:6412-6424). dirs (..., 3) -> (..., basis_dim)."""
    h = posenc(dirs, posenc_deg)
    h = jnp.maximum(h @ params["w0"] + params["b0"], 0.0)
    return h @ params["w1"] + params["b1"]


def eval_basis(grid, viewdirs: jnp.ndarray) -> jnp.ndarray:
    """Unified per-ray basis dispatch (SH / learned 3D texture / MLP),
    the TPU analog of svox2.py:3415-3426 basis selection."""
    from .. import defs

    if grid.basis_type == defs.BASIS_TYPE_3D_TEXTURE and grid.basis_data is not None:
        return eval_learned_basis(grid.basis_data, viewdirs)
    if grid.basis_type == defs.BASIS_TYPE_MLP and getattr(grid, "basis_mlp", None) is not None:
        return eval_basis_mlp(grid.basis_mlp, viewdirs)
    return eval_sh_bases(grid.basis_dim, viewdirs)


def reinit_learned_bases(
    basis_reso: int,
    basis_dim: int,
    init_type: str = "sh",
    upper_hemi: bool = False,
    sg_lambda_max: float = 1.0,
    seed: int = 0,
) -> jnp.ndarray:
    """Initialize the learned 3D-texture basis by evaluating an analytic
    spherical basis on the direction cube (reinit_learned_bases,
    svox2.py:6426-6499). init_type: 'sh' | 'sg' (spherical Gaussians) |
    'fourier'. Returns (R, R, R, basis_dim) float32."""
    import numpy as np

    R = basis_reso
    ax = (np.arange(R, dtype=np.float64) + 0.5) / R * 2.0 - 1.0
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    dirs = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    norm = np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs / np.maximum(norm, 1e-8)
    if upper_hemi:
        dirs[..., 2] = np.abs(dirs[..., 2])
    d = jnp.asarray(dirs, jnp.float32)
    if init_type == "sh":
        vals = eval_sh_bases(basis_dim, d)
    elif init_type == "sg":
        # spherical Gaussians with Fibonacci-spiral means (svox2.py:6447-6470)
        rng = np.random.default_rng(seed)
        i = np.arange(basis_dim, dtype=np.float64) + 0.5
        phi = np.arccos(1 - 2 * i / basis_dim)
        theta = np.pi * (1 + 5**0.5) * i
        mu = np.stack(
            [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)],
            axis=-1,
        )
        lam = rng.uniform(0.5, sg_lambda_max, basis_dim)
        vals = jnp.exp(
            jnp.asarray(lam, jnp.float32)
            * (d @ jnp.asarray(mu.T, jnp.float32) - 1.0)
        )
    elif init_type == "fourier":
        # random-frequency Fourier features (svox2.py:6472-6493)
        rng = np.random.default_rng(seed)
        freqs = rng.normal(size=(3, basis_dim)).astype(np.float32)
        phase = rng.uniform(0, 2 * np.pi, basis_dim).astype(np.float32)
        vals = jnp.cos(d @ jnp.asarray(freqs) + jnp.asarray(phase))
    else:
        raise ValueError(f"unknown basis init {init_type!r}")
    return vals.reshape(R, R, R, basis_dim).astype(jnp.float32)


def eval_sh_bases(basis_dim: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH bases at unit directions.

    :param basis_dim: static int, number of SH components (1, 4, 9, 16, 25)
    :param dirs: (..., 3) unit directions
    :return: (..., basis_dim)
    """
    comps = [jnp.full(dirs.shape[:-1], SH_C0, dtype=dirs.dtype)]
    if basis_dim > 1:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        comps += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
        if basis_dim > 4:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            comps += [
                SH_C2[0] * xy,
                SH_C2[1] * yz,
                SH_C2[2] * (2.0 * zz - xx - yy),
                SH_C2[3] * xz,
                SH_C2[4] * (xx - yy),
            ]
            if basis_dim > 9:
                comps += [
                    SH_C3[0] * y * (3 * xx - yy),
                    SH_C3[1] * xy * z,
                    SH_C3[2] * y * (4 * zz - xx - yy),
                    SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                    SH_C3[4] * x * (4 * zz - xx - yy),
                    SH_C3[5] * z * (xx - yy),
                    SH_C3[6] * x * (xx - 3 * yy),
                ]
                if basis_dim > 16:
                    comps += [
                        SH_C4[0] * xy * (xx - yy),
                        SH_C4[1] * yz * (3 * xx - yy),
                        SH_C4[2] * xy * (7 * zz - 1),
                        SH_C4[3] * yz * (7 * zz - 3),
                        SH_C4[4] * (zz * (35 * zz - 30) + 3),
                        SH_C4[5] * xz * (7 * zz - 3),
                        SH_C4[6] * (xx - yy) * (7 * zz - 1),
                        SH_C4[7] * xz * (xx - 3 * yy),
                        SH_C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
                    ]
    return jnp.stack(comps[:basis_dim], axis=-1)
