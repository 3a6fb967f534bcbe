"""Ray batches and pinhole cameras.

Equivalent of ``svox2.Rays`` / ``svox2.Camera`` (/root/reference/svox2/
svox2.py:108-237). OpenCV convention; optional NDC.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.struct import pytree_dataclass


@pytree_dataclass
class Rays:
    origins: jnp.ndarray  # (B, 3)
    dirs: jnp.ndarray  # (B, 3)
    masks: Optional[jnp.ndarray] = None  # (B,) bool

    def __getitem__(self, key):
        return Rays(
            self.origins[key],
            self.dirs[key],
            None if self.masks is None else self.masks[key],
        )

    @property
    def batch(self):
        return self.origins.shape[0]


@pytree_dataclass(meta_fields=("width", "height", "ndc_coeffs"))
class Camera:
    c2w: jnp.ndarray  # (4, 4) or (3, 4), OpenCV convention
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = 800
    height: int = 800
    ndc_coeffs: Tuple[float, float] = (-1.0, -1.0)

    @classmethod
    def make(cls, c2w, fx, fy=None, cx=None, cy=None, width=800, height=800,
             ndc_coeffs=(-1.0, -1.0)):
        fy = fx if fy is None else fy
        cx = width * 0.5 if cx is None else cx
        cy = height * 0.5 if cy is None else cy
        return cls(
            c2w=jnp.asarray(c2w, dtype=jnp.float32),
            fx=jnp.asarray(fx, dtype=jnp.float32),
            fy=jnp.asarray(fy, dtype=jnp.float32),
            cx=jnp.asarray(cx, dtype=jnp.float32),
            cy=jnp.asarray(cy, dtype=jnp.float32),
            width=int(width),
            height=int(height),
            ndc_coeffs=tuple(ndc_coeffs),
        )

    def gen_rays(self) -> Rays:
        """Generate all pixel rays (svox2.py:211-237). float64 intermediate
        on host for precision, f32 output."""
        c2w = np.asarray(self.c2w, dtype=np.float64)
        yy, xx = np.meshgrid(
            np.arange(self.height, dtype=np.float64) + 0.5,
            np.arange(self.width, dtype=np.float64) + 0.5,
            indexing="ij",
        )
        xx = (xx - float(self.cx)) / float(self.fx)
        yy = (yy - float(self.cy)) / float(self.fy)
        zz = np.ones_like(xx)
        dirs = np.stack((xx, yy, zz), axis=-1)  # OpenCV
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = (c2w[None, None, :3, :3] @ dirs[..., None])[..., 0]
        dirs = dirs.reshape(-1, 3).astype(np.float32)
        origins = np.broadcast_to(
            c2w[None, :3, 3], (self.height * self.width, 3)
        ).astype(np.float32).copy()
        if self.ndc_coeffs[0] > 0.0:
            origins, dirs = convert_to_ndc(origins, dirs, self.ndc_coeffs)
            dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        return Rays(jnp.asarray(origins), jnp.asarray(dirs))

    def gen_rays_device(self) -> Rays:
        """``gen_rays`` computed ON DEVICE: only the 4x4 pose and scalar
        intrinsics cross the host boundary (the host link runs at ~0.5 MB/s
        through the axon relay — a full 800x800 ray upload would take ~30 s
        per camera). f32 throughout; no NDC support (LLFF datasets are
        host-side)."""
        assert self.ndc_coeffs[0] <= 0.0, "NDC rays are generated host-side"
        H, W = int(self.height), int(self.width)
        c2w = jnp.asarray(self.c2w, jnp.float32)

        yy, xx = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32) + 0.5,
            jnp.arange(W, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        x = (xx - self.cx) / self.fx
        y = (yy - self.cy) / self.fy
        dirs = jnp.stack([x, y, jnp.ones_like(x)], -1)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = jnp.einsum("ij,hwj->hwi", c2w[:3, :3], dirs).reshape(-1, 3)
        origins = jnp.broadcast_to(c2w[:3, 3], (H * W, 3))
        return Rays(origins, dirs)


def convert_to_ndc(origins, dirs, ndc_coeffs, near: float = 1.0):
    """NDC ray warp for LLFF forward-facing scenes
    (/root/reference/svox2/utils.py:580-600)."""
    t = -(near + origins[..., 2]) / dirs[..., 2]
    origins = origins + t[..., None] * dirs
    dx, dy, dz = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ox, oy, oz = origins[..., 0], origins[..., 1], origins[..., 2]
    o0 = ndc_coeffs[0] * (ox / oz)
    o1 = ndc_coeffs[1] * (oy / oz)
    o2 = 1 - 2 * near / oz
    d0 = ndc_coeffs[0] * (dx / dz - ox / oz)
    d1 = ndc_coeffs[1] * (dy / dz - oy / oz)
    d2 = 2 * near / oz
    origins = np.stack([o0, o1, o2], axis=-1)
    dirs = np.stack([d0, d1, d2], axis=-1)
    return origins, dirs
