"""Dataset base: images + poses -> shuffled ray batches.

Numpy re-design of /root/reference/opt/util/dataset_base.py:27-78 and the
``Rays``/``Intrin`` helpers (opt/util/util.py:14-77). Host-side only — ray
batches are sliced on host and fed to jitted steps as device arrays.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Union

import numpy as np


@dataclasses.dataclass
class Intrin:
    fx: float
    fy: float
    cx: float
    cy: float

    def scale(self, s: float) -> "Intrin":
        return Intrin(self.fx * s, self.fy * s, self.cx * s, self.cy * s)


@dataclasses.dataclass
class RayBatch:
    origins: np.ndarray  # (N, 3)
    dirs: np.ndarray  # (N, 3)
    gt: np.ndarray  # (N, 3)
    mask: Optional[np.ndarray] = None  # (N,) for masked datasets (DTU)

    def __len__(self):
        return self.origins.shape[0]

    def __getitem__(self, key):
        return RayBatch(
            self.origins[key], self.dirs[key], self.gt[key],
            None if self.mask is None else self.mask[key],
        )


class DatasetBase:
    split: str
    n_images: int
    h_full: int
    w_full: int
    intrins_full: Intrin
    c2w: np.ndarray  # (n, 4, 4) OpenCV
    gt: np.ndarray  # (n, h, w, 3)

    def __init__(self):
        self.ndc_coeffs = (-1.0, -1.0)
        self.use_sphere_bound = True
        self.should_use_background = True
        self.scene_center = [0.0, 0.0, 0.0]
        self.scene_radius = [1.0, 1.0, 1.0]
        self.permutation = True
        self.epoch_size: Optional[int] = None
        self.rays: Optional[RayBatch] = None
        self.masks: Optional[np.ndarray] = None  # (n, h, w) optional

    def gen_rays(self, factor: int = 1):
        """All-pixel rays for the train split (dataset_base.py:36-71)."""
        self.factor = factor
        self.h = self.h_full // factor
        self.w = self.w_full // factor
        true_factor = self.h_full / self.h
        self.intrins = self.intrins_full.scale(1.0 / true_factor)
        yy, xx = np.meshgrid(
            np.arange(self.h, dtype=np.float32) + 0.5,
            np.arange(self.w, dtype=np.float32) + 0.5,
            indexing="ij",
        )
        # intrinsics may be scalars or per-image arrays (DTU)
        fx = np.atleast_1d(np.asarray(self.intrins.fx, np.float32))[:, None, None]
        fy = np.atleast_1d(np.asarray(self.intrins.fy, np.float32))[:, None, None]
        cx = np.atleast_1d(np.asarray(self.intrins.cx, np.float32))[:, None, None]
        cy = np.atleast_1d(np.asarray(self.intrins.cy, np.float32))[:, None, None]
        xx = (xx[None] - cx) / fx
        yy = (yy[None] - cy) / fy
        zz = np.ones_like(xx + yy)
        dirs = np.stack(np.broadcast_arrays(xx, yy, zz), axis=-1)  # OpenCV
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = dirs.reshape(dirs.shape[0], -1, 3)
        if dirs.shape[0] == 1:
            dirs = np.broadcast_to(dirs, (self.n_images,) + dirs.shape[1:])
        dirs = (self.c2w[:, None, :3, :3] @ dirs[..., None])[..., 0]

        if factor != 1:
            import cv2

            gt = np.stack(
                [
                    cv2.resize(im, (self.w, self.h), interpolation=cv2.INTER_AREA)
                    for im in self.gt
                ]
            )
        else:
            gt = self.gt
        gt = gt.reshape(self.n_images, -1, 3)
        origins = np.broadcast_to(
            self.c2w[:, None, :3, 3], (self.n_images, self.h * self.w, 3)
        )
        mask = None
        if self.masks is not None:
            mask = self.masks.reshape(self.n_images, -1)

        if self.split == "train":
            origins = origins.reshape(-1, 3)
            dirs = dirs.reshape(-1, 3)
            gt = gt.reshape(-1, 3)
            if mask is not None:
                mask = mask.reshape(-1)

        self.rays_init = RayBatch(
            np.ascontiguousarray(origins, np.float32),
            np.ascontiguousarray(dirs, np.float32),
            np.ascontiguousarray(gt, np.float32),
            mask,
        )
        self.rays = self.rays_init

    def to_device(self):
        """Upload the full train ray set to the device once and mark the
        dataset DEVICE-RESIDENT: the Trainer then shuffles (permutation
        gather) and slices batches on device instead of streaming each
        batch over the host link. TPU-native data path — the reference
        keeps its whole shuffled ray table on the GPU too
        (dataset_base.py:73-78); on the axon relay (~0.5 MB/s host->device)
        per-batch streaming would dominate the step time.

        Datasets that can generate rays directly on device (synthetic)
        should instead set ``rays_dev`` themselves and skip the upload.
        """
        import jax.numpy as jnp

        r = self.rays_init
        self.rays_dev = {
            "origins": jnp.asarray(r.origins),
            "dirs": jnp.asarray(r.dirs),
            "gt": jnp.asarray(r.gt),
        }
        if r.mask is not None:
            self.rays_dev["mask"] = jnp.asarray(r.mask)
        return self

    def shuffle_rays(self, rng: np.random.Generator):
        """Epoch reshuffle (select_or_shuffle_rays, opt/util/util.py:80-99)."""
        if self.split != "train":
            return
        n = len(self.rays_init)
        perm = (
            rng.permutation(n)
            if self.permutation
            else rng.integers(0, n, self.epoch_size or n)
        )
        if self.epoch_size is not None:
            perm = perm[: self.epoch_size]
        # threaded native row gather when available (csrc/native.cpp) —
        # the reference reshuffles ~1e8 rays on GPU each epoch
        # (dataset_base.py:73-78); here the table lives host-side
        from ..utils import native

        r = self.rays_init
        o = native.shuffle_gather(r.origins, perm)
        if o is not None:
            self.rays = RayBatch(
                o,
                native.shuffle_gather(r.dirs, perm),
                native.shuffle_gather(r.gt, perm),
                None if r.mask is None
                else native.shuffle_gather(
                    r.mask.astype(np.float32).reshape(-1, 1), perm
                ).reshape(-1).astype(r.mask.dtype),
            )
            return
        self.rays = self.rays_init[perm]
