"""LLFF forward-facing dataset loader (poses_bounds.npy) with NDC rays.

Compact port of /root/reference/opt/util/llff_dataset.py + load_llff.py:
pose recentering, world scaling by near bound, NDC coefficients, held-out
test split every ``llffhold`` images.
"""
from __future__ import annotations

import os
from os import path
from typing import Optional

import numpy as np

from .base import DatasetBase, Intrin


def _normalize(x):
    return x / np.linalg.norm(x)


def _viewmatrix(z, up, pos):
    vec2 = _normalize(z)
    vec1_avg = up
    vec0 = _normalize(np.cross(vec1_avg, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def _poses_avg(poses):
    hwf = poses[0, :3, -1:]
    center = poses[:, :3, 3].mean(0)
    vec2 = _normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return np.concatenate([_viewmatrix(vec2, up, center), hwf], 1)


def _recenter_poses(poses):
    poses_ = poses.copy()
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    c2w = _poses_avg(poses)
    c2w = np.concatenate([c2w[:3, :4], bottom], -2)
    bottom = np.tile(np.reshape(bottom, [1, 1, 4]), [poses.shape[0], 1, 1])
    poses44 = np.concatenate([poses[:, :3, :4], bottom], -2)
    poses44 = np.linalg.inv(c2w) @ poses44
    poses_[:, :3, :4] = poses44[:, :3, :4]
    return poses_


class LLFFDataset(DatasetBase):
    def __init__(
        self,
        root: str,
        split: str,
        epoch_size: Optional[int] = None,
        scene_scale: Optional[float] = None,
        factor: int = 4,
        scale: Optional[float] = None,
        permutation: bool = True,
        llffhold: int = 8,
        bd_factor: float = 0.75,
        **kwargs,
    ):
        super().__init__()
        import imageio.v2 as imageio

        assert path.isdir(root), f"'{root}' is not a directory"
        self.permutation = permutation
        self.epoch_size = epoch_size
        self.split = split

        poses_bounds = np.load(path.join(root, "poses_bounds.npy"))
        poses = poses_bounds[:, :-2].reshape(-1, 3, 5)  # (N,3,5)
        bds = poses_bounds[:, -2:]

        # pick an image dir (prefer pre-downsampled images_{factor})
        img_dir = path.join(root, f"images_{factor}")
        used_factor = factor
        if not path.isdir(img_dir):
            img_dir = path.join(root, "images")
            used_factor = 1
        img_files = sorted(
            x for x in os.listdir(img_dir)
            if x.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        imgs = np.stack(
            [imageio.imread(path.join(img_dir, f))[..., :3] for f in img_files]
        ).astype(np.float32) / 255.0
        assert imgs.shape[0] == poses.shape[0], "image/pose count mismatch"

        # llff convention -> standard: [down right back] -> [right up back]
        poses = np.concatenate(
            [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], 2
        )
        hwf = poses[0, :3, 4].copy()
        hwf[:2] = imgs.shape[1:3]
        hwf[2] /= used_factor

        # rescale world by near bound
        sc = 1.0 if bd_factor is None else 1.0 / (bds.min() * bd_factor)
        poses[:, :3, 3] *= sc
        bds = bds * sc
        poses = _recenter_poses(poses)

        # OpenGL -> OpenCV (flip y,z columns)
        c2w = np.eye(4, dtype=np.float32)[None].repeat(len(poses), 0)
        c2w[:, :3, :3] = poses[:, :3, :3] * np.array([1, -1, -1], np.float32)
        c2w[:, :3, 3] = poses[:, :3, 3]

        i_test = np.arange(len(imgs))[::llffhold] if llffhold > 0 else []
        sel = (
            np.array([i for i in range(len(imgs)) if i not in i_test])
            if split == "train"
            else np.asarray(i_test, int)
        )
        self.c2w = c2w[sel]
        self.gt = imgs[sel]
        self.n_images, self.h_full, self.w_full, _ = self.gt.shape

        H, W, f = hwf
        self.intrins_full = Intrin(f, f, W * 0.5, H * 0.5)
        self.ndc_coeffs = (2 * f / W, 2 * f / H)
        self.scene_scale = 1.0
        self.use_sphere_bound = False
        self.should_use_background = False
        self.scene_center = [0.0, 0.0, 0.0]
        self.scene_radius = [1.0, 1.0, 1.0]
        if split == "train":
            self.gen_rays(factor=1)
        else:
            self.h, self.w = self.h_full, self.w_full
            self.intrins = self.intrins_full
