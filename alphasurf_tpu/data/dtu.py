"""DTU real-capture dataset loader (IDR format).

Port of /root/reference/opt/util/dtu_dataset.py: ``cameras_sphere.npz``
P-matrix decomposition (:16-37), foreground masks applied to gt and carried
as per-ray masks, per-image intrinsics.
"""
from __future__ import annotations

from os import path
from pathlib import Path
from typing import Optional

import numpy as np

from .base import DatasetBase, Intrin


def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection into intrinsics + c2w pose
    (dtu_dataset.py:16-37)."""
    import cv2

    out = cv2.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


class DTUDataset(DatasetBase):
    def __init__(
        self,
        root: str,
        split: str,
        epoch_size: Optional[int] = None,
        scene_scale: Optional[float] = None,
        factor: int = 1,
        scale: Optional[float] = 1.0,
        permutation: bool = True,
        white_bkgd: bool = True,
        apply_mask: bool = True,
        **kwargs,
    ):
        super().__init__()
        import imageio.v2 as imageio

        assert path.isdir(root), f"'{root}' is not a directory"
        scene_scale = 1.0 if scene_scale is None else scene_scale
        scale = 1.0 if scale is None else scale
        self.permutation = permutation
        self.epoch_size = epoch_size

        img_paths = sorted((Path(root) / "image").glob("*"))
        mask_paths = sorted((Path(root) / "mask").glob("*"))
        self.n_images = len(img_paths)
        cams = np.load(str(Path(root) / "cameras_sphere.npz"))
        scale_mats = [cams[f"scale_mat_{i}"].astype(np.float32) for i in range(self.n_images)]
        world_mats = [cams[f"world_mat_{i}"].astype(np.float32) for i in range(self.n_images)]
        self.pt_rescale = scale_mats[0]

        all_c2w, all_gt, all_mask, intrins = [], [], [], []
        for i in range(self.n_images):
            P = (world_mats[i] @ scale_mats[i])[:3, :4]
            K, pose = load_K_Rt_from_P(P)
            intrins.append(K)
            all_c2w.append(pose)
            im = imageio.imread(str(img_paths[i]))
            msk = imageio.imread(str(mask_paths[i]))[..., :3]
            if scale < 1.0:
                import cv2

                h, w = im.shape[:2]
                sz = (round(w * scale), round(h * scale))
                im = cv2.resize(im, sz, interpolation=cv2.INTER_AREA)
                msk = cv2.resize(msk, sz, interpolation=cv2.INTER_AREA)
            if apply_mask:
                im = im.copy()
                im[msk < 50] = 255 if white_bkgd else 0
            all_gt.append(im)
            all_mask.append(msk)

        self.c2w = np.stack(all_c2w)
        self.c2w[:, :3, 3] *= scene_scale
        self.gt = np.stack(all_gt).astype(np.float32) / 255.0
        if self.gt.shape[-1] == 4:
            if white_bkgd:
                self.gt = self.gt[..., :3] * self.gt[..., 3:] + (1.0 - self.gt[..., 3:])
            else:
                self.gt = self.gt[..., :3]
        self.masks = (np.stack(all_mask)[..., 0] >= 50)
        _, self.h_full, self.w_full, _ = self.gt.shape

        K = np.stack(intrins)
        self.intrins_full = Intrin(
            K[:, 0, 0] * scale, K[:, 1, 1] * scale,
            K[:, 0, 2] * scale, K[:, 1, 2] * scale,
        )
        self.split = split
        self.scene_scale = scene_scale
        self.should_use_background = False
        self.use_sphere_bound = True
        if split == "train":
            self.gen_rays(factor=factor)
        else:
            self.h, self.w = self.h_full, self.w_full
            self.intrins = self.intrins_full
