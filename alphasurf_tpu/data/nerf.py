"""NeRF-synthetic (Blender) dataset loader.

Re-design of /root/reference/opt/util/nerf_dataset.py: transforms_*.json +
PNGs, OpenGL->OpenCV pose flip (nerf_dataset.py:77-82), white-background
alpha compositing (:104-109), scene_scale 2/3 (:46-47).
"""
from __future__ import annotations

import json
from os import path
from typing import Optional

import numpy as np

from .base import DatasetBase, Intrin


class NeRFDataset(DatasetBase):
    def __init__(
        self,
        root: str,
        split: str,
        epoch_size: Optional[int] = None,
        scene_scale: Optional[float] = None,
        factor: int = 1,
        scale: Optional[float] = None,
        permutation: bool = True,
        white_bkgd: bool = True,
        n_images: Optional[int] = None,
        **kwargs,
    ):
        super().__init__()
        import imageio.v2 as imageio

        assert path.isdir(root), f"'{root}' is not a directory"
        if scene_scale is None:
            scene_scale = 2 / 3
        if scale is None:
            scale = 1.0
        self.permutation = permutation
        self.epoch_size = epoch_size

        split_name = split if split != "test_train" else "train"
        data_path = path.join(root, split_name)
        data_json = path.join(root, "transforms_" + split_name + ".json")
        j = json.load(open(data_json, "r"))

        cam_trans = np.diag(np.array([1, -1, -1, 1], dtype=np.float32))
        all_c2w, all_gt = [], []
        for frame in j["frames"]:
            fpath = path.join(data_path, path.basename(frame["file_path"]) + ".png")
            c2w = np.asarray(frame["transform_matrix"], dtype=np.float32) @ cam_trans
            im_gt = imageio.imread(fpath)
            if scale < 1.0:
                import cv2

                h, w = im_gt.shape[:2]
                im_gt = cv2.resize(
                    im_gt, (round(w * scale), round(h * scale)),
                    interpolation=cv2.INTER_AREA,
                )
            all_c2w.append(c2w)
            all_gt.append(im_gt)

        focal = float(0.5 * all_gt[0].shape[1] / np.tan(0.5 * j["camera_angle_x"]))
        self.c2w = np.stack(all_c2w)
        self.c2w[:, :3, 3] *= scene_scale
        gt = np.stack(all_gt).astype(np.float32) / 255.0
        if gt.shape[-1] == 4:
            if white_bkgd:
                gt = gt[..., :3] * gt[..., 3:] + (1.0 - gt[..., 3:])
            else:
                gt = gt[..., :3]
        self.gt = gt
        self.n_images, self.h_full, self.w_full, _ = gt.shape
        if n_images is not None and n_images < self.n_images:
            self.n_images = n_images
            self.gt = self.gt[:n_images]
            self.c2w = self.c2w[:n_images]

        self.intrins_full = Intrin(focal, focal, self.w_full * 0.5, self.h_full * 0.5)
        self.split = split
        self.scene_scale = scene_scale
        self.should_use_background = False
        if split == "train":
            self.gen_rays(factor=factor)
        else:
            self.h, self.w = self.h_full, self.w_full
            self.intrins = self.intrins_full
