"""CO3D dataset loader.

Port of /root/reference/opt/util/co3d_dataset.py: gzip'd
``frame_annotations.jgz`` per category, NDC-style viewpoint intrinsics
converted to pixels, pose convention flip, cached index, per-sequence
loading with pose-outlier filtering and similarity normalization
(co3d_dataset.py:29-252).

Deviation (documented): our DatasetBase generates rays on a uniform (h, w)
per split, so after the max_image_dim rescale all frames of the selected
sequence are resized to the sequence's most common image size (CO3D
sequences are near-uniform; intrinsics are rescaled accordingly).
"""
from __future__ import annotations

import gzip
import json
import os
from os import path
from typing import Optional

import numpy as np

from .base import DatasetBase, Intrin


def similarity_from_cameras(c2w: np.ndarray):
    """Similarity transform normalizing a camera set
    (opt/util/util.py:389-443)."""
    t = c2w[:, :3, 3]
    R = c2w[:, :3, :3]

    ups = np.sum(R * np.array([0, -1.0, 0]), axis=-1)
    world_up = np.mean(ups, axis=0)
    world_up /= np.linalg.norm(world_up)

    up_camspace = np.array([0.0, -1.0, 0.0])
    c = (up_camspace * world_up).sum()
    cross = np.cross(world_up, up_camspace)
    skew = np.array([
        [0.0, -cross[2], cross[1]],
        [cross[2], 0.0, -cross[0]],
        [-cross[1], cross[0], 0.0],
    ])
    if c > -1:
        R_align = np.eye(3) + skew + (skew @ skew) / (1 + c)
    else:
        R_align = np.diag([-1.0, 1.0, 1.0])

    R = R_align @ R
    fwds = np.sum(R * np.array([0, 0.0, 1.0]), axis=-1)
    t = (R_align @ t[..., None])[..., 0]

    nearest = t + (fwds * -t).sum(-1)[:, None] * fwds
    translate = -np.median(nearest, axis=0)

    transform = np.eye(4)
    transform[:3, 3] = translate
    transform[:3, :3] = R_align
    scale = 1.0 / np.median(np.linalg.norm(t + translate, axis=-1))
    return transform, scale


class CO3DDataset(DatasetBase):
    """CO3D multi-category dataset; loads one sequence at a time."""

    def __init__(
        self,
        root: str,
        split: str,
        seq_id: Optional[int] = 0,
        epoch_size: Optional[int] = None,
        permutation: bool = True,
        max_image_dim: int = 800,
        max_pose_dist: float = 5.0,
        cam_scale_factor: float = 0.95,
        hold_every: int = 8,
        cache_dir: str = "co3d_tmp",
        **kwargs,
    ):
        super().__init__()
        self.split = split
        self.permutation = permutation
        self.epoch_size = epoch_size
        self.data_dir = root
        self.max_image_dim = max_image_dim
        self.max_pose_dist = max_pose_dist
        self.cam_scale_factor = cam_scale_factor
        self.hold_every = hold_every
        self.should_use_background = True
        self.use_sphere_bound = True

        os.makedirs(cache_dir, exist_ok=True)
        index_file = path.join(cache_dir, "co3d_index.npz")
        if path.exists(index_file):
            z = np.load(index_file, allow_pickle=True)
            self.seq_cats = list(z["seq_cats"])
            self.seq_names = list(z["seq_names"])
            self.seq_offsets = z["seq_offsets"]
            self.all_image_size = z["image_size"]  # (N, 2) w, h
            self.image_path = list(z["image_path"])
            self.image_pose = z["pose"]
            self.fxy = z["fxy"]
            self.cxy = z["cxy"]
        else:
            self._build_index(root, index_file)
        self.n_seq = len(self.seq_names)

        if seq_id is not None:
            self.load_sequence(seq_id)

    def _build_index(self, root, index_file):
        """Parse frame_annotations.jgz of every category
        (co3d_dataset.py:78-154)."""
        cats = sorted(
            x for x in os.listdir(root) if path.isdir(path.join(root, x))
        )
        cam_trans = np.diag(np.array([-1, -1, 1, 1], dtype=np.float32))
        by_seq = {}
        for cat in cats:
            fp = path.join(root, cat, "frame_annotations.jgz")
            if not path.isfile(fp):
                continue
            with gzip.open(fp, "r") as f:
                frames = json.load(f)
            for fr in frames:
                seq = cat + "//" + fr["sequence_name"]
                H, W = fr["image"]["size"]
                half_wh = np.array([W * 0.5, H * 0.5], dtype=np.float32)
                R = np.array(fr["viewpoint"]["R"])
                T = np.array(fr["viewpoint"]["T"])
                focal = np.array(fr["viewpoint"]["focal_length"]) * half_wh
                prp = -1.0 * (np.array(fr["viewpoint"]["principal_point"]) - 1.0) * half_wh
                pose = np.zeros((4, 4))
                pose[:3, :3] = R
                pose[:3, 3:] = -R @ T[..., None]
                pose[3, 3] = 1.0
                pose = pose @ cam_trans
                by_seq.setdefault(seq, []).append({
                    "frame_number": fr["frame_number"],
                    "image_path": fr["image"]["path"],
                    "image_size": np.array([W, H]),
                    "pose": pose, "fxy": focal, "cxy": prp,
                })
        self.seq_cats, self.seq_names, self.seq_offsets = [], [], []
        self.image_path, sizes, poses, fxy, cxy = [], [], [], [], []
        for k in by_seq:
            fd = sorted(by_seq[k], key=lambda x: x["frame_number"])
            cat, name = k.split("//")
            self.seq_cats.append(cat)
            self.seq_names.append(name)
            self.seq_offsets.append(len(self.image_path))
            self.image_path.extend(x["image_path"] for x in fd)
            sizes.extend(x["image_size"] for x in fd)
            poses.extend(x["pose"] for x in fd)
            fxy.extend(x["fxy"] for x in fd)
            cxy.extend(x["cxy"] for x in fd)
        self.all_image_size = np.stack(sizes)
        self.image_pose = np.stack(poses)
        self.fxy = np.stack(fxy)
        self.cxy = np.stack(cxy)
        self.seq_offsets.append(len(self.image_path))
        self.seq_offsets = np.asarray(self.seq_offsets)
        np.savez(
            index_file,
            seq_cats=self.seq_cats, seq_names=self.seq_names,
            seq_offsets=self.seq_offsets, image_size=self.all_image_size,
            image_path=self.image_path, pose=self.image_pose,
            fxy=self.fxy, cxy=self.cxy,
        )

    def load_sequence(self, sequence_id: int):
        """Load one sequence: split by hold_every, rescale to max_image_dim,
        filter pose outliers, similarity-normalize (co3d_dataset.py:166-252)."""
        import cv2

        self.curr_seq_cat = self.seq_cats[sequence_id]
        self.curr_seq_name = self.seq_names[sequence_id]
        s, e = self.seq_offsets[sequence_id], self.seq_offsets[sequence_id + 1]

        gts, c2ws, ref_c2ws = [], [], []
        fxs, fys, cxs, cys, sizes = [], [], [], [], []
        for i in range(s, e):
            is_train = i % self.hold_every != 0
            ref_c2ws.append(self.image_pose[i])
            if self.split.endswith("train") != is_train:
                continue
            im = cv2.imread(path.join(self.data_dir, self.image_path[i]))
            im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
            h, w, _ = im.shape
            approx_scale = self.max_image_dim / max(h, w)
            if approx_scale < 1.0:
                h2, w2 = int(approx_scale * h), int(approx_scale * w)
                im = cv2.resize(im, (w2, h2), interpolation=cv2.INTER_AREA)
            else:
                h2, w2 = h, w
            scale = np.array([w2 / w, h2 / h], np.float32)
            sizes.append((h2, w2))
            fxy = self.fxy[i] * scale
            cxy = self.cxy[i] * scale
            fxs.append(fxy[0]); fys.append(fxy[1])
            cxs.append(cxy[0]); cys.append(cxy[1])
            gts.append(im)
            c2ws.append(self.image_pose[i])

        c2w = np.stack(c2ws)
        ref_c2ws = np.stack(ref_c2ws)

        # pose-outlier filter (co3d_dataset.py:224-231)
        dists = np.linalg.norm(
            c2w[:, :3, 3] - np.median(c2w[:, :3, 3], axis=0), axis=-1
        )
        good = dists < np.median(dists) * self.max_pose_dist
        c2w = c2w[good]
        gts = [g for g, ok in zip(gts, good) if ok]
        sizes = [sz for sz, ok in zip(sizes, good) if ok]
        fxs, fys, cxs, cys = (
            np.asarray(a, np.float32)[good] for a in (fxs, fys, cxs, cys)
        )

        # unify to the sequence's most common image size (see module doc)
        hw_common = max(set(sizes), key=sizes.count)
        h0, w0 = hw_common
        for i, (g, (h, w)) in enumerate(zip(gts, sizes)):
            if (h, w) != hw_common:
                gts[i] = cv2.resize(g, (w0, h0), interpolation=cv2.INTER_AREA)
                fxs[i] *= w0 / w; cxs[i] *= w0 / w
                fys[i] *= h0 / h; cys[i] *= h0 / h

        T, sscale = similarity_from_cameras(ref_c2ws)
        c2w = T @ c2w
        c2w[:, :3, 3] *= self.cam_scale_factor * sscale

        self.c2w = c2w.astype(np.float32)
        self.gt = np.stack(gts)
        self.n_images = len(gts)
        self.h_full, self.w_full = h0, w0
        self.intrins_full = Intrin(fxs, fys, cxs, cys)
        self.scene_center = [0.0, 0.0, 0.0]
        self.scene_radius = [1.0, 1.0, 1.0]

        if self.split == "train":
            self.gen_rays(factor=1)
        else:
            self.intrins = self.intrins_full
