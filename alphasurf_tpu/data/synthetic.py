"""Procedural synthetic dataset (no files needed).

Renders ground-truth images of a known SDF grid with the framework's own
renderer from orbit cameras. Used by tests, the training smoke pipeline and
bench.py — the analog of the reference's synthetic gradcheck fixtures
(test/test_render_gradcheck_surface.py:26-77) extended to a full dataset.
"""
from __future__ import annotations

import numpy as np

from .. import defs
from ..core.grid import create_grid
from ..core.options import RenderOptions
from ..core.rays import Camera
from .base import DatasetBase, Intrin


def pose_spherical(azimuth_deg: float, elevation_deg: float, radius: float):
    """OpenCV c2w looking at origin from spherical coordinates."""
    az = np.deg2rad(azimuth_deg)
    el = np.deg2rad(elevation_deg)
    eye = radius * np.array(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)]
    )
    forward = -eye / np.linalg.norm(eye)  # +z toward origin (OpenCV)
    up = np.array([0.0, 0.0, -1.0])
    right = np.cross(forward, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right = right / np.linalg.norm(right)
    down = np.cross(forward, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = forward
    c2w[:3, 3] = eye
    return c2w


def make_gt_grid(reso=32, seed=0, basis_dim=4, dtype=None):
    """A positive-inside SDF sphere with smooth random SH color and
    semi-transparent alpha — exercises the full surface-render path."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    g = create_grid(
        reso, radius=1.0, basis_dim=basis_dim,
        surface_type=defs.SURFACE_TYPE_SDF, surface_init=None,
        init_sigma=3.0,
    )
    # explicit sphere of radius reso/4, positive inside (reference SDF
    # convention, svox2.py:3059)
    rr = [np.arange(r, dtype=np.float32) for r in g.reso]
    X, Y, Z = np.meshgrid(*rr, indexing="ij")
    c = np.asarray(g.reso, np.float32) / 2.0
    rs = np.sqrt((X - c[0]) ** 2 + (Y - c[1]) ** 2 + (Z - c[2]) ** 2)
    sdf = (min(g.reso) / 4.0 - rs).reshape(-1, 1).astype(np.float32)
    g = g.replace(surface_data=jnp.asarray(sdf, dtype))
    rng = np.random.default_rng(seed)
    coords = np.stack(
        np.meshgrid(*[np.arange(r) for r in g.reso], indexing="ij"), axis=-1
    ).reshape(-1, 3) / max(g.reso)
    # smooth low-frequency SH color field
    freqs = rng.normal(size=(3, basis_dim * 3)) * 2.0
    phase = rng.uniform(0, 2 * np.pi, basis_dim * 3)
    sh = 0.35 * np.sin(coords @ freqs * 2 * np.pi / 4 + phase)
    return g.replace(sh_data=jnp.asarray(sh, dtype))


class SyntheticDataset(DatasetBase):
    """Orbit-camera dataset rendered from ``make_gt_grid``."""

    def __init__(
        self,
        root: str = "",  # unused; registry compatibility
        split: str = "train",
        n_images: int | None = 20,
        width: int = 64,
        height: int = 64,
        reso: int = 32,
        seed: int = 0,
        epoch_size=None,
        permutation: bool = True,
        renderer: str = "dense",
        device_resident: bool = False,
        **kwargs,
    ):
        super().__init__()
        import functools

        import jax
        import jax.numpy as jnp

        from ..render.surface import (
            volume_render_surface,
            volume_render_surface_packed,
        )

        n_images = 20 if n_images is None else n_images
        self.permutation = permutation
        self.epoch_size = epoch_size
        self.split = split
        gt_grid = make_gt_grid(reso=reso, seed=seed)
        self.gt_grid = gt_grid

        opt = RenderOptions(
            sigma_thresh=-1e9, stop_thresh=-1.0, only_outward_intersect=True
        )
        if renderer == "packed":
            # fast GT path for larger reso (bench_scaling / dryrun / recipe
            # runs): the packed pool renderer matches the dense walk
            # bit-exactly while the pool holds all crossings. Images render
            # in fixed 64k-ray chunks (one jit specialization; a full
            # 800x800 pool would transiently allocate several GB).
            _chunk_render = jax.jit(functools.partial(
                volume_render_surface_packed, entries_per_ray=16.0
            ), static_argnums=2)
            CH = 65536

            def render(g, rays, opt):
                from ..core.rays import Rays as _Rays

                n = rays.origins.shape[0]
                if n <= CH:
                    return _chunk_render(g, rays, opt)
                parts = []
                for s in range(0, n, CH):
                    e = min(s + CH, n)
                    s_eff = e - CH  # tail chunk overlaps; head rows trimmed
                    o = jax.lax.dynamic_slice_in_dim(rays.origins, s_eff, CH)
                    d = jax.lax.dynamic_slice_in_dim(rays.dirs, s_eff, CH)
                    rgb = _chunk_render(g, _Rays(o, d), opt)["rgb"]
                    parts.append(rgb[s - s_eff:])
                return {"rgb": jnp.concatenate(parts, axis=0)}
        else:
            render = functools.partial(volume_render_surface)
        rng = np.random.default_rng(seed + (0 if split == "train" else 1))
        focal = 1.2 * width
        if device_resident:
            # full ray set + GT generated and KEPT on device (bulk data
            # never crosses the slow host link); host side keeps only poses
            assert split == "train", "device_resident is a train-split mode"
            c2ws, o_all, d_all, rgb_all = [], [], [], []
            for i in range(n_images):
                az = 360.0 * i / n_images + rng.uniform(0, 10)
                el = rng.uniform(-60, 60)
                c2w = pose_spherical(az, el, 2.7)
                cam = Camera.make(c2w, fx=focal, width=width, height=height)
                rays = (cam.gen_rays_device() if renderer == "packed"
                        else cam.gen_rays())
                out = render(gt_grid, rays, opt)
                o_all.append(rays.origins)
                d_all.append(rays.dirs)
                rgb_all.append(jnp.clip(out["rgb"], 0.0, 1.0))
                c2ws.append(c2w)
            self.c2w = np.stack(c2ws)
            self.rays_dev = {
                "origins": jnp.concatenate(o_all),
                "dirs": jnp.concatenate(d_all),
                "gt": jnp.concatenate(rgb_all),
            }
            self.gt = None  # host images not materialized in this mode
            self.n_images, self.h_full, self.w_full = n_images, height, width
            self.intrins_full = Intrin(focal, focal, width * 0.5, height * 0.5)
            self.scene_scale = 1.0
            self.should_use_background = False
            self.h, self.w = height, width
            self.intrins = self.intrins_full
            return
        c2ws, imgs = [], []
        for i in range(n_images):
            az = 360.0 * i / n_images + rng.uniform(0, 10)
            el = rng.uniform(-60, 60)
            c2w = pose_spherical(az, el, 2.7)
            cam = Camera.make(c2w, fx=focal, width=width, height=height)
            rays = (cam.gen_rays_device() if renderer == "packed"
                    else cam.gen_rays())
            out = render(gt_grid, rays, opt)
            imgs.append(np.asarray(out["rgb"]).reshape(height, width, 3))
            c2ws.append(c2w)
        self.c2w = np.stack(c2ws)
        self.gt = np.clip(np.stack(imgs), 0.0, 1.0).astype(np.float32)
        self.n_images, self.h_full, self.w_full = n_images, height, width
        self.intrins_full = Intrin(focal, focal, width * 0.5, height * 0.5)
        self.scene_scale = 1.0
        self.should_use_background = False
        if split == "train":
            self.gen_rays()
        else:
            self.h, self.w = height, width
            self.intrins = self.intrins_full
