"""Render options.

Mirrors ``svox2.RenderOptions`` (/root/reference/svox2/svox2.py:21-105).
Static dataclass — all fields are compile-time constants under jit (changing
an option retraces, matching how the reference re-marshals specs per launch).
"""
from __future__ import annotations

import dataclasses

from .. import defs


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    backend: str = "surf_trav"

    background_brightness: float = 1.0
    step_size: float = 0.5
    sigma_thresh: float = 1e-10
    stop_thresh: float = 1e-7
    last_sample_opaque: bool = False
    near_clip: float = 0.0
    use_spheric_clip: bool = False

    # surface-mode knobs (svox2.py:58-67)
    surf_fake_sample: bool = False
    surf_fake_sample_min_vox_len: float = 0.1
    limited_fake_sample: bool = False
    no_surf_grad_from_sh: bool = False
    alpha_activation_type: int = defs.EXP_FN
    fake_sample_l_dist: bool = True
    fake_sample_normalize_surf: bool = True
    only_outward_intersect: bool = False
    truncated_vol_render: bool = False
    trunc_vol_weight_min: float = 0.0

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)
