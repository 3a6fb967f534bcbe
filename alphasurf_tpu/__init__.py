"""alphasurf_tpu — TPU-native αSurf framework (JAX / XLA / Pallas).

From-scratch re-design of ChikaYan/alphasurf (reference mounted at
/root/reference) for TPU: sparse voxel grid with decoupled SDF geometry,
alpha opacity and SH color; exact ray/iso-surface intersection rendering;
full training pipeline. See SURVEY.md for the blueprint.
"""
from . import defs
from .core.grid import SparseGrid, create_grid
from .core.options import RenderOptions
from .core.rays import Camera, Rays
from .core.sh import eval_sh_bases
from .render.compat import volume_render, volume_render_nvol, volume_render_svox1
from .render.cuvol import volume_render_cuvol
from .render.surface import volume_render_surface, volume_render_surface_compact

__version__ = "0.1.0"

__all__ = [
    "defs",
    "SparseGrid",
    "create_grid",
    "RenderOptions",
    "Camera",
    "Rays",
    "eval_sh_bases",
    "volume_render",
    "volume_render_cuvol",
    "volume_render_nvol",
    "volume_render_svox1",
    "volume_render_surface",
    "volume_render_surface_compact",
]
