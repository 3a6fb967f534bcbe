"""Dataset registry + auto detection (opt/util/dataset.py:8-33)."""
from os import path

from .base import DatasetBase, Intrin, RayBatch
from .nerf import NeRFDataset
from .synthetic import SyntheticDataset


def auto_dataset(root: str, *args, **kwargs):
    if path.isfile(path.join(root, "poses_bounds.npy")):
        from .llff import LLFFDataset

        return LLFFDataset(root, *args, **kwargs)
    if path.isfile(path.join(root, "transforms_train.json")) or path.isfile(
        path.join(root, "transforms.json")
    ):
        return NeRFDataset(root, *args, **kwargs)
    if path.isfile(path.join(root, "cameras_sphere.npz")) or path.isfile(
        path.join(root, "cameras_large.npz")
    ):
        from .dtu import DTUDataset

        return DTUDataset(root, *args, **kwargs)
    from .nsvf import NSVFDataset

    return NSVFDataset(root, *args, **kwargs)


def _lazy(name):
    def make(root, *a, **kw):
        import importlib

        mod = importlib.import_module(f"alphasurf_tpu.data.{name.lower()}")
        return getattr(mod, f"{name}Dataset")(root, *a, **kw)

    return make


datasets = {
    "auto": auto_dataset,
    "nerf": NeRFDataset,
    "synthetic": SyntheticDataset,
    "llff": _lazy("LLFF"),
    "dtu": _lazy("DTU"),
    "nsvf": _lazy("NSVF"),
    "co3d": _lazy("CO3D"),
}
