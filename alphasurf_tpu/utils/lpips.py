"""LPIPS (VGG) perceptual metric.

Faithful implementation of the LPIPS-vgg metric used by the reference's
calc_metrics (/root/reference/opt/calc_metrics.py:31: ``lpips.LPIPS(net=
'vgg')``): torchvision-layout VGG16 feature trunk, per-channel unit
normalization, learned 1x1 linear heads, spatial averaging.

This environment has no network access and ships neither torchvision
weights nor the lpips package, so pretrained weights must be provided as
files. ``make_lpips`` looks for them at ``$LPIPS_WEIGHTS_DIR`` (or the
explicit paths given) and returns ``None`` when unavailable — callers
report LPIPS only when the metric exists (calc_metrics prints lpips only
when computable).

Expected weight files (standard state dicts, torch.save format):
  * vgg16.pth        torchvision ``vgg16(weights=IMAGENET1K_V1)`` state dict
                     (``features.N.weight/bias`` keys)
  * lpips_vgg.pth    lpips package ``LPIPS(net='vgg')`` lin state dict
                     (``lin{k}.model.1.weight`` keys)
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

# VGG16 "features" layout (torchvision): conv indices per block
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]
# feature taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_SLICE_ENDS = (4, 9, 16, 23, 30)
_CHNS = (64, 128, 256, 512, 512)


def _build_vgg_features():
    import torch.nn as nn

    layers = []
    in_ch = 3
    for v in _VGG16_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(in_ch, v, kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_ch = v
    return nn.Sequential(*layers)


class LPIPSVgg:
    """Callable LPIPS-vgg metric over numpy images in [0, 1]."""

    def __init__(self, vgg_state: dict, lin_state: dict):
        import torch
        import torch.nn as nn

        self.torch = torch
        self.features = _build_vgg_features()
        feat_sd = {
            k.split("features.", 1)[1]: v
            for k, v in vgg_state.items()
            if k.startswith("features.")
        }
        self.features.load_state_dict(feat_sd)
        self.features.eval()
        for p in self.features.parameters():
            p.requires_grad_(False)

        self.lins = []
        for k, ch in enumerate(_CHNS):
            lin = nn.Conv2d(ch, 1, 1, bias=False)
            w = None
            for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
                if key in lin_state:
                    w = lin_state[key]
            if w is None:
                raise KeyError(f"lin weights for tap {k} not found")
            lin.weight.data = w
            lin.eval()
            self.lins.append(lin)

        # input scaling constants (lpips.ScalingLayer)
        self.shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        self.scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def _feats(self, x):
        outs = []
        h = x
        prev = 0
        for end in _SLICE_ENDS:
            for i in range(prev, end):
                h = self.features[i](h)
            prev = end
            outs.append(h)
        return outs

    @staticmethod
    def _unit_normalize(t, eps=1e-10):
        n = (t ** 2).sum(dim=1, keepdim=True).sqrt()
        return t / (n + eps)

    def __call__(self, img0: np.ndarray, img1: np.ndarray) -> float:
        """LPIPS distance between two (H, W, 3) images in [0, 1]."""
        torch = self.torch
        with torch.no_grad():
            def prep(im):
                t = torch.from_numpy(
                    np.asarray(im, np.float32).transpose(2, 0, 1)[None]
                )
                t = t * 2.0 - 1.0  # [-1, 1]
                return (t - self.shift) / self.scale

            f0 = self._feats(prep(img0))
            f1 = self._feats(prep(img1))
            val = 0.0
            for k in range(len(_CHNS)):
                d = (self._unit_normalize(f0[k]) - self._unit_normalize(f1[k])) ** 2
                val = val + self.lins[k](d).mean(dim=(2, 3))
            return float(val.reshape(()))


def make_lpips(
    vgg_path: Optional[str] = None, lin_path: Optional[str] = None
) -> Optional[LPIPSVgg]:
    """Construct the metric if weight files exist, else None (gated dep)."""
    base = os.environ.get("LPIPS_WEIGHTS_DIR", "")
    vgg_path = vgg_path or (os.path.join(base, "vgg16.pth") if base else "")
    lin_path = lin_path or (os.path.join(base, "lpips_vgg.pth") if base else "")
    if not (vgg_path and lin_path and os.path.isfile(vgg_path)
            and os.path.isfile(lin_path)):
        return None
    import torch

    vgg_state = torch.load(vgg_path, map_location="cpu", weights_only=True)
    lin_state = torch.load(lin_path, map_location="cpu", weights_only=True)
    return LPIPSVgg(vgg_state, lin_state)
