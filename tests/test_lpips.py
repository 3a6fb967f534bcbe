"""LPIPS-vgg implementation: architecture exercised with synthetic weight
files (real pretrained weights are not shippable in this environment; the
metric is gated on weight availability, calc_metrics.py:28-40)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from alphasurf_tpu.utils.lpips import _VGG16_CFG, make_lpips


def _fake_weights(tmp_path):
    g = torch.Generator().manual_seed(0)
    sd = {}
    in_ch, idx = 3, 0
    for v in _VGG16_CFG:
        if v == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.randn((v, in_ch, 3, 3), generator=g) * 0.05
        sd[f"features.{idx}.bias"] = torch.zeros(v)
        in_ch = v
        idx += 2  # conv + relu
    vggp = tmp_path / "vgg16.pth"
    torch.save(sd, vggp)
    lin = {}
    for k, ch in enumerate([64, 128, 256, 512, 512]):
        lin[f"lin{k}.model.1.weight"] = torch.rand((1, ch, 1, 1), generator=g)
    linp = tmp_path / "lpips_vgg.pth"
    torch.save(lin, linp)
    return str(vggp), str(linp)


def test_gated_when_no_weights(monkeypatch):
    monkeypatch.delenv("LPIPS_WEIGHTS_DIR", raising=False)
    assert make_lpips() is None


def test_lpips_metric_properties(tmp_path):
    vggp, linp = _fake_weights(tmp_path)
    m = make_lpips(vggp, linp)
    assert m is not None
    rng = np.random.default_rng(0)
    a = rng.random((64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    d_same = m(a, a)
    d_diff = m(a, b)
    assert abs(d_same) < 1e-6
    assert d_diff > 0
    # symmetric
    np.testing.assert_allclose(m(b, a), d_diff, rtol=1e-5)


def test_lpips_env_dir(tmp_path, monkeypatch):
    _fake_weights(tmp_path)
    monkeypatch.setenv("LPIPS_WEIGHTS_DIR", str(tmp_path))
    assert make_lpips() is not None
