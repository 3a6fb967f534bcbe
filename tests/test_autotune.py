"""Autotune sweep runner: grid expansion, result collection, and the
worker pool (reference: opt/autotune.py:116-140 GPU worker pool)."""
import json
import time

from alphasurf_tpu.app import autotune


def test_product_configs():
    combos = list(autotune.product_configs({"a": [1, 2], "b": ["x"]}))
    assert combos == [{"a": 1, "b": "x"}, {"a": 2, "b": "x"}]


def test_parallel_pool_overlaps(tmp_path, monkeypatch):
    """3 experiments with workers=3 run concurrently (wall << 3x single)
    and each worker gets its own pinned device id."""
    spans = {}

    def fake_run(train_dir, data_dir, overrides, base=None, device=None):
        t0 = time.time()
        time.sleep(1.0)
        spans[train_dir] = (t0, time.time(), device)
        return {"psnr": 1.0}

    monkeypatch.setattr(autotune, "run_experiment", fake_run)
    spec = {
        "train_root": str(tmp_path),
        "data_root": "",
        "scenes": ["s1", "s2", "s3"],
        "base": {},
        "devices": ["0", "1", "2"],
    }
    spec_path = tmp_path / "task.json"
    spec_path.write_text(json.dumps(spec))
    t0 = time.time()
    autotune.main([str(spec_path)])
    wall = time.time() - t0
    assert len(spans) == 3
    assert wall < 2.5, f"pool did not parallelize: {wall:.1f}s for 3x1s jobs"
    # overlap: at least two spans intersect
    (a0, a1, _), (b0, b1, _) = list(spans.values())[:2]
    assert max(a0, b0) < min(a1, b1), "no overlap between workers"
    devs = sorted(d for _, _, d in spans.values())
    assert devs == ["0", "1", "2"]
    res = json.loads((tmp_path / "sweep_results.json").read_text())
    assert set(res) == {"s1", "s2", "s3"}
