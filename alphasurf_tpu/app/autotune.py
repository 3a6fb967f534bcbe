"""Multi-experiment sweep runner.

Equivalent of /root/reference/opt/autotune.py: a JSON task spec describes a
base config + per-experiment overrides + scenes; experiments run as
subprocesses with results scraped from ``eval stats:`` lines and skipped if
already complete (test_psnr.txt present — autotune.py:48-57).

The reference parallelizes over GPUs via CUDA_VISIBLE_DEVICES
(autotune.py:116-140); here a thread pool drives ``--workers`` concurrent
training subprocesses, each pinned to one chip of the host via
TPU_VISIBLE_DEVICES (the TPU analog of the reference's env pinning) — or
unpinned CPU processes for CPU sweeps. Workers pull experiments from a
shared queue exactly like the reference's per-GPU worker loop.
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import re
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from os import path


def product_configs(param_grid: dict):
    """Cartesian product of param values (config_generator.py:1-83)."""
    keys = list(param_grid.keys())
    for combo in itertools.product(*[param_grid[k] for k in keys]):
        yield dict(zip(keys, combo))


def run_experiment(train_dir, data_dir, overrides, base_args=None,
                   device: str | None = None):
    if path.isfile(path.join(train_dir, "test_psnr.txt")):
        print(f"skip {train_dir} (already complete)")
        with open(path.join(train_dir, "test_psnr.txt")) as f:
            return json.load(f)
    os.makedirs(train_dir, exist_ok=True)
    cmd = [sys.executable, "-m", "alphasurf_tpu.app.train", data_dir,
           "-t", train_dir]
    for k, v in {**(base_args or {}), **overrides}.items():
        cmd += [f"--{k}", json.dumps(v) if not isinstance(v, str) else v]
    env = dict(os.environ)
    if device is not None:
        # one chip per worker (the reference pins CUDA_VISIBLE_DEVICES,
        # autotune.py:118-121)
        env["TPU_VISIBLE_DEVICES"] = device
        env["TPU_PROCESS_BOUNDS"] = "1,1,1"
    print("run:", " ".join(cmd))
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
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
                                      "scenes, base, param_grid, devices}")
    ap.add_argument("--workers", type=int, default=0,
                    help="concurrent experiments (0 = one per device in "
                         "the spec's 'devices' list, else 1)")
    args = ap.parse_args(argv)
    spec = json.load(open(args.task_json))
    devices = spec.get("devices")  # e.g. ["0", "1", "2", "3"] chip ids
    workers = args.workers or (len(devices) if devices else 1)

    jobs = []
    grid_entries = list(product_configs(spec.get("param_grid", {}))) or [{}]
    for scene in spec.get("scenes", [""]):
        for i, overrides in enumerate(grid_entries):
            name = f"{scene}_{i}" if len(grid_entries) > 1 else scene
            jobs.append((
                name,
                path.join(spec.get("train_root", "sweep"), name),
                path.join(spec.get("data_root", ""), scene),
                overrides,
            ))

    results = {}

    def run_one(idx_job):
        idx, (name, train_dir, data_dir, overrides) = idx_job
        dev = devices[idx % len(devices)] if devices else None
        r = run_experiment(train_dir, data_dir, overrides, spec.get("base"),
                           device=dev)
        print(f"{name}: {r}")
        return name, r

    if workers > 1:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            for name, r in pool.map(run_one, enumerate(jobs)):
                results[name] = r
    else:
        for j in enumerate(jobs):
            name, r = run_one(j)
            results[name] = r
    out = path.join(spec.get("train_root", "sweep"), "sweep_results.json")
    os.makedirs(path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
