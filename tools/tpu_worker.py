"""Long-lived TPU worker: executes queued python snippets in one process.

The axon relay makes process startup/chip-claim expensive (PERF.md), so all
TPU experiments run inside one persistent process. Protocol: drop
``NNN_name.py`` files into the queue dir; the worker executes them in order
inside a shared namespace (so expensive state — grids, jitted fns — persists
between jobs), writing ``NNN_name.out`` with stdout+traceback and moving the
job to ``done/``.

Usage: python tools/tpu_worker.py [queue_dir=/tmp/tpuq]
Stop:  drop a file whose contents are exactly ``STOP``.
"""
import io
import os
import sys
import time
import traceback
from contextlib import redirect_stderr, redirect_stdout

QDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpuq"
os.makedirs(QDIR, exist_ok=True)
os.makedirs(os.path.join(QDIR, "done"), exist_ok=True)

sys.path.insert(0, "/root/repo")

NS = {"__name__": "__tpu_worker__"}

# claim the device eagerly so a wedged grant is visible at startup
import jax
import jax.numpy as jnp
_t0 = time.time()
jnp.zeros(8).block_until_ready()
print(f"device claimed in {time.time()-_t0:.1f}s: {jax.devices()}", flush=True)

print(f"worker ready, watching {QDIR}", flush=True)
while True:
    jobs = sorted(
        f for f in os.listdir(QDIR)
        if f.endswith(".py") and os.path.isfile(os.path.join(QDIR, f))
    )
    if not jobs:
        time.sleep(0.5)
        continue
    job = jobs[0]
    path = os.path.join(QDIR, job)
    with open(path) as f:
        src = f.read()
    if src.strip() == "STOP":
        os.rename(path, os.path.join(QDIR, "done", job))
        print("worker stopping", flush=True)
        break
    # stream output incrementally so long jobs can be monitored live
    out = os.path.join(QDIR, job[:-3] + ".out")
    t0 = time.time()
    status = "OK"
    with open(out, "w", buffering=1) as buf:
        buf.write(f"# RUNNING {job}\n")
        try:
            with redirect_stdout(buf), redirect_stderr(buf):
                exec(compile(src, job, "exec"), NS)
        except BaseException:
            buf.write(traceback.format_exc())
            status = "ERROR"
        buf.write(f"# {status} in {time.time()-t0:.1f}s\n")
    os.rename(path, os.path.join(QDIR, "done", job))
    print(f"{job}: {status} ({time.time()-t0:.1f}s)", flush=True)
