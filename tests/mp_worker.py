"""Worker for the multi-process (multi-host simulation) test: joins a
2-process jax.distributed job on CPU, shards the global ray batch across
the global mesh, runs one full surface train step, prints the loss."""
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from alphasurf_tpu.parallel.distributed import (
    global_mesh,
    init_multihost,
    local_ray_slice,
)

active = init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
assert active, "distributed init failed"

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import __graft_entry__ as ge
import alphasurf_tpu as at
from alphasurf_tpu.train.steps import HParams, StepConfig, init_rms, make_surface_step

BATCH = 64
grid, origins, dirs, opt = ge._make_setup(reso=16, batch=BATCH)
mesh = global_mesh(model=1)
rays_sh = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())

s, e = local_ray_slice(BATCH)


def to_global(x):
    return jax.make_array_from_process_local_data(
        rays_sh, np.asarray(x)[s:e], (BATCH,) + x.shape[1:]
    )


g_origins = to_global(origins)
g_dirs = to_global(dirs)
g_gt = to_global(np.zeros((BATCH, 3), np.float32))

grid = jax.device_put(grid, repl)
rms = jax.device_put(init_rms(grid), repl)

step = make_surface_step(StepConfig(opt=opt, cache_size=None))
hp = HParams(
    lr_alpha=1e-2, lr_surface=1e-3, lr_sh=1e-2,
    lambda_tv_alpha=1e-5, lambda_tv_surface=1e-4,
    lambda_normal_l1=1e-6, lambda_l_entropy=1e-4,
)
new_grid, new_rms, stats = step(
    grid, rms, at.Rays(g_origins, g_dirs), g_gt, hp, jax.random.PRNGKey(0)
)
print(f"MP_LOSS {float(stats['loss']):.10f}", flush=True)
print(f"MP_OK proc={pid} devices={len(jax.devices())}", flush=True)
