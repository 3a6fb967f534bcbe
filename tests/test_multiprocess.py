"""Multi-host simulation: two OS processes join a jax.distributed job on
CPU (2 local devices each -> 4 global), shard the ray batch over the global
mesh, and run one full surface train step. The loss must agree across
processes AND with a single-process run of the same step (SURVEY §2.4(d))."""
import os
import socket
import subprocess
import sys
from os import path

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_step():
    here = path.dirname(__file__)
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, path.join(here, "mp_worker.py"), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    losses = []
    for i, out in enumerate(outs):
        assert f"MP_OK proc={i} devices=4" in out, f"worker {i}:\n{out[-3000:]}"
        losses.append(
            float([l for l in out.splitlines() if l.startswith("MP_LOSS")][0].split()[1])
        )
    assert losses[0] == losses[1]

    # single-process oracle on the same batch
    import jax

    import __graft_entry__ as ge
    import alphasurf_tpu as at
    from alphasurf_tpu.train.steps import (
        HParams, StepConfig, init_rms, make_surface_step,
    )
    import jax.numpy as jnp

    grid, origins, dirs, opt = ge._make_setup(reso=16, batch=64)
    step = make_surface_step(StepConfig(opt=opt, cache_size=None))
    hp = HParams(
        lr_alpha=1e-2, lr_surface=1e-3, lr_sh=1e-2,
        lambda_tv_alpha=1e-5, lambda_tv_surface=1e-4,
        lambda_normal_l1=1e-6, lambda_l_entropy=1e-4,
    )
    _, _, stats = step(
        grid, init_rms(grid), at.Rays(origins, dirs),
        jnp.zeros((64, 3), jnp.float32), hp, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(losses[0], float(stats["loss"]),
                               rtol=1e-6, atol=1e-9)
