"""Multi-host orchestration: jax.distributed init + global meshes.

TPU-native multi-host layer (SURVEY.md §2.4(d)): the reference is strictly
single-process/single-GPU; here every process joins a coordination service
(`jax.distributed.initialize`), sees the global device set, and participates
in a global mesh. Collectives ride ICI within a slice and DCN across
slices — all inserted by XLA from sharding annotations.

Environment-driven init (standard TPU pod / GKE conventions): when launched
under a cluster manager that sets the coordinator address, arguments may be
omitted entirely; for manual bring-up pass coordinator/num/id explicitly.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join the multi-process job. Returns True if distributed mode is
    active (more than one process), False for single-process runs.

    Arguments default to the JAX_* / cluster-env autodetection built into
    ``jax.distributed.initialize``; explicit values win.
    """
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto = any(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                  "TPU_WORKER_HOSTNAMES", "SLURM_JOB_ID")
    )
    if not explicit and not auto and num_processes is None:
        return False  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_count() > 1


def process_info():
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_mesh(data: Optional[int] = None, model: int = 1,
                axis_names=("data", "model")) -> Mesh:
    """Global (data, model) mesh over ALL processes' devices. ``data``
    defaults to n_devices // model. Device order follows jax.devices(), so
    the data axis strides across hosts last (ray shards stay host-local)."""
    devs = np.asarray(jax.devices())
    n = len(devs)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devs.reshape(data, model), axis_names)


def local_ray_slice(n_rays_global: int):
    """[start, end) of this process's contiguous shard of a global ray
    batch (each host feeds only its local shard; jax.make_array_from_
    process_local_data assembles the global array)."""
    pc, pi = jax.process_count(), jax.process_index()
    per = n_rays_global // pc
    return pi * per, (pi + 1) * per if pi < pc - 1 else n_rays_global
