"""Fused optimizer steps (functional).

Equivalents of the reference RMSprop/SGD CUDA kernels
(/root/reference/svox2/csrc/optim_kernel.cu:28-153) and their Python wrappers
(svox2.py:5972-6206). The reference updates parameters in-place over a sparse
indexer; here updates are pure functions over full arrays — XLA fuses the
elementwise chain into one pass, and cells with zero gradient see rms decay
only when touched (we mask by grad != 0 to mirror the sparse-indexer
semantics of only stepping visited cells).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class RMSState(NamedTuple):
    rms: jnp.ndarray


def rmsprop_init(param: jnp.ndarray) -> RMSState:
    return RMSState(rms=jnp.zeros_like(param))


def rmsprop_step(
    param: jnp.ndarray,
    state: RMSState,
    grad: jnp.ndarray,
    lr: float,
    beta: float = 0.9,
    epsilon: float = 1e-8,
    minval: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
):
    """One RMSprop step. ``mask`` (broadcastable bool) restricts the update to
    visited cells, mirroring the sparse indexer (svox2.py:6314-6333)."""
    if mask is None:
        mask = jnp.any(grad != 0, axis=-1, keepdims=True)
    new_rms = jnp.where(mask, beta * state.rms + (1 - beta) * grad * grad, state.rms)
    upd = lr * grad / (jnp.sqrt(new_rms) + epsilon)
    new_param = jnp.where(mask, param - upd, param)
    if minval is not None:
        new_param = jnp.maximum(new_param, minval)
    return new_param, RMSState(rms=new_rms)


def sgd_step(param, grad, lr: float, mask=None):
    if mask is None:
        mask = jnp.any(grad != 0, axis=-1, keepdims=True)
    return jnp.where(mask, param - lr * grad, param)
