"""Pytree dataclass helper.

JAX-idiomatic replacement for the reference's ``nn.Module``-based containers
(e.g. ``svox2.SparseGrid``, /root/reference/svox2/svox2.py:560): immutable
dataclasses registered as pytrees so they flow through ``jit`` / ``grad`` /
``shard_map`` directly.
"""
from __future__ import annotations

import dataclasses
from typing import Any

from jax import tree_util


def pytree_dataclass(cls: Any = None, *, meta_fields: tuple = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta_fields`` are static (hashable, part of the treedef); all other
    fields are traced leaves.
    """

    def wrap(c):
        c = dataclasses.dataclass(c, frozen=True)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )

        def _replace(self, **kw):
            return dataclasses.replace(self, **kw)

        c.replace = _replace
        tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        return c

    return wrap(cls) if cls is not None else wrap
