"""Pytree helpers: a tiny decorator to register dataclasses as JAX pytrees.

Fields marked ``static=True`` become part of the treedef (hashable, trigger
recompilation when changed); everything else is a leaf container.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax


def register_pytree_dataclass(cls: Any) -> Any:
    """Class decorator: register a ``dataclasses.dataclass`` as a JAX pytree.

    Fields with ``metadata={'static': True}`` are treated as auxiliary
    (static) data.
    """
    fields = dataclasses.fields(cls)
    data_names = tuple(f.name for f in fields if not f.metadata.get("static", False))
    static_names = tuple(f.name for f in fields if f.metadata.get("static", False))

    def flatten(obj):
        children = tuple(getattr(obj, name) for name in data_names)
        aux = tuple(getattr(obj, name) for name in static_names)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(data_names, children))
        kwargs.update(dict(zip(static_names, aux)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def static_field(**kwargs):
    """A dataclass field that is static (part of the pytree treedef)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)
