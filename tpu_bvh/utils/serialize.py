"""BVH serialization: save a built tree, reload for traversal-only runs.

The reference has no persistence (SURVEY.md §5 — every run rebuilds; only
PNGs are written). This is the checkpoint/resume capability the rebuild
adds: `.npz` round-trip of any engine struct (Bvh2/Bvh4/PrimRefs/...).
"""
from __future__ import annotations

import numpy as np

from ..types import Bvh2, Bvh4

_TYPES = {"Bvh2": Bvh2, "Bvh4": Bvh4}


def save_bvh(path: str, bvh) -> None:
    kind = type(bvh).__name__
    if kind not in _TYPES:
        raise TypeError(f"unsupported type {kind}")
    arrays = {f: np.asarray(v) for f, v in zip(bvh._fields, bvh)}
    np.savez_compressed(path, __kind__=np.array(kind), **arrays)


def load_bvh(path: str):
    import jax.numpy as jnp

    with np.load(path) as data:
        kind = str(data["__kind__"])
        cls = _TYPES[kind]
        # tolerate files written before a defaulted field existed (e.g.
        # Bvh4.root): NamedTuple defaults fill the gap
        return cls(
            **{f: jnp.asarray(data[f]) for f in cls._fields if f in data}
        )
