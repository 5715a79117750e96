"""PLOC++ and HPLOC builder pipelines.

TPU equivalents of `/root/reference/src/PLOC++Bvh.cpp:16-210` and
`Hploc.cpp:16-180`: extents -> extended Morton -> sort -> agglomerative
clustering (one fused jit; the reference's per-round host readback loop
lives on-device in a `lax.while_loop`). Root is node 0 by the top-down
allocation convention; internal AABBs come out of the clustering itself
(no refit pass needed).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import ploc as ploc_ops
from ..types import Bvh2, PrimRefs
from . import lbvh

I32 = jnp.int32


def _build(
    tris, use_extended: bool, hploc: bool,
    shift0: int = 9, shift_step: int = 6,
) -> Bvh2:
    """Lane-major end-to-end: the sorted leaf columns feed the clustering
    matrix directly and the node SoA relayout happens exactly once."""
    refs = lbvh.prim_refs_from_triangles(tris)
    codes, leaf_packed_t, leaf_prim = lbvh._sorted_leaves_packed(
        refs, use_extended
    )
    n = refs.prim_idx.shape[0]

    left, right, int_packed_t = ploc_ops.ploc_build_topology_packed(
        leaf_packed_t, codes, hploc=hploc,
        shift0=shift0, shift_step=shift_step,
    )
    node_packed = jnp.concatenate([int_packed_t, leaf_packed_t], axis=1)
    left_full = jnp.concatenate([left, leaf_prim])
    right_full = jnp.concatenate([right, jnp.full((n,), -1, I32)])
    return Bvh2(
        packed_t=node_packed,
        left=left_full,
        right=right_full,
        root=jnp.zeros((), I32),
    )


@partial(jax.jit, static_argnames=("use_extended",))
def build_ploc(tris, use_extended: bool = True) -> Bvh2:
    """PLOC++ (`PLOC++Bvh.cpp`)."""
    return _build(tris, use_extended, hploc=False)


@partial(jax.jit, static_argnames=("use_extended",))
def build_hploc(tris, use_extended: bool = True) -> Bvh2:
    """HPLOC (`Hploc.cpp`): PLOC merges scheduled bottom-up through
    Morton-prefix (LBVH subtree) segments. The schedule starts at prefix
    shift 9 and coarsens 6 bits per round (swept on sponza_like: SAH
    281.2 vs 292.1 for the 3/+3 schedule — within 0.2% of unguided PLOC —
    while constraining only the first ~4 rounds)."""
    return _build(tris, use_extended, hploc=True)
