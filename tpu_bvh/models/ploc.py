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


def _build(tris, use_extended: bool, hploc: bool) -> Bvh2:
    refs = lbvh.prim_refs_from_triangles(tris)
    codes, leaf_min, leaf_max, leaf_prim = lbvh._sorted_leaves(refs, use_extended)
    n = refs.prim_idx.shape[0]

    left, right, imin, imax = ploc_ops.ploc_build_topology(
        leaf_min, leaf_max, codes, hploc=hploc
    )
    node_min = jnp.concatenate([imin, leaf_min], axis=0)
    node_max = jnp.concatenate([imax, leaf_max], axis=0)
    n_nodes = 2 * n - 1
    left_full = jnp.concatenate([left, leaf_prim])
    right_full = jnp.concatenate([right, jnp.full((n,), -1, I32)])
    return Bvh2(
        node_min=node_min,
        node_max=node_max,
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
    Morton-prefix (LBVH subtree) segments."""
    return _build(tris, use_extended, hploc=True)
