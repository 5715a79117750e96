"""SAH cost metrics — the reference's quality/regression oracle.

jnp re-implementations of `calculateLbvhCost` / `calculatebvh4Cost` /
`calculateBinnedSahBvhCost` (`/root/reference/src/Utility.cpp:317-422`),
formula-exact (ci = ct = 1, areas normalized by the root area, root counted
once at ct). Expected parity values: bunny ~22.6 / sponza ~59.5 post
collapse (`README.md:61,81`).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import aabb as A


def sah_cost_bvh2(bvh) -> jnp.ndarray:
    """`calculateLbvhCost` (`Utility.cpp:317-349`): ct for the root + ct per
    internal-node child + ci per leaf, all area-weighted."""
    n_internal = bvh.n_internal
    areas = A.area(bvh.node_min, bvh.node_max)
    root = bvh.root
    inv_root = 1.0 / areas[root]
    left = bvh.left[:n_internal]
    right = bvh.right[:n_internal]
    cost = 1.0
    cost = cost + jnp.sum(areas[left] * inv_root) + jnp.sum(areas[right] * inv_root)
    cost = cost + jnp.sum(areas[n_internal:] * inv_root)
    return cost


def sah_cost_bvh4(bvh4, prim_aabb_min, prim_aabb_max) -> jnp.ndarray:
    """`calculatebvh4Cost` (`Utility.cpp:351-396`): ct per wide internal
    child + ci per wide leaf (leaf areas from the *original* primitive
    AABBs), normalized by the root AABB area."""
    cap = bvh4.n_internal_cap
    child = bvh4.child  # i32[K,4]
    cmin = bvh4.child_min
    cmax = bvh4.child_max

    root_valid = child[bvh4.root] >= 0
    root_min = jnp.min(
        jnp.where(root_valid[:, None], cmin[bvh4.root], jnp.inf), axis=0
    )
    root_max = jnp.max(
        jnp.where(root_valid[:, None], cmax[bvh4.root], -jnp.inf), axis=0
    )
    inv_root = 1.0 / A.area(root_min, root_max)

    # used-slot mask by child_count: holds for both the dense queue-ordered
    # numbering (used slots = prefix) and the sparse fast-collapse numbering
    is_used = (bvh4.child_count > 0)[:, None]
    is_internal_child = (child >= 0) & (child < cap) & is_used
    child_areas = A.area(cmin, cmax)
    cost = 1.0 + jnp.sum(jnp.where(is_internal_child, child_areas, 0.0)) * inv_root

    leaf_areas = A.area(prim_aabb_min[bvh4.leaf_prim], prim_aabb_max[bvh4.leaf_prim])
    cost = cost + jnp.sum(leaf_areas) * inv_root
    return cost
