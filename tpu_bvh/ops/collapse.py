"""BVH2 -> BVH4 collapse as deterministic frontier BFS.

The reference runs a persistent kernel spinning on a global task queue with
atomic slot allocation (`/root/reference/src/TwoPassLbvhKernel.h:237-337`).
On TPU the same algorithm becomes a `lax.while_loop` over BFS frontiers:
each round expands every pending wide-node task in parallel (twice splitting
the largest-area internal child, giving <= 4 children,
`TwoPassLbvhKernel.h:270-296`) and allocates child slots with an exclusive
cumsum instead of `atomicAdd` — which makes the node order deterministic and
identical to the sequential CPU oracle (`Utility.cpp:540-611`).

Rounds = depth of the wide tree (~log4), each round a handful of masked
vector gathers — no spinning, no fences.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Bvh2, Bvh4
from . import aabb as A

I32 = jnp.int32
INVALID = jnp.int32(-1)


@jax.jit
def collapse_bvh2_to_bvh4(bvh: Bvh2) -> Bvh4:
    n_leaves = bvh.n_leaves
    n2_int = bvh.n_internal
    cap = max(n2_int, 1)
    node_areas = A.area(bvh.node_min, bvh.node_max)

    def expand(task_b2, todo):
        """Children of each pending task after two largest-area-internal
        expansions. Returns (ids i32[cap,4], count i32[cap])."""
        safe = jnp.clip(task_b2, 0, bvh.n_nodes - 1)
        ids = jnp.stack(
            [
                bvh.left[safe],
                bvh.right[safe],
                jnp.full((cap,), INVALID),
                jnp.full((cap,), INVALID),
            ],
            axis=1,
        )
        count = jnp.full((cap,), 2, I32)
        slot_ids = jnp.arange(4, dtype=I32)[None, :]
        for _ in range(2):
            is_int = (ids >= 0) & (ids < n2_int) & (slot_ids < count[:, None])
            areas = jnp.where(is_int, node_areas[jnp.clip(ids, 0, bvh.n_nodes - 1)], -1.0)
            pos = jnp.argmax(areas, axis=1).astype(I32)
            best = jnp.max(areas, axis=1)
            do = todo & (best > 0.0)  # strict > 0 as the reference's maxArea=0 start
            chosen = ids[jnp.arange(cap), pos]
            chosen_safe = jnp.clip(chosen, 0, bvh.n_nodes - 1)
            lc = bvh.left[chosen_safe]
            rc = bvh.right[chosen_safe]
            # replace expanded slot with its left child, append right child
            ids = jnp.where(
                do[:, None] & (slot_ids == pos[:, None]), lc[:, None], ids
            )
            ids = jnp.where(
                do[:, None] & (slot_ids == count[:, None]), rc[:, None], ids
            )
            count = jnp.where(do, count + 1, count)
        return ids, count

    def body(carry):
        (
            task_b2,
            task_parent,
            processed,
            alloc,
            child,
            cmin,
            cmax,
            parent,
            child_count,
            leaf_prim,
            leaf_parent,
        ) = carry
        todo = (task_b2 >= 0) & ~processed
        ids, count = expand(task_b2, todo)
        slot_ids = jnp.arange(4, dtype=I32)[None, :]
        in_count = slot_ids < count[:, None]
        is_int_child = todo[:, None] & in_count & (ids >= 0) & (ids < n2_int)
        is_leaf_child = todo[:, None] & in_count & (ids >= n2_int)

        # Deterministic slot allocation: exclusive cumsum across (task, slot)
        # in row-major order — BFS order, matching the CPU oracle.
        flat_int = is_int_child.reshape(-1)
        ranks = jnp.cumsum(flat_int.astype(I32)) - flat_int.astype(I32)
        new_ids = (alloc + ranks).reshape(cap, 4)
        n_new = jnp.sum(flat_int.astype(I32))

        ids_safe = jnp.clip(ids, 0, bvh.n_nodes - 1)
        child_new = jnp.where(
            is_int_child,
            new_ids,
            jnp.where(is_leaf_child, cap + (ids - n2_int), INVALID),
        )
        child = jnp.where(todo[:, None], child_new, child)
        cmin = jnp.where(
            todo[:, None, None], bvh.node_min[ids_safe], cmin
        )
        cmax = jnp.where(
            todo[:, None, None], bvh.node_max[ids_safe], cmax
        )
        child_count = jnp.where(todo, count, child_count)

        # enqueue new tasks (scatter with OOB drop for non-internal slots)
        tgt = jnp.where(is_int_child, new_ids, cap).reshape(-1)
        task_b2 = task_b2.at[tgt].set(ids.reshape(-1), mode="drop")
        task_parent = task_parent.at[tgt].set(
            jnp.repeat(jnp.arange(cap, dtype=I32), 4), mode="drop"
        )

        # record wide leaves
        leaf_slot = jnp.where(is_leaf_child, ids - n2_int, n_leaves).reshape(-1)
        leaf_prim = leaf_prim.at[leaf_slot].set(
            bvh.left[ids_safe].reshape(-1), mode="drop"
        )
        leaf_parent = leaf_parent.at[leaf_slot].set(
            jnp.repeat(jnp.arange(cap, dtype=I32), 4), mode="drop"
        )

        parent = jnp.where(todo, task_parent, parent)
        processed = processed | todo
        alloc = alloc + n_new
        return (
            task_b2,
            task_parent,
            processed,
            alloc,
            child,
            cmin,
            cmax,
            parent,
            child_count,
            leaf_prim,
            leaf_parent,
        )

    def cond(carry):
        task_b2, _tp, processed, *_ = carry
        return jnp.any((task_b2 >= 0) & ~processed)

    task_b2 = jnp.full((cap,), INVALID).at[0].set(bvh.root.astype(I32))
    task_parent = jnp.full((cap,), INVALID)
    processed = jnp.zeros((cap,), bool)
    alloc = jnp.ones((), I32)
    child = jnp.full((cap, 4), INVALID)
    cmin = jnp.zeros((cap, 4, 3), jnp.float32)
    cmax = jnp.zeros((cap, 4, 3), jnp.float32)
    parent = jnp.full((cap,), INVALID)
    child_count = jnp.zeros((cap,), I32)
    leaf_prim = jnp.full((n_leaves,), INVALID)
    leaf_parent = jnp.full((n_leaves,), INVALID)

    carry = lax.while_loop(
        cond,
        body,
        (
            task_b2,
            task_parent,
            processed,
            alloc,
            child,
            cmin,
            cmax,
            parent,
            child_count,
            leaf_prim,
            leaf_parent,
        ),
    )
    (
        task_b2,
        task_parent,
        processed,
        alloc,
        child,
        cmin,
        cmax,
        parent,
        child_count,
        leaf_prim,
        leaf_parent,
    ) = carry
    return Bvh4(
        child_min=cmin,
        child_max=cmax,
        child=child,
        parent=parent,
        child_count=child_count,
        n_nodes=alloc,
        leaf_prim=leaf_prim,
        leaf_parent=leaf_parent,
    )
