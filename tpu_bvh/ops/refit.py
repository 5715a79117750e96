"""AABB refit for LBVH nodes — level-free, atomic-free.

The reference propagates leaf AABBs bottom-up with an atomic
"second-arrival-proceeds" climb (`TwoPassLbvhKernel.h:217-235`,
`SinglePassLbvhKernel.h:88-126`). On TPU we exploit a structural fact the
GPU code can't: every LBVH internal node covers a *contiguous* range of
Morton-sorted leaves, so its AABB is a range min/max over the leaf AABB
array. We answer all n-1 range queries with a rolling sparse table
(binary-lifting windows): O(log n) fully-vectorized rounds, no dependencies
between nodes, bit-deterministic.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

I32 = jnp.int32


def _floor_log2(x):
    return (31 - lax.clz(x.astype(jnp.uint32)).astype(I32)).astype(I32)


def refit_ranges(leaf_min, leaf_max, first, last):
    """AABBs for internal nodes covering sorted-leaf ranges [first, last].

    leaf_min/max: f32[n, 3] in Morton-sorted leaf order.
    first/last: i32[m] inclusive leaf ranges (last > first).
    Returns (node_min f32[m,3], node_max f32[m,3]).

    Sparse-table answer: with k = floor(log2(len)), the union of windows
    [first, first+2^k) and [last-2^k+1, last] covers the range exactly. The
    table is built level by level and queried for the nodes whose k matches,
    so only one level is resident at a time (O(n) memory).
    """
    n = leaf_min.shape[0]
    m = first.shape[0]
    levels = max(1, math.ceil(math.log2(max(n, 2))))
    length = last - first + 1
    k = _floor_log2(length)

    out_min = jnp.zeros((m, 3), leaf_min.dtype)
    out_max = jnp.zeros((m, 3), leaf_max.dtype)
    tab_min, tab_max = leaf_min, leaf_max
    pos = jnp.arange(n, dtype=I32)
    for level in range(levels + 1):
        if level > 0:
            shift = 1 << (level - 1)
            nxt = jnp.minimum(pos + shift, n - 1)
            tab_min = jnp.minimum(tab_min, tab_min[nxt])
            tab_max = jnp.maximum(tab_max, tab_max[nxt])
        sel = k == level
        b = jnp.maximum(last - (1 << level) + 1, 0)
        cand_min = jnp.minimum(tab_min[first], tab_min[b])
        cand_max = jnp.maximum(tab_max[first], tab_max[b])
        out_min = jnp.where(sel[:, None], cand_min, out_min)
        out_max = jnp.where(sel[:, None], cand_max, out_max)
    return out_min, out_max
