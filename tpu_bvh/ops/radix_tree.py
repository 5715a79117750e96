"""LBVH radix-tree topology, the TPU way.

Two builders over the same (unique) radix tree on Morton-sorted keys:

* `karras_topology` — vectorized re-expression of Karras 2012
  (`/root/reference/src/TwoPassLbvhKernel.h:42-216`): per-internal-node
  direction + doubling range expansion + two binary searches, all as
  fixed-trip-count unrolled loops over the whole node array (data-parallel
  gathers, no divergence).

* `apetrei_topology` — the single-pass (Apetrei) construction
  (`/root/reference/src/SinglePassLbvhKernel.h:56-126`) re-derived without
  atomics: the radix tree is the max-Cartesian tree of the adjacent-key
  similarity array, each internal node lives at its own split boundary, and
  its leaf range follows from previous/next-smaller-value queries answered by
  a sparse-table descent. Parent links then follow from one comparison per
  node — the reference's racy "second arrival wins" climb disappears
  entirely.

Both produce identical trees (the radix tree over distinct keys is unique;
the reference's identical SAH costs for its two LBVH builders confirm the
same), with different internal-node index layouts, matching the reference's
two layouts.

Key tie-break: delta(i, j) = 32 + clz32(i ^ j) when codes are equal, else
clz32(code_i ^ code_j); out-of-range j gives -1 — exactly
`countCommonPrefixBits` (`TwoPassLbvhKernel.h:27-40`, note the ~0ull -> int
truncation that makes the out-of-range sentinel -1).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

I32 = jnp.int32
U32 = jnp.uint32


def _clz32(x):
    return lax.clz(x.astype(U32)).astype(I32)


def delta_at(codes, i, j):
    """Common-prefix length between sorted keys i and j with index
    augmentation on code ties; -1 where j is out of range. i, j: i32 arrays.
    """
    n = codes.shape[0]
    valid = (j >= 0) & (j < n)
    jc = jnp.clip(j, 0, n - 1)
    ci = codes[i]
    cj = codes[jc]
    x = ci ^ cj
    tie = 32 + _clz32(i.astype(U32) ^ jc.astype(U32))
    d = jnp.where(x == 0, tie, _clz32(x))
    return jnp.where(valid, d, -1)


def adjacent_deltas(codes):
    """delta(j, j+1) for j in [0, n-2] (the boundary similarity array)."""
    n = codes.shape[0]
    j = jnp.arange(n - 1, dtype=I32)
    return delta_at(codes, j, j + 1)


def _search_iters(n: int) -> int:
    return max(1, math.ceil(math.log2(max(n, 2)))) + 2


def karras_topology(codes):
    """Vectorized Karras build. codes: u32[n] sorted (with index tie-break
    semantics). Returns (left i32[2n-1], right i32[2n-1], parent i32[2n-1],
    first i32[n-1], last i32[n-1]).

    Node layout (`TwoPassLbvhKernel.h:196-216`): internal node i's children
    are node `split` (or leaf split) and node `split+1` (or leaf split+1);
    leaves are biased by n_internal. Root is internal node 0.
    """
    n = codes.shape[0]
    n_internal = n - 1
    iters = _search_iters(n)
    idx = jnp.arange(n_internal, dtype=I32)

    l_delta = delta_at(codes, idx, idx - 1)
    r_delta = delta_at(codes, idx, idx + 1)
    d = jnp.where(r_delta > l_delta, I32(1), I32(-1))
    delta_min = jnp.minimum(l_delta, r_delta)

    # Doubling upper bound for the range length (TwoPassLbvhKernel.h:57-74).
    lmax = jnp.full_like(idx, 2)
    growing = jnp.ones_like(idx, dtype=bool)
    for _ in range(iters):
        probe = delta_at(codes, idx, idx + d * lmax)
        growing = growing & (probe > delta_min)
        lmax = jnp.where(growing, lmax << 1, lmax)

    # Binary search for the far end (TwoPassLbvhKernel.h:76-92).
    l = jnp.zeros_like(idx)
    for k in range(1, iters + 1):
        t = lmax >> k
        probe = delta_at(codes, idx, idx + (l + t) * d)
        l = jnp.where((t > 0) & (probe > delta_min), l + t, l)

    jdx = idx + l * d
    first = jnp.minimum(idx, jdx)
    last = jnp.maximum(idx, jdx)

    # findSplit (TwoPassLbvhKernel.h:102-130): do-while binary search with the
    # exact same trip semantics (body runs once more after stride hits 1).
    delta_node = delta_at(codes, first, last)
    split = first
    stride = last - first
    active = jnp.ones_like(idx, dtype=bool)
    for _ in range(iters):
        stride = (stride + 1) >> 1
        middle = split + stride
        probe = delta_at(codes, first, middle)
        take = active & (middle < last) & (probe > delta_node)
        split = jnp.where(take, middle, split)
        active = active & (stride > 1)

    left = jnp.where(split == first, split + n_internal, split)
    right = jnp.where(split + 1 == last, split + 1 + n_internal, split + 1)

    n_nodes = 2 * n - 1
    left_full = jnp.full((n_nodes,), -1, I32).at[:n_internal].set(left)
    right_full = jnp.full((n_nodes,), -1, I32).at[:n_internal].set(right)
    parent = jnp.full((n_nodes,), -1, I32)
    parent = parent.at[left].set(idx)
    parent = parent.at[right].set(idx)
    return left_full, right_full, parent, first, last


def _sparse_min_tables(vals, levels: int):
    """T_k[i] = min(vals[i : i + 2^k]) with clamped windows."""
    n = vals.shape[0]
    tabs = [vals]
    cur = vals
    pos = jnp.arange(n, dtype=I32)
    for k in range(1, levels + 1):
        shift = 1 << (k - 1)
        cur = jnp.minimum(cur, cur[jnp.minimum(pos + shift, n - 1)])
        tabs.append(cur)
    return tabs


def _next_smaller(tabs, vals):
    """NSV(i) = least j > i with vals[j] < vals[i] via sparse-table descent;
    n (==len) where none exists."""
    n = vals.shape[0]
    pos = jnp.arange(n, dtype=I32) + 1  # candidate start
    levels = len(tabs) - 1
    for k in range(levels, -1, -1):
        width = 1 << k
        # window [pos, pos+width) entirely >= vals[i] -> skip it
        safe_pos = jnp.minimum(pos, n - 1)
        win_min = tabs[k][safe_pos]
        in_range = pos + width <= n
        skip = in_range & (win_min >= vals)
        pos = jnp.where(skip, pos + width, pos)
    # pos is the first j with vals[j] < vals[i], or >= n
    return pos


def nsv_psv(vals):
    """Next/previous strictly-smaller-value indices for each position.
    Returns (psv i32[n] in [-1, n-1], nsv i32[n] in [1, n])."""
    n = vals.shape[0]
    levels = max(1, math.ceil(math.log2(max(n, 2))))
    tabs = _sparse_min_tables(vals, levels)
    nsv = _next_smaller(tabs, vals)
    rev = vals[::-1]
    tabs_r = _sparse_min_tables(rev, levels)
    nsv_r = _next_smaller(tabs_r, rev)
    psv = (n - 1) - nsv_r[::-1]  # maps reversed NSV back; -1 where none
    return psv, nsv


def apetrei_topology(codes):
    """Single-pass-style build: every node's parent computed directly.

    Internal node i sits at boundary i (between sorted leaves i and i+1) and
    covers leaves [psv(i)+1, nsv(i)] of the adjacent-delta array; its parent
    is whichever external boundary has the longer common prefix — the exact
    relation Apetrei's climbing kernel discovers via atomics
    (`SinglePassLbvhKernel.h:64-126`), computed here in closed form.

    Returns (left, right, parent, first, last, root_idx).
    """
    n = codes.shape[0]
    n_internal = n - 1
    dlt = adjacent_deltas(codes)

    psv, nsv = nsv_psv(dlt)
    # Boundary j sits between leaves j and j+1. Node i's external boundaries
    # are psv(i) and nsv(i); its leaf range is therefore [psv+1, nsv]. nsv of
    # n-1 (== len(dlt), no smaller boundary to the right) already equals the
    # last leaf index, so no correction is needed on either side.
    first = psv + 1
    last = nsv

    idx = jnp.arange(n_internal, dtype=I32)
    # Parent boundary: the external boundary with larger delta (longer common
    # prefix). Out-of-range boundaries get -1 so the comparison never picks
    # them; the root has both external deltas == -1.
    left_b = first - 1
    right_b = last
    dl = jnp.where(left_b >= 0, dlt[jnp.maximum(left_b, 0)], -1)
    dr = jnp.where(right_b <= n_internal - 1, dlt[jnp.minimum(right_b, n_internal - 1)], -1)
    parent_of_internal = jnp.where(dl > dr, left_b, right_b)
    is_root = (first == 0) & (last == n - 1)
    parent_of_internal = jnp.where(is_root, I32(-1), parent_of_internal)
    internal_is_right_child = dl > dr  # attached at left external boundary

    # Leaves: leaf j covers [j, j]; external boundaries j-1 and j.
    jdx = jnp.arange(n, dtype=I32)
    ldl = jnp.where(jdx - 1 >= 0, dlt[jnp.maximum(jdx - 1, 0)], -1)
    ldr = jnp.where(jdx <= n_internal - 1, dlt[jnp.minimum(jdx, n_internal - 1)], -1)
    parent_of_leaf = jnp.where(ldl > ldr, jdx - 1, jdx)
    leaf_is_right_child = ldl > ldr

    n_nodes = 2 * n - 1
    parent = jnp.full((n_nodes,), -1, I32)
    parent = parent.at[idx].set(parent_of_internal)
    parent = parent.at[n_internal + jdx].set(parent_of_leaf)

    # Scatter child links. Each parent receives exactly one left and one
    # right child, so plain scatters are race-free; entries that don't apply
    # are routed out of bounds and dropped.
    left = jnp.full((n_nodes,), -1, I32)
    right = jnp.full((n_nodes,), -1, I32)
    oob = I32(n_nodes)
    tgt_i = jnp.where(is_root, oob, parent_of_internal)
    left = left.at[jnp.where(internal_is_right_child, oob, tgt_i)].set(
        idx, mode="drop"
    )
    right = right.at[jnp.where(internal_is_right_child, tgt_i, oob)].set(
        idx, mode="drop"
    )
    left = left.at[jnp.where(leaf_is_right_child, oob, parent_of_leaf)].set(
        n_internal + jdx, mode="drop"
    )
    right = right.at[jnp.where(leaf_is_right_child, parent_of_leaf, oob)].set(
        n_internal + jdx, mode="drop"
    )

    root_idx = jnp.argmax(is_root).astype(I32)
    return left, right, parent, first, last, root_idx
