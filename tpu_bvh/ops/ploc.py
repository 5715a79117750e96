"""PLOC++ agglomerative clustering — and its HPLOC-style guided variant.

TPU re-expression of the reference's PLOC++ kernels
(`/root/reference/src/Ploc++Kernel.h:98-362`) and HPLOC
(`HplocKernel.h:220-314`). The reference's machinery — shared-memory chunks
with aprons, warp-ballot prefix sums, atomicMin-encoded nearest neighbors,
cross-block serialized offsets — exists to emulate what a vector machine
does natively:

* nearest-neighbor search within Morton-order radius 8 = 8 shifted
  whole-array AABB unions + a lexicographic (area, index) min-reduction
  (the reference's `(float_bits(area) << 32) | index` atomicMin encoding,
  `Ploc++Kernel.h:140-146`, without the atomics);
* mutual-pair merge + compaction = masked cumsums and scatters;
* the host `while (nClusters > 1)` loop with its per-round device->host
  readback (`PLOC++Bvh.cpp:132-152`) = one `lax.while_loop` carrying
  `n_clusters` on device.

Merged nodes are allocated top-down (`nClusters - 2 - prefix`,
`Ploc++Kernel.h:311`) so the root lands at index 0 — the same convention,
but deterministic (in cluster order) instead of warp-race order.

The HPLOC variant (`hploc=True`) restricts merges to clusters sharing a
Morton-prefix segment and coarsens the prefix whenever a round makes no
progress — merging bottom-up within LBVH subtrees, the role the reference's
warp-cooperative `plocMerge` plays inside LBVH ranges (`HplocKernel.h:257-314`).
Same output family (root at 0, separate-leaf indexing); the subtree schedule
is prefix-quantized rather than exact-range, which is the honest TPU mapping
of that warp choreography.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..types import PLOC_RADIUS
from . import aabb as A

I32 = jnp.int32
U32 = jnp.uint32
INVALID = jnp.int32(-1)
_BIG = jnp.float32(3.0e38)


def _nearest_neighbors(cmin, cmax, seg, n_clusters, radius: int):
    """nn[i] = index of i's preferred merge partner among clusters within
    +-radius in sorted order (masked by validity and segment equality),
    minimizing (union area, neighbor index) lexicographically."""
    n = cmin.shape[0]
    idx = jnp.arange(n, dtype=I32)
    valid = idx < n_clusters

    best_area = jnp.full((n,), _BIG)
    best_idx = jnp.full((n,), n, I32)  # sentinel larger than any index

    def consider(area, nbr, ok):
        nonlocal best_area, best_idx
        area = jnp.where(ok, area, _BIG)
        nbr = jnp.where(ok, nbr, n)
        better = (area < best_area) | ((area == best_area) & (nbr < best_idx))
        best_area = jnp.where(better, area, best_area)
        best_idx = jnp.where(better, nbr, best_idx)

    for d in range(1, radius + 1):
        # forward pair (i, i+d): compute once, consider from both ends
        j_min = jnp.minimum(idx + d, n - 1)
        umin = jnp.minimum(cmin, cmin[j_min])
        umax = jnp.maximum(cmax, cmax[j_min])
        area = A.area(umin, umax)
        pair_ok = valid & (idx + d < n_clusters) & (seg == seg[j_min])
        consider(area, idx + d, pair_ok)  # i's candidate i+d
        # shift to express (i-d, i) as i's backward candidate
        area_b = jnp.roll(area, d)
        ok_b = jnp.roll(pair_ok, d) & valid
        consider(area_b, idx - d, ok_b)

    return best_idx


def ploc_build_topology(
    leaf_min, leaf_max, codes, hploc: bool = False, radius: int = PLOC_RADIUS
):
    """Agglomerate Morton-sorted leaves into a BVH2 topology.

    leaf_min/max: f32[n,3] sorted leaf AABBs; codes: u32[n] sorted Morton
    codes (used only by the HPLOC segment schedule).
    Returns (left i32[2n-1], right i32[2n-1], node_min f32[n-1,3],
    node_max f32[n-1,3]) — internal nodes only in node_min/max; root = 0.
    """
    n = leaf_min.shape[0]
    n_internal = n - 1
    idx = jnp.arange(n, dtype=I32)

    # cluster state: node id, AABB, segment key
    init_nodes = idx + n_internal  # leaf ids
    if hploc:
        init_shift = jnp.asarray(3, I32)  # start with fine 27-bit prefixes
    else:
        init_shift = jnp.asarray(32, I32)  # single segment == plain PLOC

    def seg_of(code, shift):
        return jnp.where(shift >= 32, U32(0), code >> shift.astype(U32))

    left = jnp.full((n_internal,), INVALID)
    right = jnp.full((n_internal,), INVALID)
    imin = jnp.zeros((n_internal, 3), jnp.float32)
    imax = jnp.zeros((n_internal, 3), jnp.float32)

    def cond(carry):
        return carry[0] > 1

    def body(carry):
        (n_clusters, cnode, cmin, cmax, ccode, shift, left, right, imin, imax) = carry
        valid = idx < n_clusters
        seg = seg_of(ccode, shift)
        nn = _nearest_neighbors(cmin, cmax, seg, n_clusters, radius)

        nn_safe = jnp.clip(nn, 0, n - 1)
        mutual = valid & (nn < n) & (nn[nn_safe] == idx)
        merge = mutual & (idx < nn)  # left partner performs the merge
        dropped = mutual & (idx > nn)

        rank = jnp.cumsum(merge.astype(I32)) - merge.astype(I32)
        n_merged = jnp.sum(merge.astype(I32))
        new_id = n_clusters - 2 - rank  # top-down allocation

        # write merged internal nodes
        lchild = cnode
        rchild = cnode[nn_safe]
        umin = jnp.minimum(cmin, cmin[nn_safe])
        umax = jnp.maximum(cmax, cmax[nn_safe])
        tgt = jnp.where(merge, new_id, n_internal)  # OOB drop
        left = left.at[tgt].set(lchild, mode="drop")
        right = right.at[tgt].set(rchild, mode="drop")
        imin = imin.at[tgt].set(umin, mode="drop")
        imax = imax.at[tgt].set(umax, mode="drop")

        # Compact surviving clusters (merged node replaces its left partner)
        # by one stable key-value sort on the keep flag — ~6x cheaper than
        # the scatters it replaces on TPU.
        keep = valid & ~dropped
        cnode = jnp.where(merge, new_id, jnp.where(keep, cnode, INVALID))
        cmin_k = jnp.where(merge[:, None], umin, cmin)
        cmax_k = jnp.where(merge[:, None], umax, cmax)
        sort_key = (~keep).astype(jnp.uint32)
        (_, cnode, ccode, m0, m1, m2, x0, x1, x2) = lax.sort(
            (
                sort_key,
                cnode,
                ccode,
                cmin_k[:, 0],
                cmin_k[:, 1],
                cmin_k[:, 2],
                cmax_k[:, 0],
                cmax_k[:, 1],
                cmax_k[:, 2],
            ),
            num_keys=1,
            is_stable=True,
        )
        cmin_new = jnp.stack([m0, m1, m2], axis=1)
        cmax_new = jnp.stack([x0, x1, x2], axis=1)

        # HPLOC: coarsen the segment prefix when a round stalls
        shift = jnp.where(n_merged == 0, jnp.minimum(shift + 3, 32), shift)
        n_clusters = n_clusters - n_merged
        return (
            n_clusters,
            cnode,
            cmin_new,
            cmax_new,
            ccode,
            shift,
            left,
            right,
            imin,
            imax,
        )

    carry = (
        jnp.asarray(n, I32),
        init_nodes,
        leaf_min,
        leaf_max,
        codes,
        init_shift,
        left,
        right,
        imin,
        imax,
    )
    carry = lax.while_loop(cond, body, carry)
    _, _, _, _, _, _, left, right, imin, imax = carry
    return left, right, imin, imax
