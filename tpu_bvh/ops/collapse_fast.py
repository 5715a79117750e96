"""Fast BVH2 -> BVH4 collapse for boundary-layout (single-pass LBVH) trees.

Same greedy algorithm as the reference's persistent-kernel collapse
(`/root/reference/src/TwoPassLbvhKernel.h:237-337`; CPU oracle
`Utility.cpp:540-611`): starting at the root, each wide node expands its
largest-area internal child twice (<= 4 children); expanded ("absorbed")
nodes disappear, the rest become wide children. The output TREE is
identical to the oracle's — same wide-node set, same slots, same AABBs,
same SAH — but numbered SPARSELY: wide node x keeps its bvh2 node index
(unused slots have child_count == 0, the root keeps its index in
`Bvh4.root`). The queue-ordered `collapse.collapse_bvh2_to_bvh4` remains
the byte-exact-BFS-numbering path for arbitrary trees (PLOC/HPLOC);
tests verify this path against the CPU oracle through the explicit
wide-node isomorphism (`b2_node`).

Three stages (see `pallas/collapse_block.py` for the locality argument):
  1. XLA prep: areas, short flags, dense input rows.
  2. XLA coarse stage: the ~4% of nodes with leaf-range length > S_LEN form
     an ancestor-closed crown. Compact them (one single-key sort), run the
     expansion simulation + 3-state transition pointer doubling on the
     compacted arrays (gathers at coarse size are ~0.1 ms, not ~1.9 ms),
     and derive states for coarse nodes AND their direct children (the
     seeds that keep every in-kernel pull bounded). EVERYTHING the coarse
     stage produces (seeds, slots, counts, slot AABBs, claims) is scattered
     into dense kernel-input rows by two lane-dim column scatters.
  3. Pallas blocked kernel: the ~96% short nodes, PLUS pass-through
     emission of the scattered coarse rows at coarse-wide lanes — the
     kernel's dense outputs ARE the Bvh4, so there is no post-kernel merge
     (the r4 design paid two 6-channel routing sorts + a [4,6,m] scatter
     after the kernel; r5 folds all of it into the kernel's selects).

The coarse capacity is static but only a HEURISTIC bound: 2n/(S_LEN+1)
covers bushy trees (each long node would need > S_LEN *disjoint* leaves for
that bound, which chain-shaped trees violate — a caterpillar's ancestor
chain is long at every node, so the true worst case is n_long == m). A
`lax.cond` therefore dispatches on the measured n_long: the common branch
runs the coarse stage at the compact capacity; the overflow branch re-runs
the SAME stage at capacity m (slower — full-size gathers — but exact), so
degenerate scenes are correct instead of silently wrong.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Bvh2, Bvh4
from .pallas.collapse_block import S_LEN, collapse_block_pallas

I32 = jnp.int32
_WIDE, _E1, _E2, _UNK = 0, 1, 2, 3
_BIGKEY = jnp.int32(2**30)


def _f_bits(x):
    return lax.bitcast_convert_type(x, I32)


def _bits_f(x):
    return lax.bitcast_convert_type(x, jnp.float32)


def _apply(table, s):
    return (table >> (2 * s)) & 3


@partial(jax.jit, static_argnames=("interpret",))
def collapse_lbvh_to_bvh4(
    bvh: Bvh2, parent, first, last, interpret: bool = False
) -> Bvh4:
    """bvh: boundary-layout Bvh2 from `apetrei_build_packed_full` (node i at
    boundary i with first_i <= i < last_i). parent: i32[2n-1] (leaf parents
    included). first/last: i32[n-1] inclusive leaf ranges."""
    n = bvh.n_leaves
    m = bvh.n_internal
    assert m >= 1, "collapse needs at least 2 leaves"
    # packed pointer-doubling encodes ptr*64+fenc in i32 and the coarse sort
    # sentinel is 2^30 (cvalid tests < 2^29), so node ids must fit 22 bits
    assert m < (1 << 22), "collapse packing requires < 2^22 internal nodes"

    rlen = last - first + 1
    is_long = rlen > S_LEN  # bool[m]
    ccap = 2 * n // (S_LEN + 1) + 2
    ccap = min(ccap, m)
    if ccap >= m:
        return _collapse_impl(bvh, parent, is_long, m, interpret)
    # chain-shaped crowns (caterpillar Morton runs) can exceed the bushy-tree
    # capacity heuristic; dispatch on the measured long count (ADVICE r3)
    n_long = jnp.sum(is_long.astype(I32))
    return lax.cond(
        n_long <= ccap,
        lambda: _collapse_impl(bvh, parent, is_long, ccap, interpret),
        lambda: _collapse_impl(bvh, parent, is_long, m, interpret),
    )


def _collapse_impl(
    bvh: Bvh2, parent, is_long, ccap: int, interpret: bool
) -> Bvh4:
    """One collapse evaluation at a static coarse capacity `ccap`; exact
    whenever the long-node count fits ccap (guaranteed by the caller)."""
    n = bvh.n_leaves
    m = bvh.n_internal
    mm = bvh.n_nodes
    cap = m  # bvh4 internal capacity AND the leaf child-id bias

    pk = bvh.packed_t  # f32[6, mm] (min3, -max3)
    left = bvh.left.astype(I32)
    right = bvh.right.astype(I32)
    ext = jnp.maximum(-pk[3:6] - pk[0:3], 0.0)
    area = 2.0 * (ext[0] * ext[1] + ext[0] * ext[2] + ext[1] * ext[2])
    area_bits = _f_bits(area)  # >= 0: i32 order == f32 order

    idx_m = jnp.arange(m, dtype=I32)

    # ---- coarse stage on the compacted long set ----
    key = jnp.where(is_long, idx_m, _BIGKEY)
    (skey,) = lax.sort((key.astype(jnp.uint32),), num_keys=1)
    cidx = jnp.minimum(skey[:ccap].astype(I32), m - 1)  # coarse ids, sorted
    cvalid = skey[:ccap] < jnp.uint32(2**29)
    # lane-major table: ONE [10, mm] stack, lane gathers per fetch (a
    # row-major [mm, 16] paid the 16->128 lane pad on materialization)
    prow_t = jnp.concatenate(
        [
            area_bits[None, :],
            left[None, :],
            right[None, :],
            parent[None, :].astype(I32),
            _f_bits(pk),
        ],
        axis=0,
    )  # [10, mm]

    def fetch(ids):
        return prow_t[:, jnp.clip(ids, 0, mm - 1)]  # [10, k]

    trow = fetch(cidx)
    c_left = trow[1]
    c_right = trow[2]
    c_parent = trow[3]

    # expansion simulation (oracle semantics) on [ccap] lanes
    def acode(ids, rows):
        return jnp.where((ids >= 0) & (ids < m), rows[0], -1)

    rowL = fetch(c_left)
    rowR = fetch(c_right)
    s_id = [c_left, c_right, jnp.full((ccap,), -1, I32),
            jnp.full((ccap,), -1, I32)]
    s_ac = [acode(c_left, rowL), acode(c_right, rowR),
            jnp.full((ccap,), -1, I32), jnp.full((ccap,), -1, I32)]
    s_lc = [rowL[1], rowR[1], s_id[2], s_id[2]]
    s_rc = [rowL[2], rowR[2], s_id[2], s_id[2]]
    s_ab = [rowL[4:10], rowR[4:10],
            jnp.zeros((6, ccap), I32), jnp.zeros((6, ccap), I32)]

    best1 = jnp.maximum(s_ac[0], s_ac[1])
    pos1 = (s_ac[1] > s_ac[0]).astype(I32)
    do1 = best1 > 0
    e1 = jnp.where(pos1 == 1, s_id[1], s_id[0])
    c1l = jnp.where(pos1 == 1, s_lc[1], s_lc[0])
    c1r = jnp.where(pos1 == 1, s_rc[1], s_rc[0])
    rowCL = fetch(c1l)
    rowCR = fetch(c1r)
    for k in range(2):
        mk = do1 & (pos1 == k)
        s_id[k] = jnp.where(mk, c1l, s_id[k])
        s_ac[k] = jnp.where(mk, acode(c1l, rowCL), s_ac[k])
        s_lc[k] = jnp.where(mk, rowCL[1], s_lc[k])
        s_rc[k] = jnp.where(mk, rowCL[2], s_rc[k])
        s_ab[k] = jnp.where(mk[None, :], rowCL[4:10], s_ab[k])
    s_id[2] = jnp.where(do1, c1r, s_id[2])
    s_ac[2] = jnp.where(do1, acode(c1r, rowCR), s_ac[2])
    s_lc[2] = jnp.where(do1, rowCR[1], s_lc[2])
    s_rc[2] = jnp.where(do1, rowCR[2], s_rc[2])
    s_ab[2] = jnp.where(do1[None, :], rowCR[4:10], s_ab[2])
    count1 = 2 + do1.astype(I32)

    best2 = jnp.maximum(jnp.maximum(s_ac[0], s_ac[1]), s_ac[2])
    pos2 = jnp.where(
        s_ac[0] == best2, 0, jnp.where(s_ac[1] == best2, 1, 2)
    ).astype(I32)
    do2 = best2 > 0
    pick = lambda vs: jnp.where(
        pos2 == 0, vs[0], jnp.where(pos2 == 1, vs[1], vs[2])
    )
    e2 = pick(s_id)
    c2l = pick(s_lc)
    c2r = pick(s_rc)
    rowC2L = fetch(c2l)
    rowC2R = fetch(c2r)
    for k in range(3):
        mk = do2 & (pos2 == k)
        s_id[k] = jnp.where(mk, c2l, s_id[k])
        s_ab[k] = jnp.where(mk[None, :], rowC2L[4:10], s_ab[k])
    for k in range(2, 4):
        mk = do2 & (count1 == k)
        s_id[k] = jnp.where(mk, c2r, s_id[k])
        s_ab[k] = jnp.where(mk[None, :], rowC2R[4:10], s_ab[k])
    count2 = count1 + do2.astype(I32)
    e1_c = jnp.where(do1, e1, -1)
    e2_c = jnp.where(do2, e2, -1)

    # coarse states: pointer doubling in compacted space (parents coarse)
    rank = jnp.cumsum(is_long.astype(I32)) - is_long.astype(I32)
    p_rank = rank[jnp.clip(c_parent, 0, m - 1)]
    p_rank = jnp.where(c_parent >= 0, p_rank, -1)
    lanes_c = jnp.arange(ccap, dtype=I32)
    ps = jnp.clip(p_rank, 0, ccap - 1)
    e1_at_p = e1_c[ps]
    e2_at_p = e2_c[ps]
    g_rank = p_rank[ps]
    e2_at_g = e2_c[jnp.clip(g_rank, 0, ccap - 1)]
    t_wide = jnp.where(
        cidx == e1_at_p, _E1, jnp.where(cidx == e2_at_p, _E2, _WIDE)
    )
    t_e1 = jnp.where(cidx == e2_at_g, _E2, _WIDE)
    fenc = t_wide | (t_e1 << 2)
    rootless = (p_rank < 0) | ~cvalid
    fenc = jnp.where(rootless, 0, fenc)
    ptr = jnp.where(rootless, lanes_c, ps)
    packed = ptr * 64 + fenc
    for _ in range(6):
        pulled = packed[jnp.clip(packed >> 6, 0, ccap - 1)]
        fp = pulled & 63
        f = packed & 63
        nf = (
            _apply(f, _apply(fp, 0))
            | (_apply(f, _apply(fp, 1)) << 2)
            | (_apply(f, _apply(fp, 2)) << 4)
        )
        packed = (pulled & ~jnp.int32(63)) | nf
    state_c = packed & 3

    # children-of-coarse states (seeds for the kernel)
    def child_state(cid):
        return jnp.where(
            state_c == _WIDE,
            jnp.where(cid == e1_c, _E1, jnp.where(cid == e2_c, _E2, _WIDE)),
            jnp.where(
                state_c == _E1,
                jnp.where(cid == e2_at_p, _E2, _WIDE),
                _WIDE,
            ),
        )

    state_l = child_state(c_left)
    state_r = child_state(c_right)

    # Nearest-wide-ancestor-INCLUSIVE per coarse node (`own_inc`): the wide
    # node that owns any slot whose absorbed chain terminates at-or-above
    # this node. Case table (absorption reaches at most 2 levels below a
    # wide node, `TwoPassLbvhKernel.h:262-313`):
    #   WIDE -> self
    #   E1   -> parent (a first expansion always absorbs a CHILD of the
    #           expanding wide node, so the parent is that wide node)
    #   E2   -> parent if the parent is wide, else grandparent (the parent
    #           then absorbed as E1 into ITS parent, which did both
    #           expansions; E2-under-E2 and E1-under-nonwide are impossible)
    # The crown is ancestor-closed, so parent/grandparent ranks are valid.
    state_p = state_c[ps]
    gp_id = c_parent[ps]
    own_inc = jnp.where(
        state_c == _WIDE,
        cidx,
        jnp.where(
            state_c == _E1,
            c_parent,
            jnp.where(state_p == _E1, gp_id, c_parent),
        ),
    )
    # own_parent(x) := own_inc(parent(x)) — the single value the kernel
    # needs at seed lanes: it is simultaneously (a) the claim terminal for
    # chains arriving from below (own_inc(x) = x if x is wide else
    # own_parent(x)), and (b) the self-claim of a seeded wide lane.
    own_pc = jnp.where(p_rank >= 0, own_inc[jnp.clip(p_rank, 0, ccap - 1)], -1)

    # ---- dense seed/e2/own rows for the kernel (one lane-dim scatter) ----
    # Scatter targets can collide: a coarse node that is itself the child
    # of a coarse node appears both as a tgt_c row and as a tl/tr row.
    # Duplicate targets must carry EQUAL values, so: (a) the child seed
    # state from `child_state` equals the doubling state (child_state is
    # exactly the one-step transition the doubling composes), (b) the
    # child rows carry the child's OWN coarse e2 (via rank), and (c) the
    # own_parent value has one definition (own_inc of this row) whether the
    # lane is reached as a tgt_c row (own_inc[p_rank]) or a tl/tr row.
    oob = jnp.int32(mm + 5)
    tgt_c = jnp.where(cvalid, cidx, oob)
    tl = jnp.where(cvalid & (c_left >= 0) & (c_left < m), c_left, oob)
    tr = jnp.where(cvalid & (c_right >= 0) & (c_right < m), c_right, oob)

    def child_e2(cid):
        cr = rank[jnp.clip(cid, 0, m - 1)]
        ce = e2_c[jnp.clip(cr, 0, ccap - 1)]
        long_child = ((cid >= 0) & (cid < m)
                      & (is_long[jnp.clip(cid, 0, m - 1)]) & (cr < ccap))
        return jnp.where(long_child, ce, -1)

    # ONE lane-dim scatter, not sort-routing: a [K, m] scatter at column
    # indices costs ~0.4-0.65 ms nearly independent of K on v5e
    # (tools/microbench_merge.py), while the two-sort route paid ~1.4 ms
    # per routing pass. (The r3 "~50 ns/index" scatter cliff was the 3-D
    # [4, 6, m]-at-axis-2 form; 2-D lane scatters are per-index cheap.)
    # Rows 0-1 are the chain seeds: row 0 packs (seed state << 23 | e2 + 1)
    # — e2 < 2^22 so both fit one i32 and the kernel decodes them; row 1
    # carries own_parent + 1 (0 = none), the claim terminal that lets the
    # kernel resolve ALL ownership chains itself.
    # Rows 2-33 are the coarse stage's OWN emission, which the kernel
    # passes through to its dense outputs at flagged lanes — this replaces
    # the former post-kernel merge (two 6-channel routing sorts + a
    # [4, 6, m] scatter) with in-kernel selects: 2-5 slot ids, 6 count,
    # 7 coarse-wide flag, 8-31 slot AABB bits (slot k at rows 8+6k..13+6k),
    # 32-33 pad (34 rows total).
    # The tl/tr target groups carry each child's OWN coarse-output column
    # when the child is itself coarse (rank lookup), else the background —
    # so duplicate targets stay value-consistent.
    enc_se = lambda st, e2v: st * (1 << 23) + (e2v + 1)
    is_wide_c = cvalid & (state_c == _WIDE)
    slots_rows = jnp.stack(s_id, axis=0)  # [4, ccap]
    slotmask = (
        (jnp.arange(4, dtype=I32)[:, None] < count2[None, :])
        & is_wide_c[None, :]
    )
    slots_rows = jnp.where(slotmask, slots_rows, -1)
    cnt_row = jnp.where(is_wide_c, count2, 0)[None, :]
    cw_row = is_wide_c.astype(I32)[None, :]
    ab_rows = jnp.concatenate(
        [jnp.where(is_wide_c[None, :], s_ab[k], 0) for k in range(4)],
        axis=0,
    )  # [24, ccap]
    cvals = jnp.concatenate(
        [slots_rows, cnt_row, cw_row, ab_rows], axis=0
    )  # [30, ccap] rows 2-31 of the scatter payload at tgt_c
    cbg_col = jnp.concatenate(
        [jnp.full((4, 1), -1, I32), jnp.zeros((26, 1), I32)], axis=0
    )  # [30, 1] background column

    def child_cvals(cid):
        """Coarse-output column of child `cid` (its own, via rank) when the
        child is itself coarse; background otherwise."""
        cr = rank[jnp.clip(cid, 0, m - 1)]
        long_child = ((cid >= 0) & (cid < m)
                      & (is_long[jnp.clip(cid, 0, m - 1)]) & (cr < ccap))
        v = cvals[:, jnp.clip(cr, 0, ccap - 1)]
        return jnp.where(long_child[None, :], v, cbg_col)

    pre_t = jnp.concatenate([tgt_c, tl, tr])
    seed_row = jnp.concatenate(
        [
            enc_se(state_c, e2_c),
            enc_se(state_l, child_e2(c_left)),
            enc_se(state_r, child_e2(c_right)),
        ]
    )[None, :]
    own_row = jnp.concatenate(
        [own_pc + 1, own_inc + 1, own_inc + 1]
    )[None, :]
    cout = jnp.concatenate(
        [cvals, child_cvals(c_left), child_cvals(c_right)], axis=1
    )  # [30, 3*ccap]
    pre_v = jnp.concatenate(
        [seed_row, own_row, cout, jnp.zeros((2, 3 * ccap), I32)], axis=0
    )  # [34, 3*ccap]
    pre_bg = jnp.concatenate(
        [
            jnp.full((1, m), _UNK << 23, I32),
            jnp.zeros((1, m), I32),
            jnp.broadcast_to(cbg_col, (30, m)),
            jnp.zeros((2, m), I32),
        ],
        axis=0,
    )
    pre = pre_bg.at[:, pre_t].set(pre_v, mode="drop")
    seed_e2 = pre[0]
    own_dense = pre[1]
    carr = pre[2:34]  # [32, m]: coarse-output rows for the kernel

    # ---- kernel inputs (lane-major; W = n columns so leaf n-1 exists) ----
    W = n
    padm = jnp.full((1, W - m), -1, I32)
    row = lambda v: jnp.concatenate([v[None, :], padm], axis=1)
    meta = jnp.concatenate(
        [
            jnp.concatenate([area_bits[None, :m], jnp.zeros((1, W - m), I32)], 1),
            row(left[:m]),
            row(right[:m]),
            row(parent[:m].astype(I32)),
            jnp.concatenate(
                [seed_e2[None, :], jnp.full((1, W - m), _UNK << 23, I32)], 1
            ),
            jnp.concatenate(
                [(~is_long).astype(I32)[None, :], jnp.zeros((1, W - m), I32)], 1
            ),
            jnp.concatenate([own_dense[None, :], jnp.zeros((1, W - m), I32)], 1),
            parent[None, m:].astype(I32),  # leaf parents (for claims)
        ],
        axis=0,
    )
    node8 = jnp.concatenate(
        [_f_bits(pk[:, :m]), jnp.zeros((2, m), I32)], axis=0
    )
    node8 = jnp.concatenate([node8, jnp.zeros((8, W - m), I32)], axis=1)
    leaf8 = jnp.concatenate(
        [_f_bits(pk[:, m:]), jnp.zeros((2, n), I32)], axis=0
    )
    carr = jnp.concatenate(
        [carr, jnp.broadcast_to(
            jnp.concatenate([cbg_col, jnp.zeros((2, 1), I32)], 0),
            (32, W - m))],
        axis=1,
    )

    # The kernel's dense outputs ARE the Bvh4 — no post-kernel merge.
    outm, outa = collapse_block_pallas(
        meta, node8, leaf8, carr, m, interpret=interpret
    )
    count = outm[4, :m]
    sp = _bits_f(jnp.stack([a[0:6, :m] for a in outa], axis=0))  # [4, 6, m]
    n_nodes = jnp.sum((count > 0).astype(I32))
    return Bvh4(
        slot_packed_t=sp,
        child_t=outm[0:4, :m],
        parent=outm[6, :m],
        child_count=count,
        n_nodes=n_nodes,
        leaf_prim=left[m:],
        leaf_parent=outm[7, :W][:n],
        root=bvh.root.astype(I32),
    )
