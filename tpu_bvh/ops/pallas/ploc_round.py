"""Fused PLOC round completion: sort-free emit + survivor compaction.

The XLA `_round` pays two full-width stable sorts per merge round (emit
slab compaction + survivor compaction, ~0.9 ms at 262K on v5e). This
kernel replaces both with in-register binary-shift stream compaction:

* Each lane's destination is its rank (exclusive cumsum of its stream
  flag, log2(blk) roll+add steps). The displacement `lane - rank` is
  non-decreasing over flagged lanes, so routing its bits LSB-first with
  one masked roll per bit never collides (high displacement bits are
  non-decreasing too, so two flagged lanes can never meet mid-flight);
  unflagged lanes get displacement 0 and are simply overwritten.
* Cross-block stitching: a sequential-grid carry (SMEM) tracks global
  stream offsets; each block writes its compacted stream into a dynamic
  128-aligned HBM window, read-modify-write so the partial head tile
  (previous block's tail) and everything beyond the stream tail are
  preserved. No partial-tile scratch: the RMW read recovers the partial
  from HBM.

Two streams per round:
  emit     — merged rows [cnode, rnode, union AABB(6)] written straight
             into the node buffer at their top-down slab ids
             (`slab_start + global_rank`; reference allocation
             `/root/reference/src/Ploc++Kernel.h:311`, here deterministic
             in cluster order). The RMW keeps earlier rounds' nodes (at
             higher ids) intact.
  survivor — kept rows (merged -> union AABB + new id; unmerged
             unchanged) globally front-compacted in cluster order, which
             is exactly what the stable sort produced.

All carriage is i32 (see ploc_nn's denormal-flush note: integer
payloads bitcast into f32 rows get flushed to zero by XLA:TPU fusions).
This kernel does no float arithmetic at all — pure routing.

State layout (lane-major i32[8, S]):
  rows 0..5  cluster AABB (min3, -max3), f32 bitcast
  row  6     Morton code
  row  7     cluster node id

nn layout (i32[8, S], `ploc_nn.ploc_nn_round_raw` output):
  rows 0..5  union AABB with partner (f32 bitcast), row 6 partner node
  id, row  7 flags (1 = merge, 2 = dropped)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 8192
_WPAD = 256  # write-window overhang: one head tile + one tail tile


def _cumsum_excl(flags2, blk):
    """Exclusive cumsum along lanes of i32[2, blk] (both streams at once)."""
    lanes = lax.broadcasted_iota(jnp.int32, (2, blk), 1)
    s = flags2
    k = 1
    while k < blk:
        rolled = pltpu.roll(s, k, axis=1)
        s = jnp.where(lanes >= k, s + rolled, s)
        k <<= 1
    return s - flags2


def _compact(rows, disp, blk):
    """Route rows[:, l] to lane l - disp[l] (disp per-lane, monotone over
    flagged lanes, 0 elsewhere). LSB-first binary shifts; log2(blk) rolls.
    disp rides as an extra i32 row so it travels with its element."""
    lanes = lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    x = jnp.concatenate([rows, disp], axis=0)  # i32[R+1, blk]
    b = 0
    step = 1
    while step < blk:
        rolled = pltpu.roll(x, blk - step, axis=1)  # rolled[:, l] = x[:, l+step]
        rd = rolled[-1:, :]
        take = (((rd >> b) & 1) == 1) & (lanes < blk - step)
        x = jnp.where(take, rolled, x)
        b += 1
        step <<= 1
    return x[:-1, :]


def _round_kernel2(sc_ref, state_ref, nn_ref, nodes_ref, surv_ref,
                   nodes_out_ref, surv_out_ref, carry_ref, ewin_ref,
                   swin_ref, esem, ssem, *, blk: int):
    i = pl.program_id(0)
    nc = sc_ref[0]
    slab_start = sc_ref[2]  # bottom-up base: ids already allocated

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0  # merged so far
        carry_ref[1] = 0  # kept so far

    state = state_ref[:]  # i32[8, blk]
    nn = nn_ref[:]
    lanes_g = i * blk + lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    lanes_l = lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    valid = lanes_g < nc
    flags = nn[7:8, :]
    merge = valid & (flags == 1)
    dropped = valid & (flags == 2)
    keep = valid & ~dropped

    carry_m = carry_ref[0]
    carry_k = carry_ref[1]

    f2 = jnp.concatenate(
        [merge.astype(jnp.int32), keep.astype(jnp.int32)], axis=0
    )  # [2, blk]
    excl = _cumsum_excl(f2, blk)
    rank_m = excl[0:1, :]
    rank_k = excl[1:2, :]
    cnt_m = jnp.sum(f2[0, :])
    cnt_k = jnp.sum(f2[1, :])

    new_id = slab_start + carry_m + rank_m  # this lane's merged-node id

    # ---- emit stream: [cnode, rnode, ucols x6] for merged lanes
    emit_rows = jnp.concatenate(
        [state[7:8, :], nn[6:7, :], nn[0:6, :]], axis=0
    )  # i32[8, blk]
    disp_m = jnp.where(merge, lanes_l - rank_m, 0)
    emit_c = _compact(emit_rows, disp_m, blk)

    # ---- survivor stream: merged lanes take union AABB + new id
    surv_cols = jnp.where(merge, nn[0:6, :], state[0:6, :])
    surv_id = jnp.where(merge, new_id, state[7:8, :])
    surv_rows = jnp.concatenate(
        [surv_cols, state[6:7, :], surv_id], axis=0
    )  # i32[8, blk]
    disp_k = jnp.where(keep, lanes_l - rank_k, 0)
    surv_c = _compact(surv_rows, disp_k, blk)

    # ---- stitched RMW writes
    def stitch(stream_c, cnt, base, hbm_ref, win_ref, dma_sem):
        p = lax.rem(base, 128)
        w0 = pl.multiple_of(base - p, 128)
        ld = pltpu.make_async_copy(
            hbm_ref.at[:, pl.ds(w0, blk + _WPAD)], win_ref, dma_sem
        )
        ld.start()
        ext = jnp.concatenate(
            [stream_c, jnp.zeros((8, _WPAD), jnp.int32)], axis=1
        )
        ext = pltpu.roll(ext, p, axis=1)  # stream starts at lane p
        wl = lax.broadcasted_iota(jnp.int32, (1, blk + _WPAD), 1)
        ld.wait()
        # lanes < p hold the stream head already persisted by earlier
        # blocks (or pre-round content before the stream base) — keep them
        merged_win = jnp.where((wl >= p) & (wl < p + cnt), ext, win_ref[:])
        win_ref[:] = merged_win
        st = pltpu.make_async_copy(
            win_ref, hbm_ref.at[:, pl.ds(w0, blk + _WPAD)], dma_sem
        )
        st.start()
        st.wait()

    stitch(emit_c, cnt_m, slab_start + carry_m, nodes_out_ref, ewin_ref, esem)
    stitch(surv_c, cnt_k, carry_k, surv_out_ref, swin_ref, ssem)

    carry_ref[0] = carry_m + cnt_m
    carry_ref[1] = carry_k + cnt_k


def ploc_emit_compact(mat, nn, nodes, n_clusters, base,
                      interpret: bool = False):
    """Complete one PLOC round after the NN stage, without sorts.

    mat: i32[8, S] state (layout above); nn: i32[8, S] NN output;
    nodes: i32[8, W] node buffer with W >= base + S + 256 columns of
    headroom. `base` = bottom-up ids already allocated (this round's
    merges take [base, base+n_merged)). Returns (new_mat i32[8, S],
    nodes i32[8, W]) — nodes is donated/aliased.
    """
    s = mat.shape[1]
    blk = min(_BLK, -(-s // 128) * 128)
    pad = (-s) % blk
    if pad:
        fill = jnp.zeros((8, pad), jnp.int32)
        mat = jnp.concatenate([mat, fill], axis=1)
        nn = jnp.concatenate([nn, fill], axis=1)
    sp = mat.shape[1]
    grid = sp // blk
    assert nodes.shape[1] >= s + blk + _WPAD, (
        f"nodes buffer needs >= {s + blk + _WPAD} cols, got {nodes.shape[1]}"
    )
    sc = jnp.stack(
        [jnp.asarray(n_clusters, jnp.int32), jnp.zeros((), jnp.int32),
         jnp.asarray(base, jnp.int32), jnp.zeros((), jnp.int32)]
    )
    # survivor buffer: same padded width plus window overhang
    surv0 = jnp.zeros((8, sp + blk + _WPAD), jnp.int32)
    nodes_out, surv = pl.pallas_call(
        functools.partial(_round_kernel2, blk=blk),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, blk), lambda i: (0, i)),
            pl.BlockSpec((8, blk), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),  # nodes (aliased out 0)
            pl.BlockSpec(memory_space=pl.ANY),  # surv buffer (aliased out 1)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(nodes.shape, jnp.int32),
            jax.ShapeDtypeStruct(surv0.shape, jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((8, blk + _WPAD), jnp.int32),
            pltpu.VMEM((8, blk + _WPAD), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(sc, mat, nn, nodes, surv0)
    return surv[:, :s], nodes_out


# ---------------------------------------------------------------------------
# Fully fused round: NN stencil + emit/survivor compaction in ONE kernel.
# A SINGLE sequential-grid pass runs the whole round: the halo NN stencil
# per block (`ploc_nn._nn_body`), then emit + survivor compaction with
# running SMEM carries. Node ids are allocated BOTTOM-UP (`base + seen`),
# so each block's slab base is just the sequential carry — no global
# merged-count barrier is needed at all (the reference's top-down
# `nClusters - 2 - prefix` allocation, `Ploc++Kernel.h:311`, forces its
# cross-block serialized offset spin at `:341-347`; a two-pass grid
# emulated that here and paid an extra NN round-trip through HBM plus a
# second full grid sweep). `ploc.py` flips ids (n_int-1-id) and reverses
# the node buffer once at the end to restore root-at-0.
# ---------------------------------------------------------------------------


def _fused_kernel(sc_ref, left_ref, mid_ref, right_ref, nodes_ref, surv_ref,
                  nodes_out_ref, surv_out_ref, nm_ref,
                  carry_ref, ewin_ref, swin_ref,
                  esem, ssem, *, radius: int, blk: int, surv_base: int = 0):
    from .ploc_nn import _HALO, _nn_body

    i = pl.program_id(0)
    nb = pl.num_programs(0)
    nc = sc_ref[0]
    base = sc_ref[2]  # bottom-up ids already allocated before this round

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0  # emit (merged-pair) carry
        carry_ref[1] = 0  # survivor carry

    H = _HALO
    win = jnp.concatenate(
        [left_ref[:, blk - H:], mid_ref[:], right_ref[:, :H]], axis=1
    )
    out = _nn_body(win, nc, sc_ref[1], i * blk - H, radius=radius)
    nn = out[:, H:H + blk]
    state = mid_ref[:]

    lanes_g = i * blk + lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    lanes_l = lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    valid = lanes_g < nc
    flags = nn[7:8, :]
    merge = valid & (flags == 1)
    dropped = valid & (flags == 2)
    keep = valid & ~dropped

    carry_m = carry_ref[0]
    carry_k = carry_ref[1]

    f2 = jnp.concatenate(
        [merge.astype(jnp.int32), keep.astype(jnp.int32)], axis=0
    )
    excl = _cumsum_excl(f2, blk)
    rank_m = excl[0:1, :]
    rank_k = excl[1:2, :]
    cnt_m = jnp.sum(f2[0, :])
    cnt_k = jnp.sum(f2[1, :])

    new_id = base + carry_m + rank_m

    emit_rows = jnp.concatenate(
        [state[7:8, :], nn[6:7, :], nn[0:6, :]], axis=0
    )
    disp_m = jnp.where(merge, lanes_l - rank_m, 0)
    emit_c = _compact(emit_rows, disp_m, blk)

    surv_cols = jnp.where(merge, nn[0:6, :], state[0:6, :])
    surv_id = jnp.where(merge, new_id, state[7:8, :])
    surv_rows = jnp.concatenate(
        [surv_cols, state[6:7, :], surv_id], axis=0
    )
    disp_k = jnp.where(keep, lanes_l - rank_k, 0)
    surv_c = _compact(surv_rows, disp_k, blk)

    def stitch(stream_c, cnt, wbase, hbm_ref, win_ref, dma_sem):
        q = lax.rem(wbase, 128)
        w0 = pl.multiple_of(wbase - q, 128)
        ld2 = pltpu.make_async_copy(
            hbm_ref.at[:, pl.ds(w0, blk + _WPAD)], win_ref, dma_sem
        )
        ld2.start()
        ext = jnp.concatenate(
            [stream_c, jnp.zeros((8, _WPAD), jnp.int32)], axis=1
        )
        ext = pltpu.roll(ext, q, axis=1)
        wl = lax.broadcasted_iota(jnp.int32, (1, blk + _WPAD), 1)
        ld2.wait()
        merged_win = jnp.where((wl >= q) & (wl < q + cnt), ext, win_ref[:])
        win_ref[:] = merged_win
        st2 = pltpu.make_async_copy(
            win_ref, hbm_ref.at[:, pl.ds(w0, blk + _WPAD)], dma_sem
        )
        st2.start()
        st2.wait()

    stitch(emit_c, cnt_m, base + carry_m, nodes_out_ref, ewin_ref, esem)
    stitch(surv_c, cnt_k, surv_base + carry_k, surv_out_ref, swin_ref, ssem)

    carry_ref[0] = carry_m + cnt_m
    carry_ref[1] = carry_k + cnt_k

    @pl.when(i == nb - 1)
    def _():
        nm_ref[0] = carry_m + cnt_m


def ploc_round_fused(mat, nodes, n_clusters, shift_bits, base, radius: int,
                     interpret: bool = False):
    """One full PLOC merge round (NN + emit + compaction) in one kernel.

    mat: i32[8, S] cluster state (module-docstring layout); nodes:
    i32[8, W] node buffer (donated/aliased) with W >= base_max + S + 256
    columns of headroom. `base` (i32 scalar) = bottom-up ids already
    allocated; this round's merged pairs take ids [base, base+n_merged).
    Returns (new_mat i32[8, S], nodes i32[8, W], n_merged i32[]).
    """
    from .ploc_nn import _BIGBITS, _HALO

    if radius * 2 > _HALO:
        raise ValueError(f"radius {radius} needs halo >= {radius * 2}")
    s = mat.shape[1]
    blk = min(_BLK, -(-s // 128) * 128)
    pad = (-s) % blk
    if pad:
        mat = jnp.concatenate(
            [mat, jnp.full((8, pad), _BIGBITS, jnp.int32)], axis=1
        )
    sp = mat.shape[1]
    grid = sp // blk
    sc = jnp.stack(
        [jnp.asarray(n_clusters, jnp.int32),
         jnp.asarray(shift_bits, jnp.int32),
         jnp.asarray(base, jnp.int32)]
    )
    surv0 = jnp.zeros((8, sp + blk + _WPAD), jnp.int32)
    clamp = lambda j: jnp.clip(j, 0, grid - 1)
    nodes_out, surv, nm = pl.pallas_call(
        functools.partial(_fused_kernel, radius=radius, blk=blk),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, blk), lambda i: (0, clamp(i - 1))),
            pl.BlockSpec((8, blk), lambda i: (0, i)),
            pl.BlockSpec((8, blk), lambda i: (0, clamp(i + 1))),
            pl.BlockSpec(memory_space=pl.ANY),  # nodes (aliased out 0)
            pl.BlockSpec(memory_space=pl.ANY),  # surv buffer (aliased out 1)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(nodes.shape, jnp.int32),
            jax.ShapeDtypeStruct(surv0.shape, jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((8, blk + _WPAD), jnp.int32),
            pltpu.VMEM((8, blk + _WPAD), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(sc, mat, mat, mat, nodes, surv0)
    return surv[:, :s], nodes_out, nm[0]


def ploc_round_pp(matA, matB, nodes, n_clusters, shift_bits, base,
                  radius: int, blk: int, n_blocks,
                  interpret: bool = False):
    """Ping-pong variant of `ploc_round_fused` with ZERO per-round XLA
    glue and a DYNAMIC grid: matA/matB are preallocated
    i32[8, blk + D + blk (+ slack)] buffers (one leading and one trailing
    pad block around the D-wide data region) carried through the driver's
    while_loop. `n_blocks` = ceil(live / blk) may be a TRACED scalar —
    the grid only covers live blocks, so per-round cost tracks the live
    cluster count exactly and ONE kernel instantiation serves the whole
    agglomeration (a static stage ladder cost one ~60 s Mosaic compile
    per stage width). Each round reads A and compacts survivors into B
    in place; the driver swaps them.
    Returns (matB' aliased, nodes' aliased, n_merged)."""
    from .ploc_nn import _HALO

    if radius * 2 > _HALO:
        raise ValueError(f"radius {radius} needs halo >= {radius * 2}")
    assert matB.shape == matA.shape
    assert blk + _WPAD <= 2 * blk
    sc = jnp.stack(
        [jnp.asarray(n_clusters, jnp.int32),
         jnp.asarray(shift_bits, jnp.int32),
         jnp.asarray(base, jnp.int32)]
    )
    # data region starts at column blk, so the halo neighbors of grid
    # step i are plain blocks i / i+1 / i+2 — no clamping, no edge cases
    # for any grid size.
    nodes_out, surv, nm = pl.pallas_call(
        functools.partial(_fused_kernel, radius=radius, blk=blk,
                          surv_base=blk),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, blk), lambda i: (0, i)),
            pl.BlockSpec((8, blk), lambda i: (0, i + 1)),
            pl.BlockSpec((8, blk), lambda i: (0, i + 2)),
            pl.BlockSpec(memory_space=pl.ANY),  # nodes (aliased out 0)
            pl.BlockSpec(memory_space=pl.ANY),  # matB (aliased out 1)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(nodes.shape, jnp.int32),
            jax.ShapeDtypeStruct(matB.shape, jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((8, blk + _WPAD), jnp.int32),
            pltpu.VMEM((8, blk + _WPAD), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(sc, matA, matA, matA, nodes, matB)
    return surv, nodes_out, nm[0]



# ---------------------------------------------------------------------------
# Single-invocation finisher: once the live cluster count fits one VMEM
# block, every remaining merge round runs inside ONE kernel — the TPU
# analog of the reference's single-block `SinglePassPloc`
# (`/root/reference/src/Ploc++Kernel.h:98-209`). Eliminates ~30 dispatch +
# XLA-glue round trips for the tail of the agglomeration.
# ---------------------------------------------------------------------------

_FIN_WIDTH = 16384


def _finish_kernel(sc_ref, mat_ref, nodes_in_ref, nodes_out_ref, *,
                   radius: int, width: int):
    W = width
    R = radius
    as_f = lambda x: lax.bitcast_convert_type(x, jnp.float32)
    BIGF = 3.0e38
    lanes_w = lax.broadcasted_iota(jnp.int32, (1, W), 1)

    def make_round(Ws):
      # one merge round at live width Ws (the in-kernel stage ladder runs
      # geometrically shrinking Ws so tail rounds don't pay full width)
      lanes = lax.broadcasted_iota(jnp.int32, (1, Ws), 1)

      def one_round(carry):
        nc, shift, mat, local, r = carry
        valid = lanes < nc
        cols = as_f(mat[0:6, :])
        whole = shift >= 32
        seg = jnp.where(
            whole, 0, lax.shift_right_logical(mat[6:7, :], jnp.minimum(shift, 31))
        )
        segmat = jnp.concatenate([mat[0:6, :], seg, mat[7:8, :]], axis=0)

        best_area = jnp.full((1, Ws), BIGF, jnp.float32)
        best_rel = jnp.zeros((1, Ws), jnp.int32)
        partner = jnp.zeros((8, Ws), jnp.int32)
        areas = []
        for d in range(1, R + 1):
            w = pltpu.roll(segmat, Ws - d, axis=1)
            u = jnp.minimum(cols, as_f(w[0:6, :]))
            ex = -u[3:4, :] - u[0:1, :]
            ey = -u[4:5, :] - u[1:2, :]
            ez = -u[5:6, :] - u[2:3, :]
            area = 2.0 * (ex * ey + ex * ez + ey * ez)
            ok = valid & (lanes + d < nc) & (seg == w[6:7, :])
            area = jnp.where(ok, area, BIGF)
            areas.append(area)
            better = area < best_area
            best_area = jnp.where(better, area, best_area)
            best_rel = jnp.where(better, d, best_rel)
            partner = jnp.where(better, w, partner)
        for d in range(1, R + 1):
            area_b = jnp.where(
                lanes >= d, pltpu.roll(areas[d - 1], d, axis=1), BIGF
            )
            better_b = (area_b < best_area) | (
                (area_b == best_area) & (-d < best_rel)
            )
            best_area = jnp.where(better_b, area_b, best_area)
            best_rel = jnp.where(better_b, -d, best_rel)

        has_nn = best_area < BIGF
        merge = jnp.zeros((1, Ws), jnp.bool_)
        dropped = jnp.zeros((1, Ws), jnp.bool_)
        for d in range(1, R + 1):
            br_fwd = pltpu.roll(best_rel, Ws - d, axis=1)
            br_bwd = pltpu.roll(best_rel, d, axis=1)
            merge = merge | ((best_rel == d) & (br_fwd == -d))
            dropped = dropped | ((best_rel == -d) & (br_bwd == d))
        merge = merge & has_nn & valid
        dropped = dropped & has_nn & valid
        keep = valid & ~dropped
        as_i = lambda x: lax.bitcast_convert_type(x, jnp.int32)
        ucols = as_i(jnp.minimum(cols, as_f(partner[0:6, :])))

        f2 = jnp.concatenate(
            [merge.astype(jnp.int32), keep.astype(jnp.int32)], axis=0
        )
        excl = _cumsum_excl(f2, Ws)
        rank_m = excl[0:1, :]
        rank_k = excl[1:2, :]
        nm = jnp.sum(f2[0, :])
        # bottom-up: this round's pairs take local slots [seen, seen+nm)
        # of the full-W window (global ids gbase + local slot)
        seen = nc0 - nc
        new_id = gbase + seen + rank_m

        emit_rows = jnp.concatenate(
            [mat[7:8, :], partner[7:8, :], ucols], axis=0
        )
        disp_m = jnp.where(merge, lanes - rank_m, 0)
        emit_c = _compact(emit_rows, disp_m, Ws)
        if Ws < W:
            emit_c = jnp.concatenate(
                [emit_c, jnp.zeros((8, W - Ws), jnp.int32)], axis=1
            )
        emit_pl = pltpu.roll(emit_c, seen, axis=1)  # merged row r -> lane seen+r
        sel = (lanes_w >= seen) & (lanes_w < seen + nm)
        local = jnp.where(sel, emit_pl, local)

        surv_cols = jnp.where(merge, ucols, mat[0:6, :])
        surv_id = jnp.where(merge, new_id, mat[7:8, :])
        surv_rows = jnp.concatenate(
            [surv_cols, mat[6:7, :], surv_id], axis=0
        )
        disp_k = jnp.where(keep, lanes - rank_k, 0)
        mat = _compact(surv_rows, disp_k, Ws)

        shift = jnp.minimum(shift + 3, 32)
        return (nc - nm, shift, mat, local, r + 1)

      return one_round

    nc0 = sc_ref[0]
    shift0 = sc_ref[1]
    gbase = sc_ref[2]
    # Round bound as a hang backstop (ADVICE r1): every productive round
    # merges >= 1 pair and the search shift saturates at 32 within 11
    # rounds, so nc0 + 16 rounds always suffice; non-finite leaf AABBs
    # (NaN) would otherwise make every area comparison false and spin the
    # device forever with no host-visible progress.
    limit = nc0 + 16

    # in-kernel stage ladder: W -> W/4 -> ... -> 512; each stage's rounds
    # run on a live-width slice of the state (per-round cost scales with
    # the stage width, so the long tail of tiny rounds is nearly free)
    stages = []
    ws = W
    while ws > 512:
        stages.append(ws)
        ws //= 4
    stages.append(ws)
    carry = (nc0, shift0, mat_ref[:], nodes_in_ref[:], jnp.int32(0))
    for si, ws in enumerate(stages):
        target = jnp.int32(stages[si + 1]) if si + 1 < len(stages) else jnp.int32(1)
        nc_c, shift_c, mat_c, local_c, r_c = carry
        carry_s = (nc_c, shift_c, mat_c[:, :ws], local_c, r_c)
        out = lax.while_loop(
            lambda c, t=target: (c[0] > t) & (c[4] < limit),
            make_round(ws), carry_s,
        )
        nc_c, shift_c, mat_s, local_c, r_c = out
        if ws < W:
            mat_s = jnp.concatenate(
                [mat_s, jnp.zeros((8, W - ws), jnp.int32)], axis=1
            )
        carry = (nc_c, shift_c, mat_s, local_c, r_c)
    nodes_out_ref[:] = carry[3]


def ploc_finish(mat, nodes, n_clusters, shift_bits, base, radius: int,
                interpret: bool = False):
    """Run every remaining PLOC round in one kernel. mat: i32[8, S] with
    S <= _FIN_WIDTH live clusters at the front; nodes: i32[8, W] buffer;
    `base` (i32 scalar) = bottom-up ids already allocated — the finisher's
    merges take global ids [base, base + n_clusters - 1), landing in the
    node-buffer window [base, base + _FIN_WIDTH). Returns the updated
    nodes buffer."""
    s = mat.shape[1]
    W = _FIN_WIDTH
    assert s <= W, f"finisher width {W} < live state {s}"
    if s < W:
        mat = jnp.concatenate([mat, jnp.zeros((8, W - s), jnp.int32)], axis=1)
    assert nodes.shape[1] >= W
    base = jnp.asarray(base, jnp.int32)
    sc = jnp.stack(
        [jnp.asarray(n_clusters, jnp.int32),
         jnp.asarray(shift_bits, jnp.int32), base]
    )
    win = lax.dynamic_slice(nodes, (0, base), (8, W))
    out_win = pl.pallas_call(
        functools.partial(_finish_kernel, radius=radius, width=W),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, W), lambda i: (0, 0)),
            pl.BlockSpec((8, W), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, W), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, W), jnp.int32),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(sc, mat, win)
    return lax.dynamic_update_slice(nodes, out_win, (0, base))
