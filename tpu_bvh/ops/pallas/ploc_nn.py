"""Fused Pallas kernel for the PLOC merge-round neighbor stage.

One PLOC round's dense compute — radius-R nearest-neighbor search over
Morton-adjacent clusters, mutual-pair detection, and partner-union
emission — re-expressed as a blocked VMEM-resident stencil kernel. This is
the TPU analog of the reference's shared-memory chunk work in the `Ploc`
kernel (`/root/reference/src/Ploc++Kernel.h:220-321`): the smem chunk with
its 4x-radius apron becomes a [8, BLK] lane-major block plus a 128-lane
halo on each side (fetched as clamped neighbor blocks), the atomicMin
(area<<32|idx) encoding becomes plain f32 comparisons with the same
smaller-index tie-break, and warp ballots disappear (the merge decisions
are per-offset mutuality checks; the caller compacts sort-free via
`pallas.ploc_round`).

The unfused XLA version issues ~300 separate HBM-roundtrip ops per round
(~2.2 ms at 262K clusters on v5e); the kernel measures 0.26 ms.

**All carriage is i32.** Integer payloads (Morton code, node ids, flags)
bitcast into f32 rows are denormals, and both XLA:TPU fusions and some
Mosaic paths flush f32 denormals to zero — measured: a round-trip through
an XLA concatenate zeroed the flag row. So the matrix is i32 end-to-end
(rolls/selects on i32 are exact) and only the AABB area math bitcasts
rows 0..5 back to f32 (real coordinates — normal floats — safe).

Halo correctness: a central lane i consumes best_rel at i +- R (for the
mutual check), and best_rel at those lanes consumes cluster data at
i +- 2R. With halo = 128 >= 2R (R <= 64) every consumed value is computed
from in-window data; the outermost R halo lanes may read wrapped/garbage
values but nothing central consumes them, and only the central block is
written out.

Layout contract (matches `ops.ploc._round`'s `mat`, i32[8, S]):
  rows 0..5  cluster AABB columns (min3, -max3), f32 bitcast
  row  6     Morton code; the HPLOC segment id is `code >> shift_bits`,
             computed in-kernel (shift 32 = one global segment)
  row  7     cluster node id

Output (i32[8, S]):
  rows 0..5  union AABB with the chosen partner, f32 bitcast (valid where
             merge)
  row  6     partner node id (valid where merge)
  row  7     flags: 1 = merge (left partner), 2 = dropped
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38  # plain float: jnp scalars would be captured consts in the kernel
_BIGBITS = 2137108966  # np.float32(3.0e38).view(np.int32)
_HALO = 128  # lanes of apron on each side; must be >= 2 * radius
_BLK = 16384  # central block width: keeps roll/select transients inside
# the 16 MB scoped-VMEM budget (32768 measured 20.9 MB on v5e)


def _nn_body(mat, nc, shift_bits, base, *, radius: int):
    """Dense NN/merge compute on an i32[8, s] window (layout in module
    docstring). `base` = global lane index of window column 0. Returns the
    i32[8, s] result (rows 0..5 union bits, row 6 partner node, row 7
    flags: 1 merge / 2 dropped); only columns whose full +-2R neighborhood
    is inside the window are trustworthy."""
    R = radius
    s = mat.shape[1]
    shift = jnp.minimum(shift_bits, 31)
    whole = shift_bits >= 32  # one global segment (plain PLOC)
    as_f = lambda x: lax.bitcast_convert_type(x, jnp.float32)

    # global lane index of each window column (halo lanes go negative /
    # past the end at the edges, where the clamped neighbor block repeats
    # data — all guarded out below)
    lanes = base + lax.broadcasted_iota(jnp.int32, (1, s), 1)
    valid = (lanes >= 0) & (lanes < nc)
    cols = as_f(mat[0:6, :])
    seg = jnp.where(whole, 0, lax.shift_right_logical(mat[6:7, :], shift))
    # the rolled neighbor's segment is recomputed in place of its code so
    # the per-offset compare is one i32 equality
    mat = jnp.concatenate([mat[0:6, :], seg, mat[7:8, :]], axis=0)

    best_area = jnp.full((1, s), _BIG, jnp.float32)
    best_rel = jnp.zeros((1, s), jnp.int32)
    # partner rows ride the forward loop: whenever a forward candidate wins,
    # its full row set is the partner candidate. A backward override makes
    # best_rel negative, and negative-rel lanes never consume partner, so
    # staleness is harmless — this halves the [8, s] roll count vs a
    # separate partner-select pass.
    partner = jnp.zeros((8, s), jnp.int32)
    areas = []  # forward-pair area per d (for the backward candidates)
    for d in range(1, R + 1):
        w = pltpu.roll(mat, s - d, axis=1)  # w[:, i] = mat[:, i + d] (circular)
        u = jnp.minimum(cols, as_f(w[0:6, :]))
        ex = -u[3:4, :] - u[0:1, :]
        ey = -u[4:5, :] - u[1:2, :]
        ez = -u[5:6, :] - u[2:3, :]
        area = 2.0 * (ex * ey + ex * ez + ey * ez)
        ok = valid & (lanes + d < nc) & (seg == w[6:7, :])
        area = jnp.where(ok, area, _BIG)
        areas.append(area)
        better = area < best_area
        best_area = jnp.where(better, area, best_area)
        best_rel = jnp.where(better, d, best_rel)
        partner = jnp.where(better, w, partner)
    for d in range(1, R + 1):
        # backward candidate for cluster i: neighbor i-d, area computed at
        # lane i-d. On equal areas the smaller absolute neighbor id wins
        # (the reference's packed (area_bits << 32 | index) atomicMin
        # order, `Ploc++Kernel.h:140-146`).
        area_b = jnp.where(
            lanes >= d, pltpu.roll(areas[d - 1], d, axis=1), _BIG
        )
        better_b = (area_b < best_area) | (
            (area_b == best_area) & (-d < best_rel)
        )
        best_area = jnp.where(better_b, area_b, best_area)
        best_rel = jnp.where(better_b, -d, best_rel)

    has_nn = best_area < _BIG
    # mutual pair (i, i+d): best_rel[i] == d and best_rel[i+d] == -d
    merge = jnp.zeros((1, s), jnp.bool_)
    dropped = jnp.zeros((1, s), jnp.bool_)
    for d in range(1, R + 1):
        br_fwd = pltpu.roll(best_rel, s - d, axis=1)  # best_rel[i + d]
        br_bwd = pltpu.roll(best_rel, d, axis=1)  # best_rel[i - d]
        merge = merge | ((best_rel == d) & (br_fwd == -d))
        dropped = dropped | ((best_rel == -d) & (br_bwd == d))
    merge = merge & has_nn & valid
    dropped = dropped & has_nn & valid
    as_i = lambda x: lax.bitcast_convert_type(x, jnp.int32)
    ucols = as_i(jnp.minimum(cols, as_f(partner[0:6, :])))

    flags = merge.astype(jnp.int32) + 2 * dropped.astype(jnp.int32)
    return jnp.concatenate(
        [ucols, partner[7:8, :], flags], axis=0
    )  # i32[8, s]: rows 0..5 union bits, row 6 partner cnode, row 7 flags


def _nn_kernel(nc_ref, left_ref, mid_ref, right_ref, out_ref, *, radius: int,
               blk: int):
    H = _HALO
    mat = jnp.concatenate(
        [left_ref[:, blk - H:], mid_ref[:], right_ref[:, :H]], axis=1
    )  # i32[8, blk + 2H] window
    base = pl.program_id(0) * blk - H
    out = _nn_body(mat, nc_ref[0], nc_ref[1], base, radius=radius)
    out_ref[:] = out[:, H:H + blk]


def ploc_nn_round_raw(mat, n_clusters, shift_bits, radius: int,
                      interpret: bool = False):
    """Run the fused NN stage. mat: i32[8, S] (layout above); n_clusters /
    shift_bits: i32 scalars. Returns the raw i32[8, S] output (rows 0..5
    union AABB f32-bits, row 6 partner node id, row 7 flags)."""
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
        [jnp.asarray(n_clusters, jnp.int32), jnp.asarray(shift_bits, jnp.int32)]
    )
    clamp = lambda j: jnp.clip(j, 0, grid - 1)
    out = pl.pallas_call(
        functools.partial(_nn_kernel, radius=radius, blk=blk),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, blk), lambda i: (0, clamp(i - 1))),
            pl.BlockSpec((8, blk), lambda i: (0, i)),
            pl.BlockSpec((8, blk), lambda i: (0, clamp(i + 1))),
        ],
        out_specs=pl.BlockSpec((8, blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, sp), jnp.int32),
        interpret=interpret,
    )(sc, mat, mat, mat)
    return out[:, :s]


def ploc_nn_round(mat, n_clusters, radius: int, interpret: bool = False,
                  shift_bits=32):
    """Unpacked NN stage: returns (merge b[S], dropped b[S], ucols
    f32[6, S], rnode i32[S])."""
    out = ploc_nn_round_raw(mat, n_clusters, shift_bits, radius, interpret)
    flags = out[7]
    merge = flags == 1
    dropped = flags == 2
    ucols = lax.bitcast_convert_type(out[0:6], jnp.float32)
    return merge, dropped, ucols, out[6]
