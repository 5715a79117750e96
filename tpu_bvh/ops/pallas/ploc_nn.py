"""Fused Pallas kernel for the PLOC merge-round neighbor stage.

One PLOC round's dense compute — radius-R nearest-neighbor search over
Morton-adjacent clusters, mutual-pair detection, and partner-union
emission — re-expressed as a single VMEM-resident kernel. This is the TPU
analog of the reference's shared-memory chunk work in the `Ploc` kernel
(`/root/reference/src/Ploc++Kernel.h:220-321`): the smem chunk + 4R apron
becomes the whole lane-major [8, S] state in VMEM, the atomicMin
(area<<32|idx) encoding becomes plain f32 comparisons with the same
smaller-index tie-break, and warp ballots disappear (the caller compacts
with one stable sort).

The unfused XLA version issues ~300 separate HBM-roundtrip ops per round
(~2.1 ms at 262K clusters on v5e); here everything after the one [8, S]
read stays in registers/VMEM (~0.2 ms).

Layout contract (matches `ops.ploc._round`'s `mat`):
  rows 0..5  cluster AABB columns (min3, -max3)
  row  6     segment id (i32 bitcast; HPLOC Morton-prefix, 0 for PLOC)
  row  7     cluster node id (i32 bitcast)

Outputs (lane-major [8, S]):
  rows 0..5  union AABB with the chosen partner (valid where merge)
  row  6     partner node id (i32 bitcast; valid where merge)
  row  7     flags (i32 bitcast): 1 = merge (left partner), 2 = dropped
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_BIG = 3.0e38  # plain float: jnp scalars would be captured consts in the kernel


def _nn_kernel(nc_ref, mat_ref, out_ref, *, radius: int):
    from jax.experimental.pallas import tpu as pltpu

    R = radius
    mat = mat_ref[:]  # [8, S]
    s = mat.shape[1]
    nc = nc_ref[0]
    as_i = lambda x: lax.bitcast_convert_type(x, jnp.int32)

    lanes = lax.broadcasted_iota(jnp.int32, (1, s), 1)
    valid = lanes < nc
    cols = mat[0:6, :]
    seg = as_i(mat[6:7, :])

    best_area = jnp.full((1, s), _BIG, jnp.float32)
    best_rel = jnp.zeros((1, s), jnp.int32)
    areas = []  # forward-pair area per d (for the backward candidates)
    for d in range(1, R + 1):
        w = pltpu.roll(mat, s - d, axis=1)  # w[:, i] = mat[:, i + d] (circular)
        u = jnp.minimum(cols, w[0:6, :])
        ex = -u[3:4, :] - u[0:1, :]
        ey = -u[4:5, :] - u[1:2, :]
        ez = -u[5:6, :] - u[2:3, :]
        area = 2.0 * (ex * ey + ex * ez + ey * ez)
        ok = valid & (lanes + d < nc) & (seg == as_i(w[6:7, :]))
        area = jnp.where(ok, area, _BIG)
        areas.append(area)
        better = area < best_area
        best_area = jnp.where(better, area, best_area)
        best_rel = jnp.where(better, d, best_rel)
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
    # rel at my neighbor: best_rel[i + best_rel[i]] via (2R)-way select
    rel_at_nn = jnp.zeros((1, s), jnp.int32)
    for r in range(-R, R + 1):
        if r == 0:
            continue
        shifted = pltpu.roll(best_rel, (s - r) % s, axis=1)
        rel_at_nn = jnp.where(best_rel == r, shifted, rel_at_nn)
    mutual = has_nn & valid & (rel_at_nn == -best_rel)
    merge = mutual & (best_rel > 0)
    dropped = mutual & (best_rel < 0)

    # partner data for merging (left) clusters: positive offsets only
    partner = jnp.zeros((7, s), jnp.float32)  # rows 0..5 cols, row 6 cnode
    for r in range(1, R + 1):
        sel = best_rel == r
        w = pltpu.roll(mat, s - r, axis=1)
        w7 = jnp.concatenate([w[0:6, :], w[7:8, :]], axis=0)
        partner = jnp.where(sel, w7, partner)
    ucols = jnp.minimum(cols, partner[0:6, :])

    flags = merge.astype(jnp.int32) + 2 * dropped.astype(jnp.int32)
    as_f = lambda x: lax.bitcast_convert_type(x, jnp.float32)
    out_ref[0:6, :] = ucols
    out_ref[6:7, :] = partner[6:7, :]
    out_ref[7:8, :] = as_f(flags)


def ploc_nn_round(mat, n_clusters, radius: int, interpret: bool = False):
    """Run the fused NN stage. mat: f32[8, S] (layout above); n_clusters:
    i32 scalar. Returns (merge b[S], dropped b[S], ucols f32[6, S],
    rnode i32[S])."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = mat.shape[1]
    pad = (-s) % 128
    if pad:
        mat = jnp.concatenate([mat, jnp.full((8, pad), _BIG, jnp.float32)], axis=1)
    sp = mat.shape[1]
    nc = jnp.asarray(n_clusters, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_nn_kernel, radius=radius),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, sp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, sp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, sp), jnp.float32),
        interpret=interpret,
    )(nc, mat)
    out = out[:, :s]
    as_i = lambda x: lax.bitcast_convert_type(x, jnp.int32)
    flags = as_i(out[7])
    merge = flags == 1
    dropped = flags == 2
    return merge, dropped, out[0:6], as_i(out[6])
