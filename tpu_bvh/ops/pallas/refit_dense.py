"""Fused Pallas kernel for the anchored-refit dense phase.

`refit.refit_anchored` resolves every short-range node (range within
+-radius of its own boundary — the overwhelming majority in Morton order)
with 2*radius masked shifted-window unions. In XLA that is ~2*radius
round-trips of the [6, n] packed-leaf matrix through HBM (~0.5 ms at 262K
on v5e); here it is one blocked stencil pass: each [8, BLK] block plus a
128-lane halo lives in VMEM, the +-d neighbor views are `pltpu.roll`s, and
the per-lane range masks are plain compares. The fine level-4 table row
(T4[i] = min over leaves [i, i+16), consumed by the long-node table path)
falls out of the same rolls for free as a second output.

Carriage is i32 (the `first`/`last` index rows bitcast into f32 are
denormals and XLA:TPU fusions flush those to zero — measured: it silently
flipped every node to the long path, 1.3 -> 5.5 ms with correct output);
the AABB rows are f32 bits viewed as i32 for transport and bitcast back
for the min math. Outputs are f32 with the short flag as exact 0.0/1.0.

This is the refit counterpart of the reference's smem-staged block work
(`/root/reference/src/TwoPassLbvhKernel.h:217-235` does the equivalent
propagation with global atomics; the range-min formulation is ours).

Input layout (lane-major i32[8, n]):
  rows 0..5  packed leaf columns (min3, -max3), f32 bitcast
  row  6     first (i32) for boundary i (only cols [0, m) used)
  row  7     last  (i32)

Outputs:
  acc  f32[8, n]: rows 0..5 short-node union (valid where short),
                  row 6 short flag (0.0 / 1.0), row 7 unused
  t4   f32[6, n]: fine level-4 table row (clamped windows)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38
_BIGBITS = 2137108966  # np.float32(3.0e38).view(np.int32)
_HALO = 128  # >= radius and >= 16 (T4 window)
_BLK = 16384


def _kernel(left_ref, mid_ref, right_ref, acc_ref, t4_ref, *, radius: int,
            blk: int, n: int):
    R = radius
    H = _HALO
    mat = jnp.concatenate(
        [left_ref[:, blk - H:], mid_ref[:], right_ref[:, :H]], axis=1
    )  # i32[8, blk + 2H]
    s = mat.shape[1]
    as_f = lambda x: lax.bitcast_convert_type(x, jnp.float32)

    base = pl.program_id(0) * blk - H
    lanes = base + lax.broadcasted_iota(jnp.int32, (1, s), 1)
    cols = as_f(mat[0:6, :])
    first = mat[6:7, :]
    last = mat[7:8, :]
    # Monotone masks: the range always contains the node's own boundary, so
    # forward validity (j = i + d in [first, last]) is just d <= la and
    # backward validity is d <= ab — ONE compare per offset instead of two.
    la = last - lanes   # forward budget (>= 0 on real boundaries)
    ab = lanes - first  # backward budget
    # Position-masked copy: lanes >= n (pad / clamped edge-block garbage)
    # hold +big so the T4 clamped windows need no per-offset mask at all.
    # acc windows may use it too: their d <= la mask keeps j <= last < n,
    # where colsv == cols.
    colsv = jnp.where(lanes <= n - 1, cols, _BIG)

    acc = jnp.full((6, s), _BIG, jnp.float32)
    t4 = colsv
    for d in range(1, 16):
        w = as_f(pltpu.roll(
            lax.bitcast_convert_type(colsv, jnp.int32), s - d, axis=1
        ))  # colsv[:, i + d]
        t4 = jnp.minimum(t4, w)
        if d <= R:
            acc = jnp.where(d <= la, jnp.minimum(acc, w), acc)
    for d in range(16, R + 1):
        w = as_f(pltpu.roll(
            lax.bitcast_convert_type(colsv, jnp.int32), s - d, axis=1
        ))
        acc = jnp.where(d <= la, jnp.minimum(acc, w), acc)
    for d in range(0, R):
        w = as_f(pltpu.roll(mat[0:6, :], d, axis=1)) if d else cols  # i - d
        acc = jnp.where(d <= ab, jnp.minimum(acc, w), acc)

    short = (ab < R) & (la <= R)
    out = jnp.concatenate(
        [acc, short.astype(jnp.float32), jnp.zeros((1, s), jnp.float32)],
        axis=0,
    )
    acc_ref[:] = out[:, H:H + blk]
    t4_ref[:] = t4[:, H:H + blk]


def refit_dense_pallas(mat, n: int, radius: int, interpret: bool = False):
    """mat: i32[8, n] (layout above). Returns (acc f32[6, n], short b[n],
    t4 f32[6, n]). Only columns [0, n-1) of acc/short are meaningful."""
    if radius > _HALO or _HALO < 16:
        raise ValueError(f"radius {radius} exceeds halo {_HALO}")
    s = mat.shape[1]
    blk = min(_BLK, -(-s // 128) * 128)
    pad = (-s) % blk
    if pad:
        mat = jnp.concatenate(
            [mat, jnp.full((8, pad), _BIGBITS, jnp.int32)], axis=1
        )
    sp = mat.shape[1]
    grid = sp // blk
    clamp = lambda j: jnp.clip(j, 0, grid - 1)
    kwargs = {}
    if not interpret:
        # the stencil's live [6, blk+2H] temporaries exceed the default
        # 16 MB scoped-VMEM cap at blk=16K; raise it like collapse_block
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    acc, t4 = pl.pallas_call(
        functools.partial(_kernel, radius=radius, blk=blk, n=n),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, blk), lambda i: (0, clamp(i - 1))),
            pl.BlockSpec((8, blk), lambda i: (0, i)),
            pl.BlockSpec((8, blk), lambda i: (0, clamp(i + 1))),
        ],
        out_specs=[
            pl.BlockSpec((8, blk), lambda i: (0, i)),
            pl.BlockSpec((6, blk), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, sp), jnp.float32),
            jax.ShapeDtypeStruct((6, sp), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(mat, mat, mat)
    short = acc[6, :s] == 1.0
    return acc[0:6, :s], short, t4[:, :s]
