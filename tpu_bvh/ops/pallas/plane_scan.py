"""Pallas TPU kernel: batched inclusive min/max scan along axis 0.

The threshold-scan topology core needs cummin/cummax over [m, V] planes
(V = 64 threshold lanes, m = one row per Morton boundary). XLA's cumulative
ops run ~15x off memory bound for this shape on v5e, so this kernel does it
directly: the grid walks row-chunks sequentially (forward or reverse), each
chunk computes its intra-chunk scan with log2(C) sublane rolls on the VPU
and folds in a carry row kept in VMEM scratch across grid steps. Bandwidth
bound: one read + one write of the plane.

Used by `radix_tree._threshold_core`; falls back to `lax` cumulative ops on
non-TPU backends (and in interpret mode for tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

CHUNK = 512


def _scan_kernel(x_ref, o_ref, carry_ref, *, is_min, reverse, sentinel):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    c = x_ref.shape[0]
    v = x_ref.shape[1]
    op = jnp.minimum if is_min else jnp.maximum

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, sentinel)

    x = x_ref[:]
    rows = lax.broadcasted_iota(jnp.int32, (c, v), 0)
    k = 1
    while k < c:
        if not reverse:
            from jax.experimental.pallas import tpu as pltpu

            rolled = pltpu.roll(x, k, axis=0)
            x = jnp.where(rows >= k, op(x, rolled), x)
        else:
            from jax.experimental.pallas import tpu as pltpu

            rolled = pltpu.roll(x, c - k, axis=0)  # circular: x[i + k]
            x = jnp.where(rows < c - k, op(x, rolled), x)
        k <<= 1
    x = op(x, carry_ref[0:1, :])
    o_ref[:] = x
    if not reverse:
        carry_ref[:] = x[c - 1 : c, :]
    else:
        carry_ref[:] = x[0:1, :]


def plane_scan(x, *, is_min: bool, reverse: bool, interpret: bool = False):
    """Inclusive cummin/cummax of x (i32[m, V]) along axis 0; `reverse=True`
    scans from the bottom (suffix scan)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, v = x.shape
    sentinel = (2**31 - 1) if is_min else -(2**31)

    pad = (-m) % CHUNK
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad, v), sentinel, x.dtype)], axis=0
        ) if not reverse else jnp.concatenate(
            [jnp.full((pad, v), sentinel, x.dtype), x], axis=0
        )
    mp = x.shape[0]
    chunks = mp // CHUNK

    if reverse:
        index_map = lambda i: (chunks - 1 - i, 0)
    else:
        index_map = lambda i: (i, 0)

    out = pl.pallas_call(
        functools.partial(
            _scan_kernel, is_min=is_min, reverse=reverse, sentinel=sentinel
        ),
        grid=(chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK, v), index_map, memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((CHUNK, v), index_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, v), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, v), x.dtype)],
        interpret=interpret,
    )(x)
    if pad:
        out = out[:m] if not reverse else out[pad:]
    return out


def plane_scan_reference(x, *, is_min: bool, reverse: bool):
    """lax fallback (CPU backend / correctness oracle)."""
    op = lax.cummin if is_min else lax.cummax
    return op(x, axis=0, reverse=reverse)


def plane_scan_auto(x, *, is_min: bool, reverse: bool):
    """Pallas on TPU (for plane sizes worth a kernel launch), lax elsewhere
    — small/batched inputs (e.g. the vmapped 32-prim batched builder) keep
    the lax path, which also vmaps trivially."""
    from ...utils.platform import on_tpu

    if on_tpu() and x.ndim == 2 and x.shape[0] >= 4 * CHUNK:
        return plane_scan(x, is_min=is_min, reverse=reverse)
    return plane_scan_reference(x, is_min=is_min, reverse=reverse)
