"""Fused Pallas kernels for the threshold-scan topology core.

Computes, for every Morton boundary i with (remapped) delta value d_i in
[0, 63]:

  psv(i):  max_{j < i, d_j < d_i} (j*64 + d_j)      (prev smaller, packed)
  nsv(i):  min_{j > i, d_j < d_i} (j*64 + d_j)      (next smaller, packed)

The unfused XLA version materializes [m, 64] threshold planes in HBM four
times (mask, scan, exclusive shift, one-hot select) — ~6 ms at 262K on
v5e. Here the planes live only in VMEM registers: each kernel streams the
delta column, expands the 64 threshold lanes in-register, runs the
directional scan with log2(chunk) sublane rolls + a carry row in scratch,
and immediately reduces back to one packed value per row via the one-hot
select. Traffic: read i32[m], write i32[m].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

CHUNK = 512
V = 64
_BIG = 2**31 - 1


def _psv_kernel(dlt_ref, out_ref, carry_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    c = dlt_ref.shape[0]

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, -1)

    dlt = dlt_ref[:]  # [C, 1]
    rows = lax.broadcasted_iota(jnp.int32, (c, V), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (c, V), 1)
    g = i * c + rows  # global boundary index
    packed = g * 64 + dlt
    masked = jnp.where(dlt < lanes, packed, -1)  # [C, V]

    # inclusive prefix max along rows
    x = masked
    k = 1
    while k < c:
        rolled = pltpu.roll(x, k, axis=0)
        x = jnp.where(rows >= k, jnp.maximum(x, rolled), x)
        k <<= 1
    x = jnp.maximum(x, carry_ref[0:1, :])
    # exclusive: value strictly before this row
    excl = jnp.where(
        rows >= 1, pltpu.roll(x, 1, axis=0), carry_ref[0:1, :]
    )
    # one-hot select at each row's own delta lane
    sel = jnp.where(dlt == lanes, excl, -_BIG)
    out_ref[:] = jnp.max(sel, axis=1, keepdims=True)
    carry_ref[:] = x[c - 1 : c, :]


def _nsv_kernel(dlt_ref, out_ref, carry_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    c = dlt_ref.shape[0]
    nchunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, _BIG)

    dlt = dlt_ref[:]
    rows = lax.broadcasted_iota(jnp.int32, (c, V), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (c, V), 1)
    g = (nchunks - 1 - i) * c + rows
    packed = g * 64 + dlt
    masked = jnp.where(dlt < lanes, packed, _BIG)

    # inclusive suffix min along rows
    x = masked
    k = 1
    while k < c:
        rolled = pltpu.roll(x, c - k, axis=0)  # circular: x[r + k]
        x = jnp.where(rows < c - k, jnp.minimum(x, rolled), x)
        k <<= 1
    x = jnp.minimum(x, carry_ref[0:1, :])
    # exclusive: value strictly after this row
    excl = jnp.where(
        rows < c - 1, pltpu.roll(x, c - 1, axis=0), carry_ref[0:1, :]
    )
    sel = jnp.where(dlt == lanes, excl, _BIG)
    out_ref[:] = jnp.min(sel, axis=1, keepdims=True)
    carry_ref[:] = x[0:1, :]


def _psv_kernel_lanes(dlt_ref, out_ref, carry_ref):
    """Lane-major variant: positions on lanes, thresholds on sublanes —
    lane rolls ride the VPU shuffle network (sublane rolls don't)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    c = dlt_ref.shape[1]

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, -1)

    dlt = dlt_ref[0:1, :]  # [1, C]
    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    g = i * c + lanes
    packed = g * 64 + dlt  # broadcast [V, C]
    x = jnp.where(dlt < subl, packed, -1)

    k = 1
    while k < c:
        rolled = pltpu.roll(x, k, axis=1)  # rolled[:, j] = x[:, j-k]
        x = jnp.where(lanes >= k, jnp.maximum(x, rolled), x)
        k <<= 1
    x = jnp.maximum(x, carry_ref[:, 0:1])
    excl = jnp.where(lanes >= 1, pltpu.roll(x, 1, axis=1), carry_ref[:, 0:1])
    sel = jnp.where(dlt == subl, excl, -_BIG)
    out_ref[:] = jnp.max(sel, axis=0, keepdims=True)
    carry_ref[:] = x[:, c - 1 : c]


def _nsv_kernel_lanes(dlt_ref, out_ref, carry_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    c = dlt_ref.shape[1]
    nchunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, _BIG)

    dlt = dlt_ref[0:1, :]
    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    g = (nchunks - 1 - i) * c + lanes
    packed = g * 64 + dlt
    x = jnp.where(dlt < subl, packed, _BIG)

    k = 1
    while k < c:
        rolled = pltpu.roll(x, c - k, axis=1)  # circular: x[:, j+k]
        x = jnp.where(lanes < c - k, jnp.minimum(x, rolled), x)
        k <<= 1
    x = jnp.minimum(x, carry_ref[:, 0:1])
    excl = jnp.where(lanes < c - 1, pltpu.roll(x, c - 1, axis=1), carry_ref[:, 0:1])
    sel = jnp.where(dlt == subl, excl, _BIG)
    out_ref[:] = jnp.min(sel, axis=0, keepdims=True)
    carry_ref[:] = x[:, 0:1]


def _run_lanes(kernel, dlt, reverse: bool, pad_value: int, interpret: bool, chunk: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = dlt.shape[0]
    pad = (-m) % chunk
    if pad:
        filler = jnp.full((pad,), pad_value, jnp.int32)
        dlt = (
            jnp.concatenate([dlt, filler])
            if not reverse
            else jnp.concatenate([filler, dlt])
        )
    mp = dlt.shape[0]
    chunks = mp // chunk
    row = dlt.reshape(1, mp)
    if reverse:
        index_map = lambda i: (0, chunks - 1 - i)
    else:
        index_map = lambda i: (0, i)
    out = pl.pallas_call(
        kernel,
        grid=(chunks,),
        in_specs=[pl.BlockSpec((1, chunk), index_map, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk), index_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, mp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((V, 1), jnp.int32)],
        interpret=interpret,
    )(row)
    out = out.reshape(mp)
    if pad:
        if not reverse:
            out = out[:m]
        else:
            out = out[pad:]
            out = jnp.where(out != _BIG, out - pad * 64, out)
    return out


def psv_nsv_packed_lanes(dlt, interpret: bool = False, chunk: int = 1024):
    """Lane-major fused kernels (positions on lanes)."""
    psv = _run_lanes(
        _psv_kernel_lanes, dlt, reverse=False, pad_value=63, interpret=interpret, chunk=chunk
    )
    nsv = _run_lanes(
        _nsv_kernel_lanes, dlt, reverse=True, pad_value=63, interpret=interpret, chunk=chunk
    )
    return psv, nsv


def _run(kernel, dlt, reverse: bool, pad_value: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = dlt.shape[0]
    pad = (-m) % CHUNK
    if pad:
        filler = jnp.full((pad,), pad_value, jnp.int32)
        dlt = (
            jnp.concatenate([dlt, filler])
            if not reverse
            else jnp.concatenate([filler, dlt])
        )
    mp = dlt.shape[0]
    chunks = mp // CHUNK
    col = dlt.reshape(mp, 1)
    if reverse:
        index_map = lambda i: (chunks - 1 - i, 0)
    else:
        index_map = lambda i: (i, 0)
    out = pl.pallas_call(
        kernel,
        grid=(chunks,),
        in_specs=[pl.BlockSpec((CHUNK, 1), index_map, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CHUNK, 1), index_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, V), jnp.int32)],
        interpret=interpret,
    )(col)
    out = out.reshape(mp)
    if pad:
        if not reverse:
            out = out[:m]
        else:
            # reverse pads at the front, so in-kernel row indices (and the
            # positions packed into the results) are biased by `pad`
            out = out[pad:]
            out = jnp.where(out != _BIG, out - pad * 64, out)
    return out


def psv_nsv_packed(dlt, interpret: bool = False):
    """Fused (psv_packed, nsv_packed) for remapped deltas i32[m] in [0,63].
    psv sentinel: -1 (none); nsv sentinel: 2^31-1 (none)."""
    # Padding deltas use value 63 so padded rows never become anyone's
    # "smaller" neighbor within the real range... they are outside the real
    # rows anyway (appended after for fwd, before for rev) so any value
    # works for correctness of real rows; 0 would make padded rows pick up
    # real values harmlessly. We use 63 and real rows cannot see padding:
    # fwd pads after (never scanned before real rows), rev pads before.
    psv = _run(_psv_kernel, dlt, reverse=False, pad_value=63, interpret=interpret)
    nsv = _run(_nsv_kernel, dlt, reverse=True, pad_value=63, interpret=interpret)
    return psv, nsv


def psv_nsv_packed_reference(dlt):
    """lax fallback / oracle (also used on CPU and under vmap)."""
    m = dlt.shape[0]
    pos = jnp.arange(m, dtype=jnp.int32)
    packed = pos * 64 + dlt
    vr = jnp.arange(V, dtype=jnp.int32)
    maskv = dlt[:, None] < vr[None, :]
    pk = jnp.where(maskv, packed[:, None], _BIG)
    suf = lax.cummin(pk, axis=0, reverse=True)
    nsv_rows = jnp.concatenate([suf[1:], jnp.full((1, V), _BIG, jnp.int32)], axis=0)
    pk2 = jnp.where(maskv, packed[:, None], jnp.int32(-1))
    pre = lax.cummax(pk2, axis=0)
    psv_rows = jnp.concatenate([jnp.full((1, V), -1, jnp.int32), pre[:-1]], axis=0)
    onehot = dlt[:, None] == vr[None, :]
    nsv = jnp.sum(jnp.where(onehot, nsv_rows, 0), axis=1)
    psv = jnp.sum(jnp.where(onehot, psv_rows, 0), axis=1)
    return psv, nsv


def psv_nsv_packed_auto(dlt):
    from ...utils.platform import on_tpu

    if on_tpu() and dlt.ndim == 1 and dlt.shape[0] >= 2 * CHUNK:
        # lane-major wins 3.5x over the sublane variant on v5e (lane rolls
        # ride the shuffle network; sublane rolls are tile copies)
        return psv_nsv_packed_lanes(dlt, chunk=2048)
    return psv_nsv_packed_reference(dlt)


# ---------------------------------------------------------------------------
# Payload-carrying variants: alongside psv/nsv they return an arbitrary i32
# payload evaluated AT the psv/nsv position (payload[psv(i)], payload[nsv(i)]).
# This is how "value of f at my parent" queries avoid gathers entirely: the
# Karras relabeling needs pi[parent] for every node (a 2m-row gather, ~4.6 ms
# at 262K); riding the scan costs one extra kernel pass (~1 ms).
# ---------------------------------------------------------------------------


def _psv_kernel_lanes_pay(dlt_ref, pay_ref, out_ref, outp_ref, carry_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    c = dlt_ref.shape[1]

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, -1)

    dlt = dlt_ref[0:1, :]
    pay = pay_ref[0:1, :]
    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    g = i * c + lanes
    packed = g * 64 + dlt
    x = jnp.where(dlt < subl, packed, -1)
    p = jnp.where(dlt < subl, pay, -1)

    k = 1
    while k < c:
        rx = pltpu.roll(x, k, axis=1)
        rp = pltpu.roll(p, k, axis=1)
        take = (lanes >= k) & (rx > x)
        x = jnp.where(take, rx, x)
        p = jnp.where(take, rp, p)
        k <<= 1
    cx = carry_ref[:, 0:1]
    cp = carry_ref[:, 1:2]
    tc = cx > x
    x = jnp.where(tc, cx, x)
    p = jnp.where(tc, cp, p)
    ex = jnp.where(lanes >= 1, pltpu.roll(x, 1, axis=1), cx)
    ep = jnp.where(lanes >= 1, pltpu.roll(p, 1, axis=1), cp)
    selx = jnp.where(dlt == subl, ex, -_BIG)
    selp = jnp.where(dlt == subl, ep, -_BIG)
    out_ref[:] = jnp.max(selx, axis=0, keepdims=True)
    outp_ref[:] = jnp.max(selp, axis=0, keepdims=True)
    carry_ref[:, 0:1] = x[:, c - 1 : c]
    carry_ref[:, 1:2] = p[:, c - 1 : c]


def _nsv_kernel_lanes_pay(dlt_ref, pay_ref, out_ref, outp_ref, carry_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    c = dlt_ref.shape[1]
    nchunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:, 0:1] = jnp.full_like(carry_ref[:, 0:1], _BIG)
        carry_ref[:, 1:2] = jnp.full_like(carry_ref[:, 1:2], -1)

    dlt = dlt_ref[0:1, :]
    pay = pay_ref[0:1, :]
    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    g = (nchunks - 1 - i) * c + lanes
    packed = g * 64 + dlt
    x = jnp.where(dlt < subl, packed, _BIG)
    p = jnp.where(dlt < subl, pay, -1)

    k = 1
    while k < c:
        rx = pltpu.roll(x, c - k, axis=1)
        rp = pltpu.roll(p, c - k, axis=1)
        take = (lanes < c - k) & (rx < x)
        x = jnp.where(take, rx, x)
        p = jnp.where(take, rp, p)
        k <<= 1
    cx = carry_ref[:, 0:1]
    cp = carry_ref[:, 1:2]
    tc = cx < x
    x = jnp.where(tc, cx, x)
    p = jnp.where(tc, cp, p)
    ex = jnp.where(lanes < c - 1, pltpu.roll(x, c - 1, axis=1), cx)
    ep = jnp.where(lanes < c - 1, pltpu.roll(p, c - 1, axis=1), cp)
    selx = jnp.where(dlt == subl, ex, _BIG)
    selp = jnp.where(dlt == subl, ep, -_BIG)
    out_ref[:] = jnp.min(selx, axis=0, keepdims=True)
    # payload rides the same decisions; one-hot rows leave exactly one live
    # lane, so max-select works for the payload regardless of its ordering
    outp_ref[:] = jnp.max(selp, axis=0, keepdims=True)
    carry_ref[:, 0:1] = x[:, 0:1]
    carry_ref[:, 1:2] = p[:, 0:1]


def _run_lanes_pay(kernel, dlt, pay, reverse, pad_value, interpret, chunk):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = dlt.shape[0]
    pad = (-m) % chunk
    if pad:
        filler = jnp.full((pad,), pad_value, jnp.int32)
        pfill = jnp.full((pad,), -1, jnp.int32)
        if not reverse:
            dlt = jnp.concatenate([dlt, filler])
            pay = jnp.concatenate([pay, pfill])
        else:
            dlt = jnp.concatenate([filler, dlt])
            pay = jnp.concatenate([pfill, pay])
    mp = dlt.shape[0]
    chunks = mp // chunk
    if reverse:
        index_map = lambda i: (0, chunks - 1 - i)
    else:
        index_map = lambda i: (0, i)
    out, outp = pl.pallas_call(
        kernel,
        grid=(chunks,),
        in_specs=[
            pl.BlockSpec((1, chunk), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), index_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk), index_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), index_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, mp), jnp.int32),
            jax.ShapeDtypeStruct((1, mp), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((V, 2), jnp.int32)],
        interpret=interpret,
    )(dlt.reshape(1, mp), pay.reshape(1, mp))
    out = out.reshape(mp)
    outp = outp.reshape(mp)
    if pad:
        if not reverse:
            out = out[:m]
            outp = outp[:m]
        else:
            out = out[pad:]
            outp = outp[pad:]
            out = jnp.where(out != _BIG, out - pad * 64, out)
    return out, outp


def psv_nsv_payload_reference(dlt, pay):
    """XLA oracle: (psv_packed, pay[psv], nsv_packed, pay[nsv]); payload -1
    where no smaller value exists."""
    m = dlt.shape[0]
    pos = jnp.arange(m, dtype=jnp.int32)
    packed = pos * 64 + dlt
    vr = jnp.arange(V, dtype=jnp.int32)
    maskv = dlt[:, None] < vr[None, :]

    pk = jnp.where(maskv, packed[:, None], _BIG)
    pp = jnp.where(maskv, pay[:, None], -1)
    # suffix min with payload: emulate with argmin-free packing — payload
    # rides key decisions via a second cummin on (key, tiebroken) pairs.
    # Use cumulative scan via lax.associative... instead do the simple
    # two-array trick: scan keys, then recompute payload by equality.
    suf = lax.cummin(pk, axis=0, reverse=True)
    nsv_rows = jnp.concatenate([suf[1:], jnp.full((1, V), _BIG, jnp.int32)], 0)
    pk2 = jnp.where(maskv, packed[:, None], jnp.int32(-1))
    pre = lax.cummax(pk2, axis=0)
    psv_rows = jnp.concatenate([jnp.full((1, V), -1, jnp.int32), pre[:-1]], 0)
    onehot = dlt[:, None] == vr[None, :]
    nsv = jnp.sum(jnp.where(onehot, nsv_rows, 0), axis=1)
    psv = jnp.sum(jnp.where(onehot, psv_rows, 0), axis=1)
    # payload at position: positions are packed>>6; safe gather is fine as
    # the ORACLE (CPU/testing only)
    has_n = nsv != _BIG
    has_p = psv >= 0
    np_ = jnp.where(has_n, pay[jnp.clip(nsv >> 6, 0, m - 1)], -1)
    pp_ = jnp.where(has_p, pay[jnp.clip(psv >> 6, 0, m - 1)], -1)
    return psv, pp_, nsv, np_


def psv_nsv_payload_auto(dlt, pay):
    from ...utils.platform import on_tpu

    if on_tpu() and dlt.ndim == 1 and dlt.shape[0] >= 2 * CHUNK:
        psv, psv_pay = _run_lanes_pay(
            _psv_kernel_lanes_pay, dlt, pay, False, 63, False, 2048
        )
        nsv, nsv_pay = _run_lanes_pay(
            _nsv_kernel_lanes_pay, dlt, pay, True, 63, False, 2048
        )
        return psv, psv_pay, nsv, nsv_pay
    return psv_nsv_payload_reference(dlt, pay)


# ---------------------------------------------------------------------------
# Child-position scans: the radix tree's child links WITHOUT the (side,
# parent) inversion sort. For the split-position (Apetrei) layout, node k
# covers [psv(k)+1, nsv(k)] and splits at its own boundary k, so
#
#   left_child(k)  = argmin of dlt over (psv(k), k)      (leaf k if empty)
#   right_child(k) = argmin of dlt over (k, nsv(k))      (leaf k+1 if empty)
#
# (children are the shallowest boundaries of the half-ranges). For sorted
# keys the LCP array has UNIQUE range minima — two boundaries with equal
# delta and nothing smaller between them would need the same bit to flip
# 0->1 twice in an ascending sequence — so the argmin is well-defined with
# no tie-break. Per threshold lane v this is a *segmented* running min of
# (dlt << 22 | pos): candidates where dlt > v, segment resets where
# dlt <= v; selecting lane v = dlt[k] exclusively-before k gives the left
# child, and the mirrored suffix scan gives the right child. Same [V, c]
# lane-major roll structure as the PSV/NSV kernels.
# ---------------------------------------------------------------------------

_POSB = 22  # pos bits in the packed (dlt << 22 | pos) key; needs m < 2^22


def child_positions_reference(dlt):
    """XLA oracle: (left i32[m], right i32[m]) boundary index of each
    node's internal child, or -1 where the child is a leaf."""
    m = dlt.shape[0]
    pos = jnp.arange(m, dtype=jnp.int32)
    packed = (dlt << _POSB) | pos
    vr = jnp.arange(V, dtype=jnp.int32)
    cand = jnp.where(dlt[:, None] > vr[None, :], packed[:, None], _BIG)
    reset = dlt[:, None] <= vr[None, :]

    def comb(a, b):
        mm = jnp.where(b[1], b[0], jnp.minimum(a[0], b[0]))
        return (mm, a[1] | b[1])

    m_f, _ = lax.associative_scan(comb, (cand, reset), axis=0)
    m_excl = jnp.concatenate(
        [jnp.full((1, V), _BIG, jnp.int32), m_f[:-1]], axis=0
    )
    onehot = dlt[:, None] == vr[None, :]
    lpk = jnp.max(jnp.where(onehot, m_excl, 0), axis=1)
    left = jnp.where(lpk == _BIG, -1, lpk & ((1 << _POSB) - 1))

    # reverse: suffix segmented min, exclusive after k
    def comb_r(a, b):
        # scanning reversed array: same combine
        return comb(a, b)

    m_r, _ = lax.associative_scan(
        comb, (cand[::-1], reset[::-1]), axis=0
    )
    m_r = m_r[::-1]
    m_excl_r = jnp.concatenate(
        [m_r[1:], jnp.full((1, V), _BIG, jnp.int32)], axis=0
    )
    rpk = jnp.max(jnp.where(onehot, m_excl_r, 0), axis=1)
    right = jnp.where(rpk == _BIG, -1, rpk & ((1 << _POSB) - 1))
    return left, right


def _child_kernel_lanes_fwd(dlt_ref, out_ref, carry_ref):
    """Left-child segmented argmin scan (positions on lanes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    c = dlt_ref.shape[1]

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, _BIG)

    dlt = dlt_ref[0:1, :]
    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    g = i * c + lanes
    packed = (dlt << _POSB) | g  # broadcast [V, c]
    x = jnp.where(dlt > subl, packed, _BIG)
    # segment-reset flag as i32: Mosaic can't rotate i1 vectors
    r = (dlt <= subl).astype(jnp.int32)

    k = 1
    while k < c:
        rm = pltpu.roll(x, k, axis=1)  # window ending at i-k
        rr = pltpu.roll(r, k, axis=1)
        lm = jnp.where(lanes >= k, rm, _BIG)
        # combine(L, R): if R's window contains a reset, L is invisible
        x = jnp.where(r == 1, x, jnp.minimum(lm, x))
        r = r | jnp.where(lanes >= k, rr, 0)
        k <<= 1
    cm = carry_ref[:, 0:1]
    total = jnp.where(r == 1, x, jnp.minimum(cm, x))
    ex = jnp.where(lanes >= 1, pltpu.roll(total, 1, axis=1), cm)
    sel = jnp.where(dlt == subl, ex, 0)
    out_ref[:] = jnp.max(sel, axis=0, keepdims=True)
    carry_ref[:] = total[:, c - 1 : c]


def _child_kernel_lanes_rev(dlt_ref, out_ref, carry_ref):
    """Right-child segmented argmin scan (suffix direction)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    c = dlt_ref.shape[1]
    nchunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, _BIG)

    dlt = dlt_ref[0:1, :]
    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    g = (nchunks - 1 - i) * c + lanes
    packed = (dlt << _POSB) | g
    x = jnp.where(dlt > subl, packed, _BIG)
    r = (dlt <= subl).astype(jnp.int32)

    k = 1
    while k < c:
        rm = pltpu.roll(x, c - k, axis=1)  # window starting at i+k
        rr = pltpu.roll(r, c - k, axis=1)
        lm = jnp.where(lanes < c - k, rm, _BIG)
        x = jnp.where(r == 1, x, jnp.minimum(lm, x))
        r = r | jnp.where(lanes < c - k, rr, 0)
        k <<= 1
    cm = carry_ref[:, 0:1]
    total = jnp.where(r == 1, x, jnp.minimum(cm, x))
    ex = jnp.where(lanes < c - 1, pltpu.roll(total, c - 1, axis=1), cm)
    sel = jnp.where(dlt == subl, ex, 0)
    out_ref[:] = jnp.max(sel, axis=0, keepdims=True)
    carry_ref[:] = total[:, 0:1]


def _run_child(kernel, dlt, reverse, interpret, chunk):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = dlt.shape[0]
    pad = (-m) % chunk
    if pad:
        filler = jnp.zeros((pad,), jnp.int32)
        dlt = (
            jnp.concatenate([dlt, filler])
            if not reverse
            else jnp.concatenate([filler, dlt])
        )
    mp = dlt.shape[0]
    chunks = mp // chunk
    if reverse:
        index_map = lambda i: (0, chunks - 1 - i)
    else:
        index_map = lambda i: (0, i)
    out = pl.pallas_call(
        kernel,
        grid=(chunks,),
        in_specs=[pl.BlockSpec((1, chunk), index_map, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk), index_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, mp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((V, 1), jnp.int32)],
        interpret=interpret,
    )(dlt.reshape(1, mp))
    out = out.reshape(mp)
    if pad:
        if not reverse:
            out = out[:m]
        else:
            out = out[pad:]
            mask = (1 << _POSB) - 1
            out = jnp.where(
                out != _BIG, ((out & mask) - pad) | (out & ~mask), out
            )
    return out


def child_positions_auto(dlt):
    """(left i32[m], right i32[m]) internal-child boundary positions, -1
    where the child is a leaf. Pallas on TPU, XLA reference elsewhere."""
    from ...utils.platform import on_tpu

    if on_tpu() and dlt.ndim == 1 and dlt.shape[0] >= 2 * CHUNK:
        lpk = _run_child(_child_kernel_lanes_fwd, dlt, False, False, 2048)
        rpk = _run_child(_child_kernel_lanes_rev, dlt, True, False, 2048)
        mask = (1 << _POSB) - 1
        left = jnp.where(lpk == _BIG, -1, lpk & mask)
        right = jnp.where(rpk == _BIG, -1, rpk & mask)
        return left, right
    return child_positions_reference(dlt)
