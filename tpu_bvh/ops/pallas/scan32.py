"""V=32 fused forward scan core for the LBVH topology build.

One forward Pallas kernel computes, for every Morton boundary, BOTH the
previous-smaller-value query (psv) and the left-child segmented argmin; a
second identical-direction kernel on the *flipped* delta array yields nsv
and the right child (a reverse-grid pallas_call costs ~3x a forward one on
v5e — measured in tools/profile_core_glue.py — so the data is flipped, not
the grid).

The threshold-lane count drops from 64 to 32 by collapsing all tie deltas
(equal adjacent Morton codes, reference `TwoPassLbvhKernel.h:32-40`'s
index-augmented comparison) onto one lane: within a run of equal codes the
boundary deltas are `63 - ntz(j+1)` — the ruler sequence — so tie-vs-tie
psv/nsv/argmin queries have *closed forms* in index arithmetic, evaluated
in-kernel:

  prev smaller tie:  k = j - lowbit(j+1)
  next smaller tie:  k = j + lowbit(j+1)
  argmin over (A,B]: k+1 = B with bits below highbit(A^B) cleared

Lane 30 carries "last/next non-tie position", which is simultaneously the
scan answer for tie queries and the run-boundary needed by the closed
forms. Non-tie deltas of <=30-bit codes occupy lanes [0, 29].

Outputs are fully corrected (true coordinates, comparable value codes on
the [0, 52] scale shared with `radix_tree._threshold_core`):

  psv_pos i32[m]  (-1 none)     nsv_pos i32[m]  (m none)
  psv_val i32[m]  (-1 none)     nsv_val i32[m]  (-1 none)
  lc      i32[m]  (-1 = leaf)   rc      i32[m]  (-1 = leaf)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

V = 32
CHUNK = int(os.environ.get("TBVH_SCAN32_CHUNK", "4096"))
_BIG = 2**31 - 1
_POSB = 22
_POSMASK = (1 << _POSB) - 1


def _log2_pow2(p):
    """Exact log2 of a power-of-two i32 (p <= 2^23) via the f32 exponent."""
    f = p.astype(jnp.float32)
    return (lax.bitcast_convert_type(f, jnp.int32) >> 23) - 127


def _highbit(x):
    """Largest power of two <= x (x >= 1), constant shifts only."""
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    return x - (x >> 1)


def _scan_pair(dlt, lanes, subl, g, carry_x, carry_y, carry_r):
    """Shared in-chunk Hillis-Steele for the psv max-scan (x) and the
    left-child segmented min-scan (y, resets r). Returns inclusive totals
    and the exclusive-by-one views."""
    c = dlt.shape[1]
    packed = g * 64 + dlt
    x = jnp.where(dlt < subl, packed, -1)
    y = jnp.where(dlt > subl, (dlt << _POSB) | g, _BIG)
    r = (dlt <= subl).astype(jnp.int32)

    k = 1
    while k < c:
        rx = pltpu.roll(x, k, axis=1)
        x = jnp.where(lanes >= k, jnp.maximum(x, rx), x)
        ry = pltpu.roll(y, k, axis=1)
        rr = pltpu.roll(r, k, axis=1)
        lm = jnp.where(lanes >= k, ry, _BIG)
        y = jnp.where(r == 1, y, jnp.minimum(lm, y))
        r = r | jnp.where(lanes >= k, rr, 0)
        k <<= 1
    x = jnp.maximum(x, carry_x)
    y_tot = jnp.where(r == 1, y, jnp.minimum(carry_y, y))
    ex = jnp.where(lanes >= 1, pltpu.roll(x, 1, axis=1), carry_x)
    ey = jnp.where(lanes >= 1, pltpu.roll(y_tot, 1, axis=1), carry_y)
    return x, y_tot, ex, ey


def _fwd_kernel(dlt_ref, psvp_ref, psvv_ref, lc_ref, cx_ref, cy_ref):
    i = pl.program_id(0)
    c = dlt_ref.shape[1]

    @pl.when(i == 0)
    def _():
        cx_ref[:] = jnp.full_like(cx_ref, -1)
        cy_ref[:] = jnp.full_like(cy_ref, _BIG)

    dlt = dlt_ref[0:1, :]
    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    g = i * c + lanes
    x, y_tot, ex, ey = _scan_pair(
        dlt, lanes, subl, g, cx_ref[:, 0:1], cy_ref[:, 0:1], None
    )
    cx_ref[:] = x[:, c - 1 : c]
    cy_ref[:] = y_tot[:, c - 1 : c]
    psv_pos, psv_val, lc = _fwd_correct(dlt, g, ex, ey, subl)
    psvp_ref[:] = psv_pos
    psvv_ref[:] = psv_val
    lc_ref[:] = lc


def _fwd_correct(dlt, g, ex, ey, subl):
    # selections at each position's own lane + the lane-30 row
    selx = jnp.where(dlt == subl, ex, -_BIG)
    psv_packed = jnp.max(selx, axis=0, keepdims=True)
    sely = jnp.where(dlt == subl, ey, 0)
    lc_packed = jnp.max(sely, axis=0, keepdims=True)
    lastnt_packed = ex[30:31, :]  # last non-tie strictly before

    # ---- in-kernel tie corrections (true coords == kernel coords) ----
    gi = g[0:1, :]
    tie = dlt == 30
    gp1 = gi + 1
    lowb = gp1 & -gp1
    k_prev = gi - lowb
    lastnt_pos = lastnt_packed >> 6  # -1 sentinel survives the shift
    a = lastnt_pos + 1
    use_run = tie & (k_prev >= a)

    psv_pos_scan = psv_packed >> 6
    psv_val_scan = jnp.where(psv_packed < 0, -1, psv_packed & 63)
    kp1 = k_prev + 1
    t_prev = _log2_pow2(kp1 & -kp1)
    psv_pos = jnp.where(use_run, k_prev, psv_pos_scan)
    psv_val = jnp.where(use_run, 52 - t_prev, psv_val_scan)

    # left child over the open interval (psv_pos, gi)
    empty = psv_pos >= gi - 1
    all_tie = lastnt_pos <= psv_pos
    A = psv_pos + 1
    B = gi
    hb = _highbit(jnp.maximum(A ^ B, 1))
    jstar = (B & ~(hb - 1)) - 1
    lc_scan = jnp.where(lc_packed == _BIG, -1, lc_packed & _POSMASK)
    lc = jnp.where(empty, -1, jnp.where(all_tie, jstar, lc_scan))
    return psv_pos, psv_val, lc


def _rev_kernel(dlt_ref, nsvp_ref, nsvv_ref, rc_ref, cx_ref, cy_ref, *, m: int):
    """Forward scan over the FLIPPED delta array; corrections and outputs in
    true coordinates (position j = m-1-g), array order still flipped."""
    i = pl.program_id(0)
    c = dlt_ref.shape[1]

    @pl.when(i == 0)
    def _():
        cx_ref[:] = jnp.full_like(cx_ref, -1)
        cy_ref[:] = jnp.full_like(cy_ref, _BIG)

    dlt = dlt_ref[0:1, :]
    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    g = i * c + lanes
    x, y_tot, ex, ey = _scan_pair(
        dlt, lanes, subl, g, cx_ref[:, 0:1], cy_ref[:, 0:1], None
    )
    cx_ref[:] = x[:, c - 1 : c]
    cy_ref[:] = y_tot[:, c - 1 : c]
    nsv_pos, nsv_val, rc = _rev_correct(dlt, g, ex, ey, subl, m)
    nsvp_ref[:] = nsv_pos
    nsvv_ref[:] = nsv_val
    rc_ref[:] = rc


def _rev_correct(dlt, g, ex, ey, subl, m: int):
    selx = jnp.where(dlt == subl, ex, -_BIG)
    nsv_packed = jnp.max(selx, axis=0, keepdims=True)
    sely = jnp.where(dlt == subl, ey, 0)
    rc_packed = jnp.max(sely, axis=0, keepdims=True)
    nextnt_packed = ex[30:31, :]

    gi = g[0:1, :]
    m1 = m - 1
    ti = jnp.maximum(m1 - gi, 0)  # true position (pad lanes clamp to 0)
    tie = dlt == 30
    tp1 = ti + 1
    lowb = tp1 & -tp1
    k_next = ti + lowb
    nextnt_pos = jnp.where(nextnt_packed < 0, m, m1 - (nextnt_packed >> 6))
    b = nextnt_pos - 1  # run end
    use_run = tie & (k_next <= b)

    nsv_pos_scan = jnp.where(nsv_packed < 0, m, m1 - (nsv_packed >> 6))
    nsv_val_scan = jnp.where(nsv_packed < 0, -1, nsv_packed & 63)
    kn1 = k_next + 1
    t_next = _log2_pow2(kn1 & -kn1)
    nsv_pos = jnp.where(use_run, k_next, nsv_pos_scan)
    nsv_val = jnp.where(use_run, 52 - t_next, nsv_val_scan)

    # right child over the open interval (ti, nsv_pos)
    empty = nsv_pos <= ti + 1
    all_tie = nextnt_pos >= nsv_pos
    A = ti + 1
    B = nsv_pos
    hb = _highbit(jnp.maximum(A ^ B, 1))
    jstar = (B & ~(hb - 1)) - 1
    rc_scan = jnp.where(rc_packed == _BIG, -1, m1 - (rc_packed & _POSMASK))
    rc = jnp.where(empty, -1, jnp.where(all_tie, jstar, rc_scan))
    return nsv_pos, nsv_val, rc


def _both_kernel(dltf_ref, dltr_ref, psvp_ref, psvv_ref, lc_ref,
                 nsvp_ref, nsvv_ref, rc_ref,
                 cxf_ref, cyf_ref, cxr_ref, cyr_ref, *, m: int):
    """Fused forward + flipped-forward pass: one kernel, one grid sweep,
    half the pass overhead of running `_fwd_kernel` then `_rev_kernel`."""
    i = pl.program_id(0)
    c = dltf_ref.shape[1]

    @pl.when(i == 0)
    def _():
        cxf_ref[:] = jnp.full_like(cxf_ref, -1)
        cyf_ref[:] = jnp.full_like(cyf_ref, _BIG)
        cxr_ref[:] = jnp.full_like(cxr_ref, -1)
        cyr_ref[:] = jnp.full_like(cyr_ref, _BIG)

    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    g = i * c + lanes

    dltf = dltf_ref[0:1, :]
    x, y_tot, ex, ey = _scan_pair(
        dltf, lanes, subl, g, cxf_ref[:, 0:1], cyf_ref[:, 0:1], None
    )
    cxf_ref[:] = x[:, c - 1 : c]
    cyf_ref[:] = y_tot[:, c - 1 : c]
    psv_pos, psv_val, lc = _fwd_correct(dltf, g, ex, ey, subl)
    psvp_ref[:] = psv_pos
    psvv_ref[:] = psv_val
    lc_ref[:] = lc

    dltr = dltr_ref[0:1, :]
    x, y_tot, ex, ey = _scan_pair(
        dltr, lanes, subl, g, cxr_ref[:, 0:1], cyr_ref[:, 0:1], None
    )
    cxr_ref[:] = x[:, c - 1 : c]
    cyr_ref[:] = y_tot[:, c - 1 : c]
    nsv_pos, nsv_val, rc = _rev_correct(dltr, g, ex, ey, subl, m)
    nsvp_ref[:] = nsv_pos
    nsvv_ref[:] = nsv_val
    rc_ref[:] = rc


def _run(kernel, dlt32, interpret: bool, **kw):
    m = dlt32.shape[0]
    pad = (-m) % CHUNK
    if pad:
        dlt32 = jnp.concatenate([dlt32, jnp.full((pad,), 30, jnp.int32)])
    mp = dlt32.shape[0]
    chunks = mp // CHUNK
    spec = pl.BlockSpec((1, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(kernel, **kw) if kw else kernel,
        grid=(chunks,),
        in_specs=[spec],
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((1, mp), jnp.int32)] * 3,
        scratch_shapes=[pltpu.VMEM((V, 1), jnp.int32)] * 2,
        interpret=interpret,
    )(dlt32.reshape(1, mp))
    return [o.reshape(mp)[:m] for o in outs]


def scan_core(dlt_raw, interpret: bool = False):
    """Full corrected topology scans from raw adjacent deltas.

    dlt_raw: i32[m], values in [2, 31] (non-tie) or [41, 63] (tie, requires
    m <= 2^22). Returns (psv_pos, psv_val, lc, nsv_pos, nsv_val, rc); value
    codes are on the order-preserving [0, 52] scale of
    `radix_tree._threshold_core`.
    """
    m = dlt_raw.shape[0]
    dlt32 = jnp.where(dlt_raw <= 31, dlt_raw - 2, 30).astype(jnp.int32)
    pad = (-m) % CHUNK
    dltf = dlt32
    dltr = dlt32[::-1]
    if pad:
        padv = jnp.full((pad,), 30, jnp.int32)
        dltf = jnp.concatenate([dltf, padv])
        dltr = jnp.concatenate([dltr, padv])
    mp = dltf.shape[0]
    chunks = mp // CHUNK
    spec = pl.BlockSpec((1, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_both_kernel, m=m),
        grid=(chunks,),
        in_specs=[spec, spec],
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((1, mp), jnp.int32)] * 6,
        scratch_shapes=[pltpu.VMEM((V, 1), jnp.int32)] * 4,
        interpret=interpret,
    )(dltf.reshape(1, mp), dltr.reshape(1, mp))
    psv_pos, psv_val, lc, nsv_f, nsvv_f, rc_f = (
        o.reshape(mp)[:m] for o in outs
    )
    return psv_pos, psv_val, lc, nsv_f[::-1], nsvv_f[::-1], rc_f[::-1]


def scan_core_reference(dlt_raw):
    """Pure-numpy/XLA oracle with identical contract (for tests and CPU)."""
    import numpy as np

    d = np.asarray(dlt_raw)
    m = d.shape[0]
    full = np.where(d <= 31, d - 2, d - 11).astype(np.int64)
    psv_pos = np.full(m, -1, np.int64)
    psv_val = np.full(m, -1, np.int64)
    nsv_pos = np.full(m, m, np.int64)
    nsv_val = np.full(m, -1, np.int64)
    lc = np.full(m, -1, np.int64)
    rc = np.full(m, -1, np.int64)
    stack: list[int] = []
    for i in range(m):
        while stack and full[stack[-1]] >= full[i]:
            stack.pop()
        if stack:
            psv_pos[i] = stack[-1]
            psv_val[i] = full[stack[-1]]
        stack.append(i)
    stack = []
    for i in range(m - 1, -1, -1):
        while stack and full[stack[-1]] >= full[i]:
            stack.pop()
        if stack:
            nsv_pos[i] = stack[-1]
            nsv_val[i] = full[stack[-1]]
        stack.append(i)
    for i in range(m):
        lo, hi = psv_pos[i], i
        if hi - lo > 1:
            seg = full[lo + 1 : hi]
            lc[i] = lo + 1 + int(np.argmin(seg))
        lo, hi = i, nsv_pos[i]
        if hi - lo > 1:
            seg = full[lo + 1 : hi]
            rc[i] = lo + 1 + int(np.argmin(seg))
    return (
        psv_pos.astype(np.int32),
        psv_val.astype(np.int32),
        lc.astype(np.int32),
        nsv_pos.astype(np.int32),
        nsv_val.astype(np.int32),
        rc.astype(np.int32),
    )
