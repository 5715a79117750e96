"""Cost floor of the [V, c] threshold-scan kernels: V, chunk, and scan
structure variants (timing only; variants need not be correct)."""
from __future__ import annotations

import functools
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # noqa: BLE001
    pass

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**31 - 1
M = 262_143


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=2, k_hi=12, reps=4):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    np.asarray(f_lo())
    np.asarray(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def _psv_kernel(dlt_ref, out_ref, carry_ref, *, V: int):
    i = pl.program_id(0)
    c = dlt_ref.shape[1]

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, -1)

    dlt = dlt_ref[0:1, :]
    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    g = i * c + lanes
    packed = g * 64 + dlt
    x = jnp.where(dlt < subl, packed, -1)

    k = 1
    while k < c:
        rolled = pltpu.roll(x, k, axis=1)
        x = jnp.where(lanes >= k, jnp.maximum(x, rolled), x)
        k <<= 1
    x = jnp.maximum(x, carry_ref[:, 0:1])
    excl = jnp.where(lanes >= 1, pltpu.roll(x, 1, axis=1), carry_ref[:, 0:1])
    sel = jnp.where(dlt == subl, excl, -_BIG)
    out_ref[:] = jnp.max(sel, axis=0, keepdims=True)
    carry_ref[:] = x[:, c - 1 : c]


def _psv_kernel_2lvl(dlt_ref, out_ref, carry_ref, *, V: int):
    """Two-level in-chunk scan: 128-lane Hillis-Steele (7 rolls), then a
    block-summary scan on [V, c/128] and a broadcast combine."""
    i = pl.program_id(0)
    c = dlt_ref.shape[1]
    nb = c // 128

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, -1)

    dlt = dlt_ref[0:1, :]
    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    lane128 = lanes % 128
    g = i * c + lanes
    packed = g * 64 + dlt
    x = jnp.where(dlt < subl, packed, -1)

    # level A: scan within each 128-lane block
    k = 1
    while k < 128:
        rolled = pltpu.roll(x, k, axis=1)
        x = jnp.where(lane128 >= k, jnp.maximum(x, rolled), x)
        k <<= 1
    # block summaries: last lane of each 128-block -> [V, nb]
    xb = x.reshape(V, nb, 128)[:, :, 127]
    bl = lax.broadcasted_iota(jnp.int32, (V, nb), 1)
    s = xb
    k = 1
    while k < nb:
        rolled = pltpu.roll(s, k, axis=1)
        s = jnp.where(bl >= k, jnp.maximum(s, rolled), s)
        k <<= 1
    # exclusive block prefix, broadcast back over the 128 lanes
    se = jnp.where(bl >= 1, pltpu.roll(s, 1, axis=1), -1)
    se_b = jnp.broadcast_to(se[:, :, None], (V, nb, 128)).reshape(V, c)
    x = jnp.maximum(x, se_b)
    x = jnp.maximum(x, carry_ref[:, 0:1])
    excl = jnp.where(lanes >= 1, pltpu.roll(x, 1, axis=1), carry_ref[:, 0:1])
    sel = jnp.where(dlt == subl, excl, -_BIG)
    out_ref[:] = jnp.max(sel, axis=0, keepdims=True)
    carry_ref[:] = x[:, c - 1 : c]


def _psv_lc_fused_kernel(dlt_ref, out_ref, outc_ref, carry_ref, carryc_ref, *, V: int):
    """psv max-scan + left-child segmented min-scan sharing one pass."""
    i = pl.program_id(0)
    c = dlt_ref.shape[1]

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.full_like(carry_ref, -1)
        carryc_ref[:] = jnp.full_like(carryc_ref, _BIG)

    dlt = dlt_ref[0:1, :]
    lanes = lax.broadcasted_iota(jnp.int32, (V, c), 1)
    subl = lax.broadcasted_iota(jnp.int32, (V, c), 0)
    g = i * c + lanes
    packed = g * 64 + dlt
    x = jnp.where(dlt < subl, packed, -1)
    y = jnp.where(dlt > subl, (dlt << 22) | g, _BIG)
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
    x = jnp.maximum(x, carry_ref[:, 0:1])
    cm = carryc_ref[:, 0:1]
    y = jnp.where(r == 1, y, jnp.minimum(cm, y))
    excl = jnp.where(lanes >= 1, pltpu.roll(x, 1, axis=1), carry_ref[:, 0:1])
    excly = jnp.where(lanes >= 1, pltpu.roll(y, 1, axis=1), cm)
    sel = jnp.where(dlt == subl, excl, -_BIG)
    sely = jnp.where(dlt == subl, excly, 0)
    out_ref[:] = jnp.max(sel, axis=0, keepdims=True)
    outc_ref[:] = jnp.max(sely, axis=0, keepdims=True)
    carry_ref[:] = x[:, c - 1 : c]
    carryc_ref[:] = y[:, c - 1 : c]


def run_kernel(kernel, dlt, chunk, V, n_out=1):
    m = dlt.shape[0]
    pad = (-m) % chunk
    if pad:
        dlt = jnp.concatenate([dlt, jnp.full((pad,), 63, jnp.int32)])
    mp = dlt.shape[0]
    chunks = mp // chunk
    index_map = lambda i: (0, i)
    spec = pl.BlockSpec((1, chunk), index_map, memory_space=pltpu.VMEM)
    if n_out == 1:
        out = pl.pallas_call(
            functools.partial(kernel, V=V),
            grid=(chunks,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((1, mp), jnp.int32),
            scratch_shapes=[pltpu.VMEM((V, 1), jnp.int32)],
        )(dlt.reshape(1, mp))
        return out.reshape(mp)[:m]
    out = pl.pallas_call(
        functools.partial(kernel, V=V),
        grid=(chunks,),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((1, mp), jnp.int32)] * 2,
        scratch_shapes=[pltpu.VMEM((V, 1), jnp.int32)] * 2,
    )(dlt.reshape(1, mp))
    return out[0].reshape(mp)[:m], out[1].reshape(mp)[:m]


def main():
    rng = np.random.default_rng(0)
    dlt0 = jnp.asarray(rng.integers(0, 30, size=M).astype(np.int32))

    cases = [
        ("psv V=64 c=2048 (shipped)", _psv_kernel, 2048, 64, 1),
        ("psv V=64 c=4096", _psv_kernel, 4096, 64, 1),
        ("psv V=32 c=2048", _psv_kernel, 2048, 32, 1),
        ("psv V=32 c=4096", _psv_kernel, 4096, 32, 1),
        ("psv 2-level V=64 c=2048", _psv_kernel_2lvl, 2048, 64, 1),
        ("psv 2-level V=32 c=4096", _psv_kernel_2lvl, 4096, 32, 1),
        ("psv 2-level V=32 c=8192", _psv_kernel_2lvl, 8192, 32, 1),
        ("psv+lc fused V=32 c=2048", _psv_lc_fused_kernel, 2048, 32, 2),
        ("psv 2-level V=64 c=8192", _psv_kernel_2lvl, 8192, 64, 1),
    ]
    for name, kern, chunk, V, n_out in cases:
        def mk(k, kern=kern, chunk=chunk, V=V, n_out=n_out):
            def run():
                def body(i, acc):
                    d = dlt0 + jnp.where(i < 0, 1, 0)  # defeat hoisting
                    r = run_kernel(kern, d, chunk, V, n_out)
                    if n_out == 2:
                        return acc + r[0][0] + r[1][0]
                    return acc + r[0]
                return lax.fori_loop(0, k, body, jnp.int32(0))
            return run
        try:
            ms = slope(mk)
            print(f"{name:34s} {ms:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
