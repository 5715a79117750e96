"""Final design checks: flip+fwd-scan cost, V/c sweet spots, monotone row
gather, bare cond overhead."""
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


def run_fwd(dlt, chunk, V):
    m = dlt.shape[0]
    pad = (-m) % chunk
    if pad:
        dlt = jnp.concatenate([dlt, jnp.full((pad,), 30, jnp.int32)])
    mp = dlt.shape[0]
    chunks = mp // chunk
    spec = pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_psv_kernel, V=V),
        grid=(chunks,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((1, mp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((V, 1), jnp.int32)],
    )(dlt.reshape(1, mp))
    return out.reshape(mp)[:m]


def main():
    rng = np.random.default_rng(0)
    dlt0 = jnp.asarray(rng.integers(0, 30, size=M).astype(np.int32))

    for V, c in [(32, 4096), (32, 8192), (32, 16384), (56, 4096), (64, 3072), (8, 4096), (8, 8192)]:
        def mk(k, V=V, c=c):
            def run():
                def body(i, acc):
                    d = dlt0 + jnp.where(i < 0, 1, 0)
                    return acc + run_fwd(d, c, V)[0]
                return lax.fori_loop(0, k, body, jnp.int32(0))
            return run
        try:
            print(f"psv fwd V={V} c={c:6d}        {slope(mk):8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"psv fwd V={V} c={c}  FAILED {str(e)[:90]}", flush=True)

    # flip + fwd + flip (the nsv recipe)
    def mk_flip(k):
        def run():
            def body(i, acc):
                d = dlt0 + jnp.where(i < 0, 1, 0)
                r = run_fwd(d[::-1], 4096, 32)[::-1]
                return acc + r[0]
            return lax.fori_loop(0, k, body, jnp.int32(0))
        return run
    print(f"flip + psv fwd V=32 c=4096 + flip  {slope(mk_flip):8.3f} ms", flush=True)

    # monotone row gather [m, 6]
    tab6 = jnp.asarray(rng.normal(size=(M + 1, 6)).astype(np.float32))
    sidx = jnp.asarray(np.sort(rng.integers(0, M, size=M)).astype(np.int32))
    def mk_rg(k):
        def run():
            def body(i, acc):
                ix = jnp.minimum(sidx + jnp.where(i < 0, 1, 0), M)
                return acc + tab6[ix][0, 0]
            return lax.fori_loop(0, k, body, jnp.float32(0))
        return run
    print(f"monotone row gather f32[262K, 6]   {slope(mk_rg):8.3f} ms", flush=True)

    # bare cond overhead: untaken expensive branch, small operands
    cols = [jnp.asarray(rng.normal(size=(M,)).astype(np.float32)) for _ in range(6)]
    def mk_cond(k):
        def run():
            def body(i, acc):
                x = cols[0] + i.astype(jnp.float32) * 1e-7
                flag = x[0] > 1e9  # false at runtime
                def expensive(_):
                    return [c * x[0] + jnp.sort(c)[0] for c in cols]
                def cheap(_):
                    return [c + x[0] for c in cols]
                out = lax.cond(flag, expensive, cheap, None)
                return acc + out[0][0] + out[5][1]
            return lax.fori_loop(0, k, body, jnp.float32(0))
        return run
    print(f"cond 6x[m] ops, untaken sort branch {slope(mk_cond):8.3f} ms", flush=True)

    # same computation no cond
    def mk_nocond(k):
        def run():
            def body(i, acc):
                x = cols[0] + i.astype(jnp.float32) * 1e-7
                out = [c + x[0] for c in cols]
                return acc + out[0][0] + out[5][1]
            return lax.fori_loop(0, k, body, jnp.float32(0))
        return run
    print(f"same cheap path, no cond            {slope(mk_nocond):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
