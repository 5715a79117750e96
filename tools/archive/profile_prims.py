"""Microbenchmarks of the primitive ops the build pipeline is made of.

Slope-timed on the real chip. Grounds the refit/scan redesign: which of
gather (1-D, row), sort (k columns), one-hot matmul, scan rolls is cheap.
"""
from __future__ import annotations

import sys
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


N = 262_144
M = N - 1


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, size=M).astype(np.int32))
    tab1 = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    tab6 = jnp.asarray(rng.normal(size=(N, 6)).astype(np.float32))
    tab6t = jnp.asarray(np.ascontiguousarray(np.asarray(tab6).T))
    keys = jnp.asarray(rng.integers(0, 2**31, size=M).astype(np.uint32))
    cols = [jnp.asarray(rng.normal(size=(M,)).astype(np.float32)) for _ in range(8)]

    def bench(name, mk):
        try:
            ms = slope(mk)
            print(f"{name:42s} {ms:8.4f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s} FAILED {type(e).__name__}: {e}", flush=True)

    # 1-D gather, full width
    def mk_g1(k):
        def run():
            def body(i, acc):
                ix = (idx + i) % N
                return acc + tab1[ix][0]
            return lax.fori_loop(0, k, body, 0.0)
        return run
    bench("gather 1-D f32[262K] from [262K]", mk_g1)

    # 6 separate 1-D gathers
    def mk_g6(k):
        def run():
            def body(i, acc):
                ix = (idx + i) % N
                for c in range(6):
                    acc = acc + tab6t[c][ix][0]
                return acc
            return lax.fori_loop(0, k, body, 0.0)
        return run
    bench("6x gather 1-D f32[262K]", mk_g6)

    # row gather [262K, 6]
    def mk_gr(k):
        def run():
            def body(i, acc):
                ix = (idx + i) % N
                return acc + tab6[ix][0, 0]
            return lax.fori_loop(0, k, body, 0.0)
        return run
    bench("row gather f32[262K, 6]", mk_gr)

    # small row gather (22K rows)
    cap = 22_000
    def mk_gs(k):
        def run():
            def body(i, acc):
                ix = (idx[:cap] + i) % N
                return acc + tab6[ix][0, 0]
            return lax.fori_loop(0, k, body, 0.0)
        return run
    bench("row gather f32[22K, 6]", mk_gs)

    # 1-D gather from small table (16K)
    nb = 16_384
    tabs = tab1[:nb]
    def mk_gt(k):
        def run():
            def body(i, acc):
                ix = (idx + i) % nb
                return acc + tabs[ix][0]
            return lax.fori_loop(0, k, body, 0.0)
        return run
    bench("gather 1-D f32[262K] from [16K]", mk_gt)

    # sort: 1 key
    def mk_s1(k):
        def run():
            def body(i, acc):
                kk = keys + i.astype(jnp.uint32)
                out = lax.sort((kk,), num_keys=1)
                return acc + out[0][0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run
    bench("sort u32[262K] key only", mk_s1)

    # sort key + 7 payload columns
    def mk_s8(k):
        def run():
            def body(i, acc):
                kk = keys + i.astype(jnp.uint32)
                out = lax.sort(tuple([kk] + cols[:7]), num_keys=1)
                return acc + out[1][0]
            return lax.fori_loop(0, k, body, 0.0)
        return run
    bench("sort u32[262K] + 7 f32 payloads", mk_s8)

    # cummax full width
    def mk_cm(k):
        def run():
            def body(i, acc):
                x = keys.astype(jnp.int32) + i
                return acc + lax.cummax(x)[M - 1].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run
    bench("cummax i32[262K]", mk_cm)

    # scatter full width (drop mode)
    def mk_sc(k):
        def run():
            def body(i, acc):
                ix = (idx + i) % N
                z = jnp.zeros((N,), jnp.float32).at[ix].set(tab1[:M])
                return acc + z[0]
            return lax.fori_loop(0, k, body, 0.0)
        return run
    bench("scatter f32[262K]", mk_sc)

    # take_along sorted ascending indices (monotone gather)
    sidx = jnp.sort(idx)
    def mk_gm(k):
        def run():
            def body(i, acc):
                ix = jnp.minimum(sidx + (i - i), N - 1)
                return acc + tab1[ix][0] + i.astype(jnp.float32) * 0
            return lax.fori_loop(0, k, body, 0.0)
        return run
    bench("gather 1-D sorted idx f32[262K]", mk_gm)

    # dynamic_slice-free windowed min (for scale reference): 32 shifts [6, n]
    def mk_w(k):
        p = jnp.asarray(rng.normal(size=(6, N)).astype(np.float32))
        def run():
            def body(i, acc):
                x = p + i.astype(jnp.float32) * 1e-7
                a = x
                for d in range(1, 32):
                    a = jnp.minimum(a, jnp.roll(x, -d, axis=1))
                return acc + a[0, 0]
            return lax.fori_loop(0, k, body, 0.0)
        return run
    bench("32 shifted mins on f32[6, 262K] (XLA)", mk_w)


if __name__ == "__main__":
    main()
