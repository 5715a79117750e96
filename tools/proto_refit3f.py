"""Isolate ops of the coarse path."""
from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

I32 = jnp.int32
BIG = jnp.float32(3.0e38)

n = 262_144
nb = n // 16
cap = 21_845
rng = np.random.default_rng(0)
t4_rows = jnp.asarray(rng.random((n, 6), dtype=np.float32))
c0_t = jnp.asarray(rng.random((6, nb), dtype=np.float32))
levels_c = max(1, math.ceil(math.log2(nb)))
ctab_rows = jnp.asarray(rng.random(((levels_c + 1) * nb, 6), dtype=np.float32))
bfs = jnp.asarray(rng.integers(0, nb, cap), dtype=I32)
cnt = jnp.asarray(rng.integers(1, nb, cap), dtype=I32)


def _t(f):
    t0 = time.perf_counter()
    jax.block_until_ready(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=2, k_hi=12, reps=3):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    jax.block_until_ready(f_lo())
    jax.block_until_ready(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def mk_stride_rows(k):
    def run():
        def body(i, acc):
            x = t4_rows + i.astype(jnp.float32)
            c0 = x[::16].T
            return acc + c0[0, 0]
        return lax.fori_loop(0, k, body, 0.0)
    return run


def mk_coarse_build(k):
    def run():
        def body(i, acc):
            ccur = c0_t + i.astype(jnp.float32)
            ctabs = [ccur]
            for kk in range(1, levels_c + 1):
                s = 1 << (kk - 1)
                if s < nb:
                    shifted = jnp.concatenate(
                        [ccur[:, s:], jnp.broadcast_to(ccur[:, -1:], (6, s))],
                        axis=1,
                    )
                    ccur = jnp.minimum(ccur, shifted)
                ctabs.append(ccur)
            ct = jnp.concatenate(ctabs, axis=1).T
            return acc + ct[0, 0]
        return lax.fori_loop(0, k, body, 0.0)
    return run


def mk_coarse_gather(k):
    def run():
        def body(i, acc):
            kc = (31 - lax.clz((cnt + 0 * i).astype(jnp.uint32)).astype(I32))
            b2 = jnp.maximum(bfs - (1 << kc) + 1, 0)
            u = jnp.minimum(ctab_rows[kc * nb + bfs], ctab_rows[kc * nb + b2])
            return acc + u[0, 0]
        return lax.fori_loop(0, k, body, 0.0)
    return run


def mk_fine_gather(k):
    def run():
        def body(i, acc):
            u = jnp.minimum(t4_rows[bfs + i], t4_rows[jnp.maximum(cnt - 15, 0)])
            return acc + u[0, 0]
        return lax.fori_loop(0, k, body, 0.0)
    return run


for name, mk in [
    ("rows[::16].T", mk_stride_rows),
    ("coarse build+T", mk_coarse_build),
    ("coarse 2-gather cap", mk_coarse_gather),
    ("fine 2-gather cap", mk_fine_gather),
]:
    print(f"{name:24s} {slope(mk):8.3f} ms", flush=True)
