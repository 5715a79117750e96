"""Per-offset cost of the three windowed-pull shapes used by the collapse
kernel: [1,s] single row, [8,s] stacked, strip-folded [8, s/8 + 2h].
Informs which reformulations actually save cycles."""
import sys, time, functools
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
I32 = jnp.int32

S = 4096
GRID = 64

def _sh(t, d):
    if d == 0:
        return t
    return pltpu.roll(t, (t.shape[1] - d) % t.shape[1], axis=1)

def mk_kernel(mode, n_off):
    def kern(x_ref, o_ref):
        x = x_ref[:]
        lane = pl.program_id(0) * S + lax.broadcasted_iota(I32, (1, S), 1)
        if mode == "row1":
            t = x[0:1, :] & 63
            v = x[1:2, :]
            acc = jnp.full((1, S), -1, I32)
            for d in range(-n_off // 2, n_off // 2):
                acc = jnp.where(t + lane == lane + d, _sh(v, d), acc)
            o_ref[:] = jnp.concatenate([acc] + [x[1:8, :]], axis=0)
        elif mode == "stack8":
            t = x & 63
            acc = jnp.full((8, S), -1, I32)
            for d in range(-n_off // 2, n_off // 2):
                acc = jnp.where(t + lane == lane + d, _sh(x, d), acc)
            o_ref[:] = acc
        elif mode == "row1x4":
            # 4 independent single-row pulls (like claims at p/gp/ggp)
            acc = [jnp.full((1, S), -1, I32) for _ in range(4)]
            for k in range(4):
                t = x[k : k + 1, :] & 63
                v = x[k + 4 : k + 5, :]
                for d in range(-n_off // 2, n_off // 2):
                    acc[k] = jnp.where(t + lane == lane + d, _sh(v, d), acc[k])
            o_ref[:] = jnp.concatenate(acc + [x[0:4, :]], axis=0)
    return kern

def measure(mode, n_off):
    x = jnp.asarray(np.random.default_rng(0).integers(0, 2**20, (8, S * GRID)).astype(np.int32))
    spec = pl.BlockSpec((8, S), lambda i: (0, i))
    f = pl.pallas_call(
        mk_kernel(mode, n_off), grid=(GRID,), in_specs=[spec],
        out_specs=spec, out_shape=jax.ShapeDtypeStruct((8, S * GRID), I32),
    )
    def loop(k):
        def body(i, acc):
            o = f(x + i)
            return acc + o[0, 0]
        return lax.fori_loop(0, k, body, jnp.int32(0))
    g = jax.jit(loop)
    jax.block_until_ready(g(jnp.asarray(1, I32))); jax.block_until_ready(g(jnp.asarray(7, I32)))
    def t(k):
        a = jnp.asarray(k, I32)
        t0 = time.perf_counter(); jax.block_until_ready(g(a)); return time.perf_counter() - t0
    lo = min(t(1) for _ in range(5)); hi = min(t(7) for _ in range(5))
    return (hi - lo) / 6 * 1e3

for mode in ["row1", "stack8", "row1x4"]:
    for n_off in [32, 128]:
        ms = measure(mode, n_off)
        print(f"{mode:8s} n_off={n_off:4d}: {ms:7.3f} ms  ({ms/GRID/n_off*1e6:6.1f} ns/offset/block)", flush=True)
