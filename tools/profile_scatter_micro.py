"""Micro-costs of the XLA glue ops used by collapse_fast's coarse stage:
scatter variants (sorted/unique flags), gathers at coarse sizes, and the
full coarse-stage pieces. Informs the round-3 collapse optimization."""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax import lax
sys.path.insert(0, ".")
I32 = jnp.int32

def slope(loop_fn, k_lo=1, k_hi=9, reps=5):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, I32); khi = jnp.asarray(k_hi, I32)
    jax.block_until_ready(f(klo)); jax.block_until_ready(f(khi))
    def t(fn):
        t0 = time.perf_counter(); jax.block_until_ready(fn()); return time.perf_counter() - t0
    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3

m = 262_143
cc = 15_420
rng = np.random.default_rng(0)
ids_sorted = jnp.asarray(np.sort(rng.choice(m, cc, replace=False)).astype(np.int32))
vals = jnp.asarray(rng.integers(0, 3, cc).astype(np.int32))
dense0 = jnp.zeros((m,), I32)

def mk_scatter_plain(k):
    def body(i, acc):
        d = dense0.at[ids_sorted].set(vals + i)
        return acc + d[0]
    return lax.fori_loop(0, k, body, jnp.int32(0))

def mk_scatter_sorted(k):
    dnums = lax.ScatterDimensionNumbers(update_window_dims=(),
        inserted_window_dims=(0,), scatter_dims_to_operand_dims=(0,))
    def body(i, acc):
        d = lax.scatter(dense0, ids_sorted[:, None], vals + i, dnums,
                        indices_are_sorted=True, unique_indices=True,
                        mode=lax.GatherScatterMode.FILL_OR_DROP)
        return acc + d[0]
    return lax.fori_loop(0, k, body, jnp.int32(0))

def mk_scatter_rows(k):
    # one scatter of [cc, 16] rows into [m, 16]
    dense16 = jnp.zeros((m, 16), I32)
    vals16 = jnp.tile(vals[:, None], (1, 16))
    dnums = lax.ScatterDimensionNumbers(update_window_dims=(1,),
        inserted_window_dims=(0,), scatter_dims_to_operand_dims=(0,))
    def body(i, acc):
        d = lax.scatter(dense16, ids_sorted[:, None], vals16 + i, dnums,
                        indices_are_sorted=True, unique_indices=True,
                        mode=lax.GatherScatterMode.FILL_OR_DROP)
        return acc + d[0, 0]
    return lax.fori_loop(0, k, body, jnp.int32(0))

def mk_gather_cc16(k):
    src = jnp.zeros((m + 1, 16), I32)
    def body(i, acc):
        g = src[jnp.clip(ids_sorted + i, 0, m)]
        return acc + g[0, 0]
    return lax.fori_loop(0, k, body, jnp.int32(0))

def mk_gather_cc1(k):
    src = jnp.zeros((m + 1,), I32)
    def body(i, acc):
        g = src[jnp.clip(ids_sorted + i, 0, m)]
        return acc + g[0]
    return lax.fori_loop(0, k, body, jnp.int32(0))

def mk_gather_m1(k):
    # dense m-row gather from compacted cc (the rank-broadcast alternative)
    src = jnp.zeros((cc,), I32)
    rk = jnp.asarray(np.minimum(np.arange(m) // 17, cc - 1).astype(np.int32))
    def body(i, acc):
        g = src[jnp.clip(rk + i - i, 0, cc - 1)] + i
        return acc + g[0]
    return lax.fori_loop(0, k, body, jnp.int32(0))

def mk_sortpair(k):
    key = jnp.asarray(rng.integers(0, m, m).astype(np.uint32))
    pay = jnp.arange(m, dtype=I32)
    def body(i, acc):
        s, p = lax.sort((key + i.astype(jnp.uint32), pay), num_keys=1)
        return acc + p[0]
    return lax.fori_loop(0, k, body, jnp.int32(0))

for name, mk in [("scatter .at[].set  [cc->m]", mk_scatter_plain),
                 ("scatter sorted+uniq[cc->m]", mk_scatter_sorted),
                 ("scatter rows [cc,16->m,16]", mk_scatter_rows),
                 ("gather  [cc,16]          ", mk_gather_cc16),
                 ("gather  [cc,1]           ", mk_gather_cc1),
                 ("gather  [m,1] from cc    ", mk_gather_m1),
                 ("sort_key_val m           ", mk_sortpair)]:
    print(f"{name}: {slope(mk):7.3f} ms", flush=True)
