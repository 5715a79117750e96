"""Focused merge-cost microbench: [K, m] column scatters at c indices vs
sort-routing, full consumption. Decides the collapse coarse-merge shape.
"""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
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


m = 261_999
c = 15_413
key = jax.random.PRNGKey(0)
idx = jnp.sort(jax.random.choice(key, m, (c,), replace=False).astype(I32))

for K in (1, 6, 24, 30):
    op = jnp.zeros((K, m), jnp.float32)
    upd = jnp.ones((K, c), jnp.float32)

    def mk(k, op=op, upd=upd):
        def body(i, acc):
            o = op + i.astype(jnp.float32)
            out = o.at[:, idx].set(upd, mode="drop")
            return acc + lax.bitcast_convert_type(out, I32).sum()
        return lax.fori_loop(0, k, body, jnp.int32(0))
    print(f"scatter [K={K:2d}, m] at {c} cols : {slope(mk):7.3f} ms", flush=True)

# 3-D form like the current sp scatter: [4, 6, m]
op3 = jnp.zeros((4, 6, m), jnp.float32)
upd3 = jnp.ones((4, 6, c), jnp.float32)
def mk3(k):
    def body(i, acc):
        o = op3 + i.astype(jnp.float32)
        out = o.at[:, :, idx].set(upd3, mode="drop")
        return acc + lax.bitcast_convert_type(out, I32).sum()
    return lax.fori_loop(0, k, body, jnp.int32(0))
print(f"scatter [4, 6, m] at {c} cols : {slope(mk3):7.3f} ms", flush=True)

# route-equivalent: 2 unstable sorts over (m + c) with V payload channels
for V in (2, 6):
    pays = [jnp.arange(m + c, dtype=I32) + j for j in range(V)]
    keys = jnp.concatenate([idx.astype(jnp.uint32),
                            jnp.arange(m, dtype=jnp.uint32) * 2 + 1])[: m + c]
    def mkr(k, V=V, pays=tuple(pays)):
        def body(i, acc):
            out1 = lax.sort((keys + i.astype(jnp.uint32),) + pays, num_keys=1,
                            is_stable=False)
            out2 = lax.sort(out1, num_keys=1, is_stable=False)
            return acc + sum(o.sum().astype(jnp.float32) for o in out2[1:])
        return lax.fori_loop(0, k, body, jnp.float32(0))
    print(f"route-2sorts V={V} over m+c    : {slope(mkr):7.3f} ms", flush=True)
