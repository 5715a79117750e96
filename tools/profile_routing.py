"""On-chip cost landscape of routing primitives (gather / scatter / sort
variants) at sponza scale — drives the sort-based collapse redesign."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax import lax

I32 = jnp.int32
N = 262_144


def slope(loop_fn, k_lo=2, k_hi=32, reps=5):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, I32)
    khi = jnp.asarray(k_hi, I32)
    np.asarray(f(klo)); np.asarray(f(khi))

    def t(fn):
        t0 = time.perf_counter(); np.asarray(fn()); return time.perf_counter() - t0

    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, N), I32)
    idx_sorted = jnp.sort(idx)
    v = jnp.arange(N, dtype=I32)
    vf = jnp.arange(N, dtype=jnp.float32)
    idx_small = jnp.asarray(rng.integers(0, 4096, N), I32)
    vs = jnp.arange(4096, dtype=I32)

    cases = {}

    def case(name, fn, **kw):
        cases[name] = slope(fn, **kw)
        print(f"{name:28s}: {cases[name]:7.3f} ms")

    case("gather 262K<-262K", lambda k: lax.fori_loop(
        0, k, lambda i, a: a + (v + i)[idx][0].astype(jnp.float32), 0.0))
    case("gather sorted idx", lambda k: lax.fori_loop(
        0, k, lambda i, a: a + (v + i)[idx_sorted][0].astype(jnp.float32), 0.0))
    case("gather 262K<-4K", lambda k: lax.fori_loop(
        0, k, lambda i, a: a + (vs + i)[idx_small][0].astype(jnp.float32), 0.0))
    case("take_along 64x4K batched", lambda k: lax.fori_loop(
        0, k, lambda i, a: a + jnp.take_along_axis(
            (v + i).reshape(64, 4096), idx_small.reshape(64, 4096) % 4096,
            axis=1)[0, 0].astype(jnp.float32), 0.0))
    case("scatter set 262K", lambda k: lax.fori_loop(
        0, k, lambda i, a: a + jnp.zeros(N, I32).at[idx].set(v + i)[0]
        .astype(jnp.float32), 0.0))
    case("sort_key_val 1+1", lambda k: lax.fori_loop(
        0, k, lambda i, a: a + lax.sort_key_val(idx + i, v)[1][0]
        .astype(jnp.float32), 0.0))
    case("sort 1key+3payload", lambda k: lax.fori_loop(
        0, k, lambda i, a: a + lax.sort(
            (idx + i, v, v, vf), num_keys=1, is_stable=True)[1][0]
        .astype(jnp.float32), 0.0))
    case("sort 1key+8payload", lambda k: lax.fori_loop(
        0, k, lambda i, a: a + lax.sort(
            (idx + i, v, v, v, v, vf, vf, vf, vf), num_keys=1,
            is_stable=True)[1][0].astype(jnp.float32), 0.0))
    case("sort 2M 1key+3payload", lambda k: lax.fori_loop(
        0, k, lambda i, a: a + lax.sort(
            (jnp.tile(idx, 8) + i, jnp.tile(v, 8), jnp.tile(v, 8),
             jnp.tile(vf, 8)), num_keys=1, is_stable=True)[1][0]
        .astype(jnp.float32), 0.0), k_hi=12)
    # LOCF gather: donors (key=i, val) + requests (key=idx[j]) -> sort ->
    # carry forward -> unsort
    def locf(k):
        def body(i, a):
            keys = jnp.concatenate([v, idx + i * 0])
            tag = jnp.concatenate([jnp.zeros(N, I32), jnp.ones(N, I32)])
            val = jnp.concatenate([v + i, jnp.zeros(N, I32)])
            pos = jnp.concatenate([jnp.full(N, -1, I32), jnp.arange(N, I32)])
            sk, st, sv, sp = lax.sort((keys, tag, val, pos), num_keys=2,
                                      is_stable=True)
            filled = lax.associative_scan(
                lambda x, y: jnp.where(y[1] == 0, y, (x[0], x[1])),
                (sv, st))[0]
            back = lax.sort((sp, filled), num_keys=1, is_stable=True)[1]
            return a + back[N][0 * i].astype(jnp.float32)
        return lax.fori_loop(0, k, body, 0.0)
    try:
        case("LOCF sort-gather", locf, k_hi=12)
    except Exception as e:  # noqa: BLE001
        print("LOCF failed:", e)


if __name__ == "__main__":
    main()
