"""Scatter/gather cost matrix on the real chip: sorted/unique flags,
index counts, layouts. Decides route-vs-scatter for collapse + refit."""
import sys
import time

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
    klo = jnp.asarray(k_lo, I32)
    khi = jnp.asarray(k_hi, I32)
    jax.block_until_ready(f(klo))
    jax.block_until_ready(f(khi))

    def t(fn):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        return time.perf_counter() - t0

    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    m = 262_000
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}  m={m}", flush=True)
    for k in (4096, 16384):
        idx_sorted = jnp.asarray(
            np.sort(rng.choice(m, size=k, replace=False)), I32
        )
        idx_rand = jnp.asarray(rng.choice(m, size=k, replace=False), I32)
        vals6 = jnp.asarray(rng.standard_normal((6, k)), jnp.float32)
        vals24 = jnp.asarray(rng.standard_normal((4, 6, k)), jnp.float32)
        base6 = jnp.asarray(rng.standard_normal((6, m)), jnp.float32)
        base24 = jnp.asarray(rng.standard_normal((4, 6, m)), jnp.float32)

        def mk(expr):
            def loop(kk):
                def body(i, acc):
                    return acc + expr(i)[0]
                return lax.fori_loop(0, kk, body, jnp.float32(0))
            return loop

        e = lambda x: (x.sum(),)  # consume fully: defeat DCE

        # scatter [6, m] minor-dim
        for name, idx, uq, srt in (
            ("scat6 rand", idx_rand, False, False),
            ("scat6 rand uq", idx_rand, True, False),
            ("scat6 sorted uq+srt", idx_sorted, True, True),
        ):
            fn = mk(lambda i, idx=idx, uq=uq, srt=srt: e(
                base6.at[:, idx].set(
                    vals6 + i.astype(jnp.float32),
                    unique_indices=uq, indices_are_sorted=srt)))
            print(f"k={k:6d} {name:22s}: {slope(fn):7.3f} ms", flush=True)

        # scatter [4, 6, m] minor-dim (the collapse sp merge)
        for name, idx, uq, srt in (
            ("scat24 rand", idx_rand, False, False),
            ("scat24 sorted uq+srt", idx_sorted, True, True),
        ):
            fn = mk(lambda i, idx=idx, uq=uq, srt=srt: e(
                base24.at[:, :, idx].set(
                    vals24 + i.astype(jnp.float32),
                    unique_indices=uq, indices_are_sorted=srt)))
            print(f"k={k:6d} {name:22s}: {slope(fn):7.3f} ms", flush=True)

        # 1-D scatter (the seed array)
        base1 = jnp.asarray(rng.standard_normal((m,)), jnp.float32)
        vals1 = jnp.asarray(rng.standard_normal((k,)), jnp.float32)
        for name, idx, uq, srt in (
            ("scat1 rand", idx_rand, False, False),
            ("scat1 sorted uq+srt", idx_sorted, True, True),
        ):
            fn = mk(lambda i, idx=idx, uq=uq, srt=srt: e(
                base1.at[idx].set(
                    vals1 + i.astype(jnp.float32),
                    unique_indices=uq, indices_are_sorted=srt)))
            print(f"k={k:6d} {name:22s}: {slope(fn):7.3f} ms", flush=True)

        # gathers for comparison
        fn = mk(lambda i, idx=idx_sorted: e(base6[:, idx + (i - i)]))
        print(f"k={k:6d} {'gath6 sorted':22s}: {slope(fn):7.3f} ms", flush=True)
        fn = mk(lambda i, idx=idx_rand: e(base6[:, idx + (i - i)]))
        print(f"k={k:6d} {'gath6 rand':22s}: {slope(fn):7.3f} ms", flush=True)

    # sort costs for reference: 1 payload vs 8 payloads at m
    keys = jnp.asarray(rng.integers(0, 2**30, size=m), jnp.uint32)
    pay = [jnp.asarray(rng.standard_normal((m,)), jnp.float32) for _ in range(8)]

    def mk_sort(np_):
        def loop(kk):
            def body(i, acc):
                out = lax.sort((keys + i.astype(jnp.uint32),) + tuple(pay[:np_]),
                               num_keys=1, is_stable=False)
                return acc + sum(o.sum().astype(jnp.float32) for o in out)
            return lax.fori_loop(0, kk, body, jnp.float32(0))
        return loop

    for np_ in (0, 1, 2, 5, 8):
        print(f"sort m={m} payloads={np_}: {slope(mk_sort(np_)):7.3f} ms",
              flush=True)
    # u64 single-key sort (packed key+idx)
    k64 = keys.astype(jnp.uint64) << 22
    def loop64(kk):
        def body(i, acc):
            out = lax.sort((k64 + i.astype(jnp.uint64),), num_keys=1,
                           is_stable=False)
            return acc + out[0].sum().astype(jnp.float32)
        return lax.fori_loop(0, kk, body, jnp.float32(0))
    print(f"sort m={m} u64 single  : {slope(loop64):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
