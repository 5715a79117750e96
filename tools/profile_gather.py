"""Micro-bench: row-gather cost vs (table rows, query rows); transpose cost."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=2, k_hi=12, reps=3):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    np.asarray(f_lo())
    np.asarray(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    key = jax.random.PRNGKey(0)

    for table_rows, q_rows in [
        (5_000_000, 16_000),
        (250_000, 16_000),
        (262_000, 16_000),
    ]:
        tab = jax.random.normal(key, (table_rows, 6), jnp.float32)
        idx = jax.random.randint(key, (q_rows,), 0, table_rows, jnp.int32)

        def mk(k, tab=tab, idx=idx):
            def run():
                def body(i, acc):
                    g = tab[jnp.clip(idx + i, 0, tab.shape[0] - 1)]
                    return acc + g[0, 0]
                return lax.fori_loop(0, k, body, 0.0)
            return run

        ms = slope(mk)
        print(f"gather [{table_rows:>8}] rows x {q_rows:>7} queries: {ms:7.3f} ms",
              flush=True)

    for rows, cols in [(262_000, 6), (250_000, 6)]:
        a = jax.random.normal(key, (cols, rows), jnp.float32)

        def mk(k, a=a):
            def run():
                def body(i, acc):
                    b = (a + i.astype(jnp.float32)).T
                    return acc + b[0, 0] + b[-1, -1]
                return lax.fori_loop(0, k, body, 0.0)
            return run

        ms = slope(mk)
        print(f"transpose [6-8,{rows}] -> [{rows},{cols}]: {ms:7.3f} ms", flush=True)

    # scatter rows
    for q_rows in [16_000]:
        src = jax.random.normal(key, (q_rows, 6), jnp.float32)
        idx = jax.random.randint(key, (q_rows,), 0, 262_000, jnp.int32)

        def mk(k, src=src, idx=idx):
            def run():
                def body(i, acc):
                    out = jnp.zeros((262_000, 6), jnp.float32).at[
                        jnp.clip(idx + i, 0, 261_999)
                    ].set(src, mode="drop")
                    return acc + out[0, 0]
                return lax.fori_loop(0, k, body, 0.0)
            return run

        ms = slope(mk)
        print(f"scatter {q_rows:>7} rows into [262000, 6]: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
