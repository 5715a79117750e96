"""Isolate the PLOC NN-stage cost: fused Pallas kernel vs XLA fallback."""
from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_bvh.ops import ploc
from tpu_bvh.ops.pallas.ploc_nn import ploc_nn_round

I32 = jnp.int32


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=8, k_hi=72, reps=5):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    np.asarray(f_lo())
    np.asarray(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    rng = np.random.default_rng(0)
    for size in (262_144, 65_536):
        mn = rng.random((6, size), dtype=np.float32)
        cols = np.concatenate([mn[:3], -(mn[:3] + 0.1 + mn[3:])], axis=0)
        seg = np.zeros((size,), np.int32)
        cnode = np.arange(size, dtype=np.int32)
        as_f = lambda x: lax.bitcast_convert_type(jnp.asarray(x), jnp.float32)
        mat = jnp.concatenate(
            [jnp.asarray(cols), as_f(seg)[None, :], as_f(cnode)[None, :]],
            axis=0,
        )
        nc = jnp.asarray(size, I32)

        def mk_pallas(k, mat=mat, nc=nc):
            def run():
                def body(i, m):
                    mg, dr, uc, rn = ploc_nn_round(m, nc, 8)
                    # feed outputs back so nothing is dead-code eliminated
                    m = m.at[0:6].set(jnp.where(mg[None, :], uc, m[0:6]))
                    return m
                return lax.fori_loop(0, k, body, mat)
            return run

        def mk_xla(k, mat=mat, nc=nc):
            idx = jnp.arange(size, dtype=I32)
            def run():
                def body(i, m):
                    cols6 = [m[j] for j in range(6)]
                    seg_u = lax.bitcast_convert_type(m[6], I32).astype(jnp.uint32)
                    mg, dr, uc, rn = ploc._nn_round_xla(
                        m, cols6, seg_u, idx < nc, idx, nc, size, 8
                    )
                    upd = jnp.stack([jnp.where(mg, uc[j], m[j]) for j in range(6)])
                    m = m.at[0:6].set(upd)
                    return m
                return lax.fori_loop(0, k, body, mat)
            return run

        print(f"NN stage @ {size}: pallas {slope(mk_pallas):7.3f} ms   "
              f"xla {slope(mk_xla):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
