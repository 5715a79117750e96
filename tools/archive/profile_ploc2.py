"""PLOC cost attribution on TPU: per-round kernels by stage size, the
finisher, and the real build's round counts."""
from __future__ import annotations

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

from tpu_bvh.models import lbvh
from tpu_bvh.ops import ploc
from tpu_bvh.utils import scenes

I32 = jnp.int32


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def slope(mk, k_lo=2, k_hi=10, reps=4):
    f_lo, f_hi = jax.jit(mk(k_lo)), jax.jit(mk(k_hi))
    np.asarray(f_lo())
    np.asarray(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    tris = jnp.asarray(scenes.sponza_like(262_000))
    codes, leaf_packed_t, _ = jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True)
    )(tris)
    n = int(codes.shape[0])
    as_i = lambda x: lax.bitcast_convert_type(x, I32)
    mat_full = jnp.concatenate(
        [as_i(leaf_packed_t), codes.astype(I32)[None, :],
         (jnp.arange(n, dtype=I32) + n - 1)[None, :]], axis=0)
    nodes0 = jnp.zeros((8, n - 1 + max(n, 8704)), I32)

    from tpu_bvh.ops.pallas.ploc_nn import ploc_nn_round_raw
    from tpu_bvh.ops.pallas.ploc_round import ploc_emit_compact, ploc_finish

    for size in (262_144, 131_072, 65_536, 32_768, 16_384):
        sz = min(size, n)
        mat = jax.block_until_ready(mat_full[:, :sz])

        def mk_nn(k, mat=mat, sz=sz):
            def run():
                def body(i, acc):
                    m = mat.at[7, 0].add(i * 0)
                    nn = ploc_nn_round_raw(
                        m, jnp.asarray(sz, I32), jnp.asarray(32, I32), 8
                    )
                    return acc + nn[0, 0] + nn[7, 1]
                return lax.fori_loop(0, k, body, jnp.zeros((), I32))
            return run

        def mk_both(k, mat=mat, sz=sz):
            def run():
                def body(i, acc):
                    m = mat.at[7, 0].add(i * 0)
                    nn = ploc_nn_round_raw(
                        m, jnp.asarray(sz, I32), jnp.asarray(32, I32), 8
                    )
                    n_merged = jnp.sum((nn[7] == 1).astype(I32))
                    m2, nd = ploc_emit_compact(
                        m, nn, nodes0, jnp.asarray(sz, I32), n_merged
                    )
                    return acc + m2[0, 0] + nd[0, 0]
                return lax.fori_loop(0, k, body, jnp.zeros((), I32))
            return run

        nn_ms = slope(mk_nn)
        both_ms = slope(mk_both)
        print(f"@{sz:>7}: nn {nn_ms:6.3f}  nn+emit {both_ms:6.3f} ms",
              flush=True)

    def mk_fin(k):
        mat = jax.block_until_ready(mat_full[:, :8192])

        def run():
            def body(i, acc):
                m = mat.at[7, 0].add(i * 0)
                nd = ploc_finish(m, nodes0, jnp.asarray(8192, I32),
                                 jnp.asarray(32, I32), 8)
                return acc + nd[0, 0]
            return lax.fori_loop(0, k, body, jnp.zeros((), I32))
        return run

    print(f"finisher @8192: {slope(mk_fin, k_lo=1, k_hi=3):6.3f} ms",
          flush=True)

    # real build round counts per stage (replicate the staged loop on host)
    state = (jnp.asarray(n, I32), jnp.asarray(32, I32), mat_full, nodes0)
    counts = []
    sizes = []
    size = n
    while size > 8192:
        sizes.append(size)
        size = max(8192, size // 2)
    sizes.append(size)
    rnd = jax.jit(lambda s: ploc._round(s, 8))
    for si, size in enumerate(sizes):
        target = sizes[si + 1] if si + 1 < len(sizes) else 1
        if target == 1:
            break
        c = 0
        while int(state[0]) > target:
            state = rnd(state)
            c += 1
        counts.append((size, target, c, int(state[0])))
        (nc, sb, mat, nodes) = state
        state = (nc, sb, mat[:, :target], nodes)
    print("stage rounds:", counts, flush=True)


if __name__ == "__main__":
    main()
