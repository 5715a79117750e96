"""Isolate refit_dense_pallas kernel cost from its XLA pack prep."""
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

from tpu_bvh.models import lbvh
from tpu_bvh.ops import radix_tree
from tpu_bvh.ops.pallas.refit_dense import refit_dense_pallas
from tpu_bvh.utils import scenes

I32 = jnp.int32


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


def main():
    tris = jnp.asarray(scenes.sponza_like(262_000))
    codes, leaf_min0, leaf_max0, _ = jax.jit(
        lambda t: lbvh._sorted_leaves_from_tris(t, True)
    )(tris)
    dlt, first0, last0, *_ = jax.jit(radix_tree._threshold_core)(codes)
    leaf_min0, leaf_max0, first0, last0 = map(
        jax.block_until_ready, (leaf_min0, leaf_max0, first0, last0)
    )
    n = leaf_min0.shape[0]

    # pre-packed mat (the kernel's true input)
    def pack(lm, lx, f, l):
        packed = jnp.concatenate([lm, -lx], axis=1)
        as_ib = lambda x: lax.bitcast_convert_type(x, I32)
        onecol = jnp.full((1,), n - 1, I32)
        return jnp.concatenate(
            [as_ib(packed.T),
             jnp.concatenate([f, onecol])[None, :],
             jnp.concatenate([l, onecol])[None, :]], axis=0)

    mat0 = jax.block_until_ready(jax.jit(pack)(leaf_min0, leaf_max0, first0, last0))

    def mk_pack(k):
        def run():
            def body(i, acc):
                lm = leaf_min0 + i.astype(jnp.float32) * 1e-7
                m = pack(lm, leaf_max0, first0, last0)
                return acc + m[0, 0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    def mk_kernel(k):
        def run():
            def body(i, acc):
                m = mat0.at[0, 0].add(i)
                a, s, t4 = refit_dense_pallas(m, n, 16)
                return acc + a[0, 0] + t4[0, 0] + s[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    # column-form pack: avoid the [n, 6] minor-dim concat entirely
    lmT0 = jax.block_until_ready(leaf_min0.T)
    lxT0 = jax.block_until_ready(leaf_max0.T)

    def mk_pack_cols(k):
        def run():
            def body(i, acc):
                lmT = lmT0 + i.astype(jnp.float32) * 1e-7
                as_ib = lambda x: lax.bitcast_convert_type(x, I32)
                onecol = jnp.full((1,), n - 1, I32)
                m = jnp.concatenate(
                    [as_ib(lmT), as_ib(-lxT0),
                     jnp.concatenate([first0, onecol])[None, :],
                     jnp.concatenate([last0, onecol])[None, :]], axis=0)
                return acc + m[0, 0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    for name, mk in [("pack (row-major lm/lx)", mk_pack),
                     ("pack (col-major lmT)", mk_pack_cols),
                     ("kernel only", mk_kernel)]:
        print(f"{name:28s} {slope(mk):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
