"""Phase breakdown of collapse_fast: prep+coarse vs kernel vs merge."""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from tpu_bvh.models import lbvh
from tpu_bvh.utils import scenes
from tpu_bvh.ops import collapse_fast as CF
from tpu_bvh.ops.pallas.collapse_block import collapse_block_pallas, S_LEN

I32 = jnp.int32


def slope(loop_fn, k_lo=1, k_hi=5, reps=5):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, I32)
    khi = jnp.asarray(k_hi, I32)
    t0 = time.perf_counter()
    jax.block_until_ready(f(klo))
    print(f"    (first call {time.perf_counter()-t0:.1f}s)")
    jax.block_until_ready(f(khi))

    def t(fn):
        t0 = time.perf_counter(); jax.block_until_ready(fn()); return time.perf_counter() - t0

    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    n = 262_000
    tris = jax.device_put(jnp.asarray(scenes.sponza_like(n)), dev)
    bvh, parent, first, last = jax.block_until_ready(
        lbvh.build_single_pass_aux(tris)
    )
    m = bvh.n_internal
    mm = bvh.n_nodes
    nl = bvh.n_leaves

    # ---- piece A: area/prow prep ----
    def mk_prep(k):
        def body(i, acc):
            pk = bvh.packed_t + i.astype(jnp.float32) * 1e-7
            ext = jnp.maximum(-pk[3:6] - pk[0:3], 0.0)
            area = 2.0 * (ext[0]*ext[1] + ext[0]*ext[2] + ext[1]*ext[2])
            ab = lax.bitcast_convert_type(area, I32)
            prow = jnp.concatenate([
                ab[None, :], bvh.left[None, :], bvh.right[None, :],
                parent[None, :], lax.bitcast_convert_type(pk, I32),
                jnp.zeros((6, mm), I32)], axis=0).T
            return acc + prow[0, 0].astype(jnp.float32)
        return lax.fori_loop(0, k, body, 0.0)
    print(f"A prep(prow)      : {slope(mk_prep):7.3f} ms")

    # ---- piece B: coarse compact sort ----
    rlen = last - first + 1
    is_long = rlen > S_LEN
    idx_m = jnp.arange(m, dtype=I32)

    def mk_sortc(k):
        def body(i, acc):
            key = jnp.where(is_long, idx_m + i * 0, jnp.int32(2**30))
            (skey,) = lax.sort((key.astype(jnp.uint32),), num_keys=1)
            return acc + skey[0].astype(jnp.float32)
        return lax.fori_loop(0, k, body, 0.0)
    print(f"B coarse compact  : {slope(mk_sortc):7.3f} ms")

    # ---- piece C: kernel alone (prebuilt inputs) ----
    # reproduce input construction once outside the loop
    import tpu_bvh.ops.collapse_fast as cf_mod

    # grab inputs by running the orchestrator's prep through a small shim:
    # rebuild meta/node8/leaf8 as in collapse_lbvh_to_bvh4 with zero seeds
    pk = bvh.packed_t
    ext = jnp.maximum(-pk[3:6] - pk[0:3], 0.0)
    area = 2.0 * (ext[0]*ext[1] + ext[0]*ext[2] + ext[1]*ext[2])
    area_bits = lax.bitcast_convert_type(area, I32)
    W = nl
    padm = jnp.full((1, W - m), -1, I32)
    row = lambda v: jnp.concatenate([v[None, :], padm], axis=1)
    seed = jnp.full((m,), 3, I32)
    e2d = jnp.full((m,), -1, I32)
    meta = jnp.concatenate([
        jnp.concatenate([area_bits[None, :m], jnp.zeros((1, W-m), I32)], 1),
        row(bvh.left[:m]), row(bvh.right[:m]), row(parent[:m]),
        jnp.concatenate([seed[None, :], jnp.full((1, W-m), 3, I32)], 1),
        jnp.concatenate([(~is_long).astype(I32)[None, :], jnp.zeros((1, W-m), I32)], 1),
        jnp.concatenate([e2d[None, :], padm], 1),
        jnp.zeros((1, W), I32)], axis=0)
    node8 = jnp.concatenate([lax.bitcast_convert_type(pk[:, :m], I32),
                             jnp.zeros((2, m), I32)], axis=0)
    node8 = jnp.concatenate([node8, jnp.zeros((8, W-m), I32)], axis=1)
    leaf8 = jnp.concatenate([lax.bitcast_convert_type(pk[:, m:], I32),
                             jnp.zeros((2, nl), I32)], axis=0)
    meta = jax.block_until_ready(meta)

    def mk_kernel(k):
        def body(i, acc):
            mt = meta.at[0, 0].add(i)
            outm, outa = collapse_block_pallas(mt, node8, leaf8, m)
            return acc + outm[0, 0].astype(jnp.float32) + outa[0][0, 0].astype(jnp.float32)
        return lax.fori_loop(0, k, body, 0.0)
    print(f"C kernel alone    : {slope(mk_kernel):7.3f} ms")

    # ---- piece D: full pipeline ----
    def mk_full(k):
        def body(i, acc):
            b = bvh._replace(packed_t=bvh.packed_t + i.astype(jnp.float32) * 1e-7)
            w = CF.collapse_lbvh_to_bvh4(b, parent, first, last)
            return acc + w.child[0, 0] + w.n_nodes
        return lax.fori_loop(0, k, body, jnp.int32(0))
    print(f"D full            : {slope(mk_full):7.3f} ms")

    # ---- piece E: merge/assembly (approximate: transposes + scatters) ----
    outm, outa = jax.block_until_ready(collapse_block_pallas(meta, node8, leaf8, m))

    def mk_merge(k):
        def body(i, acc):
            o = outm.at[0, 0].add(i)
            child = jnp.stack([o[j, :m] for j in range(4)], axis=1)
            ka = jnp.stack([a[0:6, :m] for a in outa], axis=0)
            kaf = lax.bitcast_convert_type(ka, jnp.float32)
            cmin = kaf[:, 0:3, :].transpose(2, 0, 1)
            cmax = -kaf[:, 3:6, :].transpose(2, 0, 1)
            return acc + child[0, 0].astype(jnp.float32) + cmin[0, 0, 0] + cmax[0, 0, 0]
        return lax.fori_loop(0, k, body, 0.0)
    print(f"E merge transposes: {slope(mk_merge):7.3f} ms")


if __name__ == "__main__":
    main()
