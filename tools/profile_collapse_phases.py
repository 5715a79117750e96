"""Per-phase on-chip timing of the analytic collapse (tools provenance:
round-3 optimization of ops/collapse.py)."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_bvh.models import lbvh
from tpu_bvh.utils import scenes

I32 = jnp.int32
U32 = jnp.uint32


def slope(loop_fn, k_lo=2, k_hi=12, reps=5):
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
    dev = jax.devices()[0]
    print("device:", dev)
    tris = jax.device_put(jnp.asarray(scenes.sponza_like(262_000)), dev)
    bvh = jax.block_until_ready(lbvh.build_single_pass(tris))
    n_int = bvh.n_internal
    mm = bvh.n_nodes
    cap = n_int
    pk = bvh.packed_t
    left = bvh.left.astype(I32)
    right = bvh.right.astype(I32)

    # stage A: expansion simulation
    def mk_expand(k):
        def body(i, acc):
            pkp = pk + i.astype(jnp.float32) * 1e-7
            ext = jnp.maximum(-pkp[3:6] - pkp[0:3], 0.0)
            area = 2.0 * (ext[0]*ext[1] + ext[0]*ext[2] + ext[1]*ext[2])
            slot_ids = jnp.arange(4, dtype=I32)[None, :]
            ids = jnp.stack([left[:cap], right[:cap],
                             jnp.full((cap,), -1, I32), jnp.full((cap,), -1, I32)], 1)
            count = jnp.full((cap,), 2, I32)
            for _ in range(2):
                is_int = (ids >= 0) & (ids < n_int)
                a = jnp.where(is_int, area[jnp.clip(ids, 0, mm-1)], -1.0)
                pos = jnp.argmax(a, axis=1).astype(I32)
                best = jnp.max(a, axis=1)
                do = best > 0
                chosen = jnp.take_along_axis(ids, pos[:, None], axis=1)[:, 0]
                cs = jnp.clip(chosen, 0, mm-1)
                cl = left[cs]; cr = right[cs]
                onehot = slot_ids == pos[:, None]
                ids = jnp.where(do[:, None] & onehot, cl[:, None], ids)
                ids = jnp.where(do[:, None] & (slot_ids == count[:, None]), cr[:, None], ids)
                count = count + do.astype(I32)
            return acc + jnp.sum(ids[0]).astype(jnp.float32) + count[0]
        return lax.fori_loop(0, k, body, 0.0)

    print(f"A expand-sim      : {slope(mk_expand):7.3f} ms")

    # stage B: one raw 262K 1D gather, isolated
    idx0 = jnp.asarray(np.random.default_rng(0).integers(0, cap, cap), I32)
    vals = jnp.arange(cap, dtype=I32)

    def mk_gather(k):
        def body(i, acc):
            v = vals + i
            g = v[idx0]
            return acc + g[0].astype(jnp.float32)
        return lax.fori_loop(0, k, body, 0.0)

    print(f"B one 262K gather : {slope(mk_gather, k_hi=32):7.3f} ms")

    # stage C: one doubling trip (2 gathers + compose)
    def mk_trip(k):
        def body(i, carry):
            acc, ptr, f = carry
            fp = f[ptr]
            nf = (fp & 3) | ((fp >> 2) & 3) << 2 | (f & 3)
            nptr = ptr[ptr]
            return (acc + nptr[0].astype(jnp.float32), nptr, nf + i)
        out = lax.fori_loop(0, k, body, (0.0, idx0, vals))
        return out[0]

    print(f"C doubling trip   : {slope(mk_trip, k_hi=32):7.3f} ms")

    # stage D: the 5-key sort
    w = [jnp.asarray(np.random.default_rng(s).integers(0, 2**31, cap, np.int64), U32)
         for s in range(5)]

    def mk_sort(k):
        def body(i, acc):
            ops = lax.sort((w[0] + i.astype(U32), w[1], w[2], w[3], w[4],
                            jnp.arange(cap, dtype=I32)), num_keys=5, is_stable=True)
            return acc + ops[5][0].astype(jnp.float32)
        return lax.fori_loop(0, k, body, 0.0)

    print(f"D 5-key sort      : {slope(mk_sort):7.3f} ms")

    # stage E: the emit scatters
    rnk = jnp.asarray(np.random.default_rng(1).permutation(cap), I32)
    cv = jnp.zeros((cap, 4), I32)
    fv = jnp.zeros((cap, 4, 3), jnp.float32)

    def mk_emit(k):
        def body(i, acc):
            t = jnp.where(rnk + i < cap, rnk, cap)
            oc = jnp.full((cap, 4), -1, I32).at[t].set(cv, mode="drop")
            om = jnp.zeros((cap, 4, 3)).at[t].set(fv, mode="drop")
            return acc + oc[0, 0].astype(jnp.float32) + om[0, 0, 0]
        return lax.fori_loop(0, k, body, 0.0)

    print(f"E emit scatters   : {slope(mk_emit):7.3f} ms")

    # stage F: while_loop overhead — empty-ish converging loop
    def mk_while(k):
        def body(i, acc):
            def wbody(c):
                p, n = c
                return p[p], n + 1
            def wcond(c):
                return c[1] < 6 + i * 0
            p, _ = lax.while_loop(wcond, wbody, (idx0, i * 0))
            return acc + p[0].astype(jnp.float32)
        return lax.fori_loop(0, k, body, 0.0)

    print(f"F 6-trip while    : {slope(mk_while):7.3f} ms")


if __name__ == "__main__":
    main()
