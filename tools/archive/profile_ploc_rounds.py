"""PLOC round-level cost breakdown: per-round cost at full width, round
count to finisher threshold, and finisher cost."""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from tpu_bvh.models import lbvh
from tpu_bvh.ops import ploc as P
from tpu_bvh.ops.pallas.ploc_round import (
    _BLK, _FIN_WIDTH, _WPAD, ploc_finish, ploc_round_pp,
)
from tpu_bvh.utils import scenes

I32 = jnp.int32


def slope(loop_fn, k_lo=1, k_hi=6, reps=3):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, jnp.int32)
    khi = jnp.asarray(k_hi, jnp.int32)
    np.asarray(jax.block_until_ready(f(klo)))
    np.asarray(jax.block_until_ready(f(khi)))

    def t(k):
        t0 = time.perf_counter()
        jax.block_until_ready(f(k))
        return time.perf_counter() - t0

    lo = min(t(klo) for _ in range(reps))
    hi = min(t(khi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    n = 262_000
    hploc = len(sys.argv) > 1 and sys.argv[1] == "hploc"
    tris = jnp.asarray(scenes.sponza_like(n))
    n = int(tris.shape[0])
    codes, leaf_packed_t, _ = jax.block_until_ready(
        jax.jit(lambda t: lbvh._sorted_leaves_from_tris(t, True))(tris)
    )
    n_internal = n - 1
    blk = _BLK
    nblk = -(-n // blk)
    w2 = (nblk + 2) * blk + _WPAD
    init_nodes = jnp.arange(n, dtype=I32) + n_internal
    as_i = lambda x: lax.bitcast_convert_type(x, I32)
    mat = jnp.concatenate(
        [as_i(leaf_packed_t), codes.astype(I32)[None, :],
         init_nodes[None, :]], axis=0)
    A0 = jnp.concatenate(
        [jnp.zeros((8, blk), I32), mat,
         jnp.zeros((8, w2 - blk - n), I32)], axis=1)
    nodes0 = jnp.zeros((8, n_internal + max(n + 512, 16384 + 512)), I32)
    shift0 = jnp.asarray(3 if hploc else 32, I32)
    n_a = jnp.asarray(n, I32)

    # --- per-round cost at FULL width (force nc = n each iteration) ---
    def full_round_loop(k):
        B0 = jnp.zeros_like(A0)
        def body(i, carry):
            A, B, nodes, acc = carry
            nb = (n_a + blk - 1) // blk
            B2, nodes2, nm = ploc_round_pp(
                A, B, nodes, n_a, shift0, jnp.asarray(0, I32), 8, blk, nb)
            return (A, B2, nodes2, acc + nm)
        _, _, _, acc = lax.fori_loop(0, k, body, (A0, B0, nodes0, 0))
        return acc
    ms = slope(full_round_loop)
    print(f"full-width round: {ms:.3f} ms", flush=True)

    # --- round count + merge trajectory ---
    def traj():
        B0 = jnp.zeros_like(A0)
        def body(s):
            nc, sb, A, B, nodes, r, hist = s
            nb = (nc + blk - 1) // blk
            B2, nodes2, nm = ploc_round_pp(
                A, B, nodes, nc, sb, n_a - nc, 8, blk, nb)
            hist = hist.at[r].set(nc)
            sb = jnp.minimum(sb + 3, 32)
            return (nc - nm, sb, B2, A, nodes2, r + 1, hist)
        hist0 = jnp.zeros((64,), I32)
        out = lax.while_loop(
            lambda s: (s[0] > _FIN_WIDTH) & (s[5] < 64), body,
            (n_a, shift0, A0, B0, nodes0, 0, hist0))
        return out[5], out[6], out[0]
    r, hist, nc_end = jax.block_until_ready(jax.jit(traj)())
    print(f"rounds to fin threshold: {int(r)}, nc at end {int(nc_end)}",
          flush=True)
    print("live trajectory:", [int(x) for x in np.asarray(hist)[:int(r)]],
          flush=True)

    # --- finisher cost (from nc_end state) ---
    def fin_state():
        B0 = jnp.zeros_like(A0)
        def body(s):
            nc, sb, A, B, nodes = s
            nb = (nc + blk - 1) // blk
            B2, nodes2, nm = ploc_round_pp(
                A, B, nodes, nc, sb, n_a - nc, 8, blk, nb)
            sb = jnp.minimum(sb + 3, 32)
            return (nc - nm, sb, B2, A, nodes2)
        return lax.while_loop(
            lambda s: s[0] > _FIN_WIDTH, body,
            (n_a, shift0, A0, B0, nodes0))
    nc_f, sb_f, A_f, B_f, nodes_f = jax.block_until_ready(jax.jit(fin_state)())

    def fin_loop(k):
        def body(i, acc):
            nd = ploc_finish(
                A_f[:, blk:blk + _FIN_WIDTH], nodes_f, nc_f,
                sb_f + 0 * i, n_a - nc_f, 8)
            return acc + nd[0, 0] + i
        return lax.fori_loop(0, k, body, jnp.int32(0))
    ms = slope(fin_loop, 1, 4)
    print(f"finisher: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
