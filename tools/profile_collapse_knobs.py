"""Tune collapse kernel knobs (S_LEN, _BLK) in ONE process, interleaved.

Chip/tunnel throughput drifts up to 2x between processes, so the old
subprocess-per-value sweeps (profile_collapse_slen.py) produced unusable
comparisons. Here every variant is traced from the same process by
mutating the module-level knobs (read at trace time) before jitting, and
timing rounds interleave across variants so drift hits all equally.

Usage: python tools/profile_collapse_knobs.py "33:3584" "25:3584" ...
       (S_LEN:BLK[:PARTS] triples; PARTS is the kernel phase bitmask
       1 sweeps / 2 aabb / 4 own / 8 states, default 15 = all — ablating
       phases in the same interleaved run attributes in-kernel cost)
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax

from tpu_bvh.models import lbvh
from tpu_bvh.utils import scenes
import tpu_bvh.ops.collapse_fast as CF
import tpu_bvh.ops.pallas.collapse_block as CB

I32 = jnp.int32
variants = sys.argv[1:] or ["33:3584", "25:3584", "33:7936", "25:7936",
                            "29:5888"]

n = 262_000
tris = jax.device_put(jnp.asarray(scenes.sponza_like(n)))
bvh, parent, first, last = jax.block_until_ready(
    lbvh.build_single_pass_aux(tris)
)


def consume(w):
    return (
        w.slot_packed_t[0, 0, 0]
        + (w.child_t[0, 0] + w.child_count[1] + w.parent[2]
           + w.leaf_parent[3] + w.leaf_prim[4] + w.n_nodes
           ).astype(jnp.float32)
    )


def set_knobs(slen, blk, parts=15):
    # all trace-time module globals that derive from S_LEN / _BLK
    CB.S_LEN = slen
    CB._DW = slen
    CB._DP = slen + 3
    CB._BLK = blk
    CB._PARTS = parts
    CF.S_LEN = slen


fns = {}
klo = jnp.asarray(1, I32)
khi = jnp.asarray(5, I32)
for v in variants:
    set_knobs(*(int(x) for x in v.split(":")))

    def mk():
        def loop(k):
            def body(i, acc):
                b = bvh._replace(
                    packed_t=bvh.packed_t * (1.0 + i.astype(jnp.float32) * 3e-7)
                )
                w = CF.collapse_lbvh_to_bvh4.__wrapped__(
                    b, parent, first, last
                )
                return acc + consume(w)

            return lax.fori_loop(0, k, body, 0.0)

        return jax.jit(loop)

    fns[v] = mk()
    jax.block_until_ready(fns[v](klo))
    jax.block_until_ready(fns[v](khi))
    print(f"compiled {v}", flush=True)


def t(f, k):
    t0 = time.perf_counter()
    jax.block_until_ready(f(k))
    return time.perf_counter() - t0


obs = {v: [] for v in fns}
for rnd in range(4):
    for v, f in fns.items():
        lo = min(t(f, klo) for _ in range(3))
        hi = min(t(f, khi) for _ in range(3))
        obs[v].append((hi - lo) / 4 * 1e3)
for v, xs in obs.items():
    print(f"{v:10s}: min {min(xs):7.3f} ms   rounds "
          + " ".join(f"{x:7.3f}" for x in xs), flush=True)
