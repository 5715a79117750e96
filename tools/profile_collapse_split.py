"""Collapse fast-path decomposition: XLA prep+coarse vs kernel vs merge.

Isolates collapse_lbvh_to_bvh4's three stages by running (a) the full
function, (b) everything up to the kernel call with the kernel replaced by
passthrough outputs (TBVH_COLLAPSE_PARTS=0 disables kernel phases), and
(c) the kernel alone on prebuilt inputs (profile_collapse_parts2.py).
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from tpu_bvh.models import lbvh
from tpu_bvh.utils import scenes

I32 = jnp.int32


def slope(loop_fn, k_lo=1, k_hi=5, reps=5):
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


n = 262_000
tris = jax.device_put(jnp.asarray(scenes.sponza_like(n)))
bvh, parent, first, last = jax.block_until_ready(
    lbvh.build_single_pass_aux(tris)
)

from tpu_bvh.ops.collapse_fast import collapse_lbvh_to_bvh4


def mk_full(k):
    def body(i, acc):
        b = bvh._replace(packed_t=bvh.packed_t + i.astype(jnp.float32) * 1e-7)
        w = collapse_lbvh_to_bvh4(b, parent, first, last)
        return acc + w.child_min[0, 0, 0]

    return lax.fori_loop(0, k, body, 0.0)


# stage isolation: monkeypatch the kernel with a passthrough to time
# XLA prep + coarse + merge without the Pallas cost
import tpu_bvh.ops.collapse_fast as CF

orig = CF.collapse_block_pallas


def passthrough(meta, node8, leaf8, carr, m, n_trips=None, interpret=False):
    outm = jnp.tile(meta[0:1], (8, 1)).astype(I32)
    return outm, [node8, node8, leaf8, leaf8]


CF.collapse_block_pallas = passthrough
collapse_nokernel = jax.jit(
    lambda b, p, f, l: CF.collapse_lbvh_to_bvh4.__wrapped__(b, p, f, l)
)


def mk_nok(k):
    def body(i, acc):
        b = bvh._replace(packed_t=bvh.packed_t + i.astype(jnp.float32) * 1e-7)
        w = collapse_nokernel(b, parent, first, last)
        return acc + w.child_min[0, 0, 0]

    return lax.fori_loop(0, k, body, 0.0)


print(f"prep+coarse+merge (no kernel): {slope(mk_nok):7.3f} ms", flush=True)
CF.collapse_block_pallas = orig

# finer: prep+coarse only (stop before merge) by slicing the fn — emulate
# by timing the coarse math standalone
from tpu_bvh.ops.pallas.collapse_block import S_LEN


def coarse_only(b, parent, first, last):
    import tpu_bvh.ops.collapse_fast as F

    nn = b.n_leaves
    m = b.n_internal
    mm = b.n_nodes
    pk = b.packed_t
    left = b.left.astype(I32)
    right = b.right.astype(I32)
    ext = jnp.maximum(-pk[3:6] - pk[0:3], 0.0)
    area = 2.0 * (ext[0] * ext[1] + ext[0] * ext[2] + ext[1] * ext[2])
    area_bits = F._f_bits(area)
    rlen = last - first + 1
    is_long = rlen > S_LEN
    idx_m = jnp.arange(m, dtype=I32)
    ccap = 2 * nn // (S_LEN + 1) + 2
    ccap = min(ccap, m)
    key = jnp.where(is_long, idx_m, F._BIGKEY)
    (skey,) = lax.sort((key.astype(jnp.uint32),), num_keys=1)
    cidx = jnp.minimum(skey[:ccap].astype(I32), m - 1)
    prow = jnp.concatenate(
        [
            area_bits[None, :],
            left[None, :],
            right[None, :],
            parent[None, :].astype(I32),
            F._f_bits(pk),
            jnp.zeros((6, mm), I32),
        ],
        axis=0,
    ).T

    def fetch(ids):
        return prow[jnp.clip(ids, 0, mm - 1)]

    trow = fetch(cidx)
    rowL = fetch(trow[:, 1])
    rowR = fetch(trow[:, 2])
    rowCL = fetch(rowL[:, 1])
    rowCR = fetch(rowR[:, 2])
    rowDL = fetch(rowCL[:, 1])
    rowDR = fetch(rowCR[:, 2])
    return (
        trow[:, 0] + rowL[:, 0] + rowR[:, 0] + rowCL[:, 0] + rowCR[:, 0]
        + rowDL[:, 0] + rowDR[:, 0]
    )


coarse_j = jax.jit(coarse_only)


def mk_coarse(k):
    def body(i, acc):
        b = bvh._replace(packed_t=bvh.packed_t + i.astype(jnp.float32) * 1e-7)
        return acc + coarse_only(b, parent, first, last)[0].astype(jnp.float32)

    return lax.fori_loop(0, k, body, 0.0)


print(f"coarse prep (sort + 7 gathers): {slope(mk_coarse):7.3f} ms", flush=True)

print(f"full collapse_lbvh_to_bvh4: {slope(mk_full):7.3f} ms", flush=True)
