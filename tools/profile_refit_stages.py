"""Refit long-path stage isolation, full consumption (no DCE):
dense kernel / + table build / + sort1 / + query / + place sort2 = full.
Stages are cumulative prefixes of refit_anchored_packed's dataflow, so
successive deltas are per-stage costs.
"""
import math
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax import lax
sys.path.insert(0, ".")
from tpu_bvh.models import lbvh
from tpu_bvh.ops.radix_tree import _topology_scans
from tpu_bvh.ops.refit import _floor_log2
from tpu_bvh.ops.pallas.refit_dense import refit_dense_pallas
from tpu_bvh.utils import scenes
I32 = jnp.int32


def slope(loop_fn, k_lo=1, k_hi=9, reps=5):
    f = jax.jit(loop_fn)
    klo = jnp.asarray(k_lo, I32); khi = jnp.asarray(k_hi, I32)
    jax.block_until_ready(f(klo)); jax.block_until_ready(f(khi))
    def t(fn):
        t0 = time.perf_counter(); jax.block_until_ready(fn()); return time.perf_counter() - t0
    lo = min(t(lambda: f(klo)) for _ in range(reps))
    hi = min(t(lambda: f(khi)) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def consume(*xs):
    tot = jnp.float32(0)
    for x in xs:
        if x.dtype == jnp.float32:
            tot += lax.bitcast_convert_type(x, I32).sum().astype(jnp.float32)
        else:
            tot += x.sum().astype(jnp.float32)
    return tot


n = 262_000
R = 24
tris = jnp.asarray(scenes.sponza_like(n))
codes_s, leaf_packed, _lp = jax.block_until_ready(
    jax.jit(lambda t: lbvh._sorted_leaves_from_tris(t, True))(tris))
dlt, first, last, *_rest = jax.block_until_ready(
    _topology_scans(codes_s.astype(jnp.uint32).astype(jnp.int32)))
m = first.shape[0]
n = leaf_packed.shape[1]
big = jnp.float32(3.0e38)
cap = min(m, max(64, (4 * m) // (3 * R)))
print(f"m={m} R={R} cap={cap}")


def stages(pt, upto: int):
    """Replicates refit_anchored_packed's dataflow up to a stage index."""
    as_ib = lambda x: lax.bitcast_convert_type(x, I32)
    as_fb = lambda x: lax.bitcast_convert_type(x, jnp.float32)
    onecol = jnp.full((1,), n - 1, I32)
    mat = jnp.concatenate(
        [as_ib(pt),
         jnp.concatenate([first, onecol])[None, :],
         jnp.concatenate([last, onecol])[None, :]], axis=0)
    acc_all, short_all, t4 = refit_dense_pallas(mat, n, R)
    acc_t = acc_all[:, :m]
    short = short_all[:m]
    if upto == 0:
        return (acc_t, short, t4)
    # table build
    nb = (n + 15) // 16
    padn = nb * 16
    ptp = pt if padn == n else jnp.concatenate(
        [pt, jnp.full((6, padn - n), big)], axis=1)
    c0 = ptp.reshape(6, nb, 16).min(axis=2)
    levels_c = max(1, math.ceil(math.log2(max(nb, 2))))
    ctabs = [t4, c0]
    ccur = c0
    for k in range(1, levels_c + 1):
        s = 1 << (k - 1)
        if s < nb:
            shifted = jnp.concatenate(
                [ccur[:, s:], jnp.broadcast_to(ccur[:, -1:], (6, s))], axis=1)
            ccur = jnp.minimum(ccur, shifted)
        ctabs.append(ccur)
    table_t = jnp.concatenate(ctabs, axis=1)
    if upto == 1:
        return (acc_t, short, table_t)
    # sort1
    i = jnp.arange(m, dtype=I32)
    key = (short.astype(jnp.uint32) << 22) | i.astype(jnp.uint32)
    accm = acc_t
    skey, cfq, clq, p0, p1, p2, p3, p4, p5 = lax.sort(
        (key, first, last,
         as_ib(accm[0]), as_ib(accm[1]), as_ib(accm[2]),
         as_ib(accm[3]), as_ib(accm[4]), as_ib(accm[5])),
        num_keys=1, is_stable=False)
    if upto == 2:
        return (skey, cfq, clq, p0, p1, p2, p3, p4, p5, table_t)
    # query

    def query(cf, cl):
        u = jnp.minimum(table_t[:, cf], table_t[:, jnp.maximum(cl - 15, 0)])
        bf = (cf + 15) >> 4
        bl = ((cl + 1) >> 4) - 1
        has_mid = bl >= bf
        bfs = jnp.minimum(bf, nb - 1)
        cnt = jnp.maximum(bl - bfs + 1, 1)
        kc = _floor_log2(cnt)
        b2 = jnp.maximum(bl - (1 << kc) + 1, 0)
        uc = jnp.minimum(
            table_t[:, n + kc * nb + bfs], table_t[:, n + kc * nb + b2])
        return jnp.minimum(u, jnp.where(has_mid[None, :], uc, big))

    ut = query(cfq[:cap], clq[:cap])
    if upto == 3:
        return (ut, skey, p0, p1, p2, p3, p4, p5)
    # place sort2
    n_long = jnp.sum((~short).astype(I32))
    rank_c = jnp.arange(cap, dtype=I32)
    blend = rank_c < n_long
    full = [
        jnp.concatenate([jnp.where(blend, as_ib(ut[k]), p[:cap]), p[cap:]])
        for k, p in enumerate((p0, p1, p2, p3, p4, p5))
    ]
    out = lax.sort((skey & ((1 << 22) - 1), *full), num_keys=1,
                   is_stable=False)
    return (jnp.stack([as_fb(o) for o in out[1:]], axis=0),)


names = ["dense kernel", "+table build", "+sort1(9op)", "+query", "+place sort2"]
for upto in range(5):
    def mk(k, upto=upto):
        def body(i, acc):
            pt = leaf_packed + i.astype(jnp.float32) * 1e-9
            return acc + consume(*stages(pt, upto))
        return lax.fori_loop(0, k, body, jnp.float32(0))
    print(f"{names[upto]:16s}: {slope(mk):7.3f} ms", flush=True)
