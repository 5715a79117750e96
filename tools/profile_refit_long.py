"""Long-path pieces of the anchored refit: table build, sort, query, place."""
import sys, time, math
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax import lax
sys.path.insert(0, ".")
from tpu_bvh.models import lbvh
from tpu_bvh.ops.radix_tree import _topology_scans
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

n_req = 262_000
tris = jnp.asarray(scenes.sponza_like(n_req))
codes_s, pt, _ = jax.block_until_ready(
    jax.jit(lambda t: lbvh._sorted_leaves_from_tris(t, True))(tris))
dlt, first, last, *_r = jax.block_until_ready(
    _topology_scans(codes_s.astype(jnp.uint32).astype(jnp.int32)))
n = pt.shape[1]
m = first.shape[0]
radius = 48
big = jnp.float32(3.0e38)

onecol = jnp.full((1,), n - 1, I32)
as_ib = lambda x: lax.bitcast_convert_type(x, I32)
mat = jax.block_until_ready(jnp.concatenate([
    as_ib(pt), jnp.concatenate([first, onecol])[None, :],
    jnp.concatenate([last, onecol])[None, :]], axis=0))
acc_all, short_all, t4 = jax.block_until_ready(refit_dense_pallas(mat, n, radius))
short = short_all[:m]
i_arr = jnp.arange(m, dtype=I32)

def build_table(t4, pt):
    nb = (n + 15) // 16
    padn = nb * 16
    ptp = pt if padn == n else jnp.concatenate([pt, jnp.full((6, padn - n), big)], 1)
    c0 = ptp.reshape(6, nb, 16).min(axis=2)
    levels_c = max(1, math.ceil(math.log2(max(nb, 2))))
    ctabs = [t4, c0]
    ccur = c0
    for k in range(1, levels_c + 1):
        s = 1 << (k - 1)
        if s < nb:
            shifted = jnp.concatenate([ccur[:, s:], jnp.broadcast_to(ccur[:, -1:], (6, s))], 1)
            ccur = jnp.minimum(ccur, shifted)
        ctabs.append(ccur)
    return jnp.concatenate(ctabs, axis=1).T, nb

def mk_table(k):
    def body(i, acc):
        tr, _ = build_table(t4 + i.astype(jnp.float32) * 1e-9, pt)
        return acc + tr[0, 0]
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"table build       : {slope(mk_table):7.3f} ms", flush=True)

def mk_sort(k):
    def body(i, acc):
        key = jnp.minimum((short.astype(jnp.uint32) << 22) | i_arr.astype(jnp.uint32), jnp.uint32(1 << 30) + i.astype(jnp.uint32))
        skey, cf, cl = lax.sort((key, first, last), num_keys=1, is_stable=False)
        return acc + skey[0].astype(jnp.float32) + cf[0].astype(jnp.float32)
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"compact sort      : {slope(mk_sort):7.3f} ms", flush=True)

table_rows, nb = jax.block_until_ready(build_table(t4, pt))
cap = min(m, max(64, (4 * m) // (3 * radius)))
skey, cfq, clq = jax.block_until_ready(lax.sort(
    ((short.astype(jnp.uint32) << 22) | i_arr.astype(jnp.uint32), first, last),
    num_keys=1, is_stable=False))
from tpu_bvh.ops.refit import _floor_log2

def query(table_rows, cf, cl):
    u = jnp.minimum(table_rows[cf], table_rows[jnp.maximum(cl - 15, 0)])
    bf = (cf + 15) >> 4
    bl = ((cl + 1) >> 4) - 1
    has_mid = bl >= bf
    bfs = jnp.minimum(bf, nb - 1)
    cnt = jnp.maximum(bl - bfs + 1, 1)
    kc = _floor_log2(cnt)
    b2 = jnp.maximum(bl - (1 << kc) + 1, 0)
    uc = jnp.minimum(table_rows[n + kc * nb + bfs], table_rows[n + kc * nb + b2])
    return jnp.minimum(u, jnp.where(has_mid[:, None], uc, big))

def mk_query(k):
    def body(i, acc):
        ut = query(table_rows + i.astype(jnp.float32) * 1e-9, cfq[:cap], clq[:cap]).T
        return acc + ut[0, 0]
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"query (4 gathers) : {slope(mk_query):7.3f} ms  (cap={cap})", flush=True)

ut0 = jax.block_until_ready(query(table_rows, cfq[:cap], clq[:cap]).T)
cpos = (skey & ((1 << 22) - 1)).astype(I32)
n_long = jnp.sum((~short).astype(I32))
rank_c = jnp.arange(cap, dtype=I32)

def mk_place(k):
    def body(i, acc):
        tgt = jnp.where(rank_c < jnp.minimum(n_long + i, n_long), cpos[:cap], m)
        out = jnp.full((6, m), big)
        out = out.at[:, tgt].set(ut0, mode="drop")
        return acc + out[0, 0]
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"place scatter     : {slope(mk_place):7.3f} ms", flush=True)


def mk_long_all(k):
    def body(i, acc):
        key = jnp.minimum((short.astype(jnp.uint32) << 22) | i_arr.astype(jnp.uint32), jnp.uint32(1 << 30) + i.astype(jnp.uint32))
        sk, cf, cl = lax.sort((key, first, last), num_keys=1, is_stable=False)
        ut = query(table_rows + i.astype(jnp.float32) * 1e-9, cf[:cap], cl[:cap]).T
        cp = (sk & ((1 << 22) - 1)).astype(I32)
        tgt = jnp.where(rank_c < n_long, cp[:cap], m)
        out = jnp.full((6, m), big).at[:, tgt].set(ut, mode="drop")
        return acc + out[0, 0]
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"long path chained : {slope(mk_long_all):7.3f} ms", flush=True)

# full refit re-expressed WITHOUT the overflow cond: dense kernel + table +
# sort + query + place + combine in one jit — isolates the cond's cost
def mk_nocond(k):
    def body(i, acc):
        ptl = pt + i.astype(jnp.float32) * 1e-9
        matl = jnp.concatenate([
            as_ib(ptl), jnp.concatenate([first, onecol])[None, :],
            jnp.concatenate([last, onecol])[None, :]], axis=0)
        acc_all, short_l, t4l = refit_dense_pallas(matl, n, radius)
        acc_t = acc_all[:, :m]
        sh = short_l[:m]
        tr, _nb = build_table(t4l, ptl)
        key = (sh.astype(jnp.uint32) << 22) | i_arr.astype(jnp.uint32)
        sk, cf, cl = lax.sort((key, first, last), num_keys=1, is_stable=False)
        ut = query(tr, cf[:cap], cl[:cap]).T
        cp = (sk & ((1 << 22) - 1)).astype(I32)
        nl = jnp.sum((~sh).astype(I32))
        tgt = jnp.where(rank_c < nl, cp[:cap], m)
        out = jnp.full((6, m), big).at[:, tgt].set(ut, mode="drop")
        res = jnp.stack([jnp.where(sh, acc_t[kk], out[kk]) for kk in range(6)], axis=0)
        return acc + res[0, 0]
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"refit no-cond e2e : {slope(mk_nocond):7.3f} ms", flush=True)

from tpu_bvh.ops import refit as _refit
def mk_refit_full(k):
    def body(i, acc):
        ptl = pt + i.astype(jnp.float32) * 1e-9
        out = _refit.refit_anchored_packed(ptl, first, last, radius=48)
        return acc + out[0, 0]
    return lax.fori_loop(0, k, body, jnp.float32(0))
print(f"refit prod e2e    : {slope(mk_refit_full):7.3f} ms", flush=True)
