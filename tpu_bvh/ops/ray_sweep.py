"""Arbitrary-origin dense sweep traversal — the TPU general-ray path.

The raster engine (`raster_tpu.py`) bakes a fixed eye into per-triangle
Möller coefficients, so it only serves pinhole frames. This engine drops
that restriction: the Plücker side products of a ray against a triangle's
edges are BILINEAR in (d, o x d), so every numerator of the reference's
triangle test (`intersectTriangle`, `/root/reference/src/Common.h:516-531`)
is a dot product of a per-triangle 10-vector with the per-ray feature
vector

    F = [d (3), m = o x d (3), o (3), 1],

derived by expanding the oracle's cross products (pos_i = v_i - o):

    u_num = (v0 x v2) . d + m . (v2 - v0)          (x2 dropped throughout)
    v_num = (v1 x v0) . d + m . (v0 - v1)
    w_num = (v2 x v1) . d + m . (v1 - v2)
    den   = n . d,           n = (v0 - v1) x (v2 - v0)
    t_num = n . v0 - n . o

A treelet sweep is therefore ONE `dot_general([10, 6L], [10, 256])` — the
same MXU cost as the raster's 4-channel fixed-eye version, because the MXU
contracts 128 deep regardless. Everything else reuses the raster schedule:

* rays are sorted once by (origin Morton cell | direction Morton cell)
  into coherent groups of 4096 (replacing the raster's screen tiles);
  common-origin sets (`shadow_occlusion`'s reversed rays) degenerate to
  pure direction sorting — tight cones from the shared origin;
* group/subgroup culling uses `_obox_vs_aabb` — the cone test generalized
  from a point eye to the group's origin BOX;
* (group, treelet) pairs ride the same sort-compacted flat pair list and
  per-(pair, subgroup) prefetch bitmasks; the kernel is the raster kernel
  with F-features, per-ray tmin/tmax rows, and a 30-deep bf16-split dot.

This replaces the reference's per-thread while-while traversal
(`/root/reference/src/TraversalKernel.h:337-451`) as the TPU throughput
path for arbitrary ray sets (shadow rays, AO, bounces, ray buckets from
any integrator). The stack-based wavefront engine (`traverse.py`) remains
the oracle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..types import HitInfo, Rays, Transformation, FLT_MAX
from . import aabb as A
from . import raster as R
from .raster_tpu import _compact_pairs

I32 = jnp.int32
F32 = jnp.float32
BIG = jnp.float32(3.0e38)
BIGF = 3.0e38  # python literal: safe to close over inside the Pallas kernel
RPT = 256  # rays per subgroup (one sweep column block)
NSUB = 16  # subgroups per group
RPG = RPT * NSUB  # rays per group (4096)
NF = 16  # feature rows (10 dot channels + tmin/tmax + pad)


def _plucker_slabs(wt, prim_ids, leaf_size: int):
    """Per-treelet coefficient slabs [T+1, 10, 6L], channel-major.

    dim1 = the ten F-channels (d xyz, m xyz, o xyz, const); dim2 = six
    L-column blocks (u, v, w, den, t, pid). Channel-major keeps each
    pair's slab one contiguous DMA row (same argument as
    `raster_tpu._build_slabs`). Slab T is all-zero (den = 0, t_num = 0 ->
    never hits) for padding; padding prims inside real treelets are
    zeroed the same way."""
    L = leaf_size
    v0, v1, v2 = wt[:, 0], wt[:, 1], wt[:, 2]
    n = jnp.cross(v0 - v1, v2 - v0)
    real = (prim_ids >= 0).astype(F32)[:, None]
    nt = wt.shape[0] // L

    def block(dch, mch, och, cch):
        """One [T, 10, L] block from per-prim channel vectors."""
        rows = jnp.concatenate([dch, mch, och, cch], axis=1) * real  # [P,10]
        return rows.reshape(nt, L, 10).transpose(0, 2, 1)

    z3 = jnp.zeros_like(v0)
    z1 = jnp.zeros((v0.shape[0], 1), F32)
    one = jnp.ones((v0.shape[0], 1), F32)
    pidf = prim_ids.astype(F32)[:, None]  # exact for ids < 2^24
    blocks = [
        block(jnp.cross(v0, v2), v2 - v0, z3, z1),  # u_num
        block(jnp.cross(v1, v0), v0 - v1, z3, z1),  # v_num
        block(jnp.cross(v2, v1), v1 - v2, z3, z1),  # w_num
        block(n, z3, z3, z1),  # den
        block(z3, z3, -n, jnp.sum(n * v0, axis=-1, keepdims=True)),  # t_num
        block(z3, z3, z3, pidf),  # pid
    ]
    slab = jnp.concatenate(blocks, axis=2)  # [T, 10, 6L]
    return jnp.concatenate([slab, jnp.zeros((1, 10, 6 * L), F32)], axis=0)


def _morton15(x, y, z):
    """15-bit Morton interleave of 5-bit cell coords (plain u32 math)."""
    def spread(v):
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def _ray_sort_key(o, d, omin, oext):
    """Coherence key: origin Morton cell (15 bits, 32^3 cells) over
    direction Morton cell (15 bits over [-1,1]^3 — sign planes land on
    the top bit per axis, so octants separate first). Rays sharing a key
    traverse near-identical treelet sets. The direction minor bits make
    COMMON-ORIGIN sets (a pinhole at a light — the reversed-shadow fast
    path) sort into tight cones: with the old octant-only direction key,
    a point light's 256-ray subgroups spanned a whole octant and subgroup
    culling kept 63% of pairs alive (measured sponza_like 512^2)."""
    q = jnp.clip(((o - omin[None, :]) / oext[None, :]) * 32.0, 0.0, 31.0)
    q = q.astype(jnp.uint32)
    qd = jnp.clip((d + 1.0) * 16.0, 0.0, 31.0).astype(jnp.uint32)
    return (_morton15(q[:, 0], q[:, 1], q[:, 2]) << 15) | _morton15(
        qd[:, 0], qd[:, 1], qd[:, 2]
    )


def _kernel(g_ct, g_first, p_tlb, p_bits, feats, slab,
            out_t, out_p, out_u, out_v, out_c, tmax_s,
            occlusion: bool = False):
    from jax.experimental import pallas as pl

    g = pl.program_id(0)
    G = slab.shape[0]
    L = slab.shape[2] // 6

    @pl.when(g_first[g] == 1)
    def _init():
        out_t[:] = jnp.full_like(out_t, BIGF)
        out_p[:] = jnp.full_like(out_p, -1)
        out_u[:] = jnp.zeros_like(out_u)
        out_v[:] = jnp.zeros_like(out_v)
        out_c[:] = jnp.zeros_like(out_c)
        for s in range(NSUB):
            # occlusion bound starts at the subgroup's largest ray tmax —
            # pairs entirely beyond any ray's reach are skipped outright
            tmax_s[s] = jnp.max(feats[0, 10, s * RPT : (s + 1) * RPT])

    iota_l = lax.broadcasted_iota(I32, (L, RPT), 0)

    def sweep(j, s):
        sr = pl.ds(s // 2, 1)
        sc = pl.ds(pl.multiple_of((s % 2) * RPT, RPT), RPT)
        # per-ray candidate counter (heat-map signal, as in the raster)
        out_c[0, sr, sc] = out_c[0, sr, sc] + L
        F = feats[0, 0:10, pl.ds(pl.multiple_of(s * RPT, RPT), RPT)]
        tmaxseg = feats[0, 10, pl.ds(pl.multiple_of(s * RPT, RPT), RPT)][None, :]
        tminseg = feats[0, 11, pl.ds(pl.multiple_of(s * RPT, RPT), RPT)][None, :]
        # boolean queries never read the pid block: drop 1/6 of the
        # contraction columns
        cj = slab[j][:, : 5 * L] if occlusion else slab[j]  # [10, 5L|6L]

        # near-f32 via the bf16 split (hi*hi + lo*hi + hi*lo in ONE
        # contraction of depth 30 — see raster_tpu._kernel for why)
        def dot_(a, b):
            return lax.dot_general(
                a, b, (((0,), (0,)), ((), ())), preferred_element_type=F32
            )

        cj_hi = cj.astype(jnp.bfloat16).astype(F32)
        cj_lo = cj - cj_hi
        f_hi = F.astype(jnp.bfloat16).astype(F32)
        f_lo = F - f_hi
        planes = dot_(
            jnp.concatenate([cj_hi, cj_lo, cj_hi], axis=0),
            jnp.concatenate([f_hi, f_hi, f_lo], axis=0),
        )  # [6L, 256]
        un = planes[0 * L : 1 * L, :]
        vn = planes[1 * L : 2 * L, :]
        wn = planes[2 * L : 3 * L, :]
        den = planes[3 * L : 4 * L, :]
        tn = planes[4 * L : 5 * L, :]
        pidp = None if occlusion else planes[5 * L : 6 * L, :]
        ok = (
            jnp.minimum(
                jnp.minimum(un * den, vn * den), jnp.minimum(wn * den, tn * den)
            )
            > 0
        )
        inv = 1.0 / jnp.where(den != 0, den, 1.0)
        tp = jnp.where(ok, tn * inv, BIGF)
        tp = jnp.where((tp > tminseg) & (tp < tmaxseg), tp, BIGF)
        tmin = jnp.min(tp, axis=0, keepdims=True)  # [1, 256]
        if occlusion:
            # boolean query: any in-range hit kills the ray — record t = 0
            # so the subgroup's occlusion bound collapses and later pairs
            # (tlb >= 0) are skipped once every ray is occluded; the
            # winner-extraction (argmin + u/v/pid mins, ~40% of the
            # epilogue) is dropped entirely
            acc_t = out_t[0, sr, sc]
            hit_any = tmin < BIGF
            new_t = jnp.where(hit_any, 0.0, acc_t)
            out_t[0, sr, sc] = new_t
            out_p[0, sr, sc] = jnp.where(hit_any, 0, out_p[0, sr, sc])
            tmax_s[s] = jnp.max(jnp.minimum(new_t, tmaxseg))
            return
        eq = tp == tmin
        win = jnp.min(jnp.where(eq, iota_l, L), axis=0, keepdims=True)
        eqw = eq & (iota_l == win)
        p_best = jnp.min(
            jnp.where(eqw, pidp, BIGF), axis=0, keepdims=True
        ).astype(I32)
        u_best = jnp.min(jnp.where(eqw, un * inv, BIGF), axis=0, keepdims=True)
        v_best = jnp.min(jnp.where(eqw, vn * inv, BIGF), axis=0, keepdims=True)

        acc_t = out_t[0, sr, sc]
        better = tmin < acc_t
        new_t = jnp.where(better, tmin, acc_t)
        out_t[0, sr, sc] = new_t
        out_p[0, sr, sc] = jnp.where(better, p_best, out_p[0, sr, sc])
        out_u[0, sr, sc] = jnp.where(better, u_best, out_u[0, sr, sc])
        out_v[0, sr, sc] = jnp.where(better, v_best, out_v[0, sr, sc])
        # cap by the ray tmax: an unhit ray must bound the subgroup at its
        # OWN reach, not BIG — without the min, one unhit ray disabled
        # pair skipping for every finite-tmax workload (shadow segments)
        tmax_s[s] = jnp.max(jnp.minimum(new_t, tmaxseg))

    for j in range(G):
        bits_j = p_bits[g * G + j]

        @pl.when(bits_j != 0)
        def _pair(j=j, bits_j=bits_j):
            def s_cond(bits):
                return bits != 0

            tlb_j = p_tlb[g * G + j]

            def s_body(bits):
                low = bits & (-bits)
                s = 31 - lax.clz(low.astype(jnp.uint32)).astype(I32)

                @pl.when(tlb_j < tmax_s[s])
                def _():
                    sweep(j, s)

                return bits & (bits - 1)

            lax.while_loop(s_cond, s_body, bits_j)


def trace_rays(
    scene: R.RasterScene,
    rays: Rays,
    tr: Transformation,
    cand_cap: int = 512,
    pair_cap: int = 16384,
    group: int = 32,
    interpret: bool = False,
    occlusion: bool = False,
):
    """Closest-hit trace of an ARBITRARY ray set against a packed scene.

    Same results as `traverse.traverse_bvh2` (up to exact-t ties).
    With `occlusion=True` the kernel answers the boolean query only
    (prim_idx >= 0 means some in-range hit exists; t/u/v are not
    meaningful) — cheaper epilogue and occluded subgroups stop sweeping.
    Returns (HitInfo in input ray order, counts u32[R] candidate-sweep
    heat-map, overflow bool[] — true when a group exceeded `cand_cap`
    candidate treelets or the pair list overflowed `pair_cap`).
    On overflow the OUTPUTS ARE UNDEFINED, not merely incomplete: pair
    truncation can drop a whole ray group's pairs, leaving its output
    block uninitialized device memory. Always gate on the flag."""
    return _trace_impl(
        scene.tris_sorted, scene.prim_ids, rays, tr,
        cand_cap, pair_cap, group, scene.leaf_size, interpret, occlusion,
    )


@partial(
    jax.jit,
    static_argnames=("cand_cap", "pair_cap", "group", "leaf_size",
                     "interpret", "occlusion"),
)
def _trace_impl(
    tris_sorted, prim_ids, rays: Rays, tr: Transformation,
    cand_cap: int, pair_cap: int, group: int, leaf_size: int,
    interpret: bool, occlusion: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = leaf_size
    G = group
    ng = pair_cap // G
    R_in = rays.origin.shape[0]
    Rp = -(-R_in // RPG) * RPG
    n_ct = Rp // RPG

    wt = A.transform_point(tris_sorted, tr.scale, tr.quat, tr.translation)
    bmin, bmax = R._treelet_aabbs(wt, prim_ids, L)
    # translate scene AND origins by the scene centroid: Plücker moments
    # grow with |v|^2, so centering keeps the bf16-split products accurate
    c0 = (jnp.min(bmin, axis=0) + jnp.max(bmax, axis=0)) * 0.5
    wt = wt - c0[None, None, :]
    bmin = bmin - c0[None, :]
    bmax = bmax - c0[None, :]

    o = rays.origin - c0[None, :]
    d = rays.direction
    tmin_r = rays.tmin
    tmax_r = rays.tmax
    if Rp != R_in:
        padn = Rp - R_in
        o = jnp.concatenate([o, jnp.zeros((padn, 3), F32)])
        d = jnp.concatenate([d, jnp.zeros((padn, 3), F32)])
        tmin_r = jnp.concatenate([tmin_r, jnp.zeros((padn,), F32)])
        # dead padding rays: tmax = -1 rejects every candidate t
        tmax_r = jnp.concatenate([tmax_r, jnp.full((padn,), -1.0, F32)])

    # ---- coherence sort: ONE ray permutation, as sort payload ----
    omin = jnp.min(o, axis=0)
    oext = jnp.maximum(jnp.max(o, axis=0) - omin, 1e-30)
    key = _ray_sort_key(o, d, omin, oext)
    rid = jnp.arange(Rp, dtype=I32)
    _, ox, oy, oz, dx, dy, dz, tmn, tmx, rids = lax.sort(
        (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         tmin_r, tmax_r, rid),
        num_keys=1,
    )

    # ---- per-group / per-subgroup bounds ----
    def gstat(v, red, n):
        return red(v.reshape(n_ct * n, RPG // n), axis=1)

    def bounds(n):
        lo = jnp.stack([gstat(v, jnp.min, n) for v in (ox, oy, oz)], -1)
        hi = jnp.stack([gstat(v, jnp.max, n) for v in (ox, oy, oz)], -1)
        dlo = jnp.stack([gstat(v, jnp.min, n) for v in (dx, dy, dz)], -1)
        dhi = jnp.stack([gstat(v, jnp.max, n) for v in (dx, dy, dz)], -1)
        return lo, hi, dlo, dhi

    glo, ghi, gdlo, gdhi = bounds(1)  # [CT, 3]
    possible, t_lb = R._obox_vs_aabb(
        glo[:, None, :], ghi[:, None, :], gdlo[:, None, :], gdhi[:, None, :],
        bmin[None], bmax[None],
    )  # [CT, T]
    # cap the entry bound by the farthest live tmax in the group
    gtmax = gstat(tmx, jnp.max, 1)  # [CT]
    possible = possible & (t_lb <= gtmax[:, None])

    p_tid, p_tlb, g_ct, g_first, empty_ct, overflow = _compact_pairs(
        possible, t_lb, n_ct, cand_cap, pair_cap, G
    )

    slabs = _plucker_slabs(wt, prim_ids, L)  # [T+1, 10, 6L]
    nt = bmin.shape[0]
    safe_tid = jnp.where(p_tid >= 0, p_tid, nt)
    pair_slab = slabs[safe_tid]  # [P, 10, 6L] — the one pair-sized gather

    # per-(pair, subgroup) cull -> prefetch bitmask (XLA-side, like raster)
    slo, shi, sdlo, sdhi = bounds(NSUB)  # [CT*NSUB, 3]
    rs = lambda v: v.reshape(n_ct, NSUB, 3)
    pc = jnp.clip(jnp.repeat(g_ct, G)[: p_tid.shape[0]], 0, n_ct - 1)
    empty = jnp.concatenate([jnp.full((1, 3), BIG), jnp.full((1, 3), -BIG)], 1)
    ab = jnp.concatenate([bmin, bmax], axis=1)  # [T, 6]
    ab = jnp.concatenate([ab, empty], 0)
    pair_aabb = ab[safe_tid]  # [P, 6]
    live_s, _ = R._obox_vs_aabb(
        rs(slo)[pc], rs(shi)[pc], rs(sdlo)[pc], rs(sdhi)[pc],
        pair_aabb[:, None, 0:3], pair_aabb[:, None, 3:6],
    )  # [P, NSUB]
    weights = jnp.left_shift(
        jnp.ones((NSUB,), I32), jnp.arange(NSUB, dtype=I32)
    )
    p_bits = jnp.sum(jnp.where(live_s, weights[None, :], 0), axis=1)
    p_bits = jnp.where(p_tid >= 0, p_bits, 0)

    # ---- feature rows [CT, NF, RPG] ----
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    onef = jnp.ones((Rp,), F32)
    zf = jnp.zeros((Rp,), F32)
    feats = jnp.stack(
        [dx, dy, dz, mx, my, mz, ox, oy, oz, onef, tmx, tmn,
         zf, zf, zf, zf],
        axis=0,
    ).reshape(NF, n_ct, RPG).transpose(1, 0, 2)

    out_shapes = (
        jax.ShapeDtypeStruct((n_ct, 8, RPG // 8), F32),
        jax.ShapeDtypeStruct((n_ct, 8, RPG // 8), I32),
        jax.ShapeDtypeStruct((n_ct, 8, RPG // 8), F32),
        jax.ShapeDtypeStruct((n_ct, 8, RPG // 8), F32),
        jax.ShapeDtypeStruct((n_ct, 8, RPG // 8), I32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(
                (1, NF, RPG), lambda g, gc, gf, tl, pb: (gc[g], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, 10, 6 * L), lambda g, gc, gf, tl, pb: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, RPG // 8), lambda g, gc, gf, tl, pb: (gc[g], 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 5,
        scratch_shapes=[
            pltpu.SMEM((NSUB,), F32),
        ],
    )
    out_t, out_p, out_u, out_v, out_c = pl.pallas_call(
        partial(_kernel, occlusion=occlusion),
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
    )(g_ct, g_first, p_tlb, p_bits, feats, pair_slab)

    # groups with zero candidate pairs never get a kernel visit — patch
    # their raw output blocks to miss before unpermuting
    e3 = empty_ct[:, None, None]
    out_t = jnp.where(e3, BIG, out_t)
    out_p = jnp.where(e3, -1, out_p)
    out_u = jnp.where(e3, 0.0, out_u)
    out_v = jnp.where(e3, 0.0, out_v)
    out_c = jnp.where(e3, 0, out_c)
    # [CT, 8, 512] rows are (subgroup pairs): flat index == sorted ray
    # order by construction (s//2, s%2, within) == s*RPT + within
    flat = lambda x: x.reshape(Rp)
    t = flat(out_t)
    prim = flat(out_p)
    u = flat(out_u)
    v = flat(out_v)
    counts = flat(out_c)

    # ---- back to input ray order: ONE sort keyed by rid (rids is a
    # permutation, so sorting by it IS the inverse permutation). An
    # 8-channel 262K lax.sort measures ~0.3 ms on v5e while the previous
    # [5, R] lane-dim scatter at R indices measured ~2.5 ms.
    _, t_i, prim, u_i, v_i, counts = lax.sort(
        (
            rids.astype(jnp.uint32),
            lax.bitcast_convert_type(t, I32),
            prim,
            lax.bitcast_convert_type(u, I32),
            lax.bitcast_convert_type(v, I32),
            counts,
        ),
        num_keys=1,
        is_stable=False,
    )
    t = lax.bitcast_convert_type(t_i, F32)[:R_in]
    prim = prim[:R_in]
    u = lax.bitcast_convert_type(u_i, F32)[:R_in]
    v = lax.bitcast_convert_type(v_i, F32)[:R_in]
    counts = counts[:R_in].astype(jnp.uint32)

    miss = (prim < 0) | (t >= BIG)
    hit = HitInfo(
        prim_idx=jnp.where(miss, -1, prim),
        t=jnp.where(miss, FLT_MAX, t),
        u=jnp.where(miss, 0.0, u),
        v=jnp.where(miss, 0.0, v),
    )
    return hit, counts, overflow


def shadow_occlusion(
    scene: R.RasterScene,
    points,
    live,
    light,
    tr: Transformation,
    eps: float,
    cand_cap: int = 512,
    pair_cap: int = 8192,
    group: int = 32,
    interpret: bool = False,
):
    """Point-light occlusion for surface points — the REVERSED fast path.

    Traces light->point rays (instead of point->light) through the same
    sweep engine: a common origin collapses every group's origin box to a
    point, so `_obox_vs_aabb` degenerates to an exact cone test, and the
    direction-minor sort key groups rays into tight cones from the light
    (the shadow analog of the raster engine's eye-tile coherence; the
    reference has no occlusion-query specialization at all — its shadow
    rays would run the same per-thread kernels,
    `/root/reference/src/TraversalKernel.h:337-451`).

    Occlusion is direction-symmetric: the reversed ray covers the same
    world segment [point + eps*l, light - eps*l] (l = unit point->light),
    so the boolean answer equals the forward query's.

    points: f32[N, 3] surface points (world space). live: bool[N] — dead
    entries cost nothing (tmax = -1 culls them from every pair).
    light: f32[3]. eps: endpoint offset in world units.
    Returns (occluded bool[N], counts u32[N], overflow bool[]).
    """
    n = points.shape[0]
    dvec = points - light[None, :]
    dist = jnp.linalg.norm(dvec, axis=1)
    d = dvec / jnp.maximum(dist, 1e-9)[:, None]
    rays = Rays(
        origin=jnp.broadcast_to(light, (n, 3)),
        direction=d,
        tmin=jnp.full((n,), eps, F32),
        tmax=jnp.where(live, dist - eps, -1.0),
    )
    hit, counts, overflow = trace_rays(
        scene, rays, tr, cand_cap, pair_cap, group, interpret,
        occlusion=True,
    )
    return (hit.prim_idx >= 0) & live, counts, overflow
