"""Decompose raster render cost on TPU: binning / gather / sweep."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_bvh.models import lbvh
from tpu_bvh.ops import raster, aabb as A
from tpu_bvh.utils import camera, scenes

I32 = jnp.int32


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=1, k_hi=6, reps=3):
    f_lo = jax.jit(make_loop(k_lo))
    f_hi = jax.jit(make_loop(k_hi))
    np.asarray(f_lo())
    np.asarray(f_hi())
    lo = min(_t(f_lo) for _ in range(reps))
    hi = min(_t(f_hi) for _ in range(reps))
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    n = 262_000
    W = H = 512
    L = 64
    cap_a = 16
    cap_b = 256
    tile = 16
    rpt = tile * tile
    n_tiles = (W * H) // rpt

    tris = jnp.asarray(scenes.sponza_like(n))
    tr, cam = scenes.preset("sponza")
    rays = camera.generate_rays(cam, W, H)
    bvh = lbvh.build_single_pass(tris)
    packed = raster.pack_raster(bvh, tris, leaf_size=L)

    wt = A.transform_point(packed.tris_sorted, tr.scale, tr.quat, tr.translation)
    bmin, bmax = raster._treelet_aabbs(wt, packed.prim_ids, L)
    eye = rays.origin[0]
    coefs, t0 = raster._moller_coefs(wt, eye)
    t0 = jnp.where(packed.prim_ids >= 0, t0, 0.0)
    nt = bmin.shape[0]
    coefs_t = jax.block_until_ready(coefs.reshape(nt, L, 4, 3))
    t0_t = t0.reshape(nt, L)
    perm = raster.tile_order(W, H, tile)
    dirs_tm = jax.block_until_ready(rays.direction[perm].reshape(n_tiles, rpt, 3))
    bins = raster.bin_treelets(
        eye, dirs_tm.reshape(-1, 3), bmin, bmax, n_tiles, rpt, cap_b
    )
    cand_a = jax.block_until_ready(bins.cand[:, :cap_a])

    def mk_bin(k):
        def run():
            def body(i, acc):
                b = raster.bin_treelets(
                    eye + i.astype(jnp.float32) * 1e-9,
                    dirs_tm.reshape(-1, 3),
                    bmin, bmax, n_tiles, rpt, cap_b,
                )
                return acc + b.cand[0, 0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    print(f"binning(cap_b={cap_b}): {slope(mk_bin):.3f} ms", flush=True)

    def mk_gather(k):
        def run():
            def body(i, acc):
                sid = jnp.clip(cand_a + 0 * i, 0, nt - 1)
                c = coefs_t[sid]  # [tiles, cap_a, L, 4, 3]
                return acc + c[0, 0, 0, 0, 0]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    print(f"coef slab gather: {slope(mk_gather):.3f} ms", flush=True)

    def mk_sweep(k):
        def run():
            def body(i, acc):
                def tile_sweep(d, ids):
                    sid = jnp.clip(ids, 0, nt - 1)
                    c = coefs_t[sid].reshape(cap_a * L, 4, 3)
                    tt = jnp.where((ids >= 0)[:, None], t0_t[sid], 0.0).reshape(-1)
                    t2, lp, u2, v2 = raster._sweep(d, c, tt)
                    return t2, lp, u2, v2
                d2 = dirs_tm * (1.0 + i.astype(jnp.float32) * 1e-9)
                t2, lp, u2, v2 = jax.vmap(tile_sweep)(d2, cand_a)
                return acc + t2[0, 0] + u2[0, 0]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    print(f"pass A sweep (gather+fma+reduce): {slope(mk_sweep):.3f} ms", flush=True)

    # sweep with NO division (approximate t ordering by den-scaled compare)
    def mk_sweep_planes_only(k):
        def run():
            def body(i, acc):
                def tile_sweep(d, ids):
                    sid = jnp.clip(ids, 0, nt - 1)
                    c = coefs_t[sid].reshape(cap_a * L * 4, 3)
                    p = (
                        d[:, None, 0] * c[None, :, 0]
                        + d[:, None, 1] * c[None, :, 1]
                        + d[:, None, 2] * c[None, :, 2]
                    )
                    return jnp.min(p.reshape(rpt, cap_a * L, 4), axis=1)
                d2 = dirs_tm * (1.0 + i.astype(jnp.float32) * 1e-9)
                m = jax.vmap(tile_sweep)(d2, cand_a)
                return acc + m[0, 0, 0]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    print(f"pass A planes+min only: {slope(mk_sweep_planes_only):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
