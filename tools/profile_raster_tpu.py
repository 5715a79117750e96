"""Pallas raster kernel on the real TPU: correctness spot-check + Mrays/s."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_bvh.models import lbvh
from tpu_bvh.ops import raster, raster_tpu
from tpu_bvh.utils import camera, scenes


def _t(f):
    t0 = time.perf_counter()
    np.asarray(f())
    return time.perf_counter() - t0


def slope(make_loop, k_lo=4, k_hi=44, reps=4):
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
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tris = jnp.asarray(scenes.sponza_like(n))
    tr, cam = scenes.preset("sponza")
    rays = camera.generate_rays(cam, W, H)
    bvh = lbvh.build_single_pass(tris)
    packed = raster.pack_raster(bvh, tris, leaf_size=L)

    hit, overflow = raster_tpu.render_raster_tpu(
        packed, rays, tr, W, H, cand_cap=1024, pair_cap=int(__import__("os").environ.get("PAIR_CAP", 8192)), group=G
    )
    nh = int(jnp.sum(hit.prim_idx >= 0))
    print(f"hits {nh}/{W*H} overflow={bool(overflow)}", file=sys.stderr)

    def mk(k):
        def run():
            def body(i, acc):
                r2 = rays._replace(
                    direction=rays.direction * (1.0 + i.astype(jnp.float32) * 1e-7)
                )
                h, o = raster_tpu._render_tpu_impl(
                    packed.tris_sorted, packed.prim_ids, r2, tr,
                    W, H, 1024, int(__import__("os").environ.get("PAIR_CAP", 8192)), G, L, False,
                )
                return acc + h.t[0] + h.u[1]
            return lax.fori_loop(0, k, body, 0.0)
        return run

    ms = slope(mk)
    mrays = (W * H) / (ms * 1e-3) / 1e6
    print(f"raster_tpu(L={L},G={G}): {ms:.3f} ms = {mrays:.1f} Mrays/s")

    import os
    for dbg in (1, 2):
        if os.environ.get("RASTER_DEBUG_MODES"):
            def mkd(k, dbg=dbg):
                def run():
                    def body(i, acc):
                        r2 = rays._replace(
                            direction=rays.direction
                            * (1.0 + i.astype(jnp.float32) * 1e-7)
                        )
                        h, o = raster_tpu._render_tpu_impl(
                            packed.tris_sorted, packed.prim_ids, r2, tr,
                            W, H, 1024, int(__import__("os").environ.get("PAIR_CAP", 8192)), G, L, False, dbg,
                        )
                        return acc + h.t[0]
                    return lax.fori_loop(0, k, body, 0.0)
                return run
            msd = slope(mkd)
            print(f"  debug={dbg}: {msd:.3f} ms")

    # prep-only (binning + slab build + pre-gather, no kernel)
    from tpu_bvh.ops import aabb as A
    from tpu_bvh.ops import raster_tpu as RT

    def mk_prep(k):
        def run():
            def body(i, acc):
                r2 = rays.direction * (1.0 + i.astype(jnp.float32) * 1e-7)
                wt = A.transform_point(
                    packed.tris_sorted, tr.scale, tr.quat, tr.translation
                )
                bmin, bmax = raster._treelet_aabbs(wt, packed.prim_ids, L)
                eye = rays.origin[0]
                nt = bmin.shape[0]
                dirs_ct = RT._to_coarse_layout(r2.reshape(W, H, 3), W, H)
                dirs_ct = dirs_ct.transpose(0, 2, 1)
                n_ct = (W * H) // RT.RPC
                p_tid, p_tlb, g_ct, g_first, ovf = RT._prepare_pairs(
                    eye, dirs_ct, bmin, bmax, n_ct, 1024, 8192, G
                )
                slabs = RT._build_slabs(wt, packed.prim_ids, eye, L)
                safe_tid = jnp.where(p_tid >= 0, p_tid, nt)
                pair_slab = slabs[safe_tid]
                return acc + pair_slab[0, 0, 0] + g_ct[0].astype(jnp.float32)
            return lax.fori_loop(0, k, body, 0.0)
        return run

    ms2 = slope(mk_prep)
    print(f"prep only: {ms2:.3f} ms (kernel+post = {ms-ms2:.3f} ms)")


if __name__ == "__main__":
    main()
