"""Multi-chip scaling over a `jax.sharding.Mesh`.

The reference is single-GPU (device 0 hard-coded, `Context.cpp:11`); its
natural scaling axes become SPMD shardings here (SURVEY.md §2 item 5 and
§5 "long-context" notes):

* batch parallelism — one BVH per mesh, meshes sharded across chips
  (`build_batched_sharded`); purely local compute, embarrassingly parallel
  over ICI-connected devices.
* primitive sharding — a single huge scene's triangles sharded across
  chips; scene extents become `lax.pmin/pmax` collectives over ICI
  (`sharded_scene_extents`), the analog of the reference's global
  `atomicGrow` reduction (`CommonBlocksKernel.h:92-137`).
* ray parallelism — rays sharded, BVH replicated (`traverse_sharded`);
  each chip shades its tile independently (the multi-chip render path).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import batched, lbvh
from ..ops import aabb as A
from ..ops import traverse
from ..types import Rays


def default_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def build_batched_sharded(mesh: Mesh, tris_b):
    """Shard the mesh batch over the 'dp' axis; each device builds its local
    BVHs with zero communication."""
    sharding = NamedSharding(mesh, P("dp"))
    tris_b = jax.device_put(tris_b, sharding)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("dp"),
        out_specs=P("dp"),
        check_vma=False,
    )
    def _build(local):
        return batched.build_batched(local)

    return _build(tris_b)


def sharded_scene_extents(mesh: Mesh, tris):
    """Scene AABB of a triangle array sharded over 'dp': local min/max then
    an ICI all-reduce (`lax.pmin`/`pmax`) — deterministic, unlike the
    reference's float atomics."""
    sharding = NamedSharding(mesh, P("dp"))
    tris = jax.device_put(tris, sharding)

    @partial(
        jax.shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P(), check_vma=False
    )
    def _extents(local):
        mn, mx = A.triangle_aabbs(local)
        lo = jnp.min(mn, axis=0)
        hi = jnp.max(mx, axis=0)
        return lax.pmin(lo, "dp"), lax.pmax(hi, "dp")

    return _extents(tris)


def traverse_sharded(mesh: Mesh, bvh, tris, rays: Rays, tr, variant="speculative"):
    """Rays sharded over 'dp', BVH + triangles replicated: the multi-chip
    render. Returns sharded HitInfo + leaf-visit counts."""
    ray_sharding = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    rays = jax.device_put(rays, ray_sharding)
    bvh = jax.device_put(bvh, rep)
    tris = jax.device_put(tris, rep)
    tr = jax.device_put(tr, rep)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P()),
        out_specs=P("dp"),
        check_vma=False,
    )
    def _trace(bvh_l, tris_l, rays_l, tr_l):
        return traverse.traverse_bvh2(bvh_l, tris_l, rays_l, tr_l, variant=variant)

    return _trace(bvh, tris, rays, tr)

def render_raster_sharded(
    mesh: Mesh,
    scene,
    rays: Rays,
    tr,
    width: int,
    height: int,
    interpret: bool = False,
    **kw,
):
    """Raster render with the image sharded over 'dp' (vertical strips of
    coarse tiles), scene replicated: each chip runs the full raster
    pipeline (binning + Pallas sweep kernel) on its strip with zero
    communication — linear scaling in rays."""
    from ..ops import raster_tpu

    n_dev = mesh.devices.size
    assert width % (64 * n_dev) == 0, "width must split into 64px strips"
    w_local = width // n_dev

    ray_sharding = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    rays = jax.device_put(rays, ray_sharding)
    scene_arrays = (scene.tris_sorted, scene.prim_ids)
    scene_arrays = jax.device_put(scene_arrays, rep)
    tr = jax.device_put(tr, rep)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P()),
        out_specs=P("dp"),
        check_vma=False,
    )
    def _render(ts, pids, rays_l, tr_l):
        hit, _c, _ = raster_tpu._render_tpu_impl(
            ts, pids, rays_l, tr_l, w_local, height,
            kw.get("cand_cap", 256), kw.get("pair_cap", 2048),
            kw.get("group", 8), scene.leaf_size, interpret,
        )
        return hit

    return _render(*scene_arrays, rays, tr)
