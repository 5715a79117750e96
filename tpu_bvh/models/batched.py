"""Batched builder: one BVH per mesh for thousands of tiny meshes.

Replaces the reference's whole-pipeline-in-one-block kernel
(`/root/reference/src/BatchedBuildKernel.h:218-312`: block AABB reduce ->
smem Morton -> smem 32-pass radix sort -> Apetrei build-and-fit) with a
`vmap` of the single-pass builder over the batch axis — the natural TPU
mapping of "one independent problem per block". Sharding the batch across
chips is `tpu_bvh.parallel.sharded.build_batched_sharded`.

Meshes are padded to a fixed prim capacity (the reference hard-caps at
`MaxBatchedBlockSize = 32`, `Common.h:597`); padding triangles are
degenerate (collapsed to the mesh's first vertex) so they never produce
hits, and `prim_count` records the real size per mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..types import Bvh2, MAX_BATCHED_PRIMS
from . import lbvh


def pad_meshes(meshes: list, capacity: int = MAX_BATCHED_PRIMS):
    """Stack variable-size triangle soups into [B, capacity, 3, 3] +
    prim_count i32[B]. Padding repeats each mesh's first vertex (zero-area
    triangles)."""
    import numpy as np

    b = len(meshes)
    out = np.zeros((b, capacity, 3, 3), np.float32)
    counts = np.zeros((b,), np.int32)
    for i, m in enumerate(meshes):
        n = m.shape[0]
        assert n <= capacity, f"mesh {i} has {n} > {capacity} prims"
        out[i, :n] = m
        out[i, n:] = m[0, 0]  # degenerate point triangles
        counts[i] = n
    return out, counts


@jax.jit
def build_batched(tris_b) -> Bvh2:
    """tris_b: f32[B, M, 3, 3] -> batch-stacked Bvh2 (every field gains a
    leading B axis). Plain 30-bit Morton codes, as the batched reference
    kernel uses (`BatchedBuildKernel.h:266-287`)."""
    return jax.vmap(lambda t: lbvh.build_single_pass(t, use_extended=False))(
        tris_b
    )
