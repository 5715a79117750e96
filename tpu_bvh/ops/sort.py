"""Key-value sort of (Morton code, primitive index) pairs.

Replaces the vendored `Oro::RadixSort` (usage at
`/root/reference/src/TwoPassLbvh.cpp:73-89`). `lax.sort` lowers to XLA's
on-device sort network; UNSTABLE, which measures 3-4x faster than stable
on v5e at 262K (stability adds a hidden index channel + tie handling,
0.16-0.25 -> 0.04-0.13 ms, and channel count barely matters). Ties in
the 30-bit codes land in arbitrary-but-deterministic order; every
consumer handles that: the radix-tree deltas break code ties by SORTED
POSITION (`radix_tree.delta_at`), so any tie permutation yields an
equally valid (marginally different) tree, exactly like the reference's
vendored GPU radix sort whose tie order is also position-based on the
device layout.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def sort_pairs(codes, values):
    """Ascending key-value sort. codes: u32[n], values: i32[n]."""
    return lax.sort_key_val(codes, values, is_stable=False)


def sort_with_payload(codes, payload):
    """Ascending sort of `codes` carrying a tuple of payload arrays.

    Returns (sorted_codes, tuple(sorted_payload)). The build front end's
    sort phase (`/root/reference/src/TwoPassLbvh.cpp:73-89` sorts
    (mortonKey, primIdx); here the leaf AABB columns ride along so the
    post-sort gather disappears)."""
    out = lax.sort((codes, *payload), num_keys=1, is_stable=False)
    return out[0], tuple(out[1:])
