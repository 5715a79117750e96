"""Key-value sort of (Morton code, primitive index) pairs.

Replaces the vendored `Oro::RadixSort` (usage at
`/root/reference/src/TwoPassLbvh.cpp:73-89`). `lax.sort` lowers to XLA's
on-device sort, which is deterministic and stable; a Pallas one-sweep radix
sort is the planned perf upgrade for very large scenes (see SURVEY.md §7).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def sort_pairs(codes, values):
    """Stable ascending sort. codes: u32[n], values: i32[n]."""
    return lax.sort_key_val(codes, values, is_stable=True)


def sort_with_payload(codes, payload):
    """Stable ascending sort of `codes` carrying a tuple of payload arrays.

    Returns (sorted_codes, tuple(sorted_payload)). The build front end's
    sort phase (`/root/reference/src/TwoPassLbvh.cpp:73-89` sorts
    (mortonKey, primIdx); here the leaf AABB columns ride along so the
    post-sort gather disappears)."""
    out = lax.sort((codes, *payload), num_keys=1, is_stable=True)
    return out[0], tuple(out[1:])
