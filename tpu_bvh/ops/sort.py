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
