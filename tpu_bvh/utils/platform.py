"""Trace-time backend dispatch for the Pallas-vs-XLA switches.

The Pallas kernels lower only on TPU (Mosaic); every hot op keeps an XLA
fallback for CPU testing. The switch must be resolved at trace time (the two
paths trace different programs), so it keys off `jax.default_backend()`,
which tracks `jax.config.update("jax_platforms", ...)` — the mechanism the
test suite and `dryrun_multichip` use to pin the CPU mesh.

Known limitation (ADVICE r1): a `jax.default_device(cpu)` context or
`jit(backend="cpu")` on a TPU host is NOT seen here and would pull Mosaic
kernels into a CPU-targeted trace. Use `jax.config.update("jax_platforms",
"cpu")` (or the TBVH_FORCE_XLA env var) to run the XLA paths on a TPU host.
"""
from __future__ import annotations

import os

import jax


def on_tpu() -> bool:
    """True when tracing targets the TPU backend (axon = tunneled TPU)."""
    if os.environ.get("TBVH_FORCE_XLA"):
        return False
    return jax.default_backend() in ("tpu", "axon")
