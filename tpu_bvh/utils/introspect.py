"""Compiled-program introspection & profiling hooks.

The reference exposes per-kernel register/shared-memory counts
(`Kernel::getNumSmem/getNumRegs`, `/root/reference/src/Kernel.cpp:170-182`)
and GPU-event timings. The XLA equivalents: compiled cost analysis (flops,
bytes accessed, memory footprint) per jitted function, and
`jax.profiler` traces.
"""
from __future__ import annotations

import contextlib

import jax


def cost_analysis(fn, *args, **kwargs) -> dict:
    """Compile fn for the current backend and return XLA's cost analysis
    (flops, bytes accessed, optimal seconds, ...)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    stats = compiled.cost_analysis()
    if isinstance(stats, list):  # older jax returns one dict per computation
        stats = stats[0] if stats else {}
    return dict(stats or {})


def memory_analysis(fn, *args, **kwargs):
    """Compiled memory footprint (bytes) if the backend reports it."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    try:
        return compiled.memory_analysis()
    except Exception:  # noqa: BLE001
        return None


def pallas_kernel_report(fn, *args, **kwargs) -> list[dict]:
    """Per-Pallas-kernel resource summary — the TPU-native analog of the
    reference's `Kernel::getNumSmem/getNumRegs`
    (`/root/reference/src/Kernel.cpp:170-182`): for every `pallas_call` in
    the traced program, its name, grid, per-buffer block shapes, and the
    VMEM working set (block bytes x 2 for the pipeline's double buffering).
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    reports: list[dict] = []

    def block_bytes(bm):
        import math

        try:
            # block_shape entries are Blocked(block_size=k) wrappers
            shape = tuple(
                int(getattr(s, "block_size", s)) for s in bm.block_shape
            )
            dtype = bm.array_aval.dtype
        except Exception:  # noqa: BLE001
            return 0, ()
        return (
            int(jax.numpy.dtype(dtype).itemsize)
            * int(max(1, math.prod(shape))),
            shape,
        )

    def visit(jpr):
        for eqn in jpr.eqns:
            if eqn.primitive.name == "pallas_call":
                p = eqn.params
                gm = p.get("grid_mapping")
                name = p.get("name")
                if not name:  # fall back to the kernel function's name
                    try:
                        name = p["jaxpr"].jaxpr.debug_info.func_name
                    except Exception:  # noqa: BLE001
                        name = "pallas_call"
                name = str(name).split(" ")[0]
                grid = tuple(
                    int(g) if isinstance(g, int) else -1
                    for g in (getattr(gm, "grid", ()) or ())
                )
                blocks = []
                total = 0
                try:
                    bms = list(gm.block_mappings)
                except Exception:  # noqa: BLE001
                    bms = []
                for bm in bms:
                    b, shape = block_bytes(bm)
                    blocks.append({"block_shape": shape, "bytes": b})
                    total += b
                reports.append(
                    {
                        "name": name,
                        "grid": grid,
                        "buffers": blocks,
                        "vmem_working_set_bytes": 2 * total,
                    }
                )
            # recurse into subcomputations (scan/cond/jit bodies)
            for v in eqn.params.values():
                for sub in _subjaxprs(v):
                    visit(sub)

    def _subjaxprs(v):
        import jax.extend.core as jcore

        if isinstance(v, jcore.ClosedJaxpr):
            yield v.jaxpr
        elif isinstance(v, jcore.Jaxpr):
            yield v
        elif isinstance(v, (tuple, list)):
            for x in v:
                yield from _subjaxprs(x)

    visit(jaxpr.jaxpr)
    return reports


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """`jax.profiler` trace context — the rebuild's analog of the
    reference's oroEvent phase timing, but with full per-op visibility."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
