"""Scene fixtures: cornellbox (from the reference's asset), procedural
benchmark scenes, and camera/transform presets.

The reference ships cornellbox in-tree and bunny/sponza as (absent) LFS
blobs (`/root/reference/.MISSING_LARGE_BLOBS`), so benchmark-scale scenes
here are procedural at matched triangle counts: `bunny_like` (~150K tris,
compact object) and `sponza_like` (~260K tris, architectural interior).
Camera presets mirror the comment block at
`/root/reference/src/Common.h:25-78`.
"""
from __future__ import annotations

import math
import os

import numpy as np

from ..types import Camera, Transformation
from .obj import load_obj

_REFERENCE_CORNELLBOX = "/root/reference/src/Meshes/cornellbox/cornellBox.obj"


def cornellbox() -> np.ndarray:
    """The 32-triangle cornellbox used by every reference demo
    (`main.cpp:52-53`)."""
    path = os.environ.get("TPU_BVH_CORNELLBOX", _REFERENCE_CORNELLBOX)
    if os.path.exists(path):
        return load_obj(path)
    return _procedural_cornellbox()


def _procedural_cornellbox() -> np.ndarray:
    """Fallback 5-wall box + light + two blocks, roughly matching the classic
    cornellbox footprint ([-3, 2.5] x [0, 5.3] x [-5.8, 0])."""
    quads = []

    def quad(a, b, c, d):
        quads.append((a, b, c))
        quads.append((a, c, d))

    lo = np.array([-3.0, -0.16, -5.84])
    hi = np.array([2.55, 5.33, -0.25])
    # floor, ceiling, back wall, left, right
    quad((lo[0], lo[1], lo[2]), (hi[0], lo[1], lo[2]), (hi[0], lo[1], hi[2]), (lo[0], lo[1], hi[2]))
    quad((lo[0], hi[1], lo[2]), (lo[0], hi[1], hi[2]), (hi[0], hi[1], hi[2]), (hi[0], hi[1], lo[2]))
    quad((lo[0], lo[1], lo[2]), (lo[0], hi[1], lo[2]), (hi[0], hi[1], lo[2]), (hi[0], lo[1], lo[2]))
    quad((lo[0], lo[1], lo[2]), (lo[0], lo[1], hi[2]), (lo[0], hi[1], hi[2]), (lo[0], hi[1], lo[2]))
    quad((hi[0], lo[1], lo[2]), (hi[0], hi[1], lo[2]), (hi[0], hi[1], hi[2]), (hi[0], lo[1], hi[2]))

    def box(cmin, cmax):
        x0, y0, z0 = cmin
        x1, y1, z1 = cmax
        quad((x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0))
        quad((x0, y0, z1), (x0, y1, z1), (x1, y1, z1), (x1, y0, z1))
        quad((x0, y0, z0), (x0, y1, z0), (x0, y1, z1), (x0, y0, z1))
        quad((x1, y0, z0), (x1, y0, z1), (x1, y1, z1), (x1, y1, z0))
        quad((x0, y1, z0), (x1, y1, z0), (x1, y1, z1), (x0, y1, z1))
        quad((x0, y0, z0), (x0, y0, z1), (x1, y0, z1), (x1, y0, z0))

    box((-1.9, -0.16, -4.4), (-0.4, 3.1, -2.9))
    box((0.5, -0.16, -3.4), (1.9, 1.5, -2.0))
    quad((-0.88, 5.32, -3.57), (0.42, 5.32, -3.57), (0.42, 5.32, -2.52), (-0.88, 5.32, -2.52))
    return np.asarray(quads, dtype=np.float32)


def bunny_like(n_tris: int = 150_000, seed: int = 0) -> np.ndarray:
    """Compact organic-ish object at bunny scale: a UV sphere with smooth
    pseudo-random radial displacement (~150K tris like Stanford bunny in the
    reference's perf tables, `README.md:49`). Deterministic."""
    lon = max(8, int(math.sqrt(n_tris / 2.0)))
    lat = max(4, n_tris // (2 * lon))
    phi = np.linspace(0.0, math.pi, lat + 1)
    theta = np.linspace(0.0, 2 * math.pi, lon + 1)
    pp, tt = np.meshgrid(phi, theta, indexing="ij")
    rng = np.random.default_rng(seed)
    # low-frequency displacement from a few random spherical harmonics-ish lobes
    r = np.ones_like(pp)
    for _ in range(6):
        fa, fb = rng.integers(1, 5, size=2)
        pa, pb, amp = rng.uniform(0, 2 * math.pi), rng.uniform(0, 2 * math.pi), rng.uniform(0.02, 0.12)
        r = r + amp * np.sin(fa * pp + pa) * np.cos(fb * tt + pb)
    x = r * np.sin(pp) * np.cos(tt)
    y = r * np.cos(pp)
    z = r * np.sin(pp) * np.sin(tt)
    grid = np.stack([x, y, z], axis=-1).astype(np.float32)  # [lat+1, lon+1, 3]
    a = grid[:-1, :-1]
    b = grid[:-1, 1:]
    c = grid[1:, 1:]
    d = grid[1:, :-1]
    t1 = np.stack([a, b, c], axis=-2).reshape(-1, 3, 3)
    t2 = np.stack([a, c, d], axis=-2).reshape(-1, 3, 3)
    return np.concatenate([t1, t2], axis=0)


def sponza_like(n_tris: int = 262_000, seed: int = 1) -> np.ndarray:
    """Architectural interior at sponza scale (~260K tris, `README.md:67`):
    a colonnade hall — floor/walls, rows of faceted columns, and a field of
    small clutter boxes. Produces the highly non-uniform triangle-area
    distribution BVH builders care about. Deterministic."""
    rng = np.random.default_rng(seed)
    tris: list[np.ndarray] = []

    def add_quad(a, b, c, d):
        a, b, c, d = (np.asarray(p, np.float32) for p in (a, b, c, d))
        tris.append(np.stack([a, b, c]))
        tris.append(np.stack([a, c, d]))

    def add_box(cmin, cmax):
        x0, y0, z0 = cmin
        x1, y1, z1 = cmax
        add_quad((x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0))
        add_quad((x0, y0, z1), (x0, y1, z1), (x1, y1, z1), (x1, y0, z1))
        add_quad((x0, y0, z0), (x0, y1, z0), (x0, y1, z1), (x0, y0, z1))
        add_quad((x1, y0, z0), (x1, y0, z1), (x1, y1, z1), (x1, y1, z0))
        add_quad((x0, y1, z0), (x1, y1, z0), (x1, y1, z1), (x0, y1, z1))
        add_quad((x0, y0, z0), (x0, y0, z1), (x1, y0, z1), (x1, y0, z0))

    # hall shell: 40 x 15 x 20
    add_box((-20, -0.2, -10), (20, 0, 10))  # floor slab
    add_box((-20, 15, -10), (20, 15.2, 10))  # ceiling
    add_box((-20.2, 0, -10), (-20, 15, 10))
    add_box((20, 0, -10), (20.2, 15, 10))
    add_box((-20, 0, -10.2), (20, 15, -10))
    add_box((-20, 0, 10), (20, 15, 10.2))

    # column rows: faceted cylinders
    n_seg = 16

    def add_column(cx, cz, radius, height):
        ang = np.linspace(0, 2 * math.pi, n_seg + 1)
        xs = cx + radius * np.cos(ang)
        zs = cz + radius * np.sin(ang)
        for i in range(n_seg):
            add_quad(
                (xs[i], 0, zs[i]),
                (xs[i + 1], 0, zs[i + 1]),
                (xs[i + 1], height, zs[i + 1]),
                (xs[i], height, zs[i]),
            )
        # capital
        add_box((cx - radius * 1.3, height, cz - radius * 1.3), (cx + radius * 1.3, height + 0.6, cz + radius * 1.3))

    for cx in np.linspace(-17, 17, 12):
        add_column(cx, -6.0, 0.8, 9.0)
        add_column(cx, 6.0, 0.8, 9.0)

    base = np.stack(tris)
    # clutter: many small boxes to reach the target count (48 tris per box
    # cluster of 4? each box is 12 tris)
    remaining = max(0, n_tris - base.shape[0])
    n_boxes = remaining // 12
    centers = rng.uniform([-19, 0, -9], [19, 2.5, 9], size=(n_boxes, 3))
    sizes = rng.uniform(0.05, 0.5, size=(n_boxes, 3))
    tris = []
    for ctr, sz in zip(centers, sizes):
        add_box(ctr - sz, ctr + sz)
    clutter = np.stack(tris) if tris else np.zeros((0, 3, 3), np.float32)
    return np.concatenate([base, clutter], axis=0).astype(np.float32)


def _quat_axis_angle(x, y, z, w):
    import numpy as _np

    axis = _np.array([x, y, z], _np.float64)
    axis = axis / _np.linalg.norm(axis)
    return np.array(
        [*(axis * math.sin(w / 2.0)), math.cos(w / 2.0)], dtype=np.float32
    )


def preset(name: str) -> tuple[Transformation, Camera]:
    """Scene poses from `Common.h:25-78` / `TwoPassLbvh.cpp:202-218`."""
    import jax.numpy as jnp

    if name == "cornellbox":
        t = Transformation(
            translation=jnp.array([0.0, 0.0, -5.0], jnp.float32),
            scale=jnp.ones(3, jnp.float32),
            quat=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        )
        cam = Camera(
            eye=jnp.array([0.0, 2.5, 5.8], jnp.float32),
            quat=jnp.asarray(_quat_axis_angle(0.0, 0.0, 1.0, -1.57)),
            fov=jnp.float32(45.0 * math.pi / 180.0),
            near=jnp.float32(0.0),
            far=jnp.float32(100000.0),
        )
    elif name == "bunny":
        t = Transformation(
            translation=jnp.array([0.0, 0.0, -3.0], jnp.float32),
            scale=jnp.full(3, 3.0, jnp.float32),
            quat=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        )
        cam = Camera(
            eye=jnp.array([0.0, 2.5, 5.8], jnp.float32),
            quat=jnp.asarray(_quat_axis_angle(0.0, 0.0, 1.0, -1.57)),
            fov=jnp.float32(45.0 * math.pi / 180.0),
            near=jnp.float32(0.0),
            far=jnp.float32(100000.0),
        )
    elif name == "sponza":
        t = Transformation(
            translation=jnp.array([0.0, 0.0, -3.0], jnp.float32),
            scale=jnp.ones(3, jnp.float32),
            quat=jnp.asarray(_quat_axis_angle(1.0, 0.0, 0.0, 1.57)),
        )
        cam = Camera(
            eye=jnp.array([-20.0, 18.5, 10.8], jnp.float32),
            quat=jnp.asarray(_quat_axis_angle(0.0, 1.0, 0.0, -1.57)),
            fov=jnp.float32(45.0 * math.pi / 180.0),
            near=jnp.float32(0.0),
            far=jnp.float32(100000.0),
        )
    else:
        raise ValueError(f"unknown preset {name!r}")
    return t, cam
