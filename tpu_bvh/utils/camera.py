"""Primary-ray generation (pinhole camera from quaternion + fov).

Vectorized equivalent of `GenerateRays`
(`/root/reference/src/CommonBlocksKernel.h:432-463`), including its 0.024
sensor size and the `normalize(eye + dir*far)` direction quirk, so rendered
images match the reference pixel-for-pixel in layout (flat index =
x * height + y)."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import aabb as A
from ..types import Camera, Rays, FLT_MAX


def generate_rays(cam: Camera, width: int, height: int) -> Rays:
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(x, y, indexing="ij")  # [W, H]
    gx = gx.reshape(-1)
    gy = gy.reshape(-1)

    sensor_x = 0.024 * (width / float(height))
    sensor_y = 0.024
    offset = 0.5
    px = (gx + offset) / width - 0.5
    py = (gy + offset) / height - 0.5
    d = jnp.stack(
        [
            px * sensor_x,
            py * sensor_y,
            jnp.full_like(px, sensor_y / (2.0 * jnp.tan(cam.fov / 2.0))),
        ],
        axis=-1,
    )

    hol = A.qt_rotate(cam.quat, jnp.array([1.0, 0.0, 0.0], jnp.float32))
    up = A.qt_rotate(cam.quat, jnp.array([0.0, -1.0, 0.0], jnp.float32))
    view = A.qt_rotate(cam.quat, jnp.array([0.0, 0.0, -1.0], jnp.float32))
    dirs = d[:, 0:1] * hol + d[:, 1:2] * up + d[:, 2:3] * view
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    n = width * height
    origin = jnp.broadcast_to(cam.eye, (n, 3))
    target = cam.eye + dirs * cam.far
    direction = target / jnp.linalg.norm(target, axis=-1, keepdims=True)
    return Rays(
        origin=origin,
        direction=direction,
        tmin=jnp.zeros(n, jnp.float32),
        tmax=jnp.full(n, FLT_MAX, jnp.float32),
    )
