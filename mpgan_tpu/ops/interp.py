"""Bi/trilinear grid sampling — the shared primitive under semi-Lagrangian
advection (solver + temporal-loss warp) and continuous-angle augmentation.

Pure XLA (gathers via take); a Pallas VMEM-tiled variant of the 2D warp lives
in :mod:`mpgan_tpu.ops.warp_pallas` for the hot path.

Conventions:
- 2D fields are ``(H, W, C)`` indexed (y, x); 3D volumes are ``(Z, Y, X, C)``
  indexed (z, y, x). Coordinates are float cell-center indices (0 = first
  cell center), clamped to the border (mantaflow-style clamped sampling).
- Velocity channel order is (vx, vy[, vz]) — x-component first, matching
  mantaflow vec3 storage (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` (H, W, C) at float coords (..., 2) given as (y, x).

    Border-clamped bilinear interpolation. Returns (..., C).
    """
    h, w, _ = img.shape
    y = jnp.clip(coords[..., 0], 0.0, h - 1.0)
    x = jnp.clip(coords[..., 1], 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (y - y0.astype(y.dtype))[..., None]
    fx = (x - x0.astype(x.dtype))[..., None]

    flat = img.reshape(h * w, -1)
    def at(yy, xx):
        return jnp.take(flat, yy * w + xx, axis=0)

    top = at(y0, x0) * (1 - fx) + at(y0, x1) * fx
    bot = at(y1, x0) * (1 - fx) + at(y1, x1) * fx
    return top * (1 - fy) + bot * fy


def trilinear_sample(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample ``vol`` (Z, Y, X, C) at float coords (..., 3) given as (z, y, x).

    Border-clamped trilinear interpolation. Returns (..., C).
    """
    d, h, w, _ = vol.shape
    z = jnp.clip(coords[..., 0], 0.0, d - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, h - 1.0)
    x = jnp.clip(coords[..., 2], 0.0, w - 1.0)
    z0 = jnp.floor(z).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    z1 = jnp.minimum(z0 + 1, d - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fz = (z - z0.astype(z.dtype))[..., None]
    fy = (y - y0.astype(y.dtype))[..., None]
    fx = (x - x0.astype(x.dtype))[..., None]

    flat = vol.reshape(d * h * w, -1)
    def at(zz, yy, xx):
        return jnp.take(flat, (zz * h + yy) * w + xx, axis=0)

    c00 = at(z0, y0, x0) * (1 - fx) + at(z0, y0, x1) * fx
    c01 = at(z0, y1, x0) * (1 - fx) + at(z0, y1, x1) * fx
    c10 = at(z1, y0, x0) * (1 - fx) + at(z1, y0, x1) * fx
    c11 = at(z1, y1, x0) * (1 - fx) + at(z1, y1, x1) * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def grid_coords_2d(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) array of (y, x) cell-center indices."""
    yy = jnp.arange(h, dtype=dtype)[:, None]
    xx = jnp.arange(w, dtype=dtype)[None, :]
    return jnp.stack(jnp.broadcast_arrays(yy, xx), axis=-1)


def grid_coords_3d(d: int, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(Z, Y, X, 3) array of (z, y, x) cell-center indices."""
    zz = jnp.arange(d, dtype=dtype)[:, None, None]
    yy = jnp.arange(h, dtype=dtype)[None, :, None]
    xx = jnp.arange(w, dtype=dtype)[None, None, :]
    return jnp.stack(jnp.broadcast_arrays(zz, yy, xx), axis=-1)
