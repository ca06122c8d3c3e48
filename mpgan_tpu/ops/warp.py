"""Semi-Lagrangian advection / frame warping.

Used in two places (SURVEY.md §2.10):
- the temporal-discriminator data path, aligning frames t−1/t+1 to t
  ("advection-aligned frame triplets" — BASELINE.json north-star), and
- the in-repo JAX smoke solver's advection step (mpgan_tpu.solver).

Semantics: for each target cell x, sample the source field at the backtraced
position ``x − dt·v(x)`` with border-clamped (bi/tri)linear interpolation —
the standard first-order semi-Lagrangian step (tempoGAN §3.2 warp A(y; v)).

Velocity channel order is (vx, vy[, vz]); fields are (H, W, C) / (Z, Y, X, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpgan_tpu.ops.interp import (
    bilinear_sample,
    grid_coords_2d,
    grid_coords_3d,
    trilinear_sample,
)


def advect_2d(field: jnp.ndarray, vel: jnp.ndarray, dt: float = 1.0) -> jnp.ndarray:
    """Semi-Lagrangian advect ``field`` (H, W, C) by ``vel`` (H, W, 2), (vx, vy)."""
    h, w, _ = field.shape
    base = grid_coords_2d(h, w, dtype=field.dtype)  # (H, W, 2) as (y, x)
    back = base - dt * vel[..., ::-1]  # vel is (vx, vy) → (vy, vx)
    return bilinear_sample(field, back)


def advect_3d(field: jnp.ndarray, vel: jnp.ndarray, dt: float = 1.0) -> jnp.ndarray:
    """Semi-Lagrangian advect ``field`` (Z, Y, X, C) by ``vel`` (Z, Y, X, 3)."""
    d, h, w, _ = field.shape
    base = grid_coords_3d(d, h, w, dtype=field.dtype)
    back = base - dt * vel[..., ::-1]  # (vx, vy, vz) → (vz, vy, vx)
    return trilinear_sample(field, back)


def advect_2d_maccormack(field: jnp.ndarray, vel: jnp.ndarray, dt: float = 1.0,
                         strength: float = 1.0) -> jnp.ndarray:
    """MacCormack/BFECC advection: second-order, with min/max limiter.

    forward = SL(field, dt); backward = SL(forward, -dt);
    corrected = forward + strength·(field − backward)/2, clamped to the local
    interpolation stencil's min/max (standard unconditionally-stable limiter).
    """
    fwd = advect_2d(field, vel, dt)
    bwd = advect_2d(fwd, vel, -dt)
    corr = fwd + 0.5 * strength * (field - bwd)
    lo, hi = _stencil_minmax_2d(field, vel, dt)
    return jnp.clip(corr, lo, hi)


def advect_3d_maccormack(field: jnp.ndarray, vel: jnp.ndarray, dt: float = 1.0,
                         strength: float = 1.0) -> jnp.ndarray:
    fwd = advect_3d(field, vel, dt)
    bwd = advect_3d(fwd, vel, -dt)
    corr = fwd + 0.5 * strength * (field - bwd)
    lo, hi = _stencil_minmax_3d(field, vel, dt)
    return jnp.clip(corr, lo, hi)


def _stencil_minmax_2d(field, vel, dt):
    h, w, _ = field.shape
    base = grid_coords_2d(h, w, dtype=field.dtype)
    back = base - dt * vel[..., ::-1]
    y0 = jnp.clip(jnp.floor(back[..., 0]).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(back[..., 1]).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    flat = field.reshape(h * w, -1)
    vals = jnp.stack(
        [jnp.take(flat, yy * w + xx, axis=0)
         for yy in (y0, y1) for xx in (x0, x1)], axis=0)
    return vals.min(axis=0), vals.max(axis=0)


def _stencil_minmax_3d(field, vel, dt):
    d, h, w, _ = field.shape
    base = grid_coords_3d(d, h, w, dtype=field.dtype)
    back = base - dt * vel[..., ::-1]
    z0 = jnp.clip(jnp.floor(back[..., 0]).astype(jnp.int32), 0, d - 1)
    y0 = jnp.clip(jnp.floor(back[..., 1]).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(back[..., 2]).astype(jnp.int32), 0, w - 1)
    z1 = jnp.minimum(z0 + 1, d - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    flat = field.reshape(d * h * w, -1)
    vals = jnp.stack(
        [jnp.take(flat, (zz * h + yy) * w + xx, axis=0)
         for zz in (z0, z1) for yy in (y0, y1) for xx in (x0, x1)], axis=0)
    return vals.min(axis=0), vals.max(axis=0)


# Batched variants for patch triplets: (B, H, W, C) fields, (B, H, W, 2) vels.
advect_2d_batch = jax.vmap(advect_2d, in_axes=(0, 0, None))
advect_3d_batch = jax.vmap(advect_3d, in_axes=(0, 0, None))
