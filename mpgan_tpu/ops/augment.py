"""Velocity-aware patch extraction + augmentation, fused and device-side.

Reference behavior (SURVEY.md §2.5, tempoGAN-family ``tilecreator_t.py``):
random rotation (90°-steps or continuous), flips, and uniform scaling applied
to LR/HR patch pairs, where velocity *vector components are transformed with
the spatial transform*. The reference does this per-batch in host numpy; here
it is a single jit/vmap-able sampling op: each output pixel samples the source
frame exactly once through the composed affine map (no double interpolation),
and the velocity channels are multiplied by the inverse Jacobian of that map.

Math: output patch pixel offset p (from the patch center) reads the source at
``x_src = c + A·p`` with ``A = R(θ)·diag(fx, fy)·σ`` (all in (y, x) space).
A vector field observed in output coordinates is ``v_out = A⁻¹·v_src`` —
rotation by −θ of content ≙ rotation of vectors by θ; mirrored axes flip the
matching component; zooming in (σ<1) magnifies velocities by 1/σ. The
out-of-plane component (vz on an xy slice) gets the same 1/σ magnitude factor
(matches the reference's "magnitude scaled with spatial scale").

Channel layout for patches: [density, vx, vy, (vz)] — density first, then
in-plane velocity, then optional out-of-plane component.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mpgan_tpu.ops.interp import bilinear_sample

ROT_NONE = 0
ROT_90 = 1
ROT_FULL = 2


def sample_transform(key: jax.Array, rot_mode: int, scale_min: float,
                     scale_max: float, flip: bool = True):
    """Draw (A, Ainv) 2×2 transform matrices in (y, x) index space.

    Returns float32 (2, 2) matrices: A maps output offsets → source offsets,
    Ainv transforms source vectors → output vectors.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if rot_mode == ROT_FULL:
        theta = jax.random.uniform(k1, (), minval=0.0, maxval=2.0 * jnp.pi)
    elif rot_mode == ROT_90:
        theta = jax.random.randint(k1, (), 0, 4).astype(jnp.float32) * (jnp.pi / 2)
    else:
        theta = jnp.zeros(())
    fy = jnp.where(jax.random.bernoulli(k2), -1.0, 1.0) if flip else jnp.float32(1.0)
    fx = jnp.where(jax.random.bernoulli(k3), -1.0, 1.0) if flip else jnp.float32(1.0)
    sigma = jax.random.uniform(k4, (), minval=scale_min, maxval=scale_max)

    c, s = jnp.cos(theta), jnp.sin(theta)
    # A = R(θ)·diag(fy, fx)·σ and its inverse, built analytically — a 2×2
    # matmul/inv here would run at TPU default precision (f32→bf16 dot
    # demotion, CLAUDE.md), quantizing every sampling coordinate downstream
    a = sigma * jnp.array([[c * fy, -s * fx], [s * fy, c * fx]])
    ainv = jnp.array([[c * fy, s * fy], [-s * fx, c * fx]]) / sigma
    return a.astype(jnp.float32), ainv.astype(jnp.float32)


def transform_vectors(patch: jnp.ndarray, ainv: jnp.ndarray,
                      n_vel: int) -> jnp.ndarray:
    """Apply the vector transform to velocity channels [1 : 1+n_vel].

    ``ainv`` acts in (y, x) space; channels are (vx, vy[, vz]).
    """
    if n_vel == 0:
        return patch
    dens = patch[..., :1]
    vx = patch[..., 1]
    vy = patch[..., 2]
    # (vy', vx') = Ainv @ (vy, vx)
    vy2 = ainv[0, 0] * vy + ainv[0, 1] * vx
    vx2 = ainv[1, 0] * vy + ainv[1, 1] * vx
    out = [dens, vx2[..., None], vy2[..., None]]
    if n_vel == 3:
        # out-of-plane: keep direction, scale magnitude like the in-plane comps
        scale = jnp.sqrt(jnp.abs(jnp.linalg.det(ainv)))
        out.append(patch[..., 3:4] * scale)
        rest = patch[..., 4:]
    else:
        rest = patch[..., 1 + n_vel:]
    if rest.shape[-1]:
        out.append(rest)
    return jnp.concatenate(out, axis=-1)


def transform_pseudovectors(patch: jnp.ndarray, ainv: jnp.ndarray,
                            start: int, n: int) -> jnp.ndarray:
    """Transform vorticity-like channels [start : start+n] (pseudo-vectors).

    The consistency requirement is ω' == curl(v') for the velocity field the
    network also sees. The out-of-plane curl of ``v' = A⁻¹·v(A·p)`` is
    *scale-invariant* (σ cancels between the component scaling and the
    coordinate stretch) and co-rotates, flipping sign under reflection:
    ``ω'_out = sign(det)·ω_out``. In-plane components transform with the
    ORTHOGONAL part of the map only, ``ω' = sign(det)·O·ω`` with
    ``O = ainv·σ`` (the slice-normal axis is never rescaled, so no exact
    in-plane scale law exists; rotation/flip co-transform is the consistent
    choice). Applying raw det(ainv)=±1/σ² magnitudes here would hand the
    network vorticity inconsistent with its own velocity channels by
    ±(scale_max²−1) every patch. Channel order within the group is
    (ω_w, ω_h[, ω_out]), matching velocity channel conventions.
    """
    if n == 0:
        return patch
    det = ainv[0, 0] * ainv[1, 1] - ainv[0, 1] * ainv[1, 0]
    sdet = jnp.sign(det)
    o = ainv / jnp.sqrt(jnp.abs(det))  # orthogonal part: scale removed
    wx = patch[..., start]
    wy = patch[..., start + 1]
    wy2 = sdet * (o[0, 0] * wy + o[0, 1] * wx)
    wx2 = sdet * (o[1, 0] * wy + o[1, 1] * wx)
    out = [patch[..., :start], wx2[..., None], wy2[..., None]]
    if n == 3:
        out.append(patch[..., start + 2:start + 3] * sdet)
        out.append(patch[..., start + 3:])
    else:
        out.append(patch[..., start + n:])
    return jnp.concatenate(out, axis=-1)


def _patch_coords(center_yx: jnp.ndarray, tile: int, a: jnp.ndarray,
                  dtype=jnp.float32) -> jnp.ndarray:
    """(tile, tile, 2) source coords for an affine-transformed patch."""
    off = jnp.arange(tile, dtype=dtype) - (tile - 1) / 2.0
    p = jnp.stack(jnp.broadcast_arrays(off[:, None], off[None, :]), axis=-1)
    # sampling coordinates are data-path math: HIGHEST stops the TPU bf16
    # dot demotion from quantizing patch positions (CLAUDE.md)
    return center_yx + jnp.einsum("ij,hwj->hwi", a, p,
                                  precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("tile_lr", "up_res", "n_vel"))
def extract_pair(lr_frame: jnp.ndarray, hr_frame: jnp.ndarray,
                 center_lr: jnp.ndarray, a: jnp.ndarray, ainv: jnp.ndarray,
                 tile_lr: int, up_res: int, n_vel: int):
    """Extract one augmented (LR, HR) patch pair from full 2D frames.

    lr_frame: (H, W, C_lr); hr_frame: (H·s, W·s, C_hr);
    center_lr: (2,) float (y, x) in LR index space; a/ainv from
    :func:`sample_transform`. Returns ((tile, tile, C_lr), (tile·s, tile·s, C_hr)).
    """
    coords_lr = _patch_coords(center_lr, tile_lr, a)
    lr = bilinear_sample(lr_frame, coords_lr)
    lr = transform_vectors(lr, ainv, n_vel)

    center_hr = (center_lr + 0.5) * up_res - 0.5
    coords_hr = _patch_coords(center_hr, tile_lr * up_res, a)
    hr = bilinear_sample(hr_frame, coords_hr)
    n_vel_hr = n_vel if hr_frame.shape[-1] > 1 else 0
    hr = transform_vectors(hr, ainv, n_vel_hr)
    return lr, hr


def identity_transform():
    eye = jnp.eye(2, dtype=jnp.float32)
    return eye, eye


# (a safe_center_range helper used to live here; the rotated-footprint
# margin now has a single implementation in data.pipeline._margin)
