"""Pallas TPU kernel for the semi-Lagrangian frame warp (SURVEY.md §2.10;
BASELINE.json: "advection-based frame warping ... as a Pallas semi-Lagrangian
interpolation kernel").

Design — roll-and-select instead of gather: Mosaic does not lower arbitrary
2D gathers, but a temporal-alignment warp has *bounded* displacement (a few
cells per frame). Exact bilinear sampling can therefore be written as

    out[y, x] = Σ_{dy, dx ∈ [-R, R+1]} tri(by - dy)·tri(bx - dx) · f[y+dy, x+dx]

with (by, bx) = −dt·v(y, x) clamped to [−R, R] and tri(u) = max(0, 1−|u|):
only the 4 integer shifts bracketing the backtrace have nonzero weight, so
the sum is the bilinear interpolant. Each shifted read is a fully *static
slice* of an edge-padded VMEM block (both loops unrolled — Mosaic lowers
neither dynamic lane starts nor, at larger tiles, unaligned dynamic sublane
starts) — pure VPU work, no gather, no DMA in the inner loop. Cost: (2R+2)²
fused multiply-adds per pixel.

Edge handling: the field is edge-padded by R+1 on the host side, which is
equivalent to the XLA reference's border-clamped sampling for displacements
within ±R (mpgan_tpu.ops.warp clamps coordinates; tested equal).

Gradients: `advect_2d_fast` is a custom_vjp — Pallas forward, XLA backward
(the VJP of the reference implementation), so it drops into the temporal
loss without autodiff support in the kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpgan_tpu.ops.warp import advect_2d as advect_2d_xla

# Cells; per-frame semi-Lagrangian backtrace bound. Single source of truth
# shared with LossConfig.warp_max_disp (config.py) so the bare kernel and the
# train path clamp identically.
DEFAULT_MAX_DISP = 8


def _warp_kernel(fpad_ref, bx_ref, by_ref, o_ref, *, r: int, h: int, w: int):
    """One (H, W) slice. fpad: (H+2P, W+2P) edge-padded field; bx/by: (H, W)
    clamped backtrace offsets; out: (H, W)."""
    p = r + 1
    bx = bx_ref[0]
    by = by_ref[0]
    acc = jnp.zeros((h, w), jnp.float32)

    # both displacement loops are unrolled so every tile read is a static
    # slice: Mosaic cannot prove alignment for dynamic sublane starts at
    # larger tiles (seen at h=128: "cannot statically prove that index in
    # dimension 1 is a multiple of 8"), and dynamic lane starts are never
    # lowered. (2R+2)^2 static VPU fmas; weights are zero except for the 4
    # shifts bracketing each pixel's backtrace.
    for dx in range(-r, r + 2):
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(bx - float(dx)))
        for dy in range(-r, r + 2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(by - float(dy)))
            tile = fpad_ref[0, p + dy:p + dy + h, p + dx:p + dx + w]
            acc = acc + wy * wx * tile
    o_ref[0] = acc


@partial(jax.jit, static_argnames=("dt", "max_disp", "interpret"))
def advect_2d_pallas(field: jnp.ndarray, vel: jnp.ndarray, dt: float = 1.0,
                     max_disp: int = DEFAULT_MAX_DISP,
                     interpret: bool = False) -> jnp.ndarray:
    """Batched semi-Lagrangian warp: (B, H, W, 1) by (B, H, W, 2) → (B, H, W, 1).

    Velocity channels are (v_w, v_h) as everywhere in the pipeline.
    Displacements beyond ±max_disp cells are clamped (the XLA reference is
    used for unbounded warps, e.g. inside the solver).
    """
    b, h, w, c = field.shape
    assert c == 1, "Pallas warp handles density slices; vmap channels if needed"
    r = int(max_disp)
    p = r + 1

    f = field[..., 0].astype(jnp.float32)
    fpad = jnp.pad(f, ((0, 0), (p, p), (p, p)), mode="edge")
    bx = jnp.clip(-dt * vel[..., 0], -r, r).astype(jnp.float32)
    by = jnp.clip(-dt * vel[..., 1], -r, r).astype(jnp.float32)

    kern = partial(_warp_kernel, r=r, h=h, w=w)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2 * p, w + 2 * p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(fpad, bx, by)
    return out[..., None]


def _clamped_xla_reference(field, vel, dt, max_disp):
    """XLA warp with the same displacement clamp (for VJP + testing)."""
    v = jnp.clip(vel, -max_disp / max(abs(dt), 1e-9),
                 max_disp / max(abs(dt), 1e-9))
    return jax.vmap(advect_2d_xla, in_axes=(0, 0, None))(field, v, dt)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def advect_2d_fast(field, vel, dt: float = 1.0,
                   max_disp: int = DEFAULT_MAX_DISP):
    """Differentiable fast warp: Pallas forward, XLA backward."""
    return advect_2d_pallas(field, vel, dt, max_disp)


def _fwd(field, vel, dt, max_disp):
    return advect_2d_pallas(field, vel, dt, max_disp), (field, vel)


def _bwd(dt, max_disp, res, g):
    field, vel = res
    _, vjp = jax.vjp(lambda f, v: _clamped_xla_reference(f, v, dt, max_disp),
                     field, vel)
    return vjp(g)


advect_2d_fast.defvjp(_fwd, _bwd)
