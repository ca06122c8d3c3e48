"""2D buoyant-smoke solver (reference ``dataDim 2`` support, SURVEY.md §2.1).

Same discretization as the 3D solver (mpgan_tpu.solver.smoke): +face
velocities, backward-difference divergence / forward-difference pressure
gradient (compact 5-point Laplacian), Jacobi projection, closed box.
Fields are (H, W, C) with y up; velocity channels (vx, vy).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpgan_tpu.ops.warp import advect_2d, advect_2d_maccormack
from mpgan_tpu.solver.smoke import SmokeParams


class Smoke2DState(NamedTuple):
    density: jnp.ndarray   # (H, W, 1)
    velocity: jnp.ndarray  # (H, W, 2) channels (vx, vy)
    solid: jnp.ndarray     # (H, W, 1)


def _shift(a, off, axis):
    idx = jnp.clip(jnp.arange(a.shape[axis]) + off, 0, a.shape[axis] - 1)
    return jnp.take(a, idx, axis=axis)


def divergence(vel):
    vx, vy = vel[..., 0], vel[..., 1]
    def bdiff(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (1, 0)
        ap = jnp.pad(a, pad)
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(0, a.shape[axis])
        return a - ap[tuple(sl)]
    return (bdiff(vx, 1) + bdiff(vy, 0))[..., None]


def pressure_gradient(p):
    p2 = p[..., 0]
    return jnp.stack([_shift(p2, 1, 1) - p2, _shift(p2, 1, 0) - p2], axis=-1)


def jacobi_pressure(div, solid, iters):
    fluid = 1.0 - solid[..., 0]
    d = div[..., 0]

    def body(_, p):
        s = jnp.zeros_like(p)
        for axis in (0, 1):
            for off in (-1, 1):
                pn = _shift(p, off, axis)
                fn = _shift(fluid, off, axis)
                s = s + jnp.where(fn > 0, pn, p)
        return jnp.where(fluid > 0, (s - d) / 4.0, 0.0)

    return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(d))[..., None]


def enforce_boundaries(vel, solid):
    vx = vel[..., 0].at[:, -1].set(0.0)
    vy = vel[..., 1].at[-1, :].set(0.0)
    s = solid[..., 0]
    sx = jnp.maximum(s, _shift(s, 1, 1))
    sy = jnp.maximum(s, _shift(s, 1, 0))
    return jnp.stack([vx * (1 - sx), vy * (1 - sy)], axis=-1)


def project(vel, solid, iters, solver: str = "jacobi"):
    vel = enforce_boundaries(vel, solid)
    div = divergence(vel) * (1.0 - solid)
    if solver == "cg":
        from mpgan_tpu.solver.smoke import cg_pressure  # dimension-generic
        p = cg_pressure(div, solid, iters)
    else:
        p = jacobi_pressure(div, solid, iters)
    return enforce_boundaries(vel - pressure_gradient(p), solid)


def vorticity_confinement(vel, eps, dt):
    def central(a, axis):
        return 0.5 * (_shift(a, 1, axis) - _shift(a, -1, axis))
    vx, vy = vel[..., 0], vel[..., 1]
    w = central(vy, 1) - central(vx, 0)  # scalar curl
    wabs = jnp.abs(w)
    ny, nx = central(wabs, 0), central(wabs, 1)
    mag = jnp.sqrt(nx * nx + ny * ny + 1e-20)
    nx, ny = nx / mag, ny / mag
    # force = ε (N × ω ẑ): fx = ny·w, fy = −nx·w
    return vel + eps * dt * jnp.stack([ny * w, -nx * w], axis=-1)


@partial(jax.jit, static_argnames=("params",))
def step(state: Smoke2DState, params: SmokeParams,
         inflow_density=None, inflow_mask=None) -> Smoke2DState:
    dens, vel, solid = state
    if params.maccormack:
        dens = advect_2d_maccormack(dens, vel, params.dt)
    else:
        dens = advect_2d(dens, vel, params.dt)
    vel = advect_2d(vel, vel, params.dt)
    vel = vel.at[..., 1].add(params.buoyancy * dens[..., 0] * params.dt * 100.0)
    if params.vorticity_eps > 0:
        vel = vorticity_confinement(vel, params.vorticity_eps, params.dt)
    if inflow_density is not None and inflow_mask is not None:
        dens = dens * (1.0 - inflow_mask) + inflow_density * inflow_mask
    if params.dissipation > 0:
        dens = dens * (1.0 - params.dissipation)
    dens = dens * (1.0 - solid)
    if params.pressure_solver == "cg":
        vel = project(vel, solid, params.cg_iters, solver="cg")
    else:
        vel = project(vel, solid, params.jacobi_iters)
    return Smoke2DState(dens, vel, solid)


def init_state(res_y: int, res_x: int, solid=None) -> Smoke2DState:
    if solid is None:
        solid = jnp.zeros((res_y, res_x, 1), jnp.float32)
    return Smoke2DState(jnp.zeros((res_y, res_x, 1), jnp.float32),
                        jnp.zeros((res_y, res_x, 2), jnp.float32), solid)


def disc_mask(res_y: int, res_x: int, center: tuple[float, float],
              radius: float) -> jnp.ndarray:
    yy = jnp.arange(res_y, dtype=jnp.float32)[:, None] / res_y
    xx = jnp.arange(res_x, dtype=jnp.float32)[None, :] / res_x
    cy, cx = center
    return ((yy - cy) ** 2 + (xx - cx) ** 2 < radius ** 2
            ).astype(jnp.float32)[..., None]
