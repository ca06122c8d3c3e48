"""JAX buoyant-smoke solver — the TPU-native stand-in for mantaflow (L0).

The reference generates training data with mantaflow scene scripts (C++ solver;
SURVEY.md §2.12/§2.13 N1). Nothing ships with this environment, so this module
provides an equivalent fluid stepper, fully jit-compiled: semi-Lagrangian /
MacCormack advection, buoyancy, vorticity confinement, noise-modulated inflow,
optional solid obstacles, and Jacobi or conjugate-gradient pressure
projection (``pressure_solver="cg"`` — mantaflow's solver choice).

Discretization: cells store density (Z,Y,X,1) and velocity (Z,Y,X,3) where
component c is the face value on the cell's +face (MAC-style). Divergence uses
backward differences, pressure gradient forward differences — their
composition is the compact 7-point Laplacian, so there is no odd-even
(checkerboard) decoupling. Domain is a closed box (zero normal velocity at
walls, Neumann pressure); obstacles are a solid mask with zero velocity and
masked projection. Advection treats components as collocated (standard
simplification for data generation).

Everything is shape-static and runs as one jitted step under lax.fori_loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mpgan_tpu.ops.warp import advect_3d, advect_3d_maccormack


class SmokeState(NamedTuple):
    density: jnp.ndarray   # (Z, Y, X, 1) float32
    velocity: jnp.ndarray  # (Z, Y, X, 3) float32, channels (vx, vy, vz)
    solid: jnp.ndarray     # (Z, Y, X, 1) float32 in {0, 1}; 1 = obstacle


@dataclass(frozen=True)
class SmokeParams:
    dt: float = 0.5
    buoyancy: float = 1.0e-2       # upward (+y) force ∝ density
    vorticity_eps: float = 0.05    # confinement strength; 0 disables
    jacobi_iters: int = 60
    maccormack: bool = True
    dissipation: float = 0.0       # density decay per step
    pressure_solver: str = "jacobi"  # "jacobi" | "cg" (mantaflow uses CG)
    cg_iters: int = 60


# ------------------------------------------------------------------ stencils

def _shift(a: jnp.ndarray, off: int, axis: int) -> jnp.ndarray:
    """Shift with edge replication (Neumann-style neighbor access)."""
    idx = jnp.clip(jnp.arange(a.shape[axis]) + off, 0, a.shape[axis] - 1)
    return jnp.take(a, idx, axis=axis)


def divergence(vel: jnp.ndarray) -> jnp.ndarray:
    """Backward-difference divergence of +face velocities; closed box.

    div[i] = vx[i] − vx[i−1] + vy[j] − vy[j−1] + vz[k] − vz[k−1], where the
    −1 face value at the domain wall is 0 and the +face at the far wall is
    forced to 0 by :func:`enforce_boundaries`.
    """
    vx, vy, vz = vel[..., 0], vel[..., 1], vel[..., 2]
    def bdiff(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (1, 0)
        ap = jnp.pad(a, pad)  # zero at the wall face
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(0, a.shape[axis])
        return a - ap[tuple(sl)]
    return (bdiff(vx, 2) + bdiff(vy, 1) + bdiff(vz, 0))[..., None]


def pressure_gradient(p: jnp.ndarray) -> jnp.ndarray:
    """Forward-difference gradient at +faces; far-wall faces get 0 gradient."""
    p3 = p[..., 0]
    def fdiff(axis):
        nxt = _shift(p3, +1, axis)
        return nxt - p3  # replicated edge → 0 at far wall
    return jnp.stack([fdiff(2), fdiff(1), fdiff(0)], axis=-1)


def jacobi_pressure(div: jnp.ndarray, solid: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Solve ∇²p = div with Jacobi; Neumann walls, solid cells excluded."""
    fluid = 1.0 - solid[..., 0]
    d = div[..., 0]

    def neighbor_sum(p):
        s = jnp.zeros_like(p)
        cnt = jnp.zeros_like(p)
        for axis in (0, 1, 2):
            for off in (-1, +1):
                pn = _shift(p, off, axis)
                fn = _shift(fluid, off, axis)
                # solid neighbor → Neumann: use center value (drops from eq.)
                s = s + jnp.where(fn > 0, pn, p)
                cnt = cnt + 1.0
        return s, cnt

    def body(_, p):
        s, cnt = neighbor_sum(p)
        p_new = (s - d) / cnt
        return jnp.where(fluid > 0, p_new, 0.0)

    p0 = jnp.zeros_like(d)
    p = jax.lax.fori_loop(0, iters, body, p0)
    return p[..., None]


def _laplace_apply(p: jnp.ndarray, fluid: jnp.ndarray) -> jnp.ndarray:
    """Matrix-free 7-point Neumann Laplacian: (A p)[c] = Σ_{fluid nbrs n} (p[c] − p[n]).

    Solid-neighbor and wall slots contribute 0 (Neumann): walls via
    :func:`_shift`'s edge replication (p − p = 0), solids via the fluid mask.
    Restricted to fluid cells; A is symmetric positive semi-definite (graph
    Laplacian of the fluid-cell adjacency), which is what CG needs.
    """
    out = jnp.zeros_like(p)
    for axis in range(p.ndim):  # dimension-generic: (Z,Y,X) or (Y,X)
        for off in (-1, +1):
            pn = _shift(p, off, axis)
            fn = _shift(fluid, off, axis)
            out = out + jnp.where(fn > 0, p - pn, 0.0)
    return out * fluid


def cg_pressure(div: jnp.ndarray, solid: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Solve the projection Poisson system with conjugate gradients.

    Same system Jacobi iterates (A p = −div on fluid cells, Neumann walls
    and solids — the discretization mantaflow's CG solver uses, SURVEY.md
    §2.13 N1), but Krylov convergence: at equal iteration count (≈ equal
    stencil cost) CG's divergence residual is ~200× below Jacobi's (measured
    16³ fixture: 4e-5 vs 8e-3 at 60 iters). Fixed iteration count keeps the
    loop shape-static under jit; divisions are guarded so iterating past
    convergence is a no-op rather than a NaN.
    """
    fluid = 1.0 - solid[..., 0]
    b = -div[..., 0] * fluid

    def dot(a, c):
        return jnp.sum(a * c)

    rs0 = dot(b, b)
    # Freeze once |r|²/|b|² < 1e-12: past f32 convergence the recurrence's
    # round-off makes r drift away from the true residual and p diverges
    # (measured: resid 8e-6 @100 iters → 3.0 @500 without the freeze).
    tol2 = 1e-12 * rs0

    def body(_, carry):
        p, r, q, rs = carry
        done = rs <= tol2
        aq = _laplace_apply(q, fluid)
        denom = dot(q, aq)
        alpha = jnp.where(done | (denom <= 0), 0.0,
                          rs / jnp.maximum(denom, 1e-30))
        p = p + alpha * q
        r = r - alpha * aq
        rs_new = jnp.where(done, rs, dot(r, r))
        beta = jnp.where(done | (rs <= 0), 0.0,
                         rs_new / jnp.maximum(rs, 1e-30))
        q = jnp.where(done, q, r + beta * q)
        return p, r, q, rs_new

    p0 = jnp.zeros_like(b)
    init = (p0, b, b, rs0)
    p, _, _, _ = jax.lax.fori_loop(0, iters, body, init)
    return (p * fluid)[..., None]


def enforce_boundaries(vel: jnp.ndarray, solid: jnp.ndarray) -> jnp.ndarray:
    """Zero +face velocities at far walls and on/into solid cells."""
    vx, vy, vz = vel[..., 0], vel[..., 1], vel[..., 2]
    vx = vx.at[:, :, -1].set(0.0)
    vy = vy.at[:, -1, :].set(0.0)
    vz = vz.at[-1, :, :].set(0.0)
    vel = jnp.stack([vx, vy, vz], axis=-1)
    # zero velocity on faces touching a solid cell (either side)
    s = solid[..., 0]
    sx = jnp.maximum(s, _shift(s, +1, 2))
    sy = jnp.maximum(s, _shift(s, +1, 1))
    sz = jnp.maximum(s, _shift(s, +1, 0))
    mask = jnp.stack([sx, sy, sz], axis=-1)
    return vel * (1.0 - mask)


def project(vel: jnp.ndarray, solid: jnp.ndarray, iters: int,
            solver: str = "jacobi") -> jnp.ndarray:
    """Make ``vel`` discretely divergence-free (fluid cells)."""
    vel = enforce_boundaries(vel, solid)
    div = divergence(vel) * (1.0 - solid)
    if solver == "cg":
        p = cg_pressure(div, solid, iters)
    else:
        p = jacobi_pressure(div, solid, iters)
    vel = vel - pressure_gradient(p)
    return enforce_boundaries(vel, solid)


def vorticity_confinement(vel: jnp.ndarray, eps: float, dt: float) -> jnp.ndarray:
    """Re-inject small-scale swirl lost to SL dissipation (Fedkiw et al.)."""
    def central(a, axis):
        return 0.5 * (_shift(a, +1, axis) - _shift(a, -1, axis))
    vx, vy, vz = vel[..., 0], vel[..., 1], vel[..., 2]
    # ω = ∇×v ; axes: 0=z, 1=y, 2=x
    wx = central(vz, 1) - central(vy, 0)
    wy = central(vx, 0) - central(vz, 2)
    wz = central(vy, 2) - central(vx, 1)
    wmag = jnp.sqrt(wx * wx + wy * wy + wz * wz + 1e-20)
    nx, ny, nz = central(wmag, 2), central(wmag, 1), central(wmag, 0)
    nmag = jnp.sqrt(nx * nx + ny * ny + nz * nz + 1e-20)
    nx, ny, nz = nx / nmag, ny / nmag, nz / nmag
    fx = ny * wz - nz * wy
    fy = nz * wx - nx * wz
    fz = nx * wy - ny * wx
    force = jnp.stack([fx, fy, fz], axis=-1)
    return vel + eps * dt * force


# ------------------------------------------------------------------ stepping

@partial(jax.jit, static_argnames=("params",))
def step(state: SmokeState, params: SmokeParams,
         inflow_density: jnp.ndarray | None = None,
         inflow_mask: jnp.ndarray | None = None) -> SmokeState:
    """One solver step. ``inflow_density`` (Z,Y,X,1) is written where
    ``inflow_mask`` (Z,Y,X,1 in [0,1]) is positive (blended)."""
    dens, vel, solid = state

    # 1. advect
    if params.maccormack:
        dens = advect_3d_maccormack(dens, vel, params.dt)
    else:
        dens = advect_3d(dens, vel, params.dt)
    vel = advect_3d(vel, vel, params.dt)

    # 2. external forces: buoyancy along +y
    vel = vel.at[..., 1].add(params.buoyancy * dens[..., 0] * params.dt * 100.0)

    # 3. vorticity confinement
    if params.vorticity_eps > 0:
        vel = vorticity_confinement(vel, params.vorticity_eps, params.dt)

    # 4. sources
    if inflow_density is not None and inflow_mask is not None:
        dens = dens * (1.0 - inflow_mask) + inflow_density * inflow_mask

    if params.dissipation > 0:
        dens = dens * (1.0 - params.dissipation)

    # 5. clear solids + project
    dens = dens * (1.0 - solid)
    if params.pressure_solver == "cg":
        vel = project(vel, solid, params.cg_iters, solver="cg")
    else:
        vel = project(vel, solid, params.jacobi_iters)
    return SmokeState(dens, vel, solid)


def init_state(res_z: int, res_y: int, res_x: int,
               solid: jnp.ndarray | None = None) -> SmokeState:
    if solid is None:
        solid = jnp.zeros((res_z, res_y, res_x, 1), jnp.float32)
    return SmokeState(
        density=jnp.zeros((res_z, res_y, res_x, 1), jnp.float32),
        velocity=jnp.zeros((res_z, res_y, res_x, 3), jnp.float32),
        solid=solid,
    )


def sphere_mask(res_z: int, res_y: int, res_x: int,
                center: tuple[float, float, float], radius: float) -> jnp.ndarray:
    """(Z,Y,X,1) hard sphere mask; center/radius in fractions of the domain."""
    zz = jnp.arange(res_z, dtype=jnp.float32)[:, None, None] / res_z
    yy = jnp.arange(res_y, dtype=jnp.float32)[None, :, None] / res_y
    xx = jnp.arange(res_x, dtype=jnp.float32)[None, None, :] / res_x
    cz, cy, cx = center
    r2 = (zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2
    return (r2 < radius * radius).astype(jnp.float32)[..., None]
