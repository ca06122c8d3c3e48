"""Pipeline-parallel multi-pass inference over a frame stream.

SURVEY.md §2.14's PP row: "pass-1 and pass-2 as a two-stage pipeline over
frame streams". The reference has no parallelism at all (single GPU); here
the device set is split into one sub-mesh per generator pass. Each sub-mesh
is internally slice-data-parallel (the existing DP/SP story in
mpgan_tpu.infer.assemble), and consecutive frames occupy different stages
simultaneously: while stage B refines frame t, stage A runs pass 1 of frame
t+1.

TPU-native mechanics — no schedulers, no threads, no MPMD programs:

- Every stage is an ordinary ``jax.jit`` over its own ``Mesh``; XLA shards
  the slice batch over the stage's chips.
- The inter-stage handoff is an async cross-mesh ``jax.device_put`` with the
  *destination* stage's slice-axis sharding, so on real hardware the
  intermediate volume moves over ICI as a scatter straight into the layout
  pass k+1 consumes (no broadcast, no host bounce).
- JAX dispatch is asynchronous: ``submit`` enqueues the whole per-frame
  chain and returns immediately; the per-device execution streams enforce
  the data dependencies, so stage A starts frame t+1 while stage B is still
  busy with frame t. Pipelining falls out of the runtime — there is nothing
  to schedule.

Pass 2 runs its convolutions on the full-resolution xy grid, i.e. ~up_res×
pass 1's work per frame (pass 3 likewise), so the default split assigns
chips proportionally to [1, up, up].
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mpgan_tpu.infer import assemble
from mpgan_tpu.parallel import mesh as pmesh


def default_split(n_devices: int, n_stages: int, up_res: int) -> tuple[int, ...]:
    """Proportional chips-per-stage for cost weights [1, up, up, ...]."""
    if n_devices < n_stages:
        raise ValueError(
            f"pipeline needs >= 1 device per stage: {n_devices} devices for "
            f"{n_stages} stages")
    w = [1.0] + [float(up_res)] * (n_stages - 1)
    total = sum(w)
    split = [max(1, round(n_devices * wi / total)) for wi in w]
    # repair rounding so the split sums exactly to n_devices, shrinking the
    # largest / growing the heaviest-weighted stage
    while sum(split) > n_devices:
        i = max(range(n_stages), key=lambda j: (split[j], w[j]))
        split[i] -= 1
    while sum(split) < n_devices:
        i = max(range(n_stages), key=lambda j: (w[j], -split[j]))
        split[i] += 1
    return tuple(split)


class InferencePipeline:
    """Two- or three-stage pipeline-parallel upscaler over a frame stream.

    Produces the same volumes as assemble.upscale_volume (tested equivalent
    on the virtual 8-device CPU mesh); only the placement differs.
    """

    def __init__(self, gen1, params1, gen2, params2, up_res: int,
                 devices: Sequence | None = None,
                 split: Sequence[int] | None = None, chunk: int = 0,
                 gen3=None, params3=None, stage: int | None = None):
        if gen2 is None:
            raise ValueError("pipeline parallelism needs a pass-2 generator "
                             "(single-pass inference has one stage)")
        if devices is None:
            devices = jax.devices()
        self.n_stages = 3 if gen3 is not None else 2
        if split is None:
            split = default_split(len(devices), self.n_stages, up_res)
        split = tuple(int(s) for s in split)
        if len(split) != self.n_stages:
            raise ValueError(f"split {split} has {len(split)} entries for "
                             f"{self.n_stages} pipeline stages")
        if sum(split) > len(devices) or min(split) < 1:
            raise ValueError(f"split {split} does not fit {len(devices)} "
                             "devices (>=1 per stage)")
        self.split = split
        offs = [sum(split[:i]) for i in range(self.n_stages + 1)]
        meshes = [pmesh.make_mesh(devices=devices[offs[i]:offs[i + 1]])
                  for i in range(self.n_stages)]
        self.meshes = meshes
        self.up_res = up_res

        # params are traced jit ARGS, not closure constants: closed-over
        # arrays become jaxpr constants baked into the compile payload, and
        # the remote axon compiler rejects big payloads (HTTP 413) — same
        # rule as assemble.make_jitted_upscaler
        self._p1 = pmesh.replicate(params1, meshes[0])
        self._p2 = pmesh.replicate(params2, meshes[1])
        # handoff shardings: the axis pass k+1 slices over, on pass k+1's mesh
        self._to2_interm = NamedSharding(meshes[1], P(None, pmesh.DATA_AXIS))
        self._to2_vel = pmesh.replicated(meshes[1])

        @jax.jit
        def fn1(p1, lr_vol):
            interm = assemble.pass1_volume(gen1, p1, lr_vol, stage=stage,
                                           chunk=chunk, mesh=meshes[0])
            vel = lr_vol[..., 1:4] if lr_vol.shape[-1] >= 4 else None
            return interm, vel

        @jax.jit
        def fn2(p2, interm, vel):
            return assemble.pass2_volume(gen2, p2, interm, vel,
                                         stage=stage, chunk=chunk,
                                         mesh=meshes[1])

        self._fn1, self._fn2, self._fn3 = fn1, fn2, None
        self._rep1 = pmesh.replicated(meshes[0])
        if self.n_stages == 3:
            self._p3 = pmesh.replicate(params3, meshes[2])
            # pass 3 slices over x (axis 2 of (Zs, Ys, Xs, 1))
            self._to3_vol = NamedSharding(meshes[2],
                                          P(None, None, pmesh.DATA_AXIS))
            self._to3_vel = pmesh.replicated(meshes[2])

            @jax.jit
            def fn3(p3, vol, vel):
                return assemble.pass3_volume(gen3, p3, vol, vel, chunk=chunk,
                                             mesh=meshes[2])

            self._fn3 = fn3

    def submit(self, lr_vol) -> jnp.ndarray:
        """Enqueue one frame through all stages; returns the final volume as
        an async jax array (not yet computed — fetch/np.asarray to wait)."""
        # device_put takes numpy directly — jnp.asarray first would commit
        # the frame to the default device and pay a second transfer
        lr_vol = jax.device_put(lr_vol, self._rep1)
        if lr_vol.shape[0] == 1:
            raise ValueError("2D frames (Z == 1) are single-pass; the "
                             "pipeline needs volumetric input")
        interm, vel = self._fn1(self._p1, lr_vol)
        # sharded handoff needs the slice axis divisible by the stage's
        # device count; otherwise replicate (placement is a perf hint only)
        to2 = (self._to2_interm
               if interm.shape[1] % self.meshes[1].devices.size == 0
               else self._to2_vel)
        interm = jax.device_put(interm, to2)
        if vel is not None:
            vel = jax.device_put(vel, self._to2_vel)
        out = self._fn2(self._p2, interm, vel)
        if self._fn3 is not None:
            to3 = (self._to3_vol
                   if out.shape[2] % self.meshes[2].devices.size == 0
                   else self._to3_vel)
            out = jax.device_put(out, to3)
            v3 = (jax.device_put(vel, self._to3_vel)
                  if vel is not None else None)
            out = self._fn3(self._p3, out, v3)
        return out

    def stream(self, frames: Iterable, depth: int | None = None
               ) -> Iterator[jnp.ndarray]:
        """Pump a frame iterable through the pipeline, yielding HR volumes in
        order. ``depth`` bounds in-flight frames (default: n_stages + 1, the
        smallest window that keeps every stage busy)."""
        if depth is None:
            depth = self.n_stages + 1
        inflight: deque = deque()
        for lr in frames:
            inflight.append(self.submit(lr))
            if len(inflight) >= depth:
                yield inflight.popleft()
        while inflight:
            yield inflight.popleft()
