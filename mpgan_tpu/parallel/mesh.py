"""Device mesh + sharding helpers (SURVEY.md §2.14/§2.15).

The reference is single-GPU; parallelism here is first-class:
- DP: the training patch batch / inference slice batch is sharded over the
  'data' axis of a 1-D mesh spanning all chips (v5e-8 ICI); gradients are
  reduced by XLA-inserted collectives (psum over ICI).
- The z-slice axis of a volume is the sequence-parallel analog: per-slice 2D
  convs need no halo exchange, so full-volume inference shards slices the
  same way (see mpgan_tpu.infer).

Multi-host: call init_distributed() first (jax.distributed) and the same
helpers span all hosts — jax.devices() becomes global, make_mesh builds one
global DATA_AXIS mesh, and XLA routes in-host collectives over ICI and
cross-host ones over DCN (Gloo on the CPU backend). device_put with a
cross-process NamedSharding works from identical per-host data, so dataset
residency (TileCreator.shard_over) and state replication need no special
casing. Validated end-to-end by the 2-process training test in
tests/test_multihost.py.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Join this process into a multi-host jax.distributed job
    (SURVEY.md §2.15 DCN row).

    Call before any backend use. With no arguments jax auto-detects the
    cluster environment (TPU pods); on arbitrary hosts pass the
    coordinator's ``host:port`` plus process count and id. Afterwards
    ``jax.devices()`` is global and every helper in this module spans all
    hosts unchanged.
    """
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices.

    Raises (rather than silently truncating) when fewer than ``n_devices``
    are available — a short mesh would otherwise surface later as a cryptic
    shape/sharding assert far from the cause.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            plat = getattr(devices[0], "platform", "?") if devices else "none"
            raise RuntimeError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} available (platform={plat}). For a virtual "
                f"multi-device CPU mesh set JAX_PLATFORMS=cpu and XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_devices} before "
                f"the backend initializes.")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batches / slice stacks."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Place every array in ``tree`` with its leading axis over DATA_AXIS."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def constrain_batch(tree: Any, mesh: Mesh | None) -> Any:
    """Inside-jit hint: shard leading axes over DATA_AXIS (no-op if no mesh)."""
    if mesh is None:
        return tree
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
