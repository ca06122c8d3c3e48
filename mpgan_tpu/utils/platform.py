"""Honor the JAX_PLATFORMS environment variable in entry-point processes.

This box's sitecustomize registers the axon PJRT plugin at interpreter start
and pins ``jax_platforms`` there, so the standard ``JAX_PLATFORMS=cpu``
contract silently fails for child processes: a subprocess launched with that
env var still lands on the TPU tunnel, where a cold remote compile takes
minutes instead of the intended seconds on CPU. Re-asserting the env var via
``jax.config.update`` before any backend is initialized restores the
documented semantics (same mechanism as tests/conftest.py).

Call this first thing in every CLI entry point, before any jax compute.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    # normalize: backend names are lowercase-canonical in jax_platforms,
    # so 'CPU' or 'cpu, tpu' must not crash backend selection
    want = ",".join(p.strip().lower() for p in want.split(",") if p.strip())

    try:
        jax.config.update("jax_platforms", want)
    except RuntimeError:
        # Backend already initialized; too late to switch. If it matches the
        # request anyway, stay silent (normalize: 'CPU' / 'cpu, tpu' must
        # count as matches for an active 'cpu' backend).
        wanted = [p.strip().lower() for p in want.split(",")]
        if jax.default_backend().lower() not in wanted:
            raise
