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


def setup_compilation_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 1.0) -> str | None:
    """Enable JAX's persistent compilation cache for entry-point processes.

    Cold compiles through this box's remote axon backend take 2–10 minutes
    for the big training/inference programs (CLAUDE.md), and every CLI
    invocation is a fresh process — without a disk cache that cost is paid
    on every run. The persistent cache stores serialized executables keyed
    by (HLO, compile options, device kind), so repeat invocations of the
    same shapes skip compilation entirely.

    Resolution order: explicit ``cache_dir`` arg (CLI flag ``compileCache``)
    → ``MPGAN_COMPILE_CACHE`` env → default ``~/.cache/mpgan_tpu/jax``.
    Pass/set ``0``/``off``/empty to disable. Returns the active dir or None.

    Failures are non-fatal by design: ``jax_raise_persistent_cache_errors``
    defaults to False, so a backend that can't serialize executables (or an
    unwritable dir) degrades to a warning, never a crash.
    """
    env = os.environ.get("MPGAN_COMPILE_CACHE")
    if cache_dir is None:
        cache_dir = env if env is not None else "~/.cache/mpgan_tpu/jax"
    if str(cache_dir).strip().lower() in ("", "0", "none", "off"):
        return None
    path = os.path.abspath(os.path.expanduser(str(cache_dir)))
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache only compiles that cost real time; tiny CPU-test programs would
    # otherwise churn the dir with thousands of sub-second entries
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path


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
