"""Persistent compilation cache (utils/platform.setup_compilation_cache).

Cold compiles through the remote axon backend cost 2-10 minutes per entry
point invocation; the persistent cache makes repeat invocations with the
same shapes skip compilation. These tests exercise the resolution rules
in-process and the actual disk round-trip in a child process (the cache
must be configured before the backend compiles anything, which in-process
pytest — with its long-lived CPU backend — can't guarantee).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

sys.path.insert(0, REPO)

from mpgan_tpu.utils.platform import setup_compilation_cache  # noqa: E402


def test_disable_spellings(tmp_path, monkeypatch):
    import jax

    monkeypatch.delenv("MPGAN_COMPILE_CACHE", raising=False)
    for off in ("0", "off", "none", ""):
        assert setup_compilation_cache(off) is None
    # env disable wins when no explicit dir is given
    monkeypatch.setenv("MPGAN_COMPILE_CACHE", "0")
    assert setup_compilation_cache() is None
    # explicit arg beats env — restore the global jax config afterwards so
    # later suite compiles don't silently persist executables into this
    # test's tmp dir (same config-leak class as the platform-pin fixture)
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        d = tmp_path / "cc"
        assert setup_compilation_cache(str(d)) == str(d)
        assert d.is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_min)


def test_unwritable_dir_is_nonfatal(monkeypatch):
    monkeypatch.delenv("MPGAN_COMPILE_CACHE", raising=False)
    assert setup_compilation_cache("/proc/nope/cc") is None


def test_cache_round_trip_across_processes(tmp_path):
    """First child populates the cache dir; second child hits it (observed
    via jax's explain-cache-misses log staying silent on the hit)."""
    cache = tmp_path / "jaxcache"
    child = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from mpgan_tpu.utils.platform import setup_compilation_cache\n"
        "d = setup_compilation_cache(%r, min_compile_secs=0.0)\n"
        "assert d == %r, d\n"
        "import jax.numpy as jnp\n"
        "f = jax.jit(lambda x: jnp.tanh(x) @ x)\n"
        "print(float(f(jnp.ones((64, 64))).sum()))\n"
    ) % (REPO, str(cache), str(cache))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for _ in range(2):
        r = subprocess.run([sys.executable, "-c", child], env=env,
                           capture_output=True, text=True, timeout=180)
        assert r.returncode == 0, r.stderr[-2000:]
    entries = [p for p in cache.iterdir() if p.is_file()]
    assert entries, "cache dir stayed empty — persistent cache inactive"
