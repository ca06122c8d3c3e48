"""bench.py supervisor logic — the driver's round-end artifact generator.

The supervisor must survive the axon tunnel's observed failure modes
(backend init raising or HANGING) without producing a failed artifact:
probe failures draw on a time window, full attempts on a count budget,
and a hard outage ends in a clearly-labeled CPU fallback. These tests
drive ``_supervise`` with a stubbed ``subprocess.run`` so no real JAX
backend (or 30-minute timeout) is involved.
"""

import importlib.util
import os
import subprocess
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    # bench.py's import-time honor_jax_platforms_env() applies the SHELL's
    # JAX_PLATFORMS (axon on this box) to THIS pytest process — flipping the
    # conftest CPU pin so the next in-process backend touch hangs on a down
    # tunnel (observed: the whole suite stalling in test_infer). Neutralize
    # both import-time hooks: no env var → honor is a no-op; cache off → no
    # config change.
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("MPGAN_COMPILE_CACHE", "0")
    spec.loader.exec_module(mod)
    import jax
    assert jax.config.jax_platforms == "cpu", (
        "bench.py import changed the test process's platform pin")
    # _supervise does `import subprocess` locally and calls module-global
    # time.sleep — patch the real modules (monkeypatch restores them).
    monkeypatch.setattr(time, "sleep", lambda s: None)
    mod._patch = lambda run: monkeypatch.setattr(subprocess, "run", run)
    return mod


class FakeProc:
    def __init__(self, rc, out=""):
        self.returncode = rc
        self.stdout = out
        self.stderr = "synthetic-error\n"


def _is_probe(cmd):
    return cmd[1] == "-c"


def test_probe_ok_first_attempt_succeeds(bench, monkeypatch, capsys):
    seq = []

    def run(cmd, **kw):
        if _is_probe(cmd):
            seq.append("probe")
            return FakeProc(0)
        seq.append("full")
        return FakeProc(0, 'noise\n{"v": 1}\n')

    bench._patch(run)
    assert bench._supervise() == 0
    assert seq == ["probe", "full"]
    # forwards exactly the child's final JSON line
    assert capsys.readouterr().out.strip() == '{"v": 1}'


def test_hard_outage_falls_back_to_labeled_cpu(bench, monkeypatch, capsys):
    """Probes never succeed: after the window expires, no full TPU attempt
    is made and the CPU-fallback child runs with the fallback env."""
    monkeypatch.setenv("MPGAN_BENCH_PROBE_WINDOW_S", "0")
    seq, envs = [], []

    def run(cmd, **kw):
        if _is_probe(cmd):
            seq.append("probe")
            return FakeProc(1)
        seq.append("full")
        envs.append(kw.get("env", {}))
        return FakeProc(0, '{"cpu": 1}\n')

    bench._patch(run)
    assert bench._supervise() == 0
    assert seq == ["probe", "full"], seq
    assert envs[0].get("JAX_PLATFORMS") == "cpu"
    assert envs[0].get("MPGAN_BENCH_FALLBACK") == "1"
    assert capsys.readouterr().out.strip() == '{"cpu": 1}'


def test_flaky_tunnel_caps_full_attempts_at_three(bench, monkeypatch):
    """Tunnel is up (probes pass) but the bench child keeps dying: exactly
    3 full attempts, then the CPU fallback — never an unbounded retry."""
    monkeypatch.setenv("MPGAN_BENCH_PROBE_WINDOW_S", "9999")
    seq = []

    def run(cmd, **kw):
        if _is_probe(cmd):
            seq.append("probe")
            return FakeProc(0)
        seq.append("full")
        if seq.count("full") <= 3:
            return FakeProc(1)
        return FakeProc(0, '{"cpu": 1}\n')

    bench._patch(run)
    assert bench._supervise() == 0
    assert seq.count("probe") == 3
    assert seq.count("full") == 4  # 3 TPU attempts + 1 CPU fallback


def test_outage_then_recovery_within_window(bench, monkeypatch, capsys):
    """Probes fail a few times, then the tunnel comes back: the supervisor
    keeps probing inside the window and still gets a real TPU run."""
    monkeypatch.setenv("MPGAN_BENCH_PROBE_WINDOW_S", "9999")
    probes = [1, 1, 1, 0]  # rc per probe call

    def run(cmd, **kw):
        if _is_probe(cmd):
            return FakeProc(probes.pop(0) if probes else 0)
        return FakeProc(0, '{"tpu": 1}\n')

    bench._patch(run)
    assert bench._supervise() == 0
    assert capsys.readouterr().out.strip() == '{"tpu": 1}'


def test_probe_window_rearms_per_outage(bench, monkeypatch, capsys):
    """The probe window bounds one CONTIGUOUS failed-probe streak. An
    outage that begins only after a long (1800 s) failed full attempt must
    still get the full window — a start-anchored deadline would already be
    expired and drop straight to the CPU fallback with attempts unused."""
    monkeypatch.setenv("MPGAN_BENCH_PROBE_WINDOW_S", "100")
    clock = [0.0]
    monkeypatch.setattr(time, "monotonic", lambda: clock[0])
    seq = []

    def run(cmd, **kw):
        if _is_probe(cmd):
            n = sum(1 for s in seq if s.startswith("probe"))
            if n == 1:  # t=1800: the outage has just begun
                seq.append("probe-fail")
                return FakeProc(1)
            seq.append("probe")  # up before the attempt / recovered after
            return FakeProc(0)
        seq.append("full")
        if seq.count("full") == 1:
            clock[0] += 1800.0  # attempt ran to its timeout, then failed
            return FakeProc(1)
        return FakeProc(0, '{"tpu": 2}\n')

    bench._patch(run)
    assert bench._supervise() == 0
    assert seq == ["probe", "full", "probe-fail", "probe", "full"], seq
    assert capsys.readouterr().out.strip() == '{"tpu": 2}'


def test_probe_hang_counts_as_probe_failure(bench, monkeypatch, capsys):
    """A probe child that HANGS (subprocess.run raises TimeoutExpired — the
    sitecustomize-import hang mode) is treated like a failed probe, not a
    crash of the supervisor."""
    monkeypatch.setenv("MPGAN_BENCH_PROBE_WINDOW_S", "0")

    def run(cmd, **kw):
        if _is_probe(cmd):
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 120))
        return FakeProc(0, '{"cpu": 1}\n')

    bench._patch(run)
    assert bench._supervise() == 0
    assert capsys.readouterr().out.strip() == '{"cpu": 1}'


def test_everything_fails_returns_nonzero(bench, monkeypatch):
    monkeypatch.setenv("MPGAN_BENCH_PROBE_WINDOW_S", "0")

    def run(cmd, **kw):
        return FakeProc(1)

    bench._patch(run)
    assert bench._supervise() == 1
