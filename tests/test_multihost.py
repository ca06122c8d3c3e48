"""Multi-host (DCN-analog) test: 2 jax.distributed processes × 4 CPU devices
run the full sharded train step over one global 8-device mesh
(SURVEY.md §2.15; VERDICT r1 #7 'multi-host decision' — built, not descoped).

The SPMD program is identical in both processes, so the replicated metrics
they fetch must agree exactly.
"""

import os
import socket
import subprocess
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training_over_global_mesh(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    xla = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                   if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (xla +
                        " --xla_force_host_platform_device_count=4").strip()
    child = os.path.join(_REPO, "tests", "_mh_child.py")
    procs = [subprocess.Popen([sys.executable, child, str(i), str(port),
                               str(tmp_path)],
                              cwd=_REPO, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"child failed:\n{out}\n{err[-3000:]}"
        outs.append(out)

    results, runs, leaves = {}, set(), set()
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("MHRESULT")][0]
        _, pid, g_loss, n_proc, run, leaf = line.split()
        assert n_proc == "2"
        results[int(pid)] = float(g_loss)
        runs.add(run)
        leaves.add(leaf)
    assert set(results) == {0, 1}
    assert results[0] == results[1], results
    # both processes agreed on one run dir and restored the same checkpoint
    assert runs == {"test_0000"}, runs
    assert len(leaves) == 1, leaves
    assert os.path.isdir(os.path.join(str(tmp_path), "test_0000",
                                      "model_0000"))
