"""Shared child-supervision primitives for elastic recovery (SURVEY.md §5).

The axon tunnel's observed failure mode is a silent HANG (backend init or a
dispatch blocking forever), not a crash — verified again live on 2026-08-21
when a datagen child wedged in backend init during a tunnel flap and sat at
3 s of CPU for an hour. Training/inference supervision lives in
``scripts/multipass_gan.py`` (run-dir pinning is training-specific); the
generic pieces here are shared with the datagen CLI, whose restartability
comes from ``skipExisting`` instead of run dirs.

The supervising parent must stay jax-free: importing this module initializes
no backend.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time


def _kill_child_group(proc) -> None:
    """Kill the child and everything it spawned (it runs in its own session
    via start_new_session=True), then reap it."""
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError, OSError):
        try:
            proc.kill()
        except OSError:
            pass
    proc.wait()


def run_child(cmd, env) -> int:
    """subprocess.call with the same death semantics as run_child_watched:
    the child gets its own session, and SIGTERM/SIGINT to the supervisor
    kills the child group before exiting."""
    proc = subprocess.Popen(cmd, env=env, start_new_session=True)

    def _die(signum, frame):
        _kill_child_group(proc)
        raise SystemExit(128 + signum)

    prev = {s: signal.signal(s, _die)
            for s in (signal.SIGTERM, signal.SIGINT)}
    try:
        return proc.wait()
    finally:
        for s, h in prev.items():
            signal.signal(s, h)


def run_child_watched(cmd, env, hang_timeout: float, heartbeat: str) -> int:
    """Run the child, killing it if its heartbeat file goes stale.

    The child touches ``env[MPGAN_HEARTBEAT]`` on every unit of forward
    progress (``utils.liveness.touch_heartbeat``); a child silent for
    ``hang_timeout`` seconds is killed (rc -9) so the caller can restart it
    like any other death. Until the FIRST touch the deadline is the larger
    startup grace (``MPGAN_STARTUP_GRACE_S``, default 900 s) — imports, data
    load, and a cold remote compile (2–10 min on this tunnel) are
    legitimately silent.
    """
    with open(heartbeat, "w"):
        pass
    launch_mtime = os.path.getmtime(heartbeat)
    grace = max(hang_timeout,
                float(os.environ.get("MPGAN_STARTUP_GRACE_S", "900")))
    # Own session so supervisor death can take the whole child tree down —
    # recipes wrap supervisors in `timeout N`, whose SIGTERM previously hit
    # only this process and orphaned a (possibly tunnel-hung) child that then
    # contended for the single host core (ADVICE r4).
    proc = subprocess.Popen(cmd, env=env, start_new_session=True)

    def _die(signum, frame):
        _kill_child_group(proc)
        # raise instead of os._exit so callers' finally blocks (heartbeat /
        # run-file cleanup) run
        raise SystemExit(128 + signum)

    prev = {s: signal.signal(s, _die)
            for s in (signal.SIGTERM, signal.SIGINT)}
    poll_s = max(1.0, min(10.0, hang_timeout / 3))
    try:
        while True:
            try:
                return proc.wait(timeout=poll_s)
            except subprocess.TimeoutExpired:
                pass
            try:
                mtime = os.path.getmtime(heartbeat)
                stale = time.time() - mtime
            except OSError:
                continue
            limit = hang_timeout if mtime != launch_mtime else grace
            if stale > limit:
                # the child may be in teardown (work done, interpreter
                # exiting), which doesn't heartbeat; give it a drain window
                drain = max(10.0, min(60.0, hang_timeout))
                try:
                    return proc.wait(timeout=drain)
                except subprocess.TimeoutExpired:
                    pass
                try:
                    if os.path.getmtime(heartbeat) != mtime:
                        continue  # recovered during the drain — not hung
                except OSError:
                    pass
                print(f"retryOnError: child silent for {stale + drain:.0f}s "
                      f"(limit {limit:g}s); killing it", flush=True)
                _kill_child_group(proc)
                return -9
    finally:
        for s, h in prev.items():
            signal.signal(s, h)


def supervise_restartable(script: str, argv, retries: int,
                          hang_timeout: float, child_env: str,
                          heartbeat_dir: str,
                          retry_flags=()) -> int:
    """Supervise an idempotently-restartable CLI (datagen): relaunch the
    same argv (plus ``retry_flags``, e.g. ``("skipExisting", "1")``) until it
    exits 0 or the retry budget is spent. The child is marked via
    ``child_env`` so it doesn't recurse into supervision.
    """
    env = dict(os.environ, **{child_env: "1"})
    delay = float(os.environ.get("MPGAN_RETRY_DELAY_S", "30"))
    os.makedirs(heartbeat_dir, exist_ok=True)
    heartbeat = None
    if hang_timeout > 0:
        heartbeat = os.path.join(heartbeat_dir, f".heartbeat_{os.getpid()}")
        env["MPGAN_HEARTBEAT"] = heartbeat
    failures = 0
    try:
        while True:
            args = list(argv)
            if failures:
                for i in range(0, len(retry_flags) - 1, 2):
                    flag = retry_flags[i]
                    if not any(t.lower() == flag.lower() for t in args):
                        args += [flag, retry_flags[i + 1]]
            cmd = [sys.executable, script] + args
            if heartbeat:
                rc = run_child_watched(cmd, env, hang_timeout, heartbeat)
            else:
                rc = run_child(cmd, env)
            if rc == 0:
                return 0
            failures += 1
            if failures > retries:
                print(f"retryOnError: giving up after {failures} failures "
                      f"(last rc={rc})", flush=True)
                return rc
            print(f"retryOnError: child died (rc={rc}); restarting in "
                  f"{delay:g}s [{failures}/{retries}]", flush=True)
            time.sleep(delay)
    finally:
        if heartbeat and os.path.exists(heartbeat):
            os.remove(heartbeat)
