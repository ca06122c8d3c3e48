"""Checkpoint / resume (SURVEY.md §5 'Checkpoint / resume').

The reference saves ``tf.train.Saver`` checkpoints every ``saveInterval`` into
run dirs ``test_%04d/`` and restores via ``load_model_test`` (run index) +
``load_model_no`` (checkpoint number). We keep that directory/CLI contract but
store orbax checkpoints of the full train state (params + optimizer moments +
step) plus a JSON sidecar with the growing stage and config snapshot, so a
crash resumes exactly (SURVEY.md §5 'Failure detection').
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import shutil
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def next_run_dir(base: str) -> str:
    """Create and return the next free ``test_%04d`` run dir under base.

    Multi-process jobs: only process 0 lists/creates (two processes listing
    the same shared ``base`` would race to the same index and collide on
    makedirs); the chosen index is broadcast so every process returns the
    same path. Non-lead processes must not write into it — the train driver
    gates all file output on ``jax.process_index() == 0``.
    """
    if jax.process_count() > 1:
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        idx = 0
        if jax.process_index() == 0:
            idx = int(os.path.basename(_next_run_dir_local(base))[5:])
        idx = int(multihost_utils.broadcast_one_to_all(jnp.int32(idx)))
        return run_dir(base, idx)
    return _next_run_dir_local(base)


def _next_run_dir_local(base: str) -> str:
    os.makedirs(base, exist_ok=True)
    existing = [int(m.group(1)) for d in os.listdir(base)
                if (m := re.fullmatch(r"test_(\d{4})", d))]
    idx = max(existing, default=-1) + 1
    path = os.path.join(base, f"test_{idx:04d}")
    os.makedirs(path)
    return path


def host_leaf(x: Any) -> np.ndarray:
    """Fetch one leaf to host for serialization. Replicated global arrays in
    a multi-process job are not fully addressable (np.asarray raises); their
    local replica shard IS the full value, so save that. Train state is
    always replicated over the mesh — dataset stacks (the only sharded
    arrays) are never checkpointed."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        x = x.addressable_data(0)
    return np.asarray(x)


def run_dir(base: str, index: int) -> str:
    return os.path.join(base, f"test_{index:04d}")


def latest_run_idx(base: str) -> int | None:
    """Newest ``test_%04d`` index under ``base`` (None when none exist)."""
    if not os.path.isdir(base):
        return None
    return max((int(m.group(1)) for d in os.listdir(base)
                if (m := re.fullmatch(r"test_(\d{4})", d))), default=None)


def model_dir(run: str, no: int) -> str:
    return os.path.join(run, f"model_{no:04d}")


def save(run: str, no: int, state: Any, meta: dict) -> str:
    """Save train state + metadata as checkpoint ``model_%04d``.

    Multi-process jobs must call this from EVERY process — orbax
    checkpointers are collective (internal sync barriers; the primary does
    the writing). Only the JSON sidecar is written lead-only here.

    Overwrite-safe: in-place crash recovery (resumeLatest) can legitimately
    re-save a number whose dir was left behind by a kill mid-write (such a
    dir has no valid ``.json`` sidecar, so latest_resumable skipped it) —
    orbax would refuse the existing path, so clear it first."""
    path = os.path.abspath(model_dir(run, no))
    if os.path.exists(path):
        if jax.process_index() == 0:
            shutil.rmtree(path)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"rm_model_{no:04d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(host_leaf, _as_pytree(state)))
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        # atomic: a SIGKILL mid-write (retryOnError watchdog) must never
        # leave a truncated sidecar — resumeLatest keys on these files
        with open(path + ".json.tmp", "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(path + ".json.tmp", path + ".json")
    return path


def restore(run: str, no: int, template: Any) -> tuple[Any, dict]:
    """Restore (state, meta). ``template`` is a matching state pytree
    (e.g. a freshly initialized TrainState) defining structure/shapes."""
    path = os.path.abspath(model_dir(run, no))
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, _as_pytree(template))
    tree = ckptr.restore(path, abstract)
    meta = {}
    if os.path.exists(path + ".json"):
        meta = json.load(open(path + ".json"))
    return _from_pytree(tree, template), meta


def latest_model_no(run: str) -> int | None:
    if not os.path.isdir(run):
        return None
    nos = [int(m.group(1)) for d in os.listdir(run)
           if (m := re.fullmatch(r"model_(\d{4})", d))]
    return max(nos, default=None)


def latest_gen_no(run: str) -> int | None:
    """Newest generator-only checkpoint number (gen_%04d). Gen-only runs
    exist: scripts/import_tf1.py writes just gen_0000."""
    if not os.path.isdir(run):
        return None
    nos = [int(m.group(1)) for d in os.listdir(run)
           if (m := re.fullmatch(r"gen_(\d{4})", d))]
    return max(nos, default=None)


def latest_resumable(base: str, pass_no: int | None = None,
                     min_index: int = -1,
                     max_index: int | None = None) -> tuple[int, int] | None:
    """Newest (run index, model no) under ``base`` with a full checkpoint —
    the auto-resume target (``resumeLatest 1``; SURVEY.md §5 'Failure
    detection / elastic recovery': restart without hand-picking numbers).

    If ``pass_no`` is given, checkpoints whose metadata records a different
    training pass — or that have no ``.json`` sidecar at all (pass unknown) —
    are skipped, scanning older model numbers within each run before moving
    to older runs. Resuming pass-1 training from a pass-2 state would crash
    at restore with a param-shape mismatch, so the crash-recovery path must
    never guess. ``min_index`` restricts the scan to run indices >= it (the
    retryOnError supervisor scopes recovery to run dirs its own launch
    created, so an unrelated older run can never hijack a restart);
    ``max_index`` additionally bounds it above (``resumeIndex`` pins the
    scan to exactly one run dir in multi-config recipes, where several
    same-pass runs share a testPath and "newest same-pass checkpoint" is
    the wrong answer)."""
    if not os.path.isdir(base):
        return None
    runs = sorted((idx for d in os.listdir(base)
                   if (m := re.fullmatch(r"test_(\d{4})", d))
                   and (idx := int(m.group(1))) >= min_index
                   and (max_index is None or idx <= max_index)),
                  reverse=True)
    for idx in runs:
        run = run_dir(base, idx)
        if not os.path.isdir(run):
            continue
        nos = sorted((int(m.group(1)) for d in os.listdir(run)
                      if (m := re.fullmatch(r"model_(\d{4})", d))),
                     reverse=True)
        for no in nos:
            if pass_no is not None:
                meta_path = model_dir(run, no) + ".json"
                if not os.path.exists(meta_path):
                    continue  # unknown pass: not a safe resume target
                try:
                    meta = json.load(open(meta_path))
                except (json.JSONDecodeError, OSError):
                    continue  # corrupt sidecar (pre-atomic-write kill):
                    # unknown pass, keep scanning — recovery must not crash
                if meta.get("pass_no") != pass_no:
                    continue
            return idx, no
    return None


def save_gen(run: str, no: int, params_g: Any, prefix: str = "gen") -> str:
    """Generator-only checkpoint ``gen_%04d`` (cheap inference restore).
    ``prefix="gen_ema"`` stores the EMA generator alongside.

    Overwrite-safe for the same reason as ``save``: in-place recovery can
    re-save a number a killed run completed without its model sidecar."""
    path = os.path.abspath(os.path.join(run, f"{prefix}_{no:04d}"))
    if os.path.exists(path):
        if jax.process_index() == 0:
            shutil.rmtree(path)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"rm_{prefix}_{no:04d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(host_leaf, params_g))
    ckptr.wait_until_finished()
    return path


def restore_gen(run: str, no: int, template_params: Any,
                prefix: str = "gen") -> Any:
    path = os.path.abspath(os.path.join(run, f"{prefix}_{no:04d}"))
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template_params)
    return ckptr.restore(path, abstract)


def save_param_log(run: str, cfg: Any, argv: list[str] | None = None,
                   pass_no: int | None = None) -> None:
    """Reference-style param log copied into the run dir. ``pass_no`` marks
    which training pass owns the dir — crash recovery keys on it when the
    run died before its first checkpoint (recover_run_dir)."""
    log: dict = {"argv": argv or [], "config": dataclasses.asdict(cfg)}
    if pass_no is not None:
        log["pass_no"] = int(pass_no)
    with open(os.path.join(run, "params.json"), "w") as f:
        json.dump(log, f, indent=1, default=str)


def run_pass_no(run: str) -> int | None:
    """Training pass recorded in a run dir's params.json (None when the dir
    predates the pass_no field, or the file is missing/corrupt)."""
    try:
        with open(os.path.join(run, "params.json")) as f:
            v = json.load(f).get("pass_no")
        return int(v) if v is not None else None
    except (OSError, json.JSONDecodeError, TypeError, ValueError):
        return None


def recover_run_dir(base: str, pass_no: int,
                    min_index: int = -1) -> str | None:
    """Run dir to REUSE for a crash-recovery FRESH start (resumeLatest found
    no checkpoint): the newest ``test_%04d`` iff it records the same pass in
    params.json and holds no model/gen checkpoints — i.e. it is the dead
    run, killed before its first save. Restarting into it keeps pinned run
    indices stable (a multi-stage recipe that evaluates "pass 1 = test 0,
    pass 2 = test 1" must not have a pre-first-save crash shift every later
    index). Only the newest dir is considered — recovery must never
    resurrect unrelated older dirs — and ``min_index`` scopes it to dirs
    this launch created (the retryOnError supervisor's contract). Returns
    None when the newest dir doesn't qualify (allocate a fresh one).

    Multi-process: process 0 decides, the index is broadcast (same contract
    as next_run_dir)."""
    def _local() -> int:
        idx = latest_run_idx(base)
        if idx is None or (min_index >= 0 and idx < min_index):
            return -1
        run = run_dir(base, idx)
        if (run_pass_no(run) == pass_no and latest_model_no(run) is None
                and latest_gen_no(run) is None):
            return idx
        return -1

    if jax.process_count() > 1:
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        idx = _local() if jax.process_index() == 0 else -1
        idx = int(multihost_utils.broadcast_one_to_all(jnp.int32(idx)))
    else:
        idx = _local()
    return run_dir(base, idx) if idx >= 0 else None


def _as_pytree(state: Any) -> Any:
    # NamedTuple → dict so orbax stores stable field names
    if hasattr(state, "_asdict"):
        return dict(state._asdict())
    return state


def _from_pytree(tree: Any, template: Any) -> Any:
    if hasattr(template, "_asdict") and isinstance(tree, dict):
        return type(template)(**tree)
    return tree
