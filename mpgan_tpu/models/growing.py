"""Progressive-growing parameter management (SURVEY.md §2.9, §7(b)).

The TF1 reference grows nets either by per-stage graph rebuilds with
checkpoint surgery or α-gated maximal graphs. Here growing is a pure
function-of-params problem: generator/discriminator modules are
stage-indexed, so the stage-k param tree is a strict subtree of stage-(k+1).
Growing = init the larger tree, merge the smaller one over it. Each stage is
its own jit compilation (shapes change anyway); no graph surgery exists.
"""

from __future__ import annotations

from typing import Any

import jax

PyTree = Any


def _flatten(tree: PyTree, prefix=()) -> dict[tuple, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: dict[tuple, Any]) -> PyTree:
    root: dict = {}
    for path, leaf in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return root


def migrate_params(old: PyTree, new: PyTree, strict: bool = True) -> PyTree:
    """Copy every leaf of ``old`` into ``new`` (stage-k → stage-k+1 growth).

    ``strict``: every old path must exist in the new tree with matching shape
    (growth-monotonicity check); set False to best-effort merge (e.g. when
    importing partial checkpoints).
    """
    fo, fn = _flatten(old), _flatten(new)
    merged = dict(fn)
    for path, leaf in fo.items():
        if path not in fn:
            if strict:
                raise KeyError(f"param {'/'.join(map(str, path))} missing in "
                               "grown tree — stage trees are not nested")
            continue
        if hasattr(leaf, "shape") and leaf.shape != fn[path].shape:
            if strict:
                raise ValueError(
                    f"param {'/'.join(map(str, path))} shape changed "
                    f"{leaf.shape} → {fn[path].shape}")
            continue
        merged[path] = leaf
    return _unflatten(merged)


def subtree_check(small: PyTree, big: PyTree) -> bool:
    """True iff every leaf path of ``small`` exists in ``big`` (same shape)."""
    fs, fb = _flatten(small), _flatten(big)
    return all(p in fb and getattr(l, "shape", None) == getattr(fb[p], "shape", None)
               for p, l in fs.items())


def alpha_schedule(it: int, stage_start_it: int, alpha_iters: int) -> float:
    """Linear 0→1 fade over ``alpha_iters`` after a stage transition."""
    if alpha_iters <= 0:
        return 1.0
    return float(min(max((it - stage_start_it) / alpha_iters, 0.0), 1.0))


class GrowthSchedule:
    """Maps a global iteration to (stage, alpha) (SURVEY.md §2.9).

    Stage k (1-based) trains for ``alpha_iters + stable_iters`` iterations:
    α ramps 0→1 over the first ``alpha_iters`` (stage 1 starts at α=1),
    then holds at 1. The final stage trains until ``total_iters``.
    """

    def __init__(self, n_stages: int, alpha_iters: int, stable_iters: int):
        self.n_stages = n_stages
        self.alpha_iters = alpha_iters
        self.stable_iters = stable_iters

    def stage_at(self, it: int) -> tuple[int, float]:
        per_stage = self.alpha_iters + self.stable_iters
        if per_stage <= 0:
            return self.n_stages, 1.0
        idx = it // per_stage  # 0-based stage index
        if idx >= self.n_stages:
            return self.n_stages, 1.0
        stage = idx + 1
        if stage == 1:
            return 1, 1.0  # first stage never fades
        return stage, alpha_schedule(it, idx * per_stage, self.alpha_iters)

    def boundaries(self) -> list[int]:
        per_stage = self.alpha_iters + self.stable_iters
        return [k * per_stage for k in range(1, self.n_stages)]


def count_params(tree: PyTree) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
