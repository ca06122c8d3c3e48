"""TF1 `tf.train.Saver` checkpoint → flax generator import.

SURVEY.md §5 ('Checkpoint / resume': "plus a TF1-ckpt→JAX import tool if
pretrained reference weights are ever available") and §7 hard-part (a): PSNR
parity against the reference is defined at the inference-output level given
imported weights, so the bridge from the reference's checkpoint format into
this framework's generators must exist before any parity run.

The reference saves `tf.train.Saver` checkpoints (SURVEY.md §2 'Checkpointing'
row) — TensorBundle V2 bundles (``model.ckpt.index`` + ``.data-00000-of-*``).
`tf.train.load_checkpoint` reads those under TF2 without a TF1 runtime, so
import works on this box's TF 2.x. TF is imported lazily: everything else in
this module (and its callers) works when TF is absent.

Layout facts that make the transfer transposition-free:

- TF1 `conv2d` kernels are ``(kh, kw, cin, cout)`` — identical to
  `flax.linen.Conv`.
- TF1 dense kernels are ``(in, out)`` — identical to `flax.linen.Dense`.
- Biases are ``(cout,)`` in both.

Only *names* differ, and the reference's variable scoping is unverifiable
while the mount is empty (SURVEY.md §0), so the mapper supports two modes:

1. explicit ``name_map`` — flax key path (``"block_0_0/conv1/kernel"``) →
   TF variable name; authoritative once the real scope names are known.
2. shape-greedy auto-match — leaves of the flax tree (alphabetical order)
   claim the first unused TF variable of identical shape (TF names sorted);
   ambiguities are reported so a human can confirm or override via mode 1.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np

__all__ = [
    "read_tf1_variables",
    "auto_match",
    "import_params",
]


def _tf_reader(ckpt_path: str):
    try:
        import tensorflow as tf  # noqa: PLC0415 — heavyweight, lazy on purpose
    except ImportError as e:  # pragma: no cover - exercised only without TF
        raise ImportError(
            "importing TF1 checkpoints requires the tensorflow package "
            "(only the CheckpointReader is used, no graph is built)") from e
    return tf.train.load_checkpoint(ckpt_path)


def read_tf1_variables(ckpt_path: str,
                       exclude_optimizer: bool = True) -> dict[str, np.ndarray]:
    """All variables of a TF1 Saver checkpoint as ``{name: ndarray}``.

    ``exclude_optimizer`` drops Adam/Momentum slot variables (``.../Adam``,
    ``.../Adam_1``, …) and step counters — the reference's checkpoints carry
    them but inference import only wants model weights.
    """
    reader = _tf_reader(ckpt_path)
    out: dict[str, np.ndarray] = {}
    for name in sorted(reader.get_variable_to_shape_map()):
        base = name.split("/")[-1]
        if exclude_optimizer and (
                base.startswith(("Adam", "Momentum", "RMSProp"))
                or name in ("global_step", "beta1_power", "beta2_power")
                or base in ("beta1_power", "beta2_power")):
            continue
        out[name] = np.asarray(reader.get_tensor(name))
    return out


def _path_key(path) -> str:
    """Slash-joined key for one tree path, ``params`` root collapsed — the
    ONE key-derivation used everywhere in this module (a second copy once
    drifted on GetAttrKey handling and broke reconstruction)."""
    keys = []
    for k in path:
        part = getattr(k, "key", getattr(k, "idx", getattr(k, "name", None)))
        if part is not None:
            keys.append(str(part))
    if keys and keys[0] == "params":
        keys = keys[1:]
    return "/".join(keys)


def _flat_params(params: Any) -> list[tuple[str, np.ndarray]]:
    """Flax tree → [(slash-joined key path, leaf)] in tree (alphabetical)
    order, with the framework-noise ``params`` root collapsed."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [(_path_key(path), np.asarray(leaf)) for path, leaf in flat]


def auto_match(tf_vars: Mapping[str, np.ndarray], params: Any
               ) -> tuple[dict[str, str], list[str]]:
    """Shape-greedy matching: flax leaf → TF variable name.

    Returns ``(mapping, ambiguous)`` where ``ambiguous`` lists flax keys that
    had more than one unused same-shape candidate (matched to the first in
    sorted-name order — deterministic, but worth human review). Raises
    ``ValueError`` naming every unmatched flax leaf, with the closest TF
    shapes, when the checkpoint cannot cover the template.
    """
    unused = dict(tf_vars)
    mapping: dict[str, str] = {}
    ambiguous: list[str] = []
    missing: list[str] = []
    for key, leaf in _flat_params(params):
        # sorted: the documented 'first in sorted-name order' tie-break must
        # not depend on the caller's dict insertion order
        cands = sorted(n for n, v in unused.items() if v.shape == leaf.shape)
        if not cands:
            missing.append(f"{key} {leaf.shape}")
            continue
        if len(cands) > 1:
            ambiguous.append(key)
        mapping[key] = cands[0]
        del unused[cands[0]]
    if missing:
        avail = ", ".join(f"{n}{tuple(v.shape)}" for n, v in
                          sorted(tf_vars.items()))
        raise ValueError(
            "no same-shape TF variable for flax leaves: "
            + "; ".join(missing) + f". Checkpoint offers: {avail}")
    return mapping, ambiguous


def import_params(tf_vars: Mapping[str, np.ndarray], params_template: Any,
                  name_map: Mapping[str, str] | None = None,
                  dtype: Any = np.float32
                  ) -> tuple[Any, dict[str, str], list[str]]:
    """Build a flax param tree from TF1 variables.

    ``name_map`` (flax slash-path → TF name) overrides auto-matching for the
    keys it covers; remaining leaves are auto-matched against the TF
    variables not claimed by the map. Shapes are verified leaf-by-leaf.
    Returns ``(params, mapping_used, ambiguous)`` — ``ambiguous`` is the
    auto-matcher's multi-candidate list for the mapping actually used (so
    callers report it without re-running the match).
    """
    name_map = dict(name_map or {})
    flat = _flat_params(params_template)
    template_keys = {k for k, _ in flat}
    stale = sorted(set(name_map) - template_keys)
    if stale:
        # an unvalidated map entry would silently withhold its TF variable
        # from auto-matching while the real leaf grabs a different one —
        # wrong weights with no error, in the tool built for parity
        raise KeyError(
            f"name_map keys not in the param template: {stale}. "
            f"Template keys: {sorted(template_keys)}")
    for key, leaf in flat:
        if key in name_map:
            tf_name = name_map[key]
            if tf_name not in tf_vars:
                raise KeyError(f"name_map sends {key!r} to {tf_name!r}, "
                               "which is not in the checkpoint")
            if tuple(tf_vars[tf_name].shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch for {key}: flax {tuple(leaf.shape)} vs "
                    f"TF {tf_name} {tuple(tf_vars[tf_name].shape)}")
    mapped_tf = set(name_map.values())
    rest_template_keys = [k for k, _ in flat if k not in name_map]
    ambiguous: list[str] = []
    if rest_template_keys:
        sub_tf = {n: v for n, v in tf_vars.items() if n not in mapped_tf}
        # rebuild a sub-template containing only unmapped leaves
        leaves = {k: v for k, v in flat}
        sub = {k: leaves[k] for k in rest_template_keys}
        auto, ambiguous = auto_match(sub_tf, sub)
        name_map.update(auto)

    arrays = {key: np.asarray(tf_vars[name_map[key]], dtype=dtype)
              for key, _ in flat}
    flat_paths = jax.tree_util.tree_flatten_with_path(params_template)
    new_leaves = [arrays[_path_key(path)].astype(leaf.dtype)
                  for path, leaf in flat_paths[0]]
    return (jax.tree_util.tree_unflatten(flat_paths[1], new_leaves),
            name_map, ambiguous)
