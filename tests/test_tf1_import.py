"""TF1 Saver-checkpoint import (SURVEY.md §5 checkpoint row: the
TF1-ckpt→JAX tool for reference-weight parity). The reference's variable
names are unknowable while the mount is empty, so these tests pin the
*mechanics*: V1-Saver bundles read correctly, shape-greedy auto-match is
deterministic, explicit name maps override, and mismatches fail loudly."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from mpgan_tpu.models import generator as G
from mpgan_tpu.utils import tf1_import

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Variable set mimicking a TF1-scoped tiny G1 (stages=2, filters=8,
# blocks=1, 4 input channels). Names sort in the same order as the flax
# tree's alphabetical leaf order so the auto-match assertion is exact.
TF1_VARS = {
    "gen/a_block0/c1/kernel": (3, 3, 8, 8),
    "gen/a_block0/c1/bias": (8,),
    "gen/a_block0/c2/kernel": (3, 3, 8, 8),
    "gen/a_block0/c2/bias": (8,),
    "gen/b_block1/c1/kernel": (3, 3, 8, 8),
    "gen/b_block1/c1/bias": (8,),
    "gen/b_block1/c2/kernel": (3, 3, 8, 8),
    "gen/b_block1/c2/bias": (8,),
    "gen/c_head0/kernel": (3, 3, 8, 1),
    "gen/c_head0/bias": (1,),
    "gen/c_head1/kernel": (3, 3, 8, 1),
    "gen/c_head1/bias": (1,),
    "gen/d_stem/kernel": (3, 3, 4, 8),
    "gen/d_stem/bias": (8,),
}


def _tf1_values():
    rng = np.random.default_rng(7)
    return {n: rng.normal(size=s).astype(np.float32)
            for n, s in TF1_VARS.items()}


@pytest.fixture(scope="module")
def tf1_ckpt(tmp_path_factory):
    """A genuine tf.compat.v1 Saver checkpoint (TensorBundle V2), including
    Adam slot variables that the importer must skip."""
    d = tmp_path_factory.mktemp("tf1")
    values = _tf1_values()
    g = tf.Graph()
    with g.as_default():
        tfv = tf.compat.v1
        for name, val in values.items():
            tfv.get_variable(name, initializer=val)
        tfv.get_variable("gen/d_stem/kernel/Adam",
                         initializer=np.zeros((3, 3, 4, 8), np.float32))
        tfv.get_variable("beta1_power", initializer=np.float32(0.9))
        saver = tfv.train.Saver()
        with tfv.Session() as sess:
            sess.run(tfv.global_variables_initializer())
            path = saver.save(sess, os.path.join(str(d), "model.ckpt"))
    return path, values


@pytest.fixture(scope="module")
def g1_template():
    gen = G.make_pass1(2, base_filters=8, n_res_blocks=1)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))
    return gen, params


def test_reader_excludes_optimizer_slots(tf1_ckpt):
    path, values = tf1_ckpt
    got = tf1_import.read_tf1_variables(path)
    assert set(got) == set(values)
    for n, v in values.items():
        np.testing.assert_array_equal(got[n], v)


def test_auto_match_is_deterministic_and_exact(tf1_ckpt, g1_template):
    path, values = tf1_ckpt
    _, params = g1_template
    tf_vars = tf1_import.read_tf1_variables(path)
    mapping, ambiguous = tf1_import.auto_match(tf_vars, params)
    # identical-shape kernels exist → ambiguity must be reported, not hidden
    assert "block_0_0/conv1/kernel" in ambiguous
    assert mapping["stem/kernel"] == "gen/d_stem/kernel"
    assert mapping["block_0_0/conv1/kernel"] == "gen/a_block0/c1/kernel"
    assert mapping["block_1_0/conv2/bias"] == "gen/b_block1/c2/bias"
    assert mapping["head_1/kernel"] == "gen/c_head1/kernel"


def test_import_runs_forward(tf1_ckpt, g1_template):
    path, values = tf1_ckpt
    gen, params = g1_template
    tf_vars = tf1_import.read_tf1_variables(path)
    imported, mapping, _ = tf1_import.import_params(tf_vars, params)
    np.testing.assert_array_equal(
        np.asarray(imported["params"]["stem"]["kernel"]),
        values["gen/d_stem/kernel"])
    out = gen.apply(imported, jnp.ones((1, 8, 8, 4)))
    assert out.shape == (1, 32, 32, 1) and np.isfinite(np.asarray(out)).all()


def test_name_map_overrides_auto(tf1_ckpt, g1_template):
    path, values = tf1_ckpt
    _, params = g1_template
    tf_vars = tf1_import.read_tf1_variables(path)
    # deliberately cross-wire the two heads
    nm = {"head_0/kernel": "gen/c_head1/kernel",
          "head_1/kernel": "gen/c_head0/kernel"}
    imported, mapping, _ = tf1_import.import_params(tf_vars, params, nm)
    np.testing.assert_array_equal(
        np.asarray(imported["params"]["head_0"]["kernel"]),
        values["gen/c_head1/kernel"])
    np.testing.assert_array_equal(
        np.asarray(imported["params"]["head_1"]["kernel"]),
        values["gen/c_head0/kernel"])
    assert mapping["head_0/kernel"] == "gen/c_head1/kernel"


def test_unmatchable_shapes_fail_loudly(tf1_ckpt):
    path, _ = tf1_ckpt
    tf_vars = tf1_import.read_tf1_variables(path)
    gen = G.make_pass1(2, base_filters=16, n_res_blocks=1)  # wrong width
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))
    with pytest.raises(ValueError, match="no same-shape TF variable"):
        tf1_import.auto_match(tf_vars, params)


def test_bad_name_map_entries_fail(tf1_ckpt, g1_template):
    path, _ = tf1_ckpt
    _, params = g1_template
    tf_vars = tf1_import.read_tf1_variables(path)
    with pytest.raises(KeyError):
        tf1_import.import_params(tf_vars, params,
                                 {"stem/kernel": "not/in/ckpt"})
    with pytest.raises(ValueError, match="shape mismatch"):
        tf1_import.import_params(tf_vars, params,
                                 {"stem/kernel": "gen/c_head0/kernel"})


def test_import_cli_roundtrip(tf1_ckpt, tmp_path):
    """scripts/import_tf1.py writes a run dir whose gen checkpoint the
    standard inference loader restores bit-exactly."""
    path, values = tf1_ckpt
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "import_tf1.py"),
         "ckpt", path, "genPass", "1", "testPath", f"{tmp_path}/runs/",
         "upRes", "4", "tileSizeLow", "8", "useVelocities", "1",
         "genFilters", "8", "genBlocks", "1"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "imported ->" in r.stdout

    from mpgan_tpu.train import checkpoint as ckpt
    gen = G.make_pass1(2, base_filters=8, n_res_blocks=1)
    template = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))
    run = os.path.join(str(tmp_path), "runs", "test_0000")
    restored = ckpt.restore_gen(run, 0, template)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["stem"]["kernel"]),
        values["gen/d_stem/kernel"])
    m = json.load(open(os.path.join(run, "tf1_import_map.json")))
    assert m["mapping"]["stem/kernel"] == "gen/d_stem/kernel"


def test_import_params_rejects_stale_name_map_keys():
    """A name_map key absent from the template must raise, not silently
    withhold its TF variable from auto-matching (wrong-weights hazard)."""
    import numpy as np
    import pytest
    from mpgan_tpu.utils.tf1_import import import_params
    template = {"params": {"stem": {"kernel": np.zeros((3, 3, 4, 8),
                                                       np.float32)}}}
    tf_vars = {"gen/c1/w": np.ones((3, 3, 4, 8), np.float32)}
    with pytest.raises(KeyError, match="not in the param template"):
        import_params(tf_vars, template,
                      name_map={"typo/conv1/kernel": "gen/c1/w"})


def test_auto_match_sorted_tiebreak_ignores_dict_order():
    """Same-shape ties must resolve in sorted-name order regardless of the
    caller's dict insertion order (documented determinism)."""
    import numpy as np
    from mpgan_tpu.utils.tf1_import import auto_match
    template = {"params": {"a": {"kernel": np.zeros((2, 2), np.float32)}}}
    for order in (("z/w", "a/w"), ("a/w", "z/w")):
        tf_vars = {n: np.ones((2, 2), np.float32) for n in order}
        mapping, ambiguous = auto_match(tf_vars, template)
        assert mapping["a/kernel"] == "a/w", (order, mapping)
        assert ambiguous == ["a/kernel"]
