"""Inference/assembly + checkpoint tests (SURVEY.md §3.3, §5)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpgan_tpu.infer import assemble
from mpgan_tpu.models import generator as G
from mpgan_tpu.parallel import mesh as pmesh
from mpgan_tpu.train import checkpoint as ckpt
from mpgan_tpu.train.loop import TrainState


def _gens(stages=1, seed=0):
    g1 = G.make_pass1(stages, base_filters=8, n_res_blocks=1)
    g2 = G.make_pass2(stages, base_filters=8, n_res_blocks=1)
    p1 = g1.init(jax.random.PRNGKey(seed), jnp.zeros((1, 8, 8, 4)))
    p2 = g2.init(jax.random.PRNGKey(seed + 1), jnp.zeros((1, 8, 16, 4)))
    return g1, p1, g2, p2


def test_two_pass_volume_shapes():
    g1, p1, g2, p2 = _gens(stages=1)
    lr = jnp.asarray(np.random.default_rng(0).random((6, 8, 10, 4), np.float32))
    out = assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=2)
    assert out.shape == (12, 16, 20, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_pass1_only_mode():
    g1, p1, _, _ = _gens(stages=1)
    lr = jnp.zeros((4, 8, 8, 4))
    out = assemble.upscale_volume(g1, p1, None, None, lr, up_res=2)
    assert out.shape == (8, 16, 16, 1)


def test_chunked_equals_unchunked():
    g1, p1, g2, p2 = _gens(stages=1)
    lr = jnp.asarray(np.random.default_rng(1).random((8, 8, 8, 4), np.float32))
    a = assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=2, chunk=0)
    b = assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=2, chunk=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_inference_matches_single_device():
    g1, p1, g2, p2 = _gens(stages=1)
    lr = jnp.asarray(np.random.default_rng(2).random((6, 8, 8, 4), np.float32))
    a = assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=2)
    mesh = pmesh.make_mesh()
    b = assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=2, mesh=mesh)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_jitted_upscaler():
    g1, p1, g2, p2 = _gens(stages=1)
    up = assemble.make_jitted_upscaler(g1, p1, g2, p2, up_res=2)
    lr = jnp.zeros((4, 8, 8, 4))
    out = up(lr)
    assert out.shape == (8, 16, 16, 1)


def test_jitted_upscaler_with_mesh_matches_single_device():
    """Jitted inference over the mesh: params created on one device must be
    replicated internally — committed single-device args would conflict with
    the in-jit mesh constraints (regression: the eager sharded test above
    never caught this)."""
    g1, p1, g2, p2 = _gens(stages=1)
    lr = jnp.asarray(np.random.default_rng(7).random((6, 8, 8, 4), np.float32))
    a = assemble.make_jitted_upscaler(g1, p1, g2, p2, up_res=2)(lr)
    mesh = pmesh.make_mesh()
    b = assemble.make_jitted_upscaler(g1, p1, g2, p2, up_res=2, mesh=mesh)(lr)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_identity_like_volume_content():
    """With the global skip, an untrained G ≈ upsampled input: the output
    must correlate strongly with the linearly-upsampled LR density."""
    g1, p1, g2, p2 = _gens(stages=1)
    rng = np.random.default_rng(3)
    lr = jnp.asarray(rng.random((6, 8, 8, 4), np.float32))
    out = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=2))
    ref = np.asarray(jax.image.resize(lr[..., 0:1], (12, 16, 16, 1), "linear"))
    cc = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert cc > 0.5, cc


# ------------------------------------------------------------- checkpoints

def test_checkpoint_roundtrip(tmp_path):
    g1, p1, _, _ = _gens(stages=1)
    state = TrainState(params_g=p1, opt_g={"m": jnp.ones((3,))},
                       params_ds={"params": {"w": jnp.zeros((2, 2))}},
                       opt_ds={}, params_dt={}, opt_dt={},
                       step=jnp.asarray(7, jnp.int32))
    run = ckpt.next_run_dir(str(tmp_path))
    ckpt.save(run, 0, state, {"stage": 1, "it": 7})
    template = jax.tree.map(jnp.zeros_like, state)
    back, meta = ckpt.restore(run, 0, template)
    assert meta["it"] == 7
    assert int(back.step) == 7
    np.testing.assert_array_equal(
        np.asarray(back.params_g["params"]["stem"]["kernel"]),
        np.asarray(p1["params"]["stem"]["kernel"]))


def test_gen_checkpoint_roundtrip(tmp_path):
    g1, p1, _, _ = _gens(stages=1)
    run = ckpt.next_run_dir(str(tmp_path))
    ckpt.save_gen(run, 3, p1)
    template = jax.tree.map(jnp.zeros_like, p1)
    back = ckpt.restore_gen(run, 3, template)
    np.testing.assert_array_equal(
        np.asarray(back["params"]["stem"]["kernel"]),
        np.asarray(p1["params"]["stem"]["kernel"]))


def test_run_dir_indexing(tmp_path):
    r0 = ckpt.next_run_dir(str(tmp_path))
    r1 = ckpt.next_run_dir(str(tmp_path))
    assert r0.endswith("test_0000") and r1.endswith("test_0001")
    assert ckpt.latest_model_no(r0) is None


def test_three_pass_volume_shapes():
    g1, p1, g2, p2 = _gens(stages=1)
    g3 = G.make_pass3(base_filters=8, n_res_blocks=1)
    p3 = g3.init(jax.random.PRNGKey(9), jnp.zeros((1, 16, 16, 4)))
    lr = jnp.asarray(np.random.default_rng(5).random((6, 8, 10, 4), np.float32))
    out = assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=2,
                                  gen3=g3, params3=p3)
    assert out.shape == (12, 16, 20, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_pass3_applies_without_pass2():
    """A loaded pass-3 refiner must run even in degenerate single-pass mode
    (gen2 absent): the z-upsample is nearest-repeat, then gen3 refines."""
    g1, p1, _, _ = _gens(stages=1)
    g3 = G.make_pass3(base_filters=8, n_res_blocks=1)
    p3 = g3.init(jax.random.PRNGKey(11), jnp.zeros((1, 16, 16, 4)))
    lr = jnp.asarray(np.random.default_rng(6).random((6, 8, 8, 4), np.float32))
    plain = assemble.upscale_volume(g1, p1, None, None, lr, up_res=2)
    with3 = assemble.upscale_volume(g1, p1, None, None, lr, up_res=2,
                                    gen3=g3, params3=p3)
    assert with3.shape == plain.shape == (12, 16, 16, 1)
    assert not np.allclose(np.asarray(with3), np.asarray(plain)), \
        "gen3 was silently dropped"


def _cfg_for_load(tmp_path, stages=2):
    from mpgan_tpu.config import (Config, DataConfig, LossConfig, ModelConfig,
                                  TrainConfig)
    return Config(
        data=DataConfig(tile_size_low=8, up_res=2 ** stages),
        model=ModelConfig(n_base_filters=8, n_res_blocks=1, stages=stages),
        loss=LossConfig(),
        train=TrainConfig(test_path=str(tmp_path)),
    )


def test_load_generator_mid_growth_and_newest_run(tmp_path):
    """A checkpoint saved mid-growth (sidecar stage < config stages) must
    load with a matching smaller architecture, and run_idx -1 must resolve
    the NEWEST test_%04d run (not format 'test_-001')."""
    import json

    from mpgan_tpu.infer.load import load_generator
    cfg = _cfg_for_load(tmp_path, stages=2)
    g_mid = G.make_pass1(1, base_filters=8, n_res_blocks=1)
    p_mid = g_mid.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))
    run = ckpt.next_run_dir(str(tmp_path))
    ckpt.save_gen(run, 0, p_mid)
    with open(ckpt.model_dir(run, 0) + ".json", "w") as f:
        json.dump({"stage": 1, "pass_no": 1}, f)
    gen, params = load_generator(cfg, 1, -1, -1)
    out = gen.apply(params, jnp.zeros((1, 8, 8, 4)))
    assert out.shape == (1, 16, 16, 1)  # 2x (saved stage), not the full 4x


def test_load_generator_no_runs_clear_error(tmp_path):
    import pytest

    from mpgan_tpu.infer.load import load_generator
    cfg = _cfg_for_load(tmp_path / "empty")
    with pytest.raises(FileNotFoundError, match="load_model_test"):
        load_generator(cfg, 1, -1, -1)


def test_read_uni_volume_mac_recenter(tmp_path):
    """read_uni_volume(mac_recenter=True) must recenter MAC-typed velocity
    grids exactly like the training loader, and leave density untouched."""
    from mpgan_tpu.infer.load import read_uni_volume
    from mpgan_tpu.io import uni
    rng = np.random.default_rng(4)
    vel = rng.random((6, 8, 8, 3), np.float32)
    vp = str(tmp_path / "velocity_low_0000.uni")
    uni.writeUni(vp, uni.make_header(vel, grid_type=uni.TYPE_MAC | uni.TYPE_VEC3),
                 vel)
    raw = read_uni_volume(vp)
    cen = read_uni_volume(vp, mac_recenter=True)
    np.testing.assert_allclose(cen, uni.recenter_mac(raw), atol=1e-6)
    assert not np.allclose(cen, raw)
    dens = rng.random((6, 8, 8, 1), np.float32)
    dp = str(tmp_path / "density_low_0000.uni")
    uni.writeUni(dp, uni.make_header(dens), dens)
    np.testing.assert_array_equal(read_uni_volume(dp, mac_recenter=True),
                                  read_uni_volume(dp))


def test_load_generator_vorticity_channels(tmp_path):
    """A model trained with useVorticities 1 has a 7-channel stem; the
    loader template must match or orbax restore fails on shape."""
    from mpgan_tpu.infer.load import load_generator
    cfg = _cfg_for_load(tmp_path, stages=1)
    cfg.data.use_vorticities = True
    g = G.make_pass1(1, base_filters=8, n_res_blocks=1)
    p = g.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 8, 7)))
    run = ckpt.next_run_dir(str(tmp_path))
    ckpt.save_gen(run, 0, p)
    gen, params = load_generator(cfg, 1, 0, 0)
    out = gen.apply(params, jnp.zeros((2, 8, 8, 7)))
    assert out.shape == (2, 16, 16, 1)


def test_streamed_assembly_matches_in_memory_path():
    """upscale_volume_streamed (host-streamed pass-2, the beyond-HBM-OUTPUT
    path) must equal upscale_volume exactly — including the per-chunk
    velocity windows computed via scale_and_translate, whose values must be
    bit-identical to the corresponding rows of the full jax.image.resize."""
    g1, p1, g2, p2 = _gens(stages=1)
    lr = jnp.asarray(np.random.default_rng(7).random((6, 8, 10, 4), np.float32))
    ref = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=2),
                     np.float32)
    for chunk in (4, 5, 16):  # divisor, non-divisor, > Ys
        got = assemble.upscale_volume_streamed(g1, p1, g2, p2, lr, up_res=2,
                                               chunk=chunk)
        np.testing.assert_allclose(got, ref, atol=2e-6, err_msg=f"chunk={chunk}")


def test_streamed_assembly_density_only():
    g1 = G.make_pass1(1, base_filters=8, n_res_blocks=1)
    g2 = G.make_pass2(1, base_filters=8, n_res_blocks=1)
    p1 = g1.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    p2 = g2.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 16, 1)))
    lr = jnp.asarray(np.random.default_rng(3).random((6, 8, 8, 1), np.float32))
    ref = np.asarray(assemble.upscale_volume(g1, p1, g2, p2, lr, up_res=2),
                     np.float32)
    got = assemble.upscale_volume_streamed(g1, p1, g2, p2, lr, up_res=2,
                                           chunk=4)
    np.testing.assert_allclose(got, ref, atol=2e-6)
