"""Model tests: shapes per stage/pass, growth subtree property, fade blending
(SURVEY.md §2.7–2.9, §4(4))."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from mpgan_tpu.models import discriminator as D
from mpgan_tpu.models import generator as G
from mpgan_tpu.models import growing

pytestmark = pytest.mark.quick


def test_pass1_generator_shapes_all_stages():
    gen = G.make_pass1(stages=3, base_filters=16)
    x = jnp.zeros((2, 8, 8, 4))
    params = gen.init(jax.random.PRNGKey(0), x, stage=3)
    for stage, f in ((1, 2), (2, 4), (3, 8)):
        y = gen.apply(params, x, stage=stage)
        assert y.shape == (2, 8 * f, 8 * f, 1), (stage, y.shape)


def test_pass2_generator_upsamples_h_only():
    gen = G.make_pass2(stages=2, base_filters=16)
    x = jnp.zeros((2, 8, 32, 4))  # (z=8 LR, x=32 already HR)
    params = gen.init(jax.random.PRNGKey(0), x, stage=2)
    y = gen.apply(params, x, stage=2)
    assert y.shape == (2, 32, 32, 1)


def test_generator_stage_params_are_nested():
    gen = G.make_pass1(stages=3, base_filters=16)
    x = jnp.zeros((1, 8, 8, 4))
    p1 = gen.init(jax.random.PRNGKey(0), x, stage=1)
    p2 = gen.init(jax.random.PRNGKey(0), x, stage=2)
    p3 = gen.init(jax.random.PRNGKey(0), x, stage=3)
    assert growing.subtree_check(p1, p2)
    assert growing.subtree_check(p2, p3)
    assert not growing.subtree_check(p3, p1)


def test_generator_fade_alpha0_matches_previous_stage_upsampled():
    """At α=0 the grown net must output exactly the previous stage's output,
    linearly upsampled — the ProGAN fade-in continuity property."""
    gen = G.make_pass1(stages=2, base_filters=16)
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 4), np.float32))
    p2 = gen.init(jax.random.PRNGKey(1), x, stage=2)
    y1 = gen.apply(p2, x, stage=1)  # (2, 16, 16, 1), uses only stage-1 params
    y2_fade0 = gen.apply(p2, x, stage=2, alpha=0.0, fade=True)
    b, h, w, c = y1.shape
    # y1 contains the global skip; the fade path upsamples the *pre-skip*
    # head output, so compare after removing both skips
    skip1 = jax.image.resize(x[..., 0:1], (b, h, w, c), "linear")
    skip2 = jax.image.resize(x[..., 0:1], (b, h * 2, w * 2, c), "linear")
    want = jax.image.resize(y1 - skip1, (b, h * 2, w * 2, c), "linear") + skip2
    np.testing.assert_allclose(np.asarray(y2_fade0), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_bf16_out_dtype_is_value_identical():
    """out_dtype=bf16 on a bf16 model must be a pure storage-width change:
    every value is already bf16-rounded before the output cast, so the f32
    view of the bf16 output equals the default f32 output bit-for-bit
    (VERDICT r2 weak #1 — the inference path is HBM-bytes-bound)."""
    x = jnp.asarray(np.random.default_rng(5).random((2, 8, 8, 4), np.float32))
    g_f32out = G.make_pass1(stages=2, base_filters=16, dtype=jnp.bfloat16)
    g_bf16out = G.make_pass1(stages=2, base_filters=16, dtype=jnp.bfloat16,
                             out_dtype=jnp.bfloat16)
    p = g_f32out.init(jax.random.PRNGKey(2), x)  # out_dtype is not a param
    y32 = g_f32out.apply(p, x)
    y16 = g_bf16out.apply(p, x)
    assert y32.dtype == jnp.float32 and y16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(y32),
                                  np.asarray(y16).astype(np.float32))


def test_migrate_params_carries_weights():
    gen = G.make_pass1(stages=2, base_filters=16)
    x = jnp.zeros((1, 8, 8, 4))
    p1 = gen.init(jax.random.PRNGKey(0), x, stage=1)
    p2 = gen.init(jax.random.PRNGKey(7), x, stage=2)
    merged = growing.migrate_params(p1, p2)
    stem_old = p1["params"]["stem"]["kernel"]
    stem_new = merged["params"]["stem"]["kernel"]
    np.testing.assert_array_equal(np.asarray(stem_old), np.asarray(stem_new))
    # stage-2-only params still come from p2
    assert "block_1_0" in merged["params"]


def test_migrate_params_strict_rejects_non_nested():
    gen = G.make_pass1(stages=2, base_filters=16)
    x = jnp.zeros((1, 8, 8, 4))
    p2 = gen.init(jax.random.PRNGKey(0), x, stage=2)
    p1 = gen.init(jax.random.PRNGKey(0), x, stage=1)
    try:
        growing.migrate_params(p2, p1)  # backwards: must fail
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_discriminator_logits_and_features():
    ds = D.make_spatial(stages=2, base_filters=16)
    x = jnp.zeros((3, 32, 32, 5))  # 4 LR channels upsampled + 1 HR density
    params = ds.init(jax.random.PRNGKey(0), x, stage=2)
    logits, feats = ds.apply(params, x, stage=2, return_features=True)
    assert logits.shape == (3, 1)
    assert len(feats) == 4  # 2 per stage
    assert all(f.shape[0] == 3 for f in feats)


def test_discriminator_stage_shapes():
    ds = D.make_spatial(stages=3, base_filters=16)
    p3 = ds.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)), stage=3)
    # stage 1 scores 16×16 inputs, stage 2 scores 32×32, stage 3 64×64
    for stage, res in ((1, 16), (2, 32), (3, 64)):
        out = ds.apply(p3, jnp.zeros((2, res, res, 5)), stage=stage)
        assert out.shape == (2, 1)


def test_discriminator_growth_nested():
    ds = D.make_spatial(stages=2, base_filters=16)
    p1 = ds.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 5)), stage=1)
    p2 = ds.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 5)), stage=2)
    # trunk params nest; the Dense head differs in fan-in across stages, so
    # exclude it (it is re-initialized at each growth step, as in ProGAN)
    t1 = {k: v for k, v in p1["params"].items() if k != "out"}
    t2 = {k: v for k, v in p2["params"].items() if k != "out"}
    assert growing.subtree_check({"params": t1}, {"params": t2})


def test_condition_ds_input_shape():
    lr = jnp.zeros((2, 8, 8, 4))
    hr = jnp.zeros((2, 32, 32, 1))
    x = D.condition_ds_input(lr, hr, 4, 4)
    assert x.shape == (2, 32, 32, 5)


def test_growth_schedule():
    sch = growing.GrowthSchedule(n_stages=3, alpha_iters=100, stable_iters=100)
    assert sch.stage_at(0) == (1, 1.0)
    assert sch.stage_at(199) == (1, 1.0)
    s, a = sch.stage_at(250)
    assert s == 2 and abs(a - 0.5) < 1e-6
    assert sch.stage_at(399) == (2, 1.0)
    s, a = sch.stage_at(400)
    assert s == 3 and a == 0.0
    assert sch.stage_at(10_000) == (3, 1.0)
    assert sch.boundaries() == [200, 400]


def test_remat_generator_matches_plain():
    """remat=True must be numerically identical (same params, same output)."""
    x = jnp.asarray(np.random.default_rng(4).random((2, 8, 8, 4), np.float32))
    g_plain = G.make_pass1(stages=1, base_filters=16)
    g_remat = G.make_pass1(stages=1, base_filters=16, remat=True)
    p = g_plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(g_plain.apply(p, x)), np.asarray(g_remat.apply(p, x)),
        atol=1e-6)
    # gradients flow through the remat path
    g = jax.grad(lambda p: jnp.sum(g_remat.apply(p, x) ** 2))(p)
    assert np.isfinite(np.asarray(g["params"]["stem"]["kernel"])).all()


def test_disc_fade_alpha0_matches_previous_stage():
    """ProGAN fade continuity for the DISCRIMINATOR: at α=0 the grown D must
    score exactly like the previous-stage D on the downsampled input — the
    newly added (randomly initialized) stage block must be fully gated out.
    (The generator-side twin of this property is pinned above; a regression
    here destabilizes training at every growth boundary.)"""
    import mpgan_tpu.models.discriminator as D
    dsc = D.make_spatial(stages=2, base_filters=16)
    x = jnp.asarray(np.random.default_rng(3).random((2, 16, 16, 5), np.float32))
    p2 = dsc.init(jax.random.PRNGKey(2), x, stage=2)
    logits_fade0 = dsc.apply(p2, x, stage=2, alpha=0.0, fade=True)
    x_down = jax.image.resize(x, (2, 8, 8, 5), method="linear")
    logits_prev = dsc.apply(p2, x_down, stage=1)
    np.testing.assert_allclose(np.asarray(logits_fade0),
                               np.asarray(logits_prev), rtol=1e-4, atol=1e-5)
