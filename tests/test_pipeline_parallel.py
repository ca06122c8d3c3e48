"""Pipeline-parallel inference (SURVEY.md §2.14 PP row): stage-split meshes
must produce exactly the volumes the single-mesh path produces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpgan_tpu.infer import assemble, pipeline
from mpgan_tpu.models import generator as G


@pytest.fixture(scope="module")
def gens():
    g1 = G.make_pass1(2, base_filters=8, n_res_blocks=1)
    g2 = G.make_pass2(2, base_filters=8, n_res_blocks=1)
    g3 = G.make_pass3(base_filters=8, n_res_blocks=1)
    p1 = g1.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)))
    p2 = g2.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 32, 4)))
    p3 = g3.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 4)))
    return g1, p1, g2, p2, g3, p3


def _frames(n, key=3):
    ks = jax.random.split(jax.random.PRNGKey(key), n)
    return [jax.random.uniform(k, (8, 8, 8, 4)) for k in ks]


def test_default_split_proportional():
    assert pipeline.default_split(8, 2, 4) == (2, 6)
    assert pipeline.default_split(8, 3, 4) == (1, 3, 4)
    assert pipeline.default_split(2, 2, 8) == (1, 1)
    assert sum(pipeline.default_split(7, 3, 2)) == 7
    with pytest.raises(ValueError):
        pipeline.default_split(1, 2, 4)


def test_two_stage_matches_single_mesh(gens):
    g1, p1, g2, p2, _, _ = gens
    pp = pipeline.InferencePipeline(g1, p1, g2, p2, up_res=4)
    assert pp.split == (2, 6)
    frames = _frames(3)
    ref = [assemble.upscale_volume(g1, p1, g2, p2, f, 4) for f in frames]
    outs = list(pp.stream(frames))
    assert len(outs) == 3
    for got, want in zip(outs, ref):
        assert got.shape == want.shape == (32, 32, 32, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_three_stage_with_pass3(gens):
    g1, p1, g2, p2, g3, p3 = gens
    pp = pipeline.InferencePipeline(g1, p1, g2, p2, up_res=4,
                                    gen3=g3, params3=p3)
    assert pp.n_stages == 3 and sum(pp.split) == 8
    frame = _frames(1, key=7)[0]
    want = assemble.upscale_volume(g1, p1, g2, p2, frame, 4,
                                   gen3=g3, params3=p3)
    got = np.asarray(pp.submit(frame))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_explicit_split_and_chunking(gens):
    g1, p1, g2, p2, _, _ = gens
    pp = pipeline.InferencePipeline(g1, p1, g2, p2, up_res=4, split=(4, 4),
                                    chunk=8)
    frame = _frames(1, key=11)[0]
    want = assemble.upscale_volume(g1, p1, g2, p2, frame, 4)
    np.testing.assert_allclose(np.asarray(pp.submit(frame)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_stream_preserves_order(gens):
    g1, p1, g2, p2, _, _ = gens
    pp = pipeline.InferencePipeline(g1, p1, g2, p2, up_res=4)
    frames = _frames(5, key=13)
    outs = [float(jnp.sum(o)) for o in pp.stream(frames, depth=2)]
    want = [float(jnp.sum(assemble.upscale_volume(g1, p1, g2, p2, f, 4)))
            for f in frames]
    np.testing.assert_allclose(outs, want, rtol=1e-5)


def test_rejects_bad_configs(gens):
    g1, p1, g2, p2, _, _ = gens
    with pytest.raises(ValueError):
        pipeline.InferencePipeline(g1, p1, None, None, up_res=4)
    with pytest.raises(ValueError):
        pipeline.InferencePipeline(g1, p1, g2, p2, up_res=4, split=(8, 2))
    with pytest.raises(ValueError):
        pipeline.InferencePipeline(g1, p1, g2, p2, up_res=4, split=(2, 2, 4))
