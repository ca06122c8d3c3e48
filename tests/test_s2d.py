"""s2d conv transform: exactness vs direct lax.conv (ops/s2d.py)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from mpgan_tpu.ops import s2d

pytestmark = pytest.mark.quick


def _conv3(x, w, b=None):
    y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y if b is None else y + b


def test_aligned_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 8, 12, 3), dtype=np.float32))
    assert jnp.array_equal(s2d.from_aligned(s2d.to_aligned(x)), x)


def test_shifted_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 8, 12, 3), dtype=np.float32))
    xs = s2d.to_shifted(x)
    assert xs.shape == (2, 5, 7, 12)
    assert jnp.array_equal(s2d.from_shifted(xs), x)
    # halo is exactly zero
    assert float(jnp.abs(xs * (1 - s2d.halo_mask(5, 7, 12))).max()) == 0.0


@pytest.mark.parametrize("ci,co", [(4, 4), (8, 16), (16, 8)])
def test_conv_s2a_matches_direct(ci, co):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32))
    ref = _conv3(x, w)
    got = s2d.from_aligned(s2d.conv_s2a(s2d.to_shifted(x), s2d.w3_to_s2a(w)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ci,co", [(4, 4), (8, 16)])
def test_conv_a2s_matches_direct(ci, co):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, ci)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype(np.float32))
    ref = _conv3(x, w)
    hb1, wb1 = 16 // 2 + 1, 24 // 2 + 1
    out_s = s2d.conv_a2s(s2d.to_aligned(x), s2d.w3_to_a2s(w))
    out_s = out_s * s2d.halo_mask(hb1, wb1, 4 * co)
    got = s2d.from_shifted(out_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _ref_resblock(x, p):
    h = jax.nn.relu(_conv3(x, p["conv1"]["kernel"], p["conv1"]["bias"]))
    h = _conv3(h, p["conv2"]["kernel"], p["conv2"]["bias"])
    if "proj" in p:
        x = lax.conv_general_dilated(
            x, p["proj"]["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["proj"]["bias"]
    return jax.nn.relu(x + h)


def _rand_resblock(rng, ci, c):
    p = {
        "conv1": {"kernel": rng.standard_normal((3, 3, ci, c)).astype(np.float32) * 0.3,
                  "bias": rng.standard_normal(c).astype(np.float32) * 0.1},
        "conv2": {"kernel": rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.3,
                  "bias": rng.standard_normal(c).astype(np.float32) * 0.1},
    }
    if ci != c:
        p["proj"] = {"kernel": rng.standard_normal((1, 1, ci, c)).astype(np.float32) * 0.3,
                     "bias": rng.standard_normal(c).astype(np.float32) * 0.1}
    return p


def test_resblock_chain_matches_model_blocks():
    """Two chained residual blocks (16->8 with proj, then 8->8) in block
    space equal the pixel-space reference."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 16)).astype(np.float32))
    p0 = _rand_resblock(rng, 16, 8)
    p1 = _rand_resblock(rng, 8, 8)
    ref = _ref_resblock(_ref_resblock(x, p0), p1)
    blocks = [s2d.resblock_params_s2d(p0), s2d.resblock_params_s2d(p1)]
    got = s2d.from_shifted(s2d.resblock_chain_xla(s2d.to_shifted(x), blocks))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
