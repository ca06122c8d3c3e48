"""Tests for interpolation, semi-Lagrangian warp, resampling, and
velocity-aware augmentation (SURVEY.md §4(2)/(3))."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from mpgan_tpu.ops import augment, interp, resample, warp


# ---------------------------------------------------------------- interp

def test_bilinear_matches_scipy():
    rng = np.random.default_rng(0)
    img = rng.random((17, 13, 2), dtype=np.float32)
    coords = rng.uniform(-1, 18, size=(50, 2)).astype(np.float32)  # incl. OOB
    got = np.asarray(interp.bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    for c in range(2):
        want = ndi.map_coordinates(img[..., c], coords.T, order=1, mode="nearest")
        np.testing.assert_allclose(got[:, c], want, rtol=1e-5, atol=1e-5)


def test_trilinear_matches_scipy():
    rng = np.random.default_rng(1)
    vol = rng.random((9, 8, 7, 1), dtype=np.float32)
    coords = rng.uniform(0, 8, size=(40, 3)).astype(np.float32)
    got = np.asarray(interp.trilinear_sample(jnp.asarray(vol), jnp.asarray(coords)))
    want = ndi.map_coordinates(vol[..., 0], coords.T, order=1, mode="nearest")
    np.testing.assert_allclose(got[:, 0], want, rtol=1e-5, atol=1e-5)


def test_sample_at_integer_coords_is_exact():
    rng = np.random.default_rng(2)
    img = rng.random((6, 5, 3), dtype=np.float32)
    cc = interp.grid_coords_2d(6, 5)
    got = np.asarray(interp.bilinear_sample(jnp.asarray(img), cc))
    np.testing.assert_allclose(got, img, atol=1e-6)


# ---------------------------------------------------------------- warp

def test_advect_2d_constant_velocity_translates():
    """Advecting by constant v shifts the field by v·dt (interior cells)."""
    rng = np.random.default_rng(3)
    f = rng.random((32, 32, 1), dtype=np.float32)
    v = np.zeros((32, 32, 2), dtype=np.float32)
    v[..., 0] = 3.0  # vx
    v[..., 1] = -2.0  # vy
    out = np.asarray(warp.advect_2d(jnp.asarray(f), jnp.asarray(v), dt=1.0))
    # out[y, x] = f[y + 2, x - 3]
    np.testing.assert_allclose(out[2:-2, 4:-4, 0], f[4:-0 or None, 1:-7, 0][0:28], atol=1e-5)


def test_advect_2d_matches_scipy_on_random_field():
    rng = np.random.default_rng(4)
    f = rng.random((24, 20, 1), dtype=np.float32)
    v = rng.standard_normal((24, 20, 2)).astype(np.float32) * 2.0
    dt = 0.7
    out = np.asarray(warp.advect_2d(jnp.asarray(f), jnp.asarray(v), dt=dt))
    yy, xx = np.meshgrid(np.arange(24), np.arange(20), indexing="ij")
    cy = yy - dt * v[..., 1]
    cx = xx - dt * v[..., 0]
    want = ndi.map_coordinates(f[..., 0], [cy, cx], order=1, mode="nearest")
    np.testing.assert_allclose(out[..., 0], want, rtol=1e-4, atol=1e-4)


def test_advect_3d_matches_scipy():
    rng = np.random.default_rng(5)
    f = rng.random((10, 12, 11, 1), dtype=np.float32)
    v = rng.standard_normal((10, 12, 11, 3)).astype(np.float32)
    out = np.asarray(warp.advect_3d(jnp.asarray(f), jnp.asarray(v), dt=1.0))
    zz, yy, xx = np.meshgrid(np.arange(10), np.arange(12), np.arange(11), indexing="ij")
    want = ndi.map_coordinates(
        f[..., 0], [zz - v[..., 2], yy - v[..., 1], xx - v[..., 0]],
        order=1, mode="nearest")
    np.testing.assert_allclose(out[..., 0], want, rtol=1e-4, atol=1e-4)


def test_maccormack_zero_velocity_is_identity():
    rng = np.random.default_rng(6)
    f = rng.random((16, 16, 1), dtype=np.float32)
    v = np.zeros((16, 16, 2), dtype=np.float32)
    out = np.asarray(warp.advect_2d_maccormack(jnp.asarray(f), jnp.asarray(v)))
    np.testing.assert_allclose(out, f, atol=1e-6)


def test_maccormack_bounded_by_local_extrema():
    rng = np.random.default_rng(7)
    f = rng.random((20, 20, 1), dtype=np.float32)
    v = rng.standard_normal((20, 20, 2)).astype(np.float32) * 3.0
    out = np.asarray(warp.advect_2d_maccormack(jnp.asarray(f), jnp.asarray(v)))
    assert out.min() >= f.min() - 1e-5 and out.max() <= f.max() + 1e-5


# ---------------------------------------------------------------- resample

def test_upsample_nearest_shapes_and_values():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = resample.upsample_nearest_2d(x, 2)
    assert up.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(up[0, :2, :2, 0]), 0.0)


def test_downsample_then_constant_preserved():
    vol = jnp.full((8, 8, 8, 1), 3.5)
    lr = resample.downsample_3d(vol, 4)
    assert lr.shape == (2, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(lr), 3.5, rtol=1e-5)


def test_downsample_factor1_is_identity():
    """factor=1 must be a no-op (not a σ=0.5 blur): datagen upRes 1 promises
    density_low == the solver's own fields (the 1024³ demo's input path).
    An explicit blur_sigma still blurs."""
    rng = np.random.default_rng(11)
    vol = jnp.asarray(rng.random((6, 7, 5, 2), dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(resample.downsample_3d(vol, 1)),
                                  np.asarray(vol))
    np.testing.assert_array_equal(
        np.asarray(resample.downsample_axis(vol, 1, axis=0)), np.asarray(vol))
    blurred = resample.downsample_axis(vol, 1, axis=1, blur_sigma=1.0)
    assert not np.array_equal(np.asarray(blurred), np.asarray(vol))


def test_downsample_mass_conservation():
    """Box-averaging after blur preserves the mean (blur edge effects small)."""
    rng = np.random.default_rng(8)
    vol = jnp.asarray(rng.random((16, 16, 16, 1), dtype=np.float32))
    lr = resample.downsample_3d(vol, 4)
    assert abs(float(lr.mean()) - float(vol.mean())) < 0.02


def test_upsample_z_only():
    vol = jnp.asarray(np.random.default_rng(9).random((4, 6, 5, 2), dtype=np.float32))
    up = resample.upsample_nearest_z(vol, 4)
    assert up.shape == (16, 6, 5, 2)
    np.testing.assert_allclose(np.asarray(up[0]), np.asarray(up[3]))


# ---------------------------------------------------------------- augment

def _make_frames(h=64, w=64, s=4, seed=0):
    rng = np.random.default_rng(seed)
    lr = rng.random((h, w, 4), dtype=np.float32)          # [d, vx, vy, vz]
    hr = rng.random((h * s, w * s, 1), dtype=np.float32)  # density only
    return jnp.asarray(lr), jnp.asarray(hr)


def test_identity_transform_is_exact_crop():
    lr, hr = _make_frames()
    a, ainv = augment.identity_transform()
    center = jnp.array([17.0, 23.0])
    lrp, hrp = augment.extract_pair(lr, hr, center, a, ainv,
                                    tile_lr=8, up_res=4, n_vel=3)
    # integer-aligned center for even tile → offsets are half-integers; check
    # against direct bilinear: corner pixel equals average of neighbors.
    want = np.asarray(interp.bilinear_sample(lr, interp.grid_coords_2d(8, 8) +
                                             (center - 3.5)))
    np.testing.assert_allclose(np.asarray(lrp), want, atol=1e-5)
    assert hrp.shape == (32, 32, 1)


def test_rotation_invariance_of_solid_body_velocity():
    """A solid-body rotation field must look identical after any in-plane
    rotation augmentation (A⁻¹·W·A = W for W commuting with rotations)."""
    h = w = 65
    cy = cx = 32.0
    omega = 0.1
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    vx = -omega * (yy - cy)
    vy = omega * (xx - cx)
    lr = jnp.asarray(np.stack([np.zeros_like(vx), vx, vy], axis=-1))
    hr = jnp.zeros((h * 2, w * 2, 1))

    for theta in (0.3, np.pi / 2, 2.1):
        c, s = np.cos(theta), np.sin(theta)
        a = jnp.asarray(np.array([[c, -s], [s, c]], dtype=np.float32))
        ainv = jnp.asarray(np.array([[c, s], [-s, c]], dtype=np.float32))
        lrp, _ = augment.extract_pair(lr, hr, jnp.array([cy, cx]), a, ainv,
                                      tile_lr=16, up_res=2, n_vel=2)
        off = np.arange(16, dtype=np.float32) - 7.5
        py, px = np.meshgrid(off, off, indexing="ij")
        np.testing.assert_allclose(np.asarray(lrp[..., 1]), -omega * py, atol=1e-4)
        np.testing.assert_allclose(np.asarray(lrp[..., 2]), omega * px, atol=1e-4)


def test_flip_x_negates_vx_and_mirrors_content():
    lr, hr = _make_frames()
    a = jnp.asarray(np.diag([1.0, -1.0]).astype(np.float32))   # flip x
    ainv = a
    center = jnp.array([30.0, 30.0])
    flipped, _ = augment.extract_pair(lr, hr, center, a, ainv,
                                      tile_lr=8, up_res=4, n_vel=3)
    ident, _ = augment.extract_pair(lr, hr, center, *augment.identity_transform(),
                                    tile_lr=8, up_res=4, n_vel=3)
    np.testing.assert_allclose(np.asarray(flipped[..., 0]),
                               np.asarray(ident[..., ::-1, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(flipped[..., 1]),
                               -np.asarray(ident[..., ::-1, 1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(flipped[..., 2]),
                               np.asarray(ident[..., ::-1, 2]), atol=1e-5)


def test_scale_magnifies_velocity():
    """Zoom-in (σ<1) multiplies velocities by 1/σ."""
    h = w = 64
    lr = jnp.asarray(np.tile(np.array([0.0, 2.0, -1.0], np.float32), (h, w, 1)))
    hr = jnp.zeros((h * 2, w * 2, 1))
    sigma = 0.5
    a = jnp.asarray((np.eye(2) * sigma).astype(np.float32))
    ainv = jnp.asarray((np.eye(2) / sigma).astype(np.float32))
    p, _ = augment.extract_pair(lr, hr, jnp.array([32.0, 32.0]), a, ainv,
                                tile_lr=8, up_res=2, n_vel=2)
    np.testing.assert_allclose(np.asarray(p[..., 1]), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p[..., 2]), -2.0, atol=1e-5)


def test_sample_transform_shapes_and_inverse():
    key = jax.random.PRNGKey(0)
    a, ainv = augment.sample_transform(key, augment.ROT_FULL, 0.85, 1.15)
    np.testing.assert_allclose(np.asarray(a @ ainv), np.eye(2), atol=1e-5)


def test_transforms_compose_under_vmap():
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    a, ainv = jax.vmap(lambda k: augment.sample_transform(
        k, augment.ROT_FULL, 0.9, 1.1))(keys)
    assert a.shape == (8, 2, 2)
    prod = np.asarray(jnp.einsum("bij,bjk->bik", a, ainv))
    np.testing.assert_allclose(prod, np.tile(np.eye(2), (8, 1, 1)), atol=1e-5)


# ------------------------------------------------------- layout-safe upsample
# ops/upsample.py: the generator's per-stage 2x upsample, rewritten from
# jax.image.resize to elementwise + major-dim interleave (the resize's
# dot_general lowering cost 39% of pass-2 inference in relayout copies —
# .profiles/pass2/per_op_breakdown.json). These pin exact parity with resize.

from mpgan_tpu.ops.upsample import linear_up2, upsample_2d

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("n", [1, 2, 3, 16, 33])
@pytest.mark.parametrize("axis", [1, 2])
def test_linear_up2_matches_image_resize(n, axis):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, n, 5, 3)) if axis == 1
                    else rng.standard_normal((2, 5, n, 3)), jnp.float32)
    got = linear_up2(x, axis)
    shape = list(x.shape)
    shape[axis] *= 2
    want = jax.image.resize(x, shape, "linear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", ["interleave", "conv_dw", "conv_dense"])
@pytest.mark.parametrize("fh,fw", [(2, 2), (2, 1), (1, 2)])
def test_upsample_2d_matches_image_resize(fh, fw, mode):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 9, 7, 2)), jnp.float32)
    got = upsample_2d(x, fh, fw, mode=mode)
    want = jax.image.resize(x, (4, 9 * fh, 7 * fw, 2), "linear")
    # (2,2) applies the two axes sequentially; bilinear is separable, so the
    # composition equals the joint resize exactly (up to fp association)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["interleave", "conv_dw", "conv_dense"])
def test_generator_output_unchanged_by_upsample_mode(mode):
    # same params, same input: every lowering must reproduce the resize-based
    # generator to fp tolerance (checkpoint compatibility)
    from mpgan_tpu.models import generator as G
    g_fast = G.Generator(factors=((2, 2), (2, 1)), base_filters=16,
                         upsample_mode=mode)
    g_ref = G.Generator(factors=((2, 2), (2, 1)), base_filters=16,
                        upsample_mode="resize")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)),
                    jnp.float32)
    p = g_fast.init(jax.random.PRNGKey(0), x)
    out_fast = g_fast.apply(p, x)
    out_ref = g_ref.apply(p, x)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    # and under fade (the other _upsample call site)
    of = g_fast.apply(p, x, stage=2, alpha=0.3, fade=True)
    orf = g_ref.apply(p, x, stage=2, alpha=0.3, fade=True)
    np.testing.assert_allclose(np.asarray(of), np.asarray(orf),
                               rtol=2e-5, atol=2e-5)


def test_linear_up_conv_one_shot_matches_resize():
    """One-shot s× conv upsample (generator global skip) == jax.image.resize
    for every factor the model uses, incl. anisotropic combinations."""
    from mpgan_tpu.ops.upsample import linear_up_conv, upsample_any
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 12, 10, 4).astype(np.float32))
    for s in (2, 4, 8):
        for axis in (1, 2):
            shape = list(x.shape)
            shape[axis] *= s
            ref = jax.image.resize(x, shape, "linear")
            got = linear_up_conv(x, axis, s)
            assert float(jnp.max(jnp.abs(got - ref))) < 1e-5, (s, axis)
    for fh, fw in ((4, 4), (8, 8), (8, 1), (4, 1), (1, 4)):
        ref = jax.image.resize(x, (3, 12 * fh, 10 * fw, 4), "linear")
        got = upsample_any(x, fh, fw)
        assert float(jnp.max(jnp.abs(got - ref))) < 1e-5, (fh, fw)
