"""Pallas warp kernel tests (interpret mode on CPU; hardware-validated
separately on the real chip — SURVEY.md §4(3))."""

import numpy as np
import jax
import jax.numpy as jnp

from mpgan_tpu.ops import warp, warp_pallas


def _data(B=4, H=32, W=32, vscale=1.5, seed=0):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.random((B, H, W, 1), dtype=np.float32))
    v = jnp.asarray((rng.standard_normal((B, H, W, 2)) * vscale).astype(np.float32))
    return f, v


def test_matches_xla_in_range():
    f, v = _data(vscale=1.5)
    out = warp_pallas.advect_2d_pallas(f, v, 1.0, interpret=True)
    ref = jax.vmap(warp.advect_2d, in_axes=(0, 0, None))(f, v, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_matches_clamped_reference_out_of_range():
    f, v = _data(vscale=6.0, seed=1)
    out = warp_pallas.advect_2d_pallas(f, v, 1.0, interpret=True)
    ref = warp_pallas._clamped_xla_reference(f, v, 1.0, warp_pallas.DEFAULT_MAX_DISP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_negative_dt():
    f, v = _data(seed=2)
    out = warp_pallas.advect_2d_pallas(f, v, -1.0, interpret=True)
    ref = jax.vmap(warp.advect_2d, in_axes=(0, 0, None))(f, v, -1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_zero_velocity_identity():
    f, _ = _data(seed=3)
    v = jnp.zeros((4, 32, 32, 2))
    out = warp_pallas.advect_2d_pallas(f, v, 1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-6)


def test_custom_vjp_matches_reference_grads():
    f, v = _data(B=2, H=16, W=16, vscale=1.0, seed=4)

    def loss_fast(f, v):
        return jnp.sum(warp_pallas.advect_2d_fast(f, v, 1.0) ** 2)

    def loss_ref(f, v):
        return jnp.sum(warp_pallas._clamped_xla_reference(
            f, v, 1.0, warp_pallas.DEFAULT_MAX_DISP) ** 2)

    # interpret path: monkey-run via interpret since no TPU in tests
    import functools
    orig = warp_pallas.advect_2d_pallas
    warp_pallas_interp = functools.partial(orig, interpret=True)
    try:
        warp_pallas.advect_2d_pallas = warp_pallas_interp
        gf = jax.grad(loss_fast, argnums=(0, 1))(f, v)
    finally:
        warp_pallas.advect_2d_pallas = orig
    gr = jax.grad(loss_ref, argnums=(0, 1))(f, v)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]), atol=1e-4)
