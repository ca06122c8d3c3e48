"""Up/downsampling ops.

- Nearest/linear upsampling of slices (generator pre-upsample, tempoGAN-style).
- Gaussian-blur + stride downsampling for LR training-data generation
  (mantaflow's downsample = blur + interpolate; SURVEY.md §2.12).

All ops are pure jnp and jit/vmap-friendly with static factors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def upsample_nearest_2d(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(..., H, W, C) → (..., H·f, W·f, C) nearest-neighbor."""
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)


def upsample_linear_2d(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(..., H, W, C) → (..., H·f, W·f, C) bilinear (half-pixel centers,
    TF2/`jax.image` 'linear' semantics, i.e. align_corners=False)."""
    *lead, h, w, c = x.shape
    return jax.image.resize(x, (*lead, h * factor, w * factor, c), method="linear")


def upsample_nearest_z(vol: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(Z, Y, X, C) → (Z·f, Y, X, C): second-pass z-axis pre-upsample."""
    return jnp.repeat(vol, factor, axis=0)


def _gauss_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur_nd(x: jnp.ndarray, sigma: float, axes: tuple[int, ...]) -> jnp.ndarray:
    """Separable Gaussian blur along ``axes`` with edge-replicate padding."""
    radius = max(1, int(np.ceil(3.0 * sigma)))
    k = jnp.asarray(_gauss_kernel1d(sigma, radius), dtype=x.dtype)
    for ax in axes:
        x = _conv1d_along(x, k, ax, radius)
    return x


def _conv1d_along(x: jnp.ndarray, k: jnp.ndarray, axis: int, radius: int) -> jnp.ndarray:
    axis = axis % x.ndim
    xm = jnp.moveaxis(x, axis, -1)
    lead = xm.shape[:-1]
    n = xm.shape[-1]
    flat = xm.reshape(-1, 1, n)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (radius, radius)), mode="edge")
    out = jax.lax.conv_general_dilated(
        flat, k.reshape(1, 1, -1),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        # full f32 accumulation — TPU default would demote to bf16, which
        # visibly biases the blur (and therefore LR training data)
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.moveaxis(out.reshape(*lead, n), -1, axis)


def downsample_axis(vol: jnp.ndarray, factor: int, axis: int,
                    blur_sigma: float | None = None) -> jnp.ndarray:
    """Blur + box-average along a single axis (e.g. z-only downsampling of HR
    volumes to build the pass-1 intermediate ground truth, SURVEY.md §2.7).

    This is THE blur/box-average implementation; the 2D/3D variants below
    are per-axis compositions (separable blur and per-axis box means act on
    distinct axes, so they commute).

    ``factor=1`` is the identity (unless an explicit ``blur_sigma`` asks
    for a pure blur): datagen with ``upRes 1`` must write LR fields equal
    to the solver's own — the 1024³ demo feeds those to an 8× model — and
    the default σ=factor/2 would silently smear them."""
    if factor == 1 and blur_sigma is None:
        return vol
    if blur_sigma is None:
        blur_sigma = factor / 2.0
    vol = gaussian_blur_nd(vol, blur_sigma, axes=(axis,))
    axis = axis % vol.ndim
    shape = vol.shape
    new = shape[:axis] + (shape[axis] // factor, factor) + shape[axis + 1:]
    return vol.reshape(new).mean(axis=axis + 1)


def downsample_3d(vol: jnp.ndarray, factor: int, blur_sigma: float | None = None) -> jnp.ndarray:
    """(Z, Y, X, C) → (Z/f, Y/f, X/f, C): Gaussian blur then box-average.

    Mirrors mantaflow-style HR→LR downsampling used to build training pairs.
    """
    for ax in (0, 1, 2):
        vol = downsample_axis(vol, factor, ax, blur_sigma)
    return vol


def downsample_2d(img: jnp.ndarray, factor: int, blur_sigma: float | None = None) -> jnp.ndarray:
    """(H, W, C) → (H/f, W/f, C): Gaussian blur then box-average."""
    for ax in (0, 1):
        img = downsample_axis(img, factor, ax, blur_sigma)
    return img
