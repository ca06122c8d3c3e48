"""Volumetric quality metrics beyond PSNR.

SSIM (Wang et al. 2004) generalized to 3D volumes: local means/variances/
covariance are computed with a separable gaussian window (the GAN-SR
literature's convention: size 11, sigma 1.5) applied along each volume axis
as three 1-D convolutions, and the SSIM map is averaged over the VALID
region (no padding bias at volume borders). The reference's evaluation
tooling reports PSNR only (SURVEY.md §4); SSIM is additive here because
adversarially-trained outputs trade PSNR for structure — the thing SSIM
measures.

For 2D datasets (Z == 1) — or any axis shorter than the window — the window
shrinks along that axis to the largest odd size that fits, so the same
function scores 2D slices and 3D volumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * jnp.square(x / sigma))
    return k / jnp.sum(k)


def _blur_valid(vol: jnp.ndarray, kernels: tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """Separable VALID filtering of a (Z, Y, X) volume, one 1-D kernel per
    axis (kernel size 1 = identity on that axis)."""
    out = vol[None, ..., None]  # NDHWC
    for axis, k in enumerate(kernels):
        if k.shape[0] == 1:
            continue
        shape = [1, 1, 1]
        shape[axis] = k.shape[0]
        rhs = k.reshape(*shape, 1, 1)
        out = jax.lax.conv_general_dilated(
            out, rhs, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=jax.lax.Precision.HIGHEST)
    return out[0, ..., 0]


def ssim_volume(fake, real, peak: float = 1.0, win_size: int = 11,
                sigma: float = 1.5) -> float:
    """Mean SSIM between two (Z, Y, X[, 1]) volumes.

    ``peak`` is the data range (smoke densities live in [0, 1] here). Axes
    shorter than ``win_size`` use the largest odd window that fits (1 = that
    axis unfiltered), so 2D data (Z == 1) degrades to plain 2D SSIM.
    """
    a = jnp.asarray(np.asarray(fake), jnp.float32).reshape(
        np.asarray(fake).shape[:3])
    b = jnp.asarray(np.asarray(real), jnp.float32).reshape(
        np.asarray(real).shape[:3])
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    kernels = tuple(
        _gaussian_kernel(min(win_size, d if d % 2 else d - 1), sigma)
        for d in a.shape)
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    mu_a = _blur_valid(a, kernels)
    mu_b = _blur_valid(b, kernels)
    # E[x²]−E[x]² under the same window (gaussian-weighted moments)
    var_a = _blur_valid(a * a, kernels) - mu_a * mu_a
    var_b = _blur_valid(b * b, kernels) - mu_b * mu_b
    cov = _blur_valid(a * b, kernels) - mu_a * mu_b
    ssim_map = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2))
    return float(jnp.mean(ssim_map))
