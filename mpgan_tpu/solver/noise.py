"""Multi-octave value noise — stand-in for mantaflow's wavelet noise used to
seed smoke inflow variety (SURVEY.md §2.12)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def value_noise_3d(key: jax.Array, shape: tuple[int, int, int],
                   base_res: int = 4, octaves: int = 3,
                   persistence: float = 0.5) -> jnp.ndarray:
    """Smooth noise in [0, 1], shape (Z, Y, X)."""
    z, y, x = shape
    out = jnp.zeros(shape, jnp.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        key, sub = jax.random.split(key)
        r = base_res * (2 ** o)
        coarse = jax.random.uniform(sub, (min(r, z), min(r, y), min(r, x)))
        fine = jax.image.resize(coarse, shape, method="linear")
        out = out + amp * fine
        total += amp
        amp *= persistence
    return out / total


def time_varying_inflow(key: jax.Array, mask: jnp.ndarray, t: int,
                        base_res: int = 4, strength: float = 1.0) -> jnp.ndarray:
    """(Z,Y,X,1) noise-modulated inflow density for frame ``t``.

    A fresh key per frame keeps the plume from being a steady column, like
    the reference's time-animated wavelet noise source.
    """
    z, y, x, _ = mask.shape
    n = value_noise_3d(jax.random.fold_in(key, t), (z, y, x), base_res=base_res)
    n = 0.5 + 0.5 * n  # keep the source dense
    return (strength * n)[..., None] * mask
