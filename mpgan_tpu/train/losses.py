"""GAN losses + temporal alignment (SURVEY.md §2.8/§2.10, tempoGAN eq. 5-7).

Total generator loss:
    L_G = λ_adv·SCE(Ds(cond, G(x)), 1) + λ_t·SCE(Dt(aligned G-triplet), 1)
        + λ_L1·‖G(x) − y‖₁ + λ_f·Σ_j ‖F_j(real) − F_j(fake)‖²

Discriminators train with sigmoid cross-entropy real→1 / fake→0 (the
reference's loss family). SURVEY.md §2.8's verify-note asks whether the
reference offers WGAN-GP/LSGAN variants for growing stability; with the mount
empty that cannot be confirmed, so the rebuild provides the full family as
selectable modes (``ganLoss sce|lsgan|hinge|wgan``) plus ProGAN-style R1 and
WGAN-GP gradient penalties (``r1Gamma`` / ``gpWeight``) — the stabilizers the
progressive-growing literature pairs with these losses.

Temporal alignment (tempoGAN §3.2): neighbors are advected to the center
frame's time with the center frame's velocity — A(y_{t−1}; +v), y_t,
A(y_{t+1}; −v) — via the semi-Lagrangian warp, with velocity upsampled to HR
pixels and rescaled by the SR factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpgan_tpu.ops.warp import advect_2d_batch


def bce_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    """Mean sigmoid cross-entropy against a constant target (0 or 1)."""
    t = jnp.full_like(logits, target)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray,
           label_smooth: float = 0.0, mode: str = "sce") -> jnp.ndarray:
    """Discriminator adversarial loss.

    mode="sce" (reference default): sigmoid CE with one-sided label smoothing
    (real → 1−ε), which tempers discriminator overconfidence (observed: Dt
    collapse at scale). "lsgan": least-squares (Mao et al. 2017). "hinge":
    geometric hinge (SAGAN/BigGAN family). "wgan": Wasserstein critic —
    pair with ``gradient_penalty`` for the Lipschitz constraint.
    """
    if mode == "sce":
        return (bce_logits(real_logits, 1.0 - label_smooth)
                + bce_logits(fake_logits, 0.0))
    if mode == "lsgan":
        return 0.5 * (jnp.mean((real_logits - (1.0 - label_smooth)) ** 2)
                      + jnp.mean(fake_logits ** 2))
    if mode in ("hinge", "wgan"):
        if label_smooth:
            raise ValueError(
                f"labelSmooth {label_smooth} has no effect with ganLoss "
                f"{mode!r} (only sce/lsgan use smoothed targets); refusing "
                f"to silently ignore it")
        if mode == "hinge":
            return (jnp.mean(jax.nn.relu(1.0 - real_logits))
                    + jnp.mean(jax.nn.relu(1.0 + fake_logits)))
        return jnp.mean(fake_logits) - jnp.mean(real_logits)
    raise ValueError(f"unknown ganLoss mode: {mode!r}")


def g_adv_loss(fake_logits: jnp.ndarray, mode: str = "sce") -> jnp.ndarray:
    if mode == "sce":
        return bce_logits(fake_logits, 1.0)
    if mode == "lsgan":
        return 0.5 * jnp.mean((fake_logits - 1.0) ** 2)
    if mode in ("hinge", "wgan"):
        return -jnp.mean(fake_logits)
    raise ValueError(f"unknown ganLoss mode: {mode!r}")


def r1_penalty(disc_fn, real_in: jnp.ndarray) -> jnp.ndarray:
    """R1 regularizer (Mescheder et al. 2018): E[‖∇_x D(x_real)‖²].

    The caller scales by γ/2. ``disc_fn(x) -> logits``; the gradient is taken
    of the summed logits w.r.t. the (real) input batch, in float32.
    """
    x = real_in.astype(jnp.float32)
    grads = jax.grad(lambda xi: jnp.sum(disc_fn(xi)))(x)
    return jnp.mean(jnp.sum(grads ** 2, axis=tuple(range(1, grads.ndim))))


def gradient_penalty(disc_fn, real_in: jnp.ndarray, fake_in: jnp.ndarray,
                     key: jax.Array) -> jnp.ndarray:
    """WGAN-GP (Gulrajani et al. 2017): E[(‖∇_x̂ D(x̂)‖ − 1)²] on random
    interpolates x̂ between real and fake batches."""
    eps = jax.random.uniform(key, (real_in.shape[0],) + (1,) * (real_in.ndim - 1))
    x_hat = (eps * real_in + (1.0 - eps) * fake_in).astype(jnp.float32)
    grads = jax.grad(lambda xi: jnp.sum(disc_fn(xi)))(x_hat)
    norms = jnp.sqrt(
        jnp.sum(grads ** 2, axis=tuple(range(1, grads.ndim))) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def l1_loss(fake: jnp.ndarray, real: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(fake - real))


def feature_loss(feats_real: list[jnp.ndarray],
                 feats_fake: list[jnp.ndarray]) -> jnp.ndarray:
    """Ds feature-space L2 (tempoGAN §3.3)."""
    total = 0.0
    for fr, ff in zip(feats_real, feats_fake):
        total = total + jnp.mean((fr - ff) ** 2)
    return total


def align_triplet(prev: jnp.ndarray, cur: jnp.ndarray, nxt: jnp.ndarray,
                  vel_hr: jnp.ndarray, use_pallas: bool = False,
                  max_disp: int = 8) -> jnp.ndarray:
    """Advect neighbors to the center time; stack as channels for Dt.

    prev/cur/nxt: (B, H, W, 1) densities; vel_hr: (B, H, W, 2) in HR pixel
    units, channels (v_w, v_h). Returns (B, H, W, 3).

    ``use_pallas``: route the warp through the Pallas roll-and-select kernel
    (5× faster than the XLA gather on v5e; displacement clamped to
    ±max_disp px — choose max_disp ≥ the dataset's max per-frame HR motion).
    """
    if use_pallas:
        from mpgan_tpu.ops.warp_pallas import advect_2d_fast
        warped_prev = advect_2d_fast(prev, vel_hr, 1.0, max_disp)
        warped_next = advect_2d_fast(nxt, vel_hr, -1.0, max_disp)
    else:
        warped_prev = advect_2d_batch(prev, vel_hr, 1.0)
        warped_next = advect_2d_batch(nxt, vel_hr, -1.0)
    return jnp.concatenate([warped_prev, cur, warped_next], axis=-1)


def psnr(fake: jnp.ndarray, real: jnp.ndarray, peak: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((fake - real) ** 2)
    return 10.0 * jnp.log10(peak ** 2 / jnp.maximum(mse, 1e-12))
