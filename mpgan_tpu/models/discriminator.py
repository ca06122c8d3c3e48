"""Spatial (Ds) and temporal (Dt) discriminators (SURVEY.md §2.8).

Ds is *conditional*: it scores an HR density patch given the LR input
(upsampled and channel-concatenated, tempoGAN §3.1). Dt is *unconditional*:
it scores a stack of three advection-aligned HR density frames as channels
(tempoGAN §3.2). Both share a growing conv trunk mirrored from the generator
(ProGAN-style): stage-k inputs enter at resolution t·2^k through a per-stage
``from_in`` head; during fade-in the newest head's features are blended with
the previous head applied to a 2×-downsampled input.

Ds also exposes intermediate feature maps for the feature-space loss
(tempoGAN §3.3, λ_f): ``apply(..., return_features=True)``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _downsample(x: jnp.ndarray, fh: int, fw: int) -> jnp.ndarray:
    if fh == 1 and fw == 1:
        return x
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h // fh, w // fw, c), method="linear")


class Discriminator(nn.Module):
    """Growing conv discriminator → (B, 1) logits.

    factors: per-stage (fh, fw) *downsample* factors, outermost stage first —
    use the same tuple as the paired generator.
    """
    factors: Sequence[tuple[int, int]] = ((2, 2), (2, 2))
    base_filters: int = 32
    max_filters: int = 256
    min_filters: int = 8
    dtype: jnp.dtype = jnp.float32

    def _stage_filters(self, k: int) -> int:
        # stage k (0 = innermost/LR-side) gets wider filters
        return min(max(self.base_filters // (2 ** k), self.min_filters),
                   self.max_filters)

    @nn.compact
    def __call__(self, x, stage: int | None = None, alpha=1.0,
                 fade: bool = False, return_features: bool = False):
        n_stages = len(self.factors)
        if stage is None:
            stage = n_stages
        assert 1 <= stage <= n_stages
        x = x.astype(self.dtype)
        feats = []

        # every stage gets an input head (applied to the input downsampled to
        # that stage's resolution); unused ones are DCE'd by XLA, but creating
        # them unconditionally keeps the param tree stage-complete for growth
        from_in = []
        x_k = x
        for k in range(stage - 1, -1, -1):
            # entry at stage k feeds down_k, whose trunk input comes from
            # conv_{k+1} with stage_filters(k+1) channels — match that width
            h_k = nn.Conv(self._stage_filters(k + 1), (3, 3), dtype=self.dtype,
                          name=f"from_in_{k}")(x_k)
            from_in.append(nn.leaky_relu(h_k, 0.2))
            x_k = _downsample(x_k, *self.factors[k])
        from_in = from_in[::-1]  # index by stage k

        h = from_in[stage - 1]
        for k in range(stage - 1, -1, -1):
            fh, fw = self.factors[k]
            h = nn.Conv(self._stage_filters(k), (3, 3), strides=(fh, fw),
                        dtype=self.dtype, name=f"down_{k}")(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
            h = nn.Conv(self._stage_filters(k), (3, 3), dtype=self.dtype,
                        name=f"conv_{k}")(h)
            h = nn.leaky_relu(h, 0.2)
            if k == stage - 1 and stage > 1 and fade:
                # ProGAN fade: blend AFTER the newest stage's whole block so
                # that at alpha=0 the net is exactly the previous-stage D
                # (from_in[k-1] feeds down_{k-1} directly); blending before
                # conv_{k} would route the old path through the freshly-
                # initialized conv at full weight — a score discontinuity at
                # every growth boundary (widths match: both stage_filters(k))
                h = alpha * h + (1.0 - alpha) * from_in[k - 1]
            feats.append(h)

        h = h.reshape(h.shape[0], -1)
        logits = nn.Dense(1, dtype=self.dtype, name="out")(h)
        logits = logits.astype(jnp.float32)
        if return_features:
            return logits, [f.astype(jnp.float32) for f in feats]
        return logits


def make_spatial(stages: int, base_filters: int = 32,
                 factors: Sequence[tuple[int, int]] | None = None,
                 dtype=jnp.float32) -> Discriminator:
    """Ds: conditional — caller concatenates [upsampled LR channels, HR patch]."""
    if factors is None:
        factors = tuple((2, 2) for _ in range(stages))
    return Discriminator(factors=tuple(factors), base_filters=base_filters,
                         dtype=dtype)


def make_temporal(stages: int, base_filters: int = 32,
                  factors: Sequence[tuple[int, int]] | None = None,
                  dtype=jnp.float32) -> Discriminator:
    """Dt: unconditional — caller stacks 3 aligned HR density frames as channels."""
    if factors is None:
        factors = tuple((2, 2) for _ in range(stages))
    return Discriminator(factors=tuple(factors), base_filters=base_filters,
                         dtype=dtype)


def condition_ds_input(lr: jnp.ndarray, hr: jnp.ndarray,
                       fh: int, fw: int) -> jnp.ndarray:
    """Build Ds input: upsample LR channels to HR res, concat the HR patch."""
    b, h, w, c = lr.shape
    lr_up = jax.image.resize(lr, (b, h * fh, w * fw, c), method="linear")
    return jnp.concatenate([lr_up, hr], axis=-1)
