"""Growing slice generator — pass-1 (xy) and pass-2 (z-refinement) networks.

One architecture serves both passes (SURVEY.md §2.7): a stem conv on the input
slice, then per growth stage an upsample (per-axis factors) followed by
residual conv blocks, with a per-stage output head ("to-density"). Progressive
growing follows ProGAN semantics (SURVEY.md §2.9): when stage k fades in, the
output is ``α·head_k(x_k) + (1−α)·upsample(head_{k−1}(x_{k−1}))``.

- Pass 1: factors (2, 2) per stage → 2×/4×/8× isotropic in-plane SR.
- Pass 2: factors (2, 1) per stage → z-axis-only refinement (the h axis of an
  xz slice is z; the x axis is already HR).

An optional global skip adds the (bi)linearly-upsampled input density, so the
convs learn the residual detail (stabilizes training and PSNR).

Parameter trees are growth-monotone: the stage-k tree is a strict subtree of
the stage-(k+1) tree (module names are stage-indexed), so growing is a pure
param-dict merge (see mpgan_tpu.models.growing).

Reference parity: tempoGAN-style generator stack (reference builds it in
GAN.py + driver; file:line unavailable — mount empty at survey time).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mpgan_tpu.ops.upsample import upsample_2d, upsample_any


def _upsample(x: jnp.ndarray, fh: int, fw: int, method: str = "linear",
              mode: str = "resize") -> jnp.ndarray:
    b, h, w, c = x.shape
    if fh == 1 and fw == 1:
        return x
    if mode != "resize" and method == "linear":
        # layout-preserving exact conv paths (ops/upsample.py): same linear
        # weights as jax.image.resize, but avoid its dot_general lowering,
        # whose layout island costs 39% of pass-2 inference in relayout
        # copies (.profiles/pass2/per_op_breakdown.json) and whose tile
        # padding OOMs the 2048³ streamed path (linear_up_conv docstring)
        if fh in (1, 2) and fw in (1, 2):
            return upsample_2d(x, fh, fw, mode=mode)
        if fh in (1, 2, 4, 8) and fw in (1, 2, 4, 8):
            # one-shot larger factors (the global skip): single dilated conv
            return upsample_any(x, fh, fw)
    return jax.image.resize(x, (b, h * fh, w * fw, c), method=method)


class ResBlock(nn.Module):
    """Two 3×3 convs with a residual connection (tempoGAN-style blocks)."""
    filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.filters, (3, 3), dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.filters, (3, 3), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.filters:
            x = nn.Conv(self.filters, (1, 1), dtype=self.dtype, name="proj")(x)
        return nn.relu(x + h)


class Generator(nn.Module):
    """Stage-parameterized SR generator over a batch of slices.

    Call: ``(B, H, W, C_in) → (B, H·Πfh, W·Πfw, out_channels)`` for the
    first ``stage`` stages.

    Attributes:
      factors: per-stage (fh, fw) upsample factors, e.g. ((2,2),(2,2)) for 4×
      base_filters: stem width; stage k uses max(base//2^k, min_filters)
      n_res_blocks: residual blocks per stage
      global_skip: add upsampled input density (channel 0) to the output
    """
    factors: Sequence[tuple[int, int]] = ((2, 2), (2, 2))
    base_filters: int = 32
    min_filters: int = 8
    n_res_blocks: int = 2
    out_channels: int = 1
    global_skip: bool = True
    dtype: jnp.dtype = jnp.float32
    # output dtype; None → float32 (training default: losses/PSNR accumulate
    # in f32). Inference sets out_dtype=dtype so a bf16 model RETURNS bf16:
    # the full-resolution volume is the largest array on the HBM-bandwidth-
    # bound inference path (BASELINE.md roofline), and the values are already
    # bf16-rounded before the cast (every op above runs in self.dtype), so
    # skipping the f32 widening is value-identical at half the bytes.
    out_dtype: jnp.dtype | None = None
    # rematerialize residual blocks (jax.checkpoint): trades FLOPs for HBM —
    # needed when training large slices (8×/512³, SURVEY.md §7(e))
    remat: bool = False
    # per-stage upsample lowering (ops/upsample.py; all numerically equal):
    # "resize" = jax.image.resize; "conv_dw"/"conv_dense"/"interleave" =
    # layout-preserving rewrites that avoid the resize dot_general's relayout
    # copies. Default picked by the real-chip A/B (scripts/bench_upsample_ab,
    # r4): conv_dense — pass-2 inference 23.7 -> 14.2 ms/frame (1.67x),
    # pass-1 5.96 -> 5.48 ms; interleave LOSES (materialized concats, 2.2x
    # bytes) and conv_dw trails conv_dense slightly (VPU vs MXU path)
    upsample_mode: str = "conv_dense"
    # global-skip lowering, separate knob: at the bench's 4x shapes the
    # one-shot resize is ~2% FASTER than the dilated-conv form (measured r5:
    # 8.71e8 vs 8.53e8 vox/s), so "resize" stays the default — but at large
    # slice planes with small chunks the resize/dot_general (and the C=1
    # conv-output layout it feeds) tile-pads catastrophically, so the
    # host-streamed beyond-HBM path constructs generators with
    # skip_mode="conv_dense" (ops/upsample.linear_up_conv docstring)
    skip_mode: str = "resize"

    def _stage_filters(self, k: int) -> int:
        return max(self.base_filters // (2 ** k), self.min_filters)

    @nn.compact
    def __call__(self, x, stage: int | None = None, alpha=1.0,
                 fade: bool = False):
        """stage: number of active growth stages (default: all, static);
        fade: enable fade-in blending (static — selects the program);
        alpha: fade-in weight of the newest stage (may be a traced scalar)."""
        n_stages = len(self.factors)
        if stage is None:
            stage = n_stages
        assert 1 <= stage <= n_stages, f"stage {stage} not in [1, {n_stages}]"
        x = x.astype(self.dtype)
        dens_in = x[..., 0:1]

        h = nn.Conv(self.base_filters, (3, 3), dtype=self.dtype, name="stem")(x)
        h = nn.relu(h)

        # every stage gets a head; unused head outputs are DCE'd by XLA, but
        # creating them unconditionally keeps the param tree stage-complete
        # (stage-k tree ⊂ stage-(k+1) tree, required for growth merging)
        heads = []
        block_cls = nn.remat(ResBlock) if self.remat else ResBlock
        for k in range(stage):
            fh, fw = self.factors[k]
            h = _upsample(h, fh, fw, mode=self.upsample_mode)
            for i in range(self.n_res_blocks):
                h = block_cls(self._stage_filters(k + 1), dtype=self.dtype,
                              name=f"block_{k}_{i}")(h)
            heads.append(nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                                 name=f"head_{k}")(h))

        out = heads[stage - 1]
        if stage > 1 and fade:
            out = alpha * out + (1.0 - alpha) * _upsample(
                heads[stage - 2], *self.factors[stage - 1],
                mode=self.upsample_mode)

        if self.global_skip:
            fh = 1
            fw = 1
            for (a, b) in self.factors[:stage]:
                fh *= a
                fw *= b
            out = out + _upsample(dens_in, fh, fw,
                                  mode=self.skip_mode).astype(self.dtype)
        return out.astype(self.out_dtype or jnp.float32)


def make_pass1(stages: int, base_filters: int = 32, n_res_blocks: int = 2,
               dtype=jnp.float32, remat: bool = False,
               out_dtype=None, skip_mode: str = "resize") -> Generator:
    """Pass-1 generator: isotropic in-plane 2× per stage (2^stages total)."""
    return Generator(factors=tuple((2, 2) for _ in range(stages)),
                     base_filters=base_filters, n_res_blocks=n_res_blocks,
                     dtype=dtype, remat=remat, out_dtype=out_dtype,
                     skip_mode=skip_mode)


def make_pass2(stages: int, base_filters: int = 32, n_res_blocks: int = 2,
               dtype=jnp.float32, remat: bool = False,
               out_dtype=None, skip_mode: str = "resize") -> Generator:
    """Pass-2 generator: z-only (h-axis) 2× per stage; w axis already HR."""
    return Generator(factors=tuple((2, 1) for _ in range(stages)),
                     base_filters=base_filters, n_res_blocks=n_res_blocks,
                     dtype=dtype, remat=remat, out_dtype=out_dtype,
                     skip_mode=skip_mode)


def make_pass3(base_filters: int = 32, n_res_blocks: int = 2,
               dtype=jnp.float32, remat: bool = False,
               out_dtype=None) -> Generator:
    """Optional pass-3 refiner: constant resolution (factors (1,1)) over yz
    slices of the full-res volume (SURVEY.md §2.7 'multi-pass')."""
    return Generator(factors=((1, 1),), base_filters=base_filters,
                     n_res_blocks=n_res_blocks, dtype=dtype, remat=remat,
                     out_dtype=out_dtype)
