"""Space-to-depth (s2d) convolution transform for small-channel SR convs.

The generator's 3x3 convs carry 8-32 channels; on the MXU (128x128 systolic
array) a direct NHWC conv contracts K = 9*C_in and emits N = C_out lanes, so
C_out=8..16 uses 6-12% of the lane dimension. Packing 2x2 pixel blocks into
channels ("space-to-depth", factor 2) turns an exact 3x3 conv into an exact
2x2 conv over 4x the channels: K = 16*C_in, N = 4*C_out — 4x better MXU
utilization for 16/9 the MACs.

PERF STATUS (measured on v5e, 2026-08, g2 bench shapes (256,128,256,16) and
(256,256,256,8)): a NEGATIVE result for the forward hot path. XLA's native
conv emitter runs the direct 3x3 chains at ~8.4-8.9 ms; the s2d chain (XLA
conv2x2 form below) takes ~14 ms — the 16/9 MAC overhead plus the
to_shifted/from_shifted repacking outweigh the lane-utilization gain — and a
fused Pallas kernel version (whole chain in VMEM, parity-alternating taps as
dot_generals) measured 24-40 ms: at these channel counts the per-tap VPU
shift copies and halo masking dominate the small matmuls, while XLA's conv
path uses the TPU's native convolution hardware support. Direct XLA convs
are therefore the production inference path; this module stays as tested
infrastructure (the transform is exact and the derivation non-trivial) and
as the record of why the obvious "pack channels for the MXU" trick does not
pay off here. Widening filters is not free either: conv time scales ~linearly
with channels at these sizes (BW/overhead-bound, not lane-bound).

The trick that makes *chains* of convs cheap is parity alternation. Define:

- aligned blocks:  block (i,j) holds pixels (2i+r, 2j+s), r,s in {0,1}
- shifted blocks:  block (i,j) holds pixels (2i-1+u, 2j-1+v) — i.e. aligned
  blocks of the input padded by one pixel at the top/left. A slice with
  Hb x Wb aligned blocks has (Hb+1) x (Wb+1) shifted blocks (the extra row/
  column carries the SAME-padding halo).

Then a stride-1 SAME 3x3 conv is a VALID 2x2 conv shifted->aligned, and
equally a (1,1)-padded 2x2 conv aligned->shifted. A residual block
(conv-relu-conv-add-relu) therefore alternates shifted->aligned->shifted with
**no repacking between convs**, and whole stages chain in s2d space. The
fused Pallas kernel (ops.fused_stage) keeps the chain in VMEM.

All transforms here are exact (weight re-indexing, no approximation); tests
assert equality with lax.conv to float32 tolerance.

Reference: the tempoGAN-family generator stack runs these convs via TF1/cuDNN
(reference file:line unavailable — mount empty at survey time); this module is
part of the TPU-native redesign, not a translation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# layout converters (pixel space <-> block space)
# ---------------------------------------------------------------------------

def to_aligned(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> aligned blocks (B, H/2, W/2, 4C); H, W even.

    Channel order: (r, s, c) -> (r*2 + s)*C + c for sub-pixel (r, s)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def from_aligned(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of to_aligned: (B, Hb, Wb, 4C) -> (B, 2Hb, 2Wb, C)."""
    b, hb, wb, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hb, wb, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * hb, 2 * wb, c)


def to_shifted(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> shifted blocks (B, H/2+1, W/2+1, 4C).

    Shifted block (i,j) sub (u,v) = pixel (2i-1+u, 2j-1+v); out-of-range
    pixels (the SAME-conv halo) are zero."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return to_aligned(x)


def from_shifted(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of to_shifted (drops the halo row/column)."""
    y = from_aligned(x)
    return y[:, 1:-1, 1:-1, :]


# ---------------------------------------------------------------------------
# weight transforms (numpy-level; weights are tiny)
# ---------------------------------------------------------------------------

def _pack(w3, in_sub_of_t, out_subs):
    """Shared builder: w3 (3,3,Ci,Co) -> w2 (2,2,4Ci,4Co).

    in_sub_of_t: maps tap-extent index t (pixel offset relative to the output
    block's first referenced pixel row) -> (block tap a, sub-pixel u).
    out_subs: output sub-pixel coordinates (r, s) and their pixel offsets."""
    ci, co = w3.shape[2], w3.shape[3]
    w2 = np.zeros((2, 2, 4 * ci, 4 * co), dtype=np.float64)
    for (r, s) in out_subs:
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                a, u = in_sub_of_t(r + dy)
                bb, v = in_sub_of_t(s + dx)
                w2[a, bb,
                   (u * 2 + v) * ci:(u * 2 + v + 1) * ci,
                   (r * 2 + s) * co:(r * 2 + s + 1) * co] += \
                    np.asarray(w3[dy + 1, dx + 1], np.float64)
    return w2


def w3_to_s2a(w3: np.ndarray) -> np.ndarray:
    """3x3 HWIO weights -> 2x2 (4Ci,4Co) weights, shifted->aligned conv.

    Output aligned block i, sub r, pixel row 2i+r+dy: t = r+dy in [-1,2] lives
    in shifted block i+a sub u with 2a-1+u = t."""
    return _pack(np.asarray(w3),
                 lambda t: ((t + 1) // 2, (t + 1) % 2),
                 [(r, s) for r in (0, 1) for s in (0, 1)]).astype(
        np.asarray(w3).dtype)


def w3_to_a2s(w3: np.ndarray) -> np.ndarray:
    """3x3 HWIO weights -> 2x2 weights, aligned->shifted conv.

    Output shifted block i, sub u, pixel row 2i-1+u+dy: t = u-1+dy in [-2,1]
    lives in aligned block i-1+a sub r with 2(a-1)+r = t, i.e. a = t//2 + 1.
    Apply with padding (1,1) so out block i reads aligned blocks i-1+a.
    (_pack hands us t' = u+dy, so shift by one first.)"""
    return _pack(np.asarray(w3),
                 lambda t: ((t - 1) // 2 + 1, (t - 1) % 2),
                 [(u, v) for u in (0, 1) for v in (0, 1)]).astype(
        np.asarray(w3).dtype)


def w1_to_block(w1: np.ndarray) -> np.ndarray:
    """1x1 conv weights (Ci, Co) -> block-diagonal (4Ci, 4Co) channel matmul
    (same parity in = out; used for residual projections)."""
    w1 = np.asarray(w1)
    ci, co = w1.shape
    w = np.zeros((4 * ci, 4 * co), dtype=w1.dtype)
    for k in range(4):
        w[k * ci:(k + 1) * ci, k * co:(k + 1) * co] = w1
    return w


# ---------------------------------------------------------------------------
# XLA reference ops on block-space tensors (also the CPU fallback)
# ---------------------------------------------------------------------------

def conv_s2a(x_shifted: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """(B, Hb+1, Wb+1, 4Ci) shifted -> (B, Hb, Wb, 4Co) aligned."""
    return lax.conv_general_dilated(
        x_shifted, w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_a2s(x_aligned: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """(B, Hb, Wb, 4Ci) aligned -> (B, Hb+1, Wb+1, 4Co) shifted."""
    return lax.conv_general_dilated(
        x_aligned, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def halo_mask(hb1: int, wb1: int, c4: int, dtype=jnp.float32) -> jnp.ndarray:
    """Multiplicative mask (hb1, wb1, c4) zeroing a shifted tensor's halo.

    Shifted block i=0 sub u=0 is pixel row -1; block i=Hb sub u=1 is pixel
    row H — both are SAME-conv padding and must be exactly zero between
    convs (a2s convs and biased projections would otherwise write there).
    Channel layout: sub (u, v) -> channels [(u*2+v)*C, (u*2+v+1)*C)."""
    c = c4 // 4
    rows = jax.lax.broadcasted_iota(jnp.int32, (hb1, wb1, c4), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hb1, wb1, c4), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (hb1, wb1, c4), 2) // c
    u, v = sub // 2, sub % 2
    bad = ((rows == 0) & (u == 0)) | ((rows == hb1 - 1) & (u == 1)) | \
          ((cols == 0) & (v == 0)) | ((cols == wb1 - 1) & (v == 1))
    return jnp.where(bad, 0, 1).astype(dtype)


def resblock_params_s2d(p: dict, dtype=None) -> dict:
    """Transform one ResBlock's flax params {conv1, conv2, [proj]} into
    block-space tensors. Biases broadcast per sub-pixel (tile 4x)."""
    def cast(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if dtype is not None else a

    out = {
        "w1": cast(w3_to_s2a(np.asarray(p["conv1"]["kernel"], np.float32))),
        "b1": cast(jnp.tile(jnp.asarray(p["conv1"]["bias"], jnp.float32), 4)),
        "w2": cast(w3_to_a2s(np.asarray(p["conv2"]["kernel"], np.float32))),
        "b2": cast(jnp.tile(jnp.asarray(p["conv2"]["bias"], jnp.float32), 4)),
    }
    if "proj" in p:
        out["wp"] = cast(w1_to_block(
            np.asarray(p["proj"]["kernel"], np.float32)[0, 0]))
        out["bp"] = cast(jnp.tile(jnp.asarray(p["proj"]["bias"],
                                              jnp.float32), 4))
    return out


def resblock_chain_xla(x_shifted: jnp.ndarray, blocks: list[dict]) -> jnp.ndarray:
    """Reference implementation of a fused-stage chain on block-space tensors:
    each block is relu(proj(x) + conv2(relu(conv1(x)))), shifted->shifted.
    The input halo must already be zero (to_shifted guarantees it)."""
    x = x_shifted
    dt = x.dtype
    _, hb1, wb1, _ = x.shape
    for blk in blocks:
        h = jax.nn.relu(conv_s2a(x, blk["w1"]) + blk["b1"]).astype(dt)
        h = conv_a2s(h, blk["w2"]) + blk["b2"]
        skip = x if "wp" not in blk else (
            jnp.einsum("bhwc,cd->bhwd", x, blk["wp"],
                       preferred_element_type=jnp.float32) + blk["bp"])
        x = jax.nn.relu(skip + h).astype(dt)
        # conv2's bias / the projection bias pollute the halo; re-zero it so
        # the next conv's SAME-padding semantics hold
        x = x * halo_mask(hb1, wb1, x.shape[-1], x.dtype)
    return x
