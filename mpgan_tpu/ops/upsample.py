"""Layout-preserving exact 2x linear upsampling for slice batches.

Why this exists (r4, measured): the generator's per-stage upsample was
``jax.image.resize(..., "linear")``, which XLA lowers to a ``dot_general``
whose preferred layouts (``{2,1,3,0}`` / ``{1,3,2,0}``) mismatch the
batch-in-lanes NHWC layout ({0,3,2,1}) it picks for the surrounding 3x3
convs. The device trace of the pass-2 inference program
(``.profiles/pass2/per_op_breakdown.json``) shows the consequence: four
full-tensor relayout copies, 9.15 ms of the 23.2 ms frame (39%), at every
ResBlock -> upsample -> ResBlock seam.

The rewrite: 2x linear resize along one axis is exactly

    out[2i]   = 0.75 * x[i] + 0.25 * x[i-1]      (edge-clamped)
    out[2i+1] = 0.75 * x[i] + 0.25 * x[i+1]      (edge-clamped)

(half-pixel centers: out coord j maps to input j/2 - 1/4). Expressed as two
shifted adds interleaved along the target axis, every op is elementwise or a
concat/reshape on a MAJOR dim of the conv layout (lanes = batch, sublanes =
channel), so XLA keeps one layout end-to-end and the copies vanish.

Numerics: identical weights to ``jax.image.resize`` — same values up to
floating-point association (one fused multiply-add order vs the resize's
dot); equality-tested against resize in ``tests/test_ops.py``.

Reference parity: the reference upsamples with TF1 ``tf.image.resize`` /
depth-to-space inside its GAN.py generator (mount empty at survey time —
SURVEY.md §2.7); this implements the same bilinear semantics TPU-first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_up2(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x linear (half-pixel, edge-clamped) upsample along ``axis``.

    Matches ``jax.image.resize(x, 2x along axis, "linear")`` up to fp
    association, but lowers to elementwise + major-dim interleave instead of
    a layout-island dot_general.
    """
    axis = axis % x.ndim
    n = x.shape[axis]

    def sl(a, b):
        s = [slice(None)] * x.ndim
        s[axis] = slice(a, b)
        return x[tuple(s)]

    # x[i-1] / x[i+1] with edge clamp
    xm = jnp.concatenate([sl(0, 1), sl(0, n - 1)], axis=axis)
    xp = jnp.concatenate([sl(1, n), sl(n - 1, n)], axis=axis)
    dt = x.dtype
    even = (x * jnp.asarray(0.75, dt) + xm * jnp.asarray(0.25, dt))
    odd = (x * jnp.asarray(0.75, dt) + xp * jnp.asarray(0.25, dt))
    # interleave along axis: (..., n, ...) x2 -> (..., 2n, ...)
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


def linear_up2_conv(x: jnp.ndarray, axis: int, dense: bool = False) -> jnp.ndarray:
    """Same 2x linear upsample as ``linear_up2``, expressed as an lhs-dilated
    (fractionally-strided) convolution so XLA lowers it with the SAME conv
    emitters/layouts as the surrounding 3x3 convs.

    Zero-stuff x along ``axis`` (lhs_dilation=2), correlate with the 4-tap
    kernel [0.25, 0.75, 0.75, 0.25] (padding 2/2), then add the clamped edge
    tap back to the first/last output rows (the dilated conv zero-pads where
    resize edge-clamps).

    dense=False: depthwise (feature_group_count=C, VPU path).
    dense=True: a diagonal CxC kernel (MXU path — 4C^2 MACs/output, still
    far under the BW-bound budget at these widths).
    """
    axis = axis % x.ndim
    assert x.ndim == 4 and axis in (1, 2), (x.shape, axis)
    c = x.shape[3]
    dt = x.dtype
    taps = jnp.asarray([0.25, 0.75, 0.75, 0.25], dt)
    if dense:
        k = taps[:, None, None] * jnp.eye(c, dtype=dt)  # (4, C, C)
        groups = 1
    else:
        k = jnp.broadcast_to(taps[:, None, None], (4, 1, c))  # (4, I/g=1, C)
        groups = c
    # kernel layout HWIO; the upsample tap runs along `axis`
    if axis == 1:
        k = k[:, None]            # (4, 1, I, O)
        lhs_dilation, padding = (2, 1), ((2, 2), (0, 0))
    else:
        k = k[None, :]            # (1, 4, I, O)
        lhs_dilation, padding = (1, 2), ((0, 0), (2, 2))
    # Precision.HIGHEST: jax.image.resize (which this replaces, with an
    # 'all numerically equal' contract) computes its dot at HIGHEST; the
    # conv default would demote f32 operands to bf16 on TPU (ADVICE r4).
    # No-op for the bf16 models the bench A/B measured, so the 1.67x stands.
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=padding,
        lhs_dilation=lhs_dilation, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    # edge-clamp correction: out[0] and out[2n-1] are missing their
    # out-of-range 0.25 tap, which resize clamps to the edge sample
    n = x.shape[axis]
    x_first = [slice(None)] * 4
    x_last = [slice(None)] * 4
    x_first[axis], x_last[axis] = 0, n - 1
    o_first = [slice(None)] * 4
    o_last = [slice(None)] * 4
    o_first[axis], o_last[axis] = 0, 2 * n - 1
    quarter = jnp.asarray(0.25, dt)
    out = out.at[tuple(o_first)].add(x[tuple(x_first)] * quarter)
    out = out.at[tuple(o_last)].add(x[tuple(x_last)] * quarter)
    return out


def linear_up_conv(x: jnp.ndarray, axis: int, s: int) -> jnp.ndarray:
    """Exact ONE-SHOT s× linear (half-pixel, edge-clamped) upsample along
    ``axis`` as a single lhs-dilated dense-diagonal conv — the generalization
    of ``linear_up2_conv`` to arbitrary integer factors (the generator's
    global skip upsamples by the one-shot product factor, 4 or 8, which is
    NOT equal to iterated 2× resizes).

    Derivation: resize output j samples input position p = (j+0.5)/s − 0.5
    with linear (two-tap) weights; as a conv over the s-dilated input with
    kernel index u ↔ offset d = pad_lo − u, the tap weight is
    w(d) = 1 − |(d+0.5)/s − 0.5|, nonzero for exactly 2s integer offsets.
    Besides killing the resize dot_general's layout island (r4), this also
    avoids its catastrophic tile-padding at large slice chunks — the
    [2048, B, 1, 2048] dot_general intermediate pads 64 MB to 8 GB (128×)
    and OOMs the 2048³ streamed path outright.

    Equality-tested vs ``jax.image.resize`` for s ∈ {2, 4, 8} in
    tests/test_ops.py.
    """
    if s == 1:
        return x
    axis = axis % x.ndim
    assert x.ndim == 4 and axis in (1, 2), (x.shape, axis)
    assert s % 2 == 0, s
    c = x.shape[3]
    dt = x.dtype
    pad = (3 * s - 2) // 2
    taps = jnp.asarray(
        [1.0 - abs((pad - u + 0.5) / s - 0.5) for u in range(2 * s)], dt)
    k = taps[:, None, None] * jnp.eye(c, dtype=dt)  # (2s, C, C)
    if axis == 1:
        k = k[:, None]
        lhs_dilation, padding = (s, 1), ((pad, pad), (0, 0))
    else:
        k = k[None, :]
        lhs_dilation, padding = (1, s), ((0, 0), (pad, pad))
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    # edge clamp: the first/last s/2 outputs sample past the edge; resize
    # clamps that tap to the edge sample, the dilated conv zero-padded it
    n = x.shape[axis]
    x_first = [slice(None)] * 4
    x_last = [slice(None)] * 4
    x_first[axis], x_last[axis] = 0, n - 1
    for j in range(s // 2):
        w = jnp.asarray(0.5 - (j + 0.5) / s, dt)
        o_first = [slice(None)] * 4
        o_last = [slice(None)] * 4
        o_first[axis], o_last[axis] = j, s * n - 1 - j
        out = out.at[tuple(o_first)].add(x[tuple(x_first)] * w)
        out = out.at[tuple(o_last)].add(x[tuple(x_last)] * w)
    return out


def upsample_any(x: jnp.ndarray, fh: int, fw: int) -> jnp.ndarray:
    """One-shot (fh, fw) linear upsample via ``linear_up_conv`` per axis —
    numerically equal to ``jax.image.resize`` at the same one-shot factors
    (separable kernel: per-axis application equals the 2-D resize)."""
    if fh > 1:
        x = linear_up_conv(x, 1, fh)
    if fw > 1:
        x = linear_up_conv(x, 2, fw)
    return x


def upsample_2d(x: jnp.ndarray, fh: int, fw: int,
                mode: str = "conv_dw") -> jnp.ndarray:
    """Per-stage slice-batch upsample ``(B, H, W, C) -> (B, fh*H, fw*W, C)``.

    Only factors 1 and 2 occur per growth stage (pass-1 (2,2), pass-2 (2,1),
    pass-3 (1,1)); callers with larger one-shot factors (the generator's
    global skip) use ``jax.image.resize`` directly.

    mode: "interleave" (linear_up2), "conv_dw" (depthwise lhs-dilated conv),
    or "conv_dense" (diagonal dense kernel) — all numerically identical to
    ``jax.image.resize`` linear; see the module docstring for which one the
    hardware A/B picked.
    """
    assert fh in (1, 2) and fw in (1, 2), (fh, fw)
    if mode == "interleave":
        up = linear_up2
    elif mode == "conv_dw":
        up = lambda v, axis: linear_up2_conv(v, axis, dense=False)
    elif mode == "conv_dense":
        up = lambda v, axis: linear_up2_conv(v, axis, dense=True)
    else:
        raise ValueError(f"unknown upsample mode {mode!r}")
    if fh == 2:
        x = up(x, axis=1)
    if fw == 2:
        x = up(x, axis=2)
    return x
