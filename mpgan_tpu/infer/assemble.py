"""Full-volume two-pass inference + slice reassembly (SURVEY.md §3.3).

The BASELINE.json benchmark path: LR volume (Z, Y, X, C) →
  pass 1: all z-slices (xy planes) through G1 as one batch → intermediate
          volume (Z, Y·s, X·s, 1);
  pass 2: all y-slices (xz planes) of the intermediate volume + upsampled LR
          velocity through G2 → final (Z·s, Y·s, X·s, 1).

The slice axis is the data-parallel axis (SURVEY.md §2.14): slice batches are
sharded over the mesh's 'data' axis; per-slice 2D convs need no halo
exchange, and reassembly is a transpose on the sharded array. Slice batches
are chunked (``slice_chunk``) to bound HBM at large volumes.

Channel layouts match the training pipeline (mpgan_tpu.data.pipeline):
xy slices use [d, vx, vy, vz]; xz slices use [d, vx, vz, vy].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpgan_tpu.parallel import mesh as pmesh


def _pad_batch(x: jnp.ndarray, multiple: int) -> tuple[jnp.ndarray, int]:
    n = x.shape[0]
    m = pmesh.pad_to_multiple(n, multiple)
    if m != n:
        pad = [(0, m - n)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    return x, n


def apply_sliced(apply_fn, slices: jnp.ndarray, chunk: int = 0,
                 mesh=None) -> jnp.ndarray:
    """Run a per-slice model over a (N, H, W, C) slice stack.

    chunk = 0 → one batch (fastest; bounded by HBM); otherwise fixed-size
    chunks via lax.map (single compile, static shapes).
    """
    n_dev = mesh.devices.size if mesh is not None else 1
    if chunk <= 0:
        x, n = _pad_batch(slices, n_dev)
        x = pmesh.constrain_batch(x, mesh)
        return apply_fn(x)[:n]
    chunk = pmesh.pad_to_multiple(chunk, n_dev)
    x, n = _pad_batch(slices, chunk)
    x = x.reshape(x.shape[0] // chunk, chunk, *x.shape[1:])
    out = jax.lax.map(lambda c: apply_fn(pmesh.constrain_batch(c, mesh)), x)
    return out.reshape(-1, *out.shape[2:])[:n]


def pass1_volume(gen1, params1, lr_vol: jnp.ndarray, stage: int | None = None,
                 chunk: int = 0, mesh=None) -> jnp.ndarray:
    """(Z, Y, X, C) → intermediate (Z, Y·s, X·s, 1) via xy slices."""
    fn = partial(gen1.apply, params1, stage=stage)
    return apply_sliced(fn, lr_vol, chunk=chunk, mesh=mesh)


def pass2_volume(gen2, params2, interm: jnp.ndarray,
                 lr_vel: jnp.ndarray | None,
                 stage: int | None = None, chunk: int = 0,
                 mesh=None) -> jnp.ndarray:
    """Intermediate (Z, Ys, Xs, 1) [+ LR velocity (Z, Y, X, 3)] →
    final (Z·s, Ys, Xs, 1) via xz slices (z-axis refinement)."""
    z, ys, xs, _ = interm.shape
    # staging dtype: the generator casts its input to gen2.dtype on entry;
    # staging in that dtype halves the resize/transpose HBM traffic for bf16
    # models (the density cast is value-identical; the velocity resize then
    # runs in bf16, within the model's own input precision)
    dt = getattr(gen2, "dtype", interm.dtype)
    if lr_vel is not None:
        # velocity on the intermediate grid, channels permuted for the xz
        # plane: [vx, vz, vy] (w=x, h=z, out=y); values stay in LR units,
        # matching the training pipeline's gather
        vel = jax.image.resize(lr_vel.astype(dt), (z, ys, xs, 3),
                               method="linear")
        vel = vel[..., jnp.asarray([0, 2, 1])]
        vol_in = jnp.concatenate([interm.astype(dt), vel], axis=-1)
    else:
        vol_in = interm.astype(dt)
    # slices over y: (Ys, Z, Xs, C)
    slices = jnp.transpose(vol_in, (1, 0, 2, 3))
    fn = partial(gen2.apply, params2, stage=stage)
    out = apply_sliced(fn, slices, chunk=chunk, mesh=mesh)  # (Ys, Zs, Xs, 1)
    return jnp.transpose(out, (1, 0, 2, 3))


def pass3_volume(gen3, params3, vol: jnp.ndarray,
                 lr_vel: jnp.ndarray | None, chunk: int = 0,
                 mesh=None) -> jnp.ndarray:
    """Optional third pass (SURVEY.md §2.7 "additional passes possible"):
    constant-resolution refinement over yz slices of the full-res volume.

    vol: (Zs, Ys, Xs, 1); slices are (Ys, Zs) planes per x, channel layout
    [d, v_w=vz, v_h=vy, v_out=vx] (pipeline 'yz' convention)."""
    zs, ys, xs, _ = vol.shape
    dt = getattr(gen3, "dtype", vol.dtype)
    if lr_vel is not None:
        vel = jax.image.resize(lr_vel.astype(dt), (zs, ys, xs, 3),
                               method="linear")
        vel = vel[..., jnp.asarray([2, 1, 0])]
        vol_in = jnp.concatenate([vol.astype(dt), vel], axis=-1)
    else:
        vol_in = vol.astype(dt)
    # slices over x: (Xs, Ys, Zs, C)  (h = y, w = z)
    slices = jnp.transpose(vol_in, (2, 1, 0, 3))
    fn = partial(gen3.apply, params3)
    out = apply_sliced(fn, slices, chunk=chunk, mesh=mesh)
    return jnp.transpose(out, (2, 1, 0, 3))


def upscale_volume(gen1, params1, gen2, params2, lr_vol: jnp.ndarray,
                   up_res: int, stage: int | None = None, chunk: int = 0,
                   mesh=None, gen3=None, params3=None) -> jnp.ndarray:
    """Full multi-pass SR: (Z, Y, X, C) LR → (Z·s, Y·s, X·s, 1) HR density.

    lr_vol channels [d, vx, vy, vz] (or density-only). gen2=None → pass-1
    only with nearest z-upsample (degenerate single-pass mode); gen3 adds
    the optional yz refinement pass.
    """
    interm = pass1_volume(gen1, params1, lr_vol, stage=stage, chunk=chunk,
                          mesh=mesh)
    if lr_vol.shape[0] == 1:
        # 2D data (dataDim 2): a single xy plane — in-plane SR only, no
        # z-axis passes (the reference's 2D mode is likewise single-net)
        return interm
    lr_vel = lr_vol[..., 1:4] if lr_vol.shape[-1] >= 4 else None
    if gen2 is None:
        # degenerate single-pass mode: nearest z-upsample stands in for pass
        # 2 — but a loaded pass-3 refiner must still run, not silently drop
        out = jnp.repeat(interm, up_res, axis=0)
    else:
        out = pass2_volume(gen2, params2, interm, lr_vel, stage=stage,
                           chunk=chunk, mesh=mesh)
    if gen3 is not None:
        out = pass3_volume(gen3, params3, out, lr_vel, chunk=chunk, mesh=mesh)
    return out


def upscale_volume_streamed(gen1, params1, gen2, params2, lr_vol, up_res: int,
                            chunk: int, stage: int | None = None,
                            chunk1: int | None = None) -> np.ndarray:
    """Two-pass SR with HOST-streamed pass-2 assembly: the final volume never
    materializes in HBM, so OUTPUT sizes beyond device memory become possible
    on one chip (2048³ bf16 alone is 17 GB > a v5e's 16 GB — `sliceChunk`
    bounds activations but `upscale_volume` still allocates the result).

    Pass 1 runs on device (the intermediate (Z, Y·s, X·s, 1) is s× smaller
    than the output and must fit). Pass 2 then runs one ``chunk`` of xz
    slices at a time — each chunk's input is sliced from the device-resident
    intermediate, its velocity window computed EXACTLY with
    ``jax.image.scale_and_translate`` (resize output rows [y0, y0+chunk) are
    a translation of the resize kernel, so the window equals the
    corresponding rows of the full resize bit-for-bit) — and each chunk's
    output is fetched to the host and written into a preallocated float32
    array while the next chunk computes.

    Returns (Z·s, Y·s, X·s, 1) float32 on host. Equality vs the in-HBM path
    is tested in tests/test_infer.py.
    """
    lr_vol = jnp.asarray(lr_vol)
    # pass-1 gets its own (usually smaller) chunk: at the sizes this path
    # exists for, per-slice activations are ~H·W·filters (≈268 MB bf16 at
    # 2048², so 64 slices of EITHER pass is a 17 GB chunk — over HBM)
    interm = pass1_volume(gen1, params1, lr_vol, stage=stage,
                          chunk=chunk if chunk1 is None else chunk1)
    z, y, x, c = lr_vol.shape
    zs, ys, xs = z * up_res, y * up_res, x * up_res
    lr_vel = lr_vol[..., 1:4] if c >= 4 else None
    dt = getattr(gen2, "dtype", interm.dtype)
    s = float(up_res)

    @partial(jax.jit, static_argnames=("rows",))
    def chunk_fn(p2, interm_, vel_, y0, rows):
        # rows of the intermediate, transposed to xz-slice batch layout
        part = jax.lax.dynamic_slice_in_dim(interm_, y0, rows, axis=1)
        slices = jnp.transpose(part.astype(dt), (1, 0, 2, 3))
        if vel_ is not None:
            # exact window of jax.image.resize(vel, (z, ys, xs)): resize ==
            # scale_and_translate at translation 0 (the half-pixel alignment
            # is internal to its kernel), so output rows [y0, y0+rows) are
            # translation −y0 — verified bit-close vs resize in test_infer
            # scale/translation stay f32: bf16 cannot represent row offsets
            # past 256 exactly (8 mantissa bits), which would shear the
            # velocity windows of large volumes
            neg_y0 = -jnp.asarray(y0, jnp.float32)
            vel_w = jax.image.scale_and_translate(
                vel_.astype(dt), (z, rows, xs, 3), (1, 2),
                scale=jnp.asarray([s, s], jnp.float32),
                translation=jnp.stack([neg_y0,
                                       jnp.zeros((), jnp.float32)]),
                method="linear")
            vel_w = vel_w[..., jnp.asarray([0, 2, 1])]  # xz plane: [vx,vz,vy]
            slices = jnp.concatenate(
                [slices, jnp.transpose(vel_w, (1, 0, 2, 3))], axis=-1)
        out = gen2.apply(p2, slices, stage=stage)   # (rows, Z·s, X·s, 1)
        return jnp.transpose(out, (1, 0, 2, 3))     # (Z·s, rows, X·s, 1)

    final = np.empty((zs, ys, xs, 1), np.float32)
    pending = None  # overlap: fetch chunk k while chunk k+1 computes
    for y0 in range(0, ys, chunk):
        rows = min(chunk, ys - y0)
        dev = chunk_fn(params2, interm, lr_vel, y0, rows)
        if pending is not None:
            p_y0, p_dev = pending
            final[:, p_y0:p_y0 + p_dev.shape[1]] = np.asarray(
                p_dev, dtype=np.float32)
        pending = (y0, dev)
    p_y0, p_dev = pending
    final[:, p_y0:p_y0 + p_dev.shape[1]] = np.asarray(p_dev, dtype=np.float32)
    return final


def make_jitted_upscaler(gen1, params1, gen2, params2, up_res: int,
                         stage: int | None = None, chunk: int = 0, mesh=None,
                         gen3=None, params3=None):
    """jit-wrapped upscale_volume with params baked as traced args.

    With a mesh, params and the input volume must live on the mesh's device
    set (replicated) — committed single-device args would conflict with the
    in-jit sharding constraints over the mesh.
    """
    if mesh is not None:
        params1, params2, params3 = (
            pmesh.replicate(p, mesh) for p in (params1, params2, params3))

    @jax.jit
    def fn(p1, p2, p3, lr_vol):
        return upscale_volume(gen1, p1, gen2, p2, lr_vol, up_res,
                              stage=stage, chunk=chunk, mesh=mesh,
                              gen3=gen3, params3=p3)

    if mesh is not None:
        rep = pmesh.replicated(mesh)
        return lambda lr_vol: fn(params1, params2, params3,
                                 jax.device_put(lr_vol, rep))
    return lambda lr_vol: fn(params1, params2, params3, lr_vol)


def precompute_intermediates(gen1, params1, lr_vols: jnp.ndarray,
                             stage: int | None = None, chunk: int = 0,
                             mesh=None) -> jnp.ndarray:
    """Frozen-G1 sweep over a dataset: (N, Z, Y, X, C) LR volumes →
    (N, Z, Y·s, X·s, 1) intermediate volumes (pass-2 training inputs,
    SURVEY.md §3.2 — G2 trains on G1 outputs)."""
    if mesh is not None:
        params1 = pmesh.replicate(params1, mesh)
    # cast per volume INSIDE the map body: the dataset-resident stack stays
    # f32 (training-pipeline dtype contract) without ever materializing a
    # second full-sweep copy when the generator returns bf16 (out_dtype)
    one = lambda v: pass1_volume(gen1, params1, v, stage=stage,
                                 chunk=chunk, mesh=mesh).astype(jnp.float32)
    # lax.map (not a python loop + stack): the output stack is allocated
    # once and filled in place — a 480-volume sweep would otherwise hold
    # the result twice (list + stack) and exhaust HBM
    return jax.jit(lambda xs: jax.lax.map(one, xs))(lr_vols)


def precompute_finals(gen1, params1, gen2, params2, lr_vols: jnp.ndarray,
                      up_res: int, chunk: int = 0, mesh=None) -> jnp.ndarray:
    """Frozen two-pass sweep: (N, Z, Y, X, C) LR → (N, Z·s, Y·s, X·s, 1)
    full-res volumes (pass-3 training inputs)."""
    if mesh is not None:
        params1 = pmesh.replicate(params1, mesh)
        params2 = pmesh.replicate(params2, mesh)
    one = lambda v: upscale_volume(gen1, params1, gen2, params2, v,
                                   up_res=up_res, chunk=chunk,
                                   mesh=mesh).astype(jnp.float32)
    # single-allocation sweep — see precompute_intermediates
    return jax.jit(lambda xs: jax.lax.map(one, xs))(lr_vols)


def psnr_volume(fake: np.ndarray, real: np.ndarray, peak: float = 1.0) -> float:
    # f32 casts: bf16 inputs (out_dtype models) must not accumulate in bf16
    fake = np.asarray(fake).astype(np.float32, copy=False)
    real = np.asarray(real).astype(np.float32, copy=False)
    mse = float(np.mean((fake - real) ** 2))
    return float(10.0 * np.log10(peak ** 2 / max(mse, 1e-12)))
