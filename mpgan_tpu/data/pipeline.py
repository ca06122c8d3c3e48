"""Device-side tile creator — the reference's ``tilecreator_t.py`` (L3),
rebuilt as fused XLA ops (SURVEY.md §2.5, §3.1 rebuild consequence).

Everything the reference does per-batch in host numpy — random patch
selection, density-threshold rejection, velocity-aware rotation/flip/scale,
temporal-triplet assembly — happens here inside one jit: a batch is a set of
*coordinate grids in LR physical space*, rotated/scaled by the augmentation
transform, gathered from the resident volumes by trilinear interpolation
(single resampling step), with velocity channels multiplied by the inverse
Jacobian.

Plane conventions (multi-pass slicing, SURVEY.md §2.7): patches are cut from
- 'xy' planes (pass 1): h = y, w = x, slice normal = z
- 'xz' planes (pass 2): h = z, w = x, slice normal = y
- 'yz' planes (optional pass 3): h = y, w = z, slice normal = x
Gathered velocity channels are permuted to the uniform per-plane layout
``[density, v_w, v_h, v_out]`` so generators and the augmentation vector
transform see one convention regardless of plane.

Sources:
- ``lr``  (N, Z, Y, X, C): LR volumes (density [+ velocity in LR cell units])
- ``hrz`` (N, Z, Y·s, X·s, 1): HR density downsampled along z only — the
  pass-1 target / pass-2 ground-truth input (intermediate volume)
- ``hr``  (N, Z·s, Y·s, X·s, 1): full HR density — the pass-2 target
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mpgan_tpu.data.loader import FluidDataset
from mpgan_tpu.ops.augment import (sample_transform, transform_pseudovectors,
                                   transform_vectors)
from mpgan_tpu.ops.interp import trilinear_sample
from mpgan_tpu.ops.resample import downsample_axis

PLANES = ("xy", "xz", "yz")
# channel permutation [d, vx, vy, vz] → [d, v_w, v_h, v_out] per plane
_VEL_PERM = {"xy": (0, 1, 2, 3), "xz": (0, 1, 3, 2), "yz": (0, 3, 2, 1)}
# (h, w, normal) → volume axes (0=z, 1=y, 2=x)
_PLANE_AXES = {"xy": (1, 2, 0), "xz": (0, 2, 1), "yz": (1, 0, 2)}


class TCStatic(NamedTuple):
    """Hashable static sampling config (jit static arg)."""
    tile_lr: int
    up_res: int
    n_vel: int
    n_vort: int
    n_frames: int
    n_vols: int
    augment: bool
    rot_mode: int
    scale_min: float
    scale_max: float
    dims_zyx: tuple[int, int, int]
    pool_zyx: tuple[int, int, int]


def plane_patch_coords(plane: str, center_zyx: jnp.ndarray, a: jnp.ndarray,
                       h: int, w: int, spacing_h: float, spacing_w: float) -> jnp.ndarray:
    """(h, w, 3) grid of (z, y, x) coords in LR space for one patch.

    ``a`` (2,2) is the augmentation transform acting on (h, w) offsets;
    spacing is LR cells per output pixel (1 for LR tiles, 1/s for HR tiles).
    """
    off_h = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0) * spacing_h
    off_w = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0) * spacing_w
    dh, dw = jnp.broadcast_arrays(off_h[:, None], off_w[None, :])
    rh = a[0, 0] * dh + a[0, 1] * dw
    rw = a[1, 0] * dh + a[1, 1] * dw
    ax_h, ax_w, _ = _PLANE_AXES[plane]
    out = jnp.zeros((h, w, 3), jnp.float32) + center_zyx
    out = out.at[..., ax_h].add(rh)
    out = out.at[..., ax_w].add(rw)
    return out


def gather_patch(vol: jnp.ndarray, coords_lr: jnp.ndarray,
                 scale_zyx: tuple[float, float, float]) -> jnp.ndarray:
    """Trilinear-gather a patch from ``vol`` given LR-space coords.

    scale_zyx converts LR coords to this volume's index space:
    idx = (c + 0.5)·scale − 0.5 (cell-center-consistent rescaling).
    """
    s = jnp.asarray(scale_zyx, jnp.float32)
    idx = (coords_lr + 0.5) * s - 0.5
    return trilinear_sample(vol, idx)


def _permute_channels(patch: jnp.ndarray, plane: str, n_vel: int,
                      n_vort: int = 0) -> jnp.ndarray:
    """Reorder [d, vx, vy, vz(, wx, wy, wz)] → per-plane [d, v_w, v_h, v_out
    (, w_w, w_h, w_out)]; vorticity channels use the same axis permutation."""
    if n_vel == 0:
        return patch
    perm = _VEL_PERM[plane]
    chans = [patch[..., perm[0]:perm[0] + 1]]
    for c in perm[1:4]:
        chans.append(patch[..., c:c + 1])
    if n_vort:
        for c in perm[1:4]:
            chans.append(patch[..., c + 3:c + 4])
        rest = patch[..., 7:]
    else:
        rest = patch[..., 4:]
    if rest.shape[-1]:
        chans.append(rest)
    return jnp.concatenate(chans, axis=-1)


def _margin(st: TCStatic) -> float:
    m = (st.tile_lr - 1) / 2.0 * (st.scale_max if st.augment else 1.0)
    if st.augment and st.rot_mode == 2:
        m *= float(np.sqrt(2.0))
    return float(m + 1.0)


def _candidates(key, n: int, plane: str, dense_idx: jnp.ndarray,
                st: TCStatic, normal_hr: bool = False):
    """(vol, center_zyx) candidates drawn from the dense-cell index.

    ``dense_idx`` (K, 4) holds (vol, zp, yp, xp) pooled cells whose density
    passed the rejection threshold (precomputed at init — this replaces the
    reference's resample-until-dense loop with an exact draw, SURVEY.md §2.5).
    ``normal_hr``: sample the slice-normal coordinate on the HR lattice
    (pass 2 slices the intermediate volume at HR-spaced positions)."""
    kp, kj = jax.random.split(key)
    m = _margin(st)
    _, _, ax_n = _PLANE_AXES[plane]
    dims = st.dims_zyx
    half = (st.tile_lr - 1) / 2.0

    pick = jax.random.randint(kp, (n,), 0, dense_idx.shape[0])
    cells = dense_idx[pick]
    vol = cells[:, 0]
    # uniform jitter inside the pooled cell → LR-space float center
    pool = jnp.asarray(st.pool_zyx, jnp.float32)
    jitter = jax.random.uniform(kj, (n, 3)) * pool
    raw = cells[:, 1:4].astype(jnp.float32) * pool + jitter

    def coord(axis):
        size = dims[axis]
        c = raw[:, axis]
        if axis == ax_n:  # slice normal: lattice position, no margin
            if normal_hr:
                j = jnp.round((c + 0.5) * st.up_res - 0.5)
                j = jnp.clip(j, 0, size * st.up_res - 1)
                return (j + 0.5) / st.up_res - 0.5
            return jnp.clip(jnp.round(c), 0, size - 1)
        lo, hi = m, max(size - 1 - m, m)
        c = jnp.clip(c, lo, hi)
        # snap to the half-integer lattice so that, without rotation/scale,
        # LR patch pixels land exactly on cells (and HR pixels on HR cells)
        return jnp.floor(c - half) + half

    centers = jnp.stack([coord(0), coord(1), coord(2)], axis=-1)
    return vol, centers


def _transforms(key, batch: int, st: TCStatic):
    if not st.augment:
        eye = jnp.broadcast_to(jnp.eye(2), (batch, 2, 2))
        return eye, eye
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: sample_transform(
        k, st.rot_mode, st.scale_min, st.scale_max))(keys)


@partial(jax.jit, static_argnames=("batch", "plane", "temporal", "st"))
def _sample_pass1(lr, hrz, dense_idx, key, batch: int, plane: str,
                  temporal: bool, st: TCStatic):
    k1, k3 = jax.random.split(key)
    vol, centers = _candidates(k1, batch, plane, dense_idx, st)
    a, ainv = _transforms(k3, batch, st)
    t, s = st.tile_lr, st.up_res

    def one(v, c, am, ai):
        clr = plane_patch_coords(plane, c, am, t, t, 1.0, 1.0)
        lrp = gather_patch(lr[v], clr, (1.0, 1.0, 1.0))
        lrp = transform_vectors(
            _permute_channels(lrp, plane, st.n_vel, st.n_vort), ai, st.n_vel)
        if st.n_vort:
            lrp = transform_pseudovectors(lrp, ai, start=4, n=st.n_vort)
        chr_ = plane_patch_coords(plane, c, am, t * s, t * s, 1.0 / s, 1.0 / s)
        hrp = gather_patch(hrz[v], chr_, (1.0, float(s), float(s)))
        return lrp, hrp

    out = {}
    out["lr"], out["hr"] = jax.vmap(one)(vol, centers, a, ainv)
    if temporal:
        for name, dv in (("prev", -1), ("next", +1)):
            lr2, hr2 = jax.vmap(one)(vol + dv, centers, a, ainv)
            out[f"lr_{name}"], out[f"hr_{name}"] = lr2, hr2
    return out


@partial(jax.jit, static_argnames=("batch", "plane", "temporal", "st"))
def _sample_pass2(lr, interm_src, hr, dense_idx, key, batch: int, plane: str,
                  temporal: bool, st: TCStatic):
    k1, k3 = jax.random.split(key)
    vol, centers = _candidates(k1, batch, plane, dense_idx, st, normal_hr=True)
    a, ainv = _transforms(k3, batch, st)
    t, s = st.tile_lr, st.up_res

    def one(v, c, am, ai):
        # input: h = z at LR spacing (t px), w = x at HR spacing (t·s px)
        cin = plane_patch_coords(plane, c, am, t, t * s, 1.0, 1.0 / s)
        interm = gather_patch(interm_src[v], cin, (1.0, float(s), float(s)))
        vel = None
        if st.n_vel:
            lrp = gather_patch(lr[v], cin, (1.0, 1.0, 1.0))
            lrp = transform_vectors(_permute_channels(lrp, plane, st.n_vel),
                                    ai, st.n_vel)
            vel = lrp[..., 1:4]
        cout = plane_patch_coords(plane, c, am, t * s, t * s, 1.0 / s, 1.0 / s)
        hrp = gather_patch(hr[v], cout, (float(s), float(s), float(s)))
        return interm, vel, hrp

    interm, vel, hrp = jax.vmap(one)(vol, centers, a, ainv)
    out = {"interm": interm, "hr": hrp}
    if vel is not None:
        out["lr_vel"] = vel
    if temporal:
        for name, dv in (("prev", -1), ("next", +1)):
            i2, v2, h2 = jax.vmap(one)(vol + dv, centers, a, ainv)
            out[f"interm_{name}"], out[f"hr_{name}"] = i2, h2
            if v2 is not None:
                out[f"lr_vel_{name}"] = v2
    return out


@partial(jax.jit, static_argnames=("batch", "plane", "temporal", "st"))
def _sample_pass3(lr, final_src, hr, dense_idx, key, batch: int, plane: str,
                  temporal: bool, st: TCStatic):
    """Pass-3 (yz-plane) batches: constant-resolution refinement patches.

    input: (t·s, t·s) full-HR-spacing patches from ``final_src`` (the
    two-pass output volumes, or HR for identity-regularized training),
    velocity channels from LR, target from HR — all at the same coords."""
    k1, k3 = jax.random.split(key)
    vol, centers = _candidates(k1, batch, plane, dense_idx, st, normal_hr=True)
    a, ainv = _transforms(k3, batch, st)
    t, s = st.tile_lr, st.up_res
    ts = t * s

    def one(v, c, am, ai):
        cin = plane_patch_coords(plane, c, am, ts, ts, 1.0 / s, 1.0 / s)
        fin = gather_patch(final_src[v], cin, (float(s), float(s), float(s)))
        vel = None
        if st.n_vel:
            # only the velocity channels survive the [1:4] slice below, so
            # vorticity channels (if any) are left unpermuted/untransformed,
            # matching pass 2 — transform them before exposing if a future
            # pass consumes them (they are pseudo-vectors: see pass 1)
            lrp = gather_patch(lr[v], cin, (1.0, 1.0, 1.0))
            lrp = transform_vectors(
                _permute_channels(lrp, plane, st.n_vel), ai, st.n_vel)
            vel = lrp[..., 1:4]
        hrp = gather_patch(hr[v], cin, (float(s), float(s), float(s)))
        return fin, vel, hrp

    fin, vel, hrp = jax.vmap(one)(vol, centers, a, ainv)
    out = {"final": fin, "hr": hrp}
    if vel is not None:
        out["lr_vel"] = vel
    if temporal:
        for name, dv in (("prev", -1), ("next", +1)):
            f2, v2, h2 = jax.vmap(one)(vol + dv, centers, a, ainv)
            out[f"final_{name}"], out[f"hr_{name}"] = f2, h2
            if v2 is not None:
                out[f"lr_vel_{name}"] = v2
    return out


def _shard_dense(dense: np.ndarray, n_shards: int, vols_per_shard: int,
                 grid_shape: tuple[int, int, int],
                 temporal_frames: int | None = None) -> np.ndarray:
    """Partition a global (K, 4) dense-cell index by volume shard.

    Returns (n_shards·M, 4) with *shard-local* volume indices; each shard's
    block is cyclically tiled to the common length M = max per-shard count so
    shard_map sees equal shapes (rows stay intact: np.resize tiles the flat
    buffer and the row length divides it). Sampling draws uniformly from a
    shard's block, so the tiling keeps the within-shard distribution ~uniform.

    A shard whose local volumes have NO above-threshold cells falls back to
    a uniform lattice over all its local pooled cells (subsampled for size
    parity with the other shards) — mirroring the unsharded degenerate
    fallback — rather than pinning that device's sampling to one cell.
    ``temporal_frames``: when set (the dense_idx_t variant), the fallback
    lattice restricts volumes to frames in [1, n_frames−2] so t±1 neighbors
    stay inside the sim — same filter the global temporal index applies.
    """
    blocks = []
    for s in range(n_shards):
        lo = s * vols_per_shard
        blk = dense[(dense[:, 0] >= lo) &
                    (dense[:, 0] < lo + vols_per_shard)].copy()
        blk[:, 0] -= lo
        blocks.append(blk)
    cap = max([b.shape[0] for b in blocks if b.shape[0]] or [1024])
    for s, blk in enumerate(blocks):
        if blk.shape[0] == 0:  # fully-empty shard: anywhere local, uniform
            gz, gy, gx = grid_shape
            vols = np.arange(vols_per_shard)
            if temporal_frames is not None:
                # shards hold whole sims, so a local vol's frame is v % F
                frm = vols % temporal_frames
                ok = (frm >= 1) & (frm <= temporal_frames - 2)
                if ok.any():
                    vols = vols[ok]
            full = np.stack(np.meshgrid(
                vols, np.arange(gz), np.arange(gy),
                np.arange(gx), indexing="ij"), -1).reshape(-1, 4)
            if full.shape[0] > cap:
                sel = np.random.default_rng(s).choice(
                    full.shape[0], size=cap, replace=False)
                full = full[np.sort(sel)]
            blocks[s] = full.astype(dense.dtype)
    m = max(b.shape[0] for b in blocks)
    return np.concatenate([np.resize(b, (m, 4)) for b in blocks])


class TileCreator:
    """Holds device-resident volumes; samples augmented training batches."""

    def __init__(self, dataset: FluidDataset, tile_lr: int,
                 density_threshold: float = 0.002,
                 augment: bool = True, rot_mode: int = 2,
                 scale_min: float = 0.85, scale_max: float = 1.15,
                 interm: jnp.ndarray | None = None,
                 final: jnp.ndarray | None = None):
        """``interm``: optional (N, Z, Y·s, X·s, 1) volumes to use as the
        pass-2 *input* source instead of the GT z-downsampled HR — pass the
        frozen pass-1 generator's outputs here to train G2 on G1 outputs
        (SURVEY.md §3.2; see mpgan_tpu.infer.assemble.precompute_intermediates).
        ``final``: optional (N, Z·s, Y·s, X·s, 1) full-res volumes as the
        pass-3 input source (two-pass outputs); defaults to HR.

        Device residency is lazy and per-pass: pass-1 training touches only
        ``lr`` + ``hrz`` (the 4×-larger ``hr`` stack stays on host), so large
        datasets fit HBM; ``hrz`` is computed volume-by-volume to bound blur
        temporaries."""
        self._host_lr = dataset.lr
        self._host_hr = dataset.hr
        self._dev: dict = {}
        self._src: dict = {}  # interm/final sources, placed lazily via _put
        # sharded residency (VERDICT r1 #5): set by shard_over(mesh)
        self._mesh = None
        self._vol_sharding = None
        self.n_shards = 1
        self.st_local = None
        if interm is not None:
            hrz_shape = (dataset.hr.shape[0], dataset.lr.shape[1],
                         *dataset.hr.shape[2:])
            if tuple(interm.shape) != hrz_shape:
                raise ValueError(f"interm shape {interm.shape} != expected "
                                 f"{hrz_shape}")
            self._src["interm"] = interm
        if final is not None:
            if tuple(final.shape) != dataset.hr.shape:
                raise ValueError(f"final shape {final.shape} != expected "
                                 f"{tuple(dataset.hr.shape)}")
            self._src["final"] = final
        n_frames = int(dataset.n_frames)

        # dense-cell index: pooled LR density cells above the rejection
        # threshold, precomputed on host — sampling draws from these directly.
        # Pool 2 per axis where the axis allows it (Z may be 1 for 2D data).
        d = dataset.lr[..., 0]
        pool = tuple(2 if d.shape[i + 1] >= 2 else 1 for i in range(3))
        nz, ny, nx = (d.shape[1] // pool[0]) * pool[0], \
            (d.shape[2] // pool[1]) * pool[1], (d.shape[3] // pool[2]) * pool[2]
        pooled = d[:, :nz, :ny, :nx].reshape(
            d.shape[0], nz // pool[0], pool[0], ny // pool[1], pool[1],
            nx // pool[2], pool[2]).mean(axis=(2, 4, 6))
        dense = np.argwhere(pooled >= density_threshold)
        self._pooled_shape = tuple(pooled.shape[1:])
        if dense.shape[0] == 0:  # degenerate (all-empty data): allow anywhere
            dense = np.argwhere(np.ones_like(pooled, dtype=bool))
        # host copies are kept so shard_over never round-trips the index
        # device→host (a multi-MB fetch through the axon tunnel at ~1.4 MB/s)
        self._host_dense = dense.astype(np.int32)
        self.dense_idx = jnp.asarray(self._host_dense)
        # temporal sampling needs frames in [1, F−2] so t±1 exist
        frm = dense[:, 0] % n_frames
        dense_t = dense[(frm >= 1) & (frm <= n_frames - 2)]
        if dense_t.shape[0] == 0:
            dense_t = dense
        self._host_dense_t = dense_t.astype(np.int32)
        self.dense_idx_t = jnp.asarray(self._host_dense_t)

        self.st = TCStatic(
            tile_lr=int(tile_lr), up_res=int(dataset.up_res),
            n_vel=3 if dataset.use_velocities else 0,
            n_vort=3 if dataset.use_vorticities else 0,
            n_frames=n_frames, n_vols=int(dataset.lr.shape[0]),
            augment=bool(augment),
            rot_mode=int(rot_mode), scale_min=float(scale_min),
            scale_max=float(scale_max),
            dims_zyx=tuple(int(v) for v in dataset.lr.shape[1:4]),
            pool_zyx=pool,
        )

    @property
    def up_res(self) -> int:
        return self.st.up_res

    def shard_over(self, mesh) -> bool:
        """Shard volume residency over the mesh's data axis (VERDICT r1 #5).

        Each device holds a contiguous block of *whole sims* (so temporal
        t±1 neighbors stay shard-local) plus that block's slice of the
        dense-cell index with shard-local volume numbers; training then
        samples each device's share of the batch from its local volumes
        inside a shard_map — no cross-device gathers, and the HBM cost per
        chip is dataset/n_devices instead of the full stacks (SURVEY §3.1).

        Applies only when n_sims divides evenly over the mesh; otherwise
        residency stays replicated and this returns False. Idempotent for
        the same mesh; call before first device placement otherwise.
        """
        n_dev = int(mesh.devices.size)
        if self._mesh is not None:
            if self._mesh is mesh or list(self._mesh.devices.flat) == \
                    list(mesh.devices.flat):
                return self.n_shards > 1
            raise RuntimeError("TileCreator already sharded over another mesh")
        n_sims = self.st.n_vols // self.st.n_frames
        if n_dev <= 1 or n_sims % n_dev:
            return False
        from jax.sharding import NamedSharding, PartitionSpec
        from mpgan_tpu.parallel.mesh import DATA_AXIS
        self._mesh = mesh
        self._vol_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
        self.n_shards = n_dev
        vols = self.st.n_vols // n_dev
        self.st_local = self.st._replace(n_vols=vols)
        self.dense_idx = jax.device_put(
            _shard_dense(self._host_dense, n_dev, vols,
                         self._pooled_shape), self._vol_sharding)
        self.dense_idx_t = jax.device_put(
            _shard_dense(self._host_dense_t, n_dev, vols,
                         self._pooled_shape,
                         temporal_frames=self.st.n_frames),
            self._vol_sharding)
        # re-place anything already device-resident (normally nothing:
        # lr/hr/hrz/interm/final all place lazily through _put after this)
        for k, v in list(self._dev.items()):
            self._dev[k] = jax.device_put(v, self._vol_sharding)
        return True

    # lazy device arrays ---------------------------------------------------

    def _put(self, x) -> jnp.ndarray:
        if self._vol_sharding is not None:
            return jax.device_put(x, self._vol_sharding)
        return jnp.asarray(x)

    @property
    def lr(self) -> jnp.ndarray:
        if "lr" not in self._dev:
            self._dev["lr"] = self._put(self._host_lr)
        return self._dev["lr"]

    @property
    def hr(self) -> jnp.ndarray:
        if "hr" not in self._dev:
            self._dev["hr"] = self._put(self._host_hr)
        return self._dev["hr"]

    @property
    def hrz(self) -> jnp.ndarray:
        """HR downsampled along z only (pass-1 target); for 2D data (Z == 1)
        this is HR itself. Computed per volume to bound temporaries."""
        if "hrz" not in self._dev:
            z_factor = self._host_hr.shape[1] // self._host_lr.shape[1]
            if z_factor <= 1:
                self._dev["hrz"] = self.hr
            else:
                # build in place with buffer donation: the accumulator is
                # created once in its final (possibly sharded) layout and each
                # volume is downsampled (z is axis 0 of one (Z, Y, X, C)
                # volume) then written into its row, so the transient HBM
                # cost is 1× hrz + one HR volume — a python loop + jnp.stack
                # would hold 2× hrz on the default device (the CLAUDE.md
                # sweep-OOM pattern), defeating sharded residency
                n = self._host_hr.shape[0]
                shape = (n, self._host_hr.shape[1] // z_factor,
                         *self._host_hr.shape[2:])
                make = partial(jnp.zeros, shape, jnp.float32)
                if self._vol_sharding is not None:
                    acc = jax.jit(make, out_shardings=self._vol_sharding)()
                    set_ = jax.jit(
                        lambda a, i, v: jax.lax.dynamic_update_index_in_dim(
                            a, downsample_axis(v, factor=z_factor, axis=0),
                            i, 0),
                        donate_argnums=(0,),
                        out_shardings=self._vol_sharding)
                else:
                    acc = jax.jit(make)()
                    set_ = jax.jit(
                        lambda a, i, v: jax.lax.dynamic_update_index_in_dim(
                            a, downsample_axis(v, factor=z_factor, axis=0),
                            i, 0),
                        donate_argnums=(0,))
                for i in range(n):
                    acc = set_(acc, jnp.int32(i),
                               jnp.asarray(self._host_hr[i]))
                self._dev["hrz"] = acc
        return self._dev["hrz"]

    @property
    def interm(self) -> jnp.ndarray:
        if "interm" not in self._dev:
            if "interm" not in self._src:
                return self.hrz
            # placement deferred from __init__ so shard_over (called before
            # first use by Trainer) decides the layout — placing at init
            # would spike the full stack onto the default device first
            self._dev["interm"] = self._put(self._src.pop("interm"))
        return self._dev["interm"]

    @property
    def final(self) -> jnp.ndarray:
        if "final" not in self._dev:
            if "final" not in self._src:
                return self.hr
            self._dev["final"] = self._put(self._src.pop("final"))
        return self._dev["final"]

    def _idx(self, temporal: bool):
        return self.dense_idx_t if temporal else self.dense_idx

    def _run(self, fn, arrays: tuple, key, batch: int, plane: str,
             temporal: bool):
        """Dispatch a _sample_pass* kernel, honoring sharded residency.

        After shard_over() the dense index holds SHARD-LOCAL volume numbers
        and the volume stacks are sharded, so the kernel must run inside a
        shard_map (each device draws from its local shard) — calling it
        directly would gather from the wrong volumes AND force GSPMD to
        all-gather the whole dataset. Each device draws ceil(batch/n_shards)
        samples (per-device key folded with the mesh axis index, matching
        train.loop.make_sampler); the concatenated result is trimmed to
        ``batch``.
        """
        if self.n_shards <= 1:
            return fn(*arrays, self._idx(temporal), key, batch, plane,
                      temporal, self.st)
        from jax.sharding import PartitionSpec as P
        from mpgan_tpu.parallel.mesh import DATA_AXIS
        sub = -(-batch // self.n_shards)
        st_local = self.st_local

        def local(arrs, didx_l, key_):
            k = jax.random.fold_in(key_, jax.lax.axis_index(DATA_AXIS))
            return fn(*arrs, didx_l, k, sub, plane, temporal, st_local)

        out = jax.shard_map(
            local, mesh=self._mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS))(arrays, self._idx(temporal), key)
        total = sub * self.n_shards
        if total != batch:
            # EVENLY-SPREAD trim, not a prefix: rows are ordered shard
            # 0..N-1, so keeping the first `batch` rows would make small
            # preview batches sample only the lowest-index shards' sims
            # forever. linspace (vs a stride of total//batch, which
            # degenerates to a prefix whenever batch > total//2) spreads
            # the kept rows over ALL shards; spacing >= 1 guarantees the
            # rounded indices are distinct.
            sel = np.round(np.linspace(0, total - 1, batch)).astype(np.int32)
            out = jax.tree.map(lambda x: x[sel], out)
        return out

    def sample_pass1(self, key, batch: int, temporal: bool = False,
                     plane: str = "xy"):
        """Pass-1 batch: {'lr' (B,t,t,C), 'hr' (B,ts,ts,1)} [+ prev/next]."""
        return self._run(_sample_pass1, (self.lr, self.hrz), key, batch,
                         plane, temporal)

    def sample_pass2(self, key, batch: int, temporal: bool = False,
                     plane: str = "xz"):
        """Pass-2 batch: {'interm' (B,t,ts,1), 'lr_vel' (B,t,ts,3),
        'hr' (B,ts,ts,1)} [+ prev/next]."""
        return self._run(_sample_pass2, (self.lr, self.interm, self.hr), key,
                         batch, plane, temporal)

    def sample_pass3(self, key, batch: int, temporal: bool = False,
                     plane: str = "yz"):
        """Pass-3 batch: {'final' (B,ts,ts,1), 'lr_vel' (B,ts,ts,3),
        'hr' (B,ts,ts,1)} [+ prev/next]."""
        return self._run(_sample_pass3, (self.lr, self.final, self.hr), key,
                         batch, plane, temporal)
