"""Host-side dataset assembly — the reference's ``fluiddataloader.py`` (L2).

Indexes ``<base>/sim_%04d/`` directories and loads per-frame LR/HR .uni
volumes into dense numpy arrays (SURVEY.md §2.4). Like the reference,
everything is loaded eagerly into host RAM (``data_fraction`` bounds it);
unlike the reference, the arrays are then moved once to device and all
per-step sampling/augmentation happens on-device (SURVEY.md §3.1 rebuild
consequence — no per-step feed_dict).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from mpgan_tpu.io import uni

LOW_DENSITY = "density_low_%04d.uni"
LOW_VELOCITY = "velocity_low_%04d.uni"
HIGH_DENSITY = "density_high_%04d.uni"
HIGH_VELOCITY = "velocity_high_%04d.uni"


@dataclass
class FluidDataset:
    """Dense LR/HR volume stacks.

    lr: (N, Z, Y, X, C)  — C = 1 (density) or 4 (density + vx, vy, vz)
    hr: (N, Z·s, Y·s, X·s, 1) — HR density
    n_sims, n_frames: N = n_sims · n_frames
    up_res: spatial factor s
    """
    lr: np.ndarray
    hr: np.ndarray
    n_sims: int
    n_frames: int
    up_res: int

    @property
    def use_velocities(self) -> bool:
        return self.lr.shape[-1] >= 4

    @property
    def use_vorticities(self) -> bool:
        return self.lr.shape[-1] >= 7


def vorticity(vel: np.ndarray) -> np.ndarray:
    """Curl of a (Z, Y, X, 3) velocity field, central differences, LR units
    (the reference's ``useVorticities`` input channels, SURVEY.md §2.1).

    Central differences in the interior, one-sided at the boundary planes
    (np.gradient) — the solver domain is a closed box, so a periodic
    roll-based stencil would difference opposite faces against each other
    and inject spurious vorticity at every boundary cell."""
    def central(a, axis):
        return np.gradient(a, axis=axis)
    vx, vy, vz = vel[..., 0], vel[..., 1], vel[..., 2]
    wx = central(vz, 1) - central(vy, 0)   # axes: 0=z, 1=y, 2=x
    wy = central(vx, 0) - central(vz, 2)
    wz = central(vy, 2) - central(vx, 1)
    return np.stack([wx, wy, wz], axis=-1).astype(np.float32)


class FluidDataLoader:
    """Reference-shaped loader: ``FluidDataLoader(...).get()`` → FluidDataset."""

    def __init__(self, base_path: str, from_sim: int, to_sim: int,
                 frame_min: int = 0, frame_max: int = 120,
                 use_velocities: bool = True, data_fraction: float = 1.0,
                 use_vorticities: bool = False, mac_recenter: bool = False):
        self.base_path = base_path
        self.sims = list(range(from_sim, to_sim + 1))
        self.frame_min = frame_min
        self.frame_max = frame_max
        self.use_velocities = use_velocities
        self.use_vorticities = use_vorticities and use_velocities
        self.data_fraction = data_fraction
        self.mac_recenter = mac_recenter

    def _frames_for(self, sim_dir: str) -> list[int]:
        # keep only the first CONTIGUOUS run of frames: a gap in the middle
        # (e.g. an interrupted datagen sweep) must truncate, not be skipped —
        # the temporal-triplet sampler treats adjacent array indices as
        # adjacent sim frames (dt = 1), and a silently bridged gap would
        # train the temporal loss on dt=2 pairs labeled dt=1
        # a frame counts only when EVERY file this load needs exists:
        # datagen writes density before velocity before HR, so an interrupt
        # can leave a frame with density but no velocity — keying on density
        # alone would crash at decode instead of truncating here
        patterns = [LOW_DENSITY, HIGH_DENSITY]
        if self.use_velocities:
            patterns.append(LOW_VELOCITY)
        frames: list[int] = []
        for f in range(self.frame_min, self.frame_max):
            if all(os.path.exists(os.path.join(sim_dir, p % f))
                   for p in patterns):
                frames.append(f)
            elif frames:
                import warnings
                warnings.warn(
                    f"{sim_dir}: frame {f} missing/incomplete after "
                    f"{len(frames)} contiguous frames — truncating this sim "
                    f"there to keep temporal adjacency (dt=1) intact")
                break
        if self.data_fraction < 1.0 and frames:
            # contiguous prefix, NOT strided: temporal triplets assume
            # adjacent array indices are adjacent sim frames (dt = 1)
            keep = max(1, int(len(frames) * self.data_fraction))
            frames = frames[:keep]
        return frames

    def get(self) -> FluidDataset:
        """Load all sims/frames. Uses the native parallel codec when built
        (mpgan_tpu.io.native — ~#cores× faster for dataset-scale loads);
        falls back to the pure-Python decoder otherwise."""
        per_sim: list[tuple[str, list[int]]] = []
        for sim in self.sims:
            sim_dir = os.path.join(self.base_path, f"sim_{sim:04d}")
            if not os.path.isdir(sim_dir):
                raise FileNotFoundError(f"missing sim dir {sim_dir}")
            frames = self._frames_for(sim_dir)
            if not frames:
                raise FileNotFoundError(f"no frames in {sim_dir}")
            per_sim.append((sim_dir, frames))
        # truncate every sim to the global minimum so N == n_sims·n_frames
        # (frame arithmetic in the tile creator relies on a rectangular grid;
        # uneven counts would let temporal triplets cross sim boundaries)
        n_frames = min(len(fr) for _, fr in per_sim)
        d_paths, v_paths, h_paths = [], [], []
        for sim_dir, frames in per_sim:
            for f in frames[:n_frames]:
                d_paths.append(os.path.join(sim_dir, LOW_DENSITY % f))
                if self.use_velocities:
                    v_paths.append(os.path.join(sim_dir, LOW_VELOCITY % f))
                h_paths.append(os.path.join(sim_dir, HIGH_DENSITY % f))

        from mpgan_tpu.io import native
        if native.available():
            d_arrs = native.read_many(d_paths)
            v_arrs = native.read_many(v_paths) if v_paths else []
            h_arrs = native.read_many(h_paths)
        else:
            d_arrs = [uni.readUni(p)[1] for p in d_paths]
            v_arrs = [uni.readUni(p)[1] for p in v_paths]
            h_arrs = [uni.readUni(p)[1] for p in h_paths]

        if self.mac_recenter:
            # average staggered MAC faces to cell centers (SURVEY.md §2.3
            # "Verify") — but only for files whose header carries TypeMAC;
            # already-cell-centered Vec3 grids must pass through untouched.
            # Header peek via the native probe when built (the Python peek
            # is a full per-file gzip header decode on the load hot path).
            gridtype = (native.read_gridtype if native.available()
                        else uni.read_gridtype)
            v_arrs = [uni.recenter_mac(v)
                      if gridtype(p) & uni.TYPE_MAC else v
                      for p, v in zip(v_paths, v_arrs)]
        if self.use_velocities:
            chans = [np.concatenate([d.astype(np.float32),
                                     v.astype(np.float32)], axis=-1)
                     for d, v in zip(d_arrs, v_arrs)]
            if self.use_vorticities:
                chans = [np.concatenate([c, vorticity(c[..., 1:4])], axis=-1)
                         for c in chans]
            lr = np.stack(chans)
        else:
            lr = np.stack([d.astype(np.float32) for d in d_arrs])
        hr = np.stack([h.astype(np.float32) for h in h_arrs])
        # infer SR factor from Y (valid for 2D data too, where Z == 1)
        s = hr.shape[2] // lr.shape[2]
        return FluidDataset(lr=lr, hr=hr, n_sims=len(self.sims),
                            n_frames=n_frames, up_res=s)
