"""Tests for the loader and device-side tile creator (SURVEY.md §2.4/§2.5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpgan_tpu.data.loader import FluidDataLoader, FluidDataset
from mpgan_tpu.data import pipeline
from mpgan_tpu.solver import datagen


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("data"))
    datagen.generate_dataset(base, from_sim=1000, to_sim=1001, res_hi=32,
                             up_res=4, frames=4, seed=0)
    return FluidDataLoader(base, 1000, 1001, frame_min=0, frame_max=4).get()


def test_loader_shapes(tiny_dataset):
    ds = tiny_dataset
    assert ds.lr.shape == (8, 8, 8, 8, 4)     # 2 sims × 4 frames, 8³ LR, d+vel
    assert ds.hr.shape == (8, 32, 32, 32, 1)
    assert ds.up_res == 4 and ds.use_velocities


def test_loader_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        FluidDataLoader(str(tmp_path), 5, 5).get()


def _synthetic_dataset(n_sims=2, n_frames=3, zyx=(16, 24, 20), s=2, seed=0):
    rng = np.random.default_rng(seed)
    n = n_sims * n_frames
    z, y, x = zyx
    lr = rng.random((n, z, y, x, 4), dtype=np.float32)
    hr = rng.random((n, z * s, y * s, x * s, 1), dtype=np.float32)
    return FluidDataset(lr=lr, hr=hr, n_sims=n_sims, n_frames=n_frames, up_res=s)


def test_sample_pass1_shapes():
    ds = _synthetic_dataset()
    tc = pipeline.TileCreator(ds, tile_lr=8)
    out = tc.sample_pass1(jax.random.PRNGKey(0), batch=6)
    assert out["lr"].shape == (6, 8, 8, 4)
    assert out["hr"].shape == (6, 16, 16, 1)
    assert np.isfinite(np.asarray(out["lr"])).all()


def test_sample_pass1_temporal_triplets_shapes():
    ds = _synthetic_dataset()
    tc = pipeline.TileCreator(ds, tile_lr=8)
    out = tc.sample_pass1(jax.random.PRNGKey(1), batch=4, temporal=True)
    for k in ("lr", "lr_prev", "lr_next", "hr", "hr_prev", "hr_next"):
        assert k in out
    assert out["lr_prev"].shape == out["lr"].shape


def test_sample_pass2_shapes():
    ds = _synthetic_dataset()
    tc = pipeline.TileCreator(ds, tile_lr=8)
    out = tc.sample_pass2(jax.random.PRNGKey(2), batch=5)
    assert out["interm"].shape == (5, 8, 16, 1)
    assert out["lr_vel"].shape == (5, 8, 16, 3)
    assert out["hr"].shape == (5, 16, 16, 1)


def test_unaugmented_pass1_patch_matches_direct_crop():
    """With augment off and density threshold 0, LR patches must be exact
    sub-arrays of the LR volume (integer-aligned gathers)."""
    ds = _synthetic_dataset()
    tc = pipeline.TileCreator(ds, tile_lr=8, augment=False, density_threshold=0.0)
    out = tc.sample_pass1(jax.random.PRNGKey(3), batch=16)
    lr_np = ds.lr
    patch = np.asarray(out["lr"][:, :, :, 0])  # density channel
    # each patch row must appear somewhere in some volume: check via direct
    # search over all z-slices of all volumes for patch 0
    p0 = patch[0]
    found = False
    for n in range(lr_np.shape[0]):
        for zz in range(lr_np.shape[1]):
            sl = lr_np[n, zz, :, :, 0]
            for oy in range(sl.shape[0] - 8 + 1):
                for ox in range(sl.shape[1] - 8 + 1):
                    if np.allclose(sl[oy:oy+8, ox:ox+8], p0, atol=2e-3):
                        found = True
                        break
    assert found, "unaugmented patch not found as a sub-array of any slice"


def test_density_rejection_prefers_dense_tiles():
    """Dataset where one volume is empty: sampled tiles should avoid it."""
    ds = _synthetic_dataset(n_sims=2, n_frames=1)
    ds.lr[0] *= 0.0  # volume 0 empty
    ds.hr[0] *= 0.0
    tc = pipeline.TileCreator(ds, tile_lr=8, density_threshold=0.01)
    out = tc.sample_pass1(jax.random.PRNGKey(4), batch=8)
    means = np.asarray(out["lr"][..., 0].mean(axis=(1, 2)))
    assert (means > 0.01).all(), means


def test_triplet_adjacency_uses_same_location():
    """prev/center/next patches come from the same spatial window: on a
    dataset where volume values encode the frame index, patches differ by
    exactly the frame-value delta."""
    n_sims, n_frames, s = 1, 5, 2
    z, y, x = 12, 16, 16
    lr = np.zeros((n_frames, z, y, x, 4), np.float32)
    for f in range(n_frames):
        lr[f, ..., 0] = f + 1.0
    hr = np.zeros((n_frames, z * s, y * s, x * s, 1), np.float32)
    ds = FluidDataset(lr=lr, hr=hr, n_sims=n_sims, n_frames=n_frames, up_res=s)
    tc = pipeline.TileCreator(ds, tile_lr=6, augment=False, density_threshold=0.0)
    out = tc.sample_pass1(jax.random.PRNGKey(5), batch=4, temporal=True)
    d = np.asarray(out["lr"][..., 0])
    dp = np.asarray(out["lr_prev"][..., 0])
    dn = np.asarray(out["lr_next"][..., 0])
    np.testing.assert_allclose(d - dp, 1.0, atol=1e-5)
    np.testing.assert_allclose(dn - d, 1.0, atol=1e-5)
    assert d.min() >= 2.0 - 1e-5 and d.max() <= 4.0 + 1e-5  # frames 1..F-2


def test_pass2_interm_consistent_with_hrz():
    """Pass-2 input patches equal crops of the z-downsampled HR volume.

    HR is made constant along y so the (HR-lattice) slice-normal
    interpolation is exact and the match can be checked directly."""
    rng = np.random.default_rng(7)
    n_frames, s, z, y, x = 3, 2, 16, 24, 20
    zx = rng.random((n_frames, z * s, 1, x * s, 1), dtype=np.float32)
    hr = np.broadcast_to(zx, (n_frames, z * s, y * s, x * s, 1)).copy()
    lr = rng.random((n_frames, z, y, x, 4), dtype=np.float32)
    ds = FluidDataset(lr=lr, hr=hr, n_sims=1, n_frames=n_frames, up_res=s)
    tc = pipeline.TileCreator(ds, tile_lr=8, augment=False, density_threshold=0.0)
    out = tc.sample_pass2(jax.random.PRNGKey(6), batch=4)
    hrz = np.asarray(tc.hrz)
    p0 = np.asarray(out["interm"][0, :, :, 0])  # (t, t·s) in (z, x_hr)
    found = False
    for n in range(hrz.shape[0]):
        sl = hrz[n, :, 0, :, 0]  # (Z, Xs); constant along y
        for oz in range(sl.shape[0] - 8 + 1):
            for ox in range(sl.shape[1] - 16 + 1):
                if np.allclose(sl[oz:oz+8, ox:ox+16], p0, atol=2e-3):
                    found = True
    assert found


def test_pass2_custom_interm_source():
    """TileCreator with an explicit interm source uses it for pass-2 inputs."""
    ds = _synthetic_dataset(s=2)
    n, z, y, x, _ = ds.lr.shape
    interm = np.full((n, z, y * 2, x * 2, 1), 0.625, np.float32)
    tc = pipeline.TileCreator(ds, tile_lr=8, augment=False,
                              density_threshold=0.0, interm=interm)
    out = tc.sample_pass2(jax.random.PRNGKey(0), batch=4)
    np.testing.assert_allclose(np.asarray(out["interm"]), 0.625, atol=1e-5)
    # HR targets still come from the real HR volume
    assert float(np.asarray(out["hr"]).std()) > 0.1


def test_pass2_interm_shape_mismatch_raises():
    ds = _synthetic_dataset(s=2)
    bad = np.zeros((1, 2, 2, 2, 1), np.float32)
    with pytest.raises(ValueError):
        pipeline.TileCreator(ds, tile_lr=8, interm=bad)


def test_vorticity_channels_flow_through():
    """useVorticities: 7-channel LR patches sample and keep finite values,
    with vorticity channels pseudo-vector-transformed under flips."""
    from mpgan_tpu.data.loader import vorticity
    rng = np.random.default_rng(11)
    n, z, y, x = 2, 12, 16, 16
    vel = rng.standard_normal((n, z, y, x, 3)).astype(np.float32)
    dens = rng.random((n, z, y, x, 1), dtype=np.float32)
    vort = np.stack([vorticity(vel[i]) for i in range(n)])
    lr = np.concatenate([dens, vel, vort], axis=-1)
    hr = rng.random((n, z * 2, y * 2, x * 2, 1), dtype=np.float32)
    ds = FluidDataset(lr=lr, hr=hr, n_sims=1, n_frames=2, up_res=2)
    assert ds.use_vorticities
    tc = pipeline.TileCreator(ds, tile_lr=8, density_threshold=0.0)
    out = tc.sample_pass1(jax.random.PRNGKey(0), batch=4)
    assert out["lr"].shape == (4, 8, 8, 7)
    assert np.isfinite(np.asarray(out["lr"])).all()


def test_vorticity_pseudovector_under_flip():
    """Under an x-flip, in-plane velocity vx flips sign but vorticity wz
    (out-of-plane pseudo-vector) also flips; wx keeps, wy flips twice..."""
    from mpgan_tpu.ops.augment import transform_pseudovectors, transform_vectors
    import jax.numpy as jnp
    patch = np.zeros((4, 4, 7), np.float32)
    patch[..., 1] = 2.0   # v_w
    patch[..., 2] = 3.0   # v_h
    patch[..., 4] = 1.0   # w_w
    patch[..., 5] = 5.0   # w_h
    patch[..., 6] = 7.0   # w_out
    flip_x = jnp.asarray(np.diag([1.0, -1.0]).astype(np.float32))  # (h, w)
    out = transform_vectors(jnp.asarray(patch), flip_x, 3)
    out = np.asarray(transform_pseudovectors(out, flip_x, start=4, n=3))
    assert np.allclose(out[..., 1], -2.0)   # v_w flips
    assert np.allclose(out[..., 2], 3.0)    # v_h unchanged
    # det = -1: w' = det·M·w → w_w: -1·(-1·1)=1... sign algebra:
    assert np.allclose(out[..., 4], 1.0)    # w_w: det·(-w_w) = +1
    assert np.allclose(out[..., 5], -5.0)   # w_h: det·(+w_h) = -5
    assert np.allclose(out[..., 6], -7.0)   # w_out: det·w_out = -7


def test_hrz_matches_stack_downsample():
    """Regression: per-volume lazy hrz must equal downsampling the whole
    stack along the z axis (a wrong-axis bug silently corrupted pass-1
    targets once)."""
    from mpgan_tpu.ops.resample import downsample_axis
    ds = _synthetic_dataset(s=2)
    tc = pipeline.TileCreator(ds, tile_lr=8)
    want = np.asarray(downsample_axis(jnp.asarray(ds.hr), 2, axis=1))
    np.testing.assert_allclose(np.asarray(tc.hrz), want, atol=1e-5)
    assert tc.hrz.shape == (ds.hr.shape[0], ds.lr.shape[1],
                            ds.hr.shape[2], ds.hr.shape[3], 1)


def test_loader_truncates_to_min_frames(tmp_path):
    """Sims with uneven frame counts are truncated to the global minimum so
    temporal triplets never cross sim boundaries."""
    from mpgan_tpu.io import uni as uni_io
    import os
    rng = np.random.default_rng(13)
    for sim, n in ((1000, 4), (1001, 2)):
        d = str(tmp_path / f"sim_{sim:04d}")
        os.makedirs(d)
        for f in range(n):
            uni_io.write_density(os.path.join(d, f"density_low_{f:04d}.uni"),
                                 rng.random((4, 4, 4), dtype=np.float32))
            uni_io.write_velocity(os.path.join(d, f"velocity_low_{f:04d}.uni"),
                                  rng.random((4, 4, 4, 3), dtype=np.float32))
            uni_io.write_density(os.path.join(d, f"density_high_{f:04d}.uni"),
                                 rng.random((8, 8, 8), dtype=np.float32))
    ds = FluidDataLoader(str(tmp_path), 1000, 1001, frame_max=4).get()
    assert ds.n_frames == 2 and ds.lr.shape[0] == 4


def test_loader_mac_recenter(tmp_path):
    """macRecenter 1 must face-average only files whose header carries
    TypeMAC (true mantaflow staggered data) and pass self-generated
    (cell-centered Vec3) data through UNTOUCHED — the in-repo solver's
    writer must not claim MAC, or macRecenter would shift its velocities
    by half a cell relative to density (SURVEY.md §2.3 'Verify')."""
    import glob
    import os

    from mpgan_tpu.io import uni
    base = str(tmp_path)
    datagen.generate_dataset(base, from_sim=1000, to_sim=1000, res_hi=16,
                             up_res=2, frames=2, seed=3)
    plain = FluidDataLoader(base, 1000, 1000, frame_max=2).get()
    # fresh datagen output is cell-centered Vec3: macRecenter is a no-op
    cent0 = FluidDataLoader(base, 1000, 1000, frame_max=2,
                            mac_recenter=True).get()
    np.testing.assert_array_equal(cent0.lr, plain.lr)

    # rewrite velocity files claiming TypeMAC (as real mantaflow data
    # would): now macRecenter must equal manual face-averaging and leave
    # density untouched
    for p in glob.glob(os.path.join(base, "sim_1000",
                                    "velocity_low_*.uni")):
        _, vel = uni.readUni(p)
        uni.writeUni(p, uni.make_header(
            vel, grid_type=uni.TYPE_MAC | uni.TYPE_VEC3), vel)
    cent = FluidDataLoader(base, 1000, 1000, frame_max=2,
                           mac_recenter=True).get()
    np.testing.assert_array_equal(cent.lr[..., 0], plain.lr[..., 0])
    np.testing.assert_array_equal(cent.hr, plain.hr)
    for i in range(plain.lr.shape[0]):
        want = uni.recenter_mac(np.asarray(plain.lr[i, ..., 1:4]))
        np.testing.assert_allclose(np.asarray(cent.lr[i, ..., 1:4]), want,
                                   atol=1e-6)
    assert not np.allclose(cent.lr[..., 1:4], plain.lr[..., 1:4])


def test_shard_dense_empty_shard_uniform_fallback():
    """A shard with no above-threshold cells must fall back to a uniform
    lattice over its local pooled cells, not one pinned corner cell."""
    from mpgan_tpu.data.pipeline import _shard_dense
    # all dense cells live in shard 0's volumes (vols 0..1 of 4, 2 shards)
    dense = np.array([[0, 1, 2, 3], [1, 0, 1, 2], [0, 2, 2, 1],
                      [1, 1, 1, 1]], np.int32)
    out = _shard_dense(dense, n_shards=2, vols_per_shard=2,
                       grid_shape=(3, 4, 4))
    m = out.shape[0] // 2
    blk1 = out[m:]
    assert np.unique(blk1, axis=0).shape[0] > 1  # not a single repeated cell
    assert blk1[:, 0].min() >= 0 and blk1[:, 0].max() <= 1  # local vol ids
    assert blk1[:, 1].max() <= 2 and blk1[:, 2].max() <= 3
    # spread across volumes, not clustered at the origin
    assert len(np.unique(blk1[:, 0])) == 2


def test_shard_dense_temporal_fallback_frame_bounds():
    """The empty-shard fallback lattice for the TEMPORAL index must restrict
    volumes to frames in [1, F-2] so t±1 neighbors stay inside the sim —
    the global temporal index applies the same filter."""
    from mpgan_tpu.data.pipeline import _shard_dense
    # 2 shards × 2 sims × 3 frames; all dense cells in shard 0
    dense = np.array([[1, 0, 0, 0], [4, 1, 1, 1]], np.int32)
    out = _shard_dense(dense, n_shards=2, vols_per_shard=6,
                       grid_shape=(2, 2, 2), temporal_frames=3)
    m = out.shape[0] // 2
    blk1 = out[m:]
    frames = blk1[:, 0] % 3
    assert frames.min() >= 1 and frames.max() <= 1, np.unique(blk1[:, 0])


def test_vorticity_one_sided_at_boundaries():
    """A linear shear vx = y has constant curl wz = -1 EVERYWHERE, including
    the boundary planes — a periodic (roll-based) stencil would corrupt the
    edges by differencing opposite domain faces."""
    from mpgan_tpu.data.loader import vorticity
    z, y, x = 4, 8, 6
    vel = np.zeros((z, y, x, 3), np.float32)
    vel[..., 0] = np.arange(y, dtype=np.float32)[None, :, None]  # vx = y
    w = vorticity(vel)
    np.testing.assert_allclose(w[..., 2], -1.0, atol=1e-6)
    np.testing.assert_allclose(w[..., 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(w[..., 1], 0.0, atol=1e-6)


def test_frames_for_truncates_at_gap(tmp_path):
    """A missing frame in the middle of a sim must truncate the frame list
    there (dt=1 adjacency for temporal triplets), not be silently skipped —
    and a frame missing ANY needed file (e.g. velocity, when the datagen
    interrupt landed between a frame's density and velocity writes) counts
    as missing."""
    sim = tmp_path / "sim_0000"
    sim.mkdir()
    for f in [0, 1, 2, 4, 5]:  # gap at 3
        for pat in ("density_low_%04d.uni", "velocity_low_%04d.uni",
                    "density_high_%04d.uni"):
            (sim / (pat % f)).touch()
    ldr = FluidDataLoader(str(tmp_path), 0, 0, frame_min=0, frame_max=6)
    with pytest.warns(UserWarning, match="truncating"):
        frames = ldr._frames_for(str(sim))
    assert frames == [0, 1, 2]
    # density present but velocity missing = incomplete frame = truncate
    (sim / ("velocity_low_%04d.uni" % 2)).unlink()
    with pytest.warns(UserWarning, match="truncating"):
        frames = ldr._frames_for(str(sim))
    assert frames == [0, 1]
    # ... unless velocities aren't loaded at all
    ldr_d = FluidDataLoader(str(tmp_path), 0, 0, frame_min=0, frame_max=6,
                            use_velocities=False)
    with pytest.warns(UserWarning, match="truncating"):
        assert ldr_d._frames_for(str(sim)) == [0, 1, 2]


def test_direct_sample_methods_after_shard_over():
    """tc.sample_pass*() (the preview path) must stay correct after
    shard_over: each device draws from ITS local sims via shard_map — the
    shard-local dense index must never be applied to the global stacks."""
    from mpgan_tpu.parallel import mesh as pmesh
    n_sims, n_frames, s = 8, 3, 2
    z, y, x = 8, 12, 12
    rng = np.random.default_rng(3)
    lr = rng.random((n_sims * n_frames, z, y, x, 4), dtype=np.float32)
    for i in range(n_sims):  # density identifies the source sim
        lr[i * n_frames:(i + 1) * n_frames, ..., 0] = (i + 1) / 10.0
    hr = rng.random((n_sims * n_frames, z * s, y * s, x * s, 1),
                    dtype=np.float32)
    ds = FluidDataset(lr=lr, hr=hr, n_sims=n_sims, n_frames=n_frames,
                      up_res=s)
    tc = pipeline.TileCreator(ds, tile_lr=6, density_threshold=0.0,
                              augment=False)
    mesh = pmesh.make_mesh()
    assert tc.shard_over(mesh)

    # batch divisible by the mesh: rows [2d, 2d+1] come from device d's sims
    b = tc.sample_pass1(jax.random.PRNGKey(0), batch=16)
    vals = np.asarray(b["lr"][..., 0]).reshape(8, 2, -1)
    for d in range(8):
        np.testing.assert_allclose(
            vals[d], (d + 1) / 10.0, atol=1e-6,
            err_msg=f"device {d} sampled foreign sims (preview path)")

    # indivisible batch: evenly-spread trim covers low AND high shards (a
    # prefix trim would preview only the lowest-index shards' sims forever;
    # the earlier total//batch stride degenerated to exactly that whenever
    # batch > total//2, e.g. batch=6 on 8 shards)
    for batch, want in ((4, (0, 2, 5, 7)), (6, (0, 1, 3, 4, 6, 7)),
                        (3, (0, 4, 7))):
        b_ = tc.sample_pass1(jax.random.PRNGKey(1), batch=batch)
        assert b_["lr"].shape[0] == batch
        v_ = np.asarray(b_["lr"][..., 0]).reshape(batch, -1)
        for i, d in enumerate(want):
            np.testing.assert_allclose(
                v_[i], (d + 1) / 10.0, atol=1e-6,
                err_msg=f"batch={batch}: row {i} not from shard {d}")

    # pass-2 and pass-3 previews run too (shapes + locality of hr target)
    b2 = tc.sample_pass2(jax.random.PRNGKey(2), batch=8)
    assert b2["interm"].shape[0] == 8
    b3 = tc.sample_pass3(jax.random.PRNGKey(3), batch=8, temporal=True)
    assert b3["final"].shape[0] == 8
    assert np.isfinite(np.asarray(b3["hr_prev"])).all()


def test_pseudovector_scale_invariance():
    """Vorticity must stay consistent with the velocity field the network
    sees: the out-of-plane curl of v' = A⁻¹·v(A·p) is scale-INVARIANT, so a
    pure-scale transform must leave all vorticity channels unchanged (the
    old det(ainv)=1/σ² factor injected ±30-60% spurious magnitude per patch
    at the default scale range)."""
    from mpgan_tpu.ops.augment import transform_pseudovectors
    patch = np.zeros((4, 4, 7), np.float32)
    patch[..., 4] = 1.0
    patch[..., 5] = 5.0
    patch[..., 6] = 7.0
    for sigma in (0.8, 1.25):
        ainv = jnp.eye(2) / sigma  # pure scale: A = σI
        out = np.asarray(transform_pseudovectors(
            jnp.asarray(patch), ainv, start=4, n=3))
        np.testing.assert_allclose(out[..., 4:7], patch[..., 4:7], atol=1e-6,
                                   err_msg=f"sigma={sigma}")
    # rotation: in-plane components co-rotate magnitude-preserving
    th = 0.7
    c, s = np.cos(th), np.sin(th)
    ainv = jnp.asarray([[c, s], [-s, c]], jnp.float32) / 1.1  # rot + scale
    out = np.asarray(transform_pseudovectors(jnp.asarray(patch), ainv,
                                             start=4, n=3))
    mag_in = np.hypot(patch[..., 4], patch[..., 5])
    mag_out = np.hypot(out[..., 4], out[..., 5])
    np.testing.assert_allclose(mag_out, mag_in, rtol=1e-5)
    np.testing.assert_allclose(out[..., 6], patch[..., 6], atol=1e-6)
