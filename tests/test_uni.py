"""Round-trip and format tests for mantaflow .uni I/O (SURVEY.md §2.3, §4(1))."""

import gzip
import struct

import numpy as np
import pytest

from mpgan_tpu.io import uni

pytestmark = pytest.mark.quick


def test_density_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    dens = rng.random((12, 10, 8, 1), dtype=np.float32)
    p = str(tmp_path / "density_low_0000.uni")
    uni.writeUni(p, uni.make_header(dens, grid_type=uni.TYPE_REAL), dens)
    head, back = uni.readUni(p)
    assert head["dimX"] == 8 and head["dimY"] == 10 and head["dimZ"] == 12
    assert head["elementType"] == uni.ELEM_REAL
    np.testing.assert_array_equal(back, dens)


def test_velocity_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    vel = rng.standard_normal((6, 5, 4, 3)).astype(np.float32)
    p = str(tmp_path / "velocity_low_0000.uni")
    uni.write_velocity(p, vel)
    head, back = uni.readUni(p)
    assert head["elementType"] == uni.ELEM_VEC3
    assert head["bytesPerElement"] == 12
    np.testing.assert_array_equal(back, vel)


def test_int_grid_roundtrip(tmp_path):
    flags = np.arange(2 * 3 * 4, dtype=np.int32).reshape(2, 3, 4, 1)
    p = str(tmp_path / "flags.uni")
    uni.writeUni(p, uni.make_header(flags, grid_type=uni.TYPE_FLAGS), flags)
    head, back = uni.readUni(p)
    assert head["elementType"] == uni.ELEM_INT
    np.testing.assert_array_equal(back, flags)


def test_header_is_288_bytes_and_gzip(tmp_path):
    """Golden structural check: MNT3 = gzip[4-byte magic + 288-byte header + data]."""
    dens = np.zeros((2, 2, 2, 1), dtype=np.float32)
    p = str(tmp_path / "d.uni")
    uni.write_density(p, dens[..., 0])
    raw = open(p, "rb").read()
    assert raw[:2] == b"\x1f\x8b"  # gzip magic
    payload = gzip.decompress(raw)
    assert payload[:4] == b"MNT3"
    assert len(payload) == 4 + 288 + 2 * 2 * 2 * 4
    # header fields parse back
    dx, dy, dz, gt, et, bpe = struct.unpack("iiiiii", payload[4:28])
    assert (dx, dy, dz) == (2, 2, 2)
    assert et == uni.ELEM_REAL and bpe == 4


def test_read_mnt2(tmp_path):
    """We must read legacy MNT2 files (older mantaflow output)."""
    dens = np.random.default_rng(2).random((3, 4, 5, 1), dtype=np.float32)
    p = str(tmp_path / "old.uni")
    hdr = struct.pack(
        "iiiiii256sQ", 5, 4, 3, uni.TYPE_REAL, uni.ELEM_REAL, 4,
        b"legacy".ljust(256, b"\x00"), 12345,
    )
    with gzip.open(p, "wb") as f:
        f.write(b"MNT2")
        f.write(hdr)
        f.write(memoryview(np.ascontiguousarray(dens.reshape(-1))))
    head, back = uni.readUni(p)
    assert head["magic"] == "MNT2"
    np.testing.assert_array_equal(back, dens)


def test_bad_magic_raises(tmp_path):
    p = str(tmp_path / "junk.uni")
    with gzip.open(p, "wb") as f:
        f.write(b"XXXX" + b"\x00" * 300)
    with pytest.raises(ValueError):
        uni.readUni(p)


def test_size_mismatch_raises(tmp_path):
    dens = np.zeros((2, 2, 2, 1), dtype=np.float32)
    head = uni.make_header(dens)
    head["dimX"] = 7
    with pytest.raises(ValueError):
        uni.writeUni(str(tmp_path / "bad.uni"), head, dens)


def test_recenter_mac_linear_field_exact():
    """Faces storing u(p)=p at p=x-1/2 (mantaflow lower-face layout) must
    recenter to exactly u=x at cell centers (interior; upper edge clamps)."""
    z, y, x = 4, 5, 6
    vel = np.zeros((z, y, x, 3), np.float32)
    vel[..., 0] = np.arange(x, dtype=np.float32)[None, None, :] - 0.5
    vel[..., 1] = np.arange(y, dtype=np.float32)[None, :, None] - 0.5
    vel[..., 2] = np.arange(z, dtype=np.float32)[:, None, None] - 0.5
    out = uni.recenter_mac(vel)
    np.testing.assert_allclose(
        out[:, :, :-1, 0], np.broadcast_to(np.arange(x - 1, dtype=np.float32),
                                           (z, y, x - 1)), atol=1e-6)
    np.testing.assert_allclose(
        out[:, :-1, :, 1],
        np.broadcast_to(np.arange(y - 1, dtype=np.float32)[:, None],
                        (z, y - 1, x)), atol=1e-6)
    np.testing.assert_allclose(
        out[:-1, :, :, 2],
        np.broadcast_to(np.arange(z - 1, dtype=np.float32)[:, None, None],
                        (z - 1, y, x)), atol=1e-6)
    # clamped upper edge repeats the last face value
    np.testing.assert_allclose(out[:, :, -1, 0], vel[:, :, -1, 0], atol=1e-6)
    # constant fields are invariant
    const = np.full((3, 3, 3, 3), 2.5, np.float32)
    np.testing.assert_array_equal(uni.recenter_mac(const), const)


def test_readuni_recenter_respects_mac_bit(tmp_path):
    rng = np.random.default_rng(5)
    vel = rng.random((4, 4, 4, 3), dtype=np.float32)
    p_mac = str(tmp_path / "mac.uni")
    uni.writeUni(p_mac, uni.make_header(
        vel, grid_type=uni.TYPE_MAC | uni.TYPE_VEC3), vel)
    _, raw = uni.readUni(p_mac)
    _, cent = uni.readUni(p_mac, recenter=True)
    np.testing.assert_allclose(cent, uni.recenter_mac(raw), atol=0)
    assert not np.allclose(cent, raw)
    # plain (non-MAC) vec3 grids are untouched by the flag
    p_vec = str(tmp_path / "vec.uni")
    uni.writeUni(p_vec, uni.make_header(vel, grid_type=uni.TYPE_VEC3), vel)
    _, vec = uni.readUni(p_vec, recenter=True)
    np.testing.assert_array_equal(vec, vel)


def test_write_velocity_is_plain_vec3_not_mac(tmp_path):
    """The in-repo solver writes cell-centered velocities, so write_velocity
    must NOT set the TypeMAC bit — readers gate half-cell recentering on it,
    and a wrong MAC claim would make macRecenter 1 silently shift every
    self-generated velocity field relative to density."""
    vel = np.random.default_rng(0).random((4, 6, 6, 3)).astype(np.float32)
    p = str(tmp_path / "velocity_low_0000.uni")
    uni.write_velocity(p, vel)
    gt = uni.read_gridtype(p)
    assert gt & uni.TYPE_VEC3 and not gt & uni.TYPE_MAC
    # and therefore recentering reads it back bit-identically
    _, back = uni.readUni(p, recenter=True)
    np.testing.assert_array_equal(back, vel)
