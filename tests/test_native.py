"""Native .uni codec tests: build, interop with the Python codec, parallel
read (SURVEY.md §2.13 N2)."""

import numpy as np
import pytest

from mpgan_tpu.io import native, uni

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain / zlib")


def test_native_reads_python_written(tmp_path):
    rng = np.random.default_rng(0)
    d = rng.random((10, 8, 6, 1), dtype=np.float32)
    p = str(tmp_path / "d.uni")
    uni.write_density(p, d[..., 0])
    got = native.read(p)
    np.testing.assert_array_equal(got, d)
    h = native.read_header(p)
    assert (h["dimZ"], h["dimY"], h["dimX"]) == (10, 8, 6)


def test_python_reads_native_written(tmp_path):
    rng = np.random.default_rng(1)
    v = rng.standard_normal((5, 6, 7, 3)).astype(np.float32)
    p = str(tmp_path / "v.uni")
    native.write(p, v, grid_type=uni.TYPE_MAC | uni.TYPE_VEC3,
                 element_type=uni.ELEM_VEC3)
    head, got = uni.readUni(p)
    assert head["elementType"] == uni.ELEM_VEC3
    np.testing.assert_array_equal(got, v)


def test_native_roundtrip_int(tmp_path):
    flags = np.arange(24, dtype=np.int32).reshape(2, 3, 4, 1)
    p = str(tmp_path / "f.uni")
    native.write(p, flags, grid_type=uni.TYPE_FLAGS, element_type=uni.ELEM_INT)
    got = native.read(p)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, flags)


def test_read_many_parallel(tmp_path):
    rng = np.random.default_rng(2)
    paths, arrays = [], []
    for i in range(12):
        a = rng.random((6, 6, 6, 1), dtype=np.float32)
        p = str(tmp_path / f"d{i}.uni")
        uni.write_density(p, a[..., 0])
        paths.append(p)
        arrays.append(a)
    got = native.read_many(paths, workers=6)
    for g, a in zip(got, arrays):
        np.testing.assert_array_equal(g, a)


def test_bad_file_raises(tmp_path):
    p = str(tmp_path / "junk.uni")
    open(p, "wb").write(b"not gzip at all")
    with pytest.raises(IOError):
        native.read(p)


def test_native_gridtype_matches_python(tmp_path):
    """The native header probe must expose gridType so MAC gating needs no
    second Python-side gzip decode per file on the dataset-load hot path."""
    from mpgan_tpu.io import native, uni
    if not native.available():
        import pytest
        pytest.skip("native codec unavailable")
    vel = np.random.default_rng(1).random((3, 4, 4, 3)).astype(np.float32)
    p = str(tmp_path / "v.uni")
    uni.writeUni(p, uni.make_header(vel, grid_type=uni.TYPE_MAC | uni.TYPE_VEC3),
                 vel)
    assert native.read_gridtype(p) == uni.read_gridtype(p) \
        == uni.TYPE_MAC | uni.TYPE_VEC3
