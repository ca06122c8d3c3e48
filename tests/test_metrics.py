"""ssim_volume (utils/metrics.py): identity, noise monotonicity, and
agreement with a direct sliding-window reference implementation."""

import numpy as np
import pytest

from mpgan_tpu.utils.metrics import ssim_volume

pytestmark = pytest.mark.quick


def _rand_vol(shape, seed=0):
    return np.random.default_rng(seed).random(shape, dtype=np.float32)


def test_identity_is_one():
    x = _rand_vol((12, 13, 14, 1))
    assert ssim_volume(x, x) == pytest.approx(1.0, abs=1e-5)


def test_noise_monotonicity():
    x = _rand_vol((16, 16, 16))
    rng = np.random.default_rng(1)
    small = x + 0.02 * rng.standard_normal(x.shape).astype(np.float32)
    big = x + 0.2 * rng.standard_normal(x.shape).astype(np.float32)
    s_small = ssim_volume(small, x)
    s_big = ssim_volume(big, x)
    assert 1.0 > s_small > s_big


def test_constant_offset_penalized_less_than_structure_loss():
    """A uniform brightness shift (structure preserved) scores higher than
    shuffling the same voxels (structure destroyed) at equal MSE scale."""
    x = _rand_vol((12, 12, 12))
    shifted = x + 0.1
    shuffled = np.random.default_rng(2).permutation(x.reshape(-1)).reshape(x.shape)
    assert ssim_volume(shifted, x) > ssim_volume(shuffled, x)


def _ssim_direct(a, b, win, sigma, peak):
    """Dense sliding-window reference (numpy, O(N·w³)) — tiny inputs only."""
    g = [np.exp(-0.5 * ((np.arange(w) - (w - 1) / 2) / sigma) ** 2)
         for w in win]
    g = [k / k.sum() for k in g]
    w3 = g[0][:, None, None] * g[1][None, :, None] * g[2][None, None, :]
    c1, c2 = (0.01 * peak) ** 2, (0.03 * peak) ** 2
    zz, yy, xx = a.shape
    vals = []
    for z in range(zz - win[0] + 1):
        for y in range(yy - win[1] + 1):
            for x in range(xx - win[2] + 1):
                pa = a[z:z + win[0], y:y + win[1], x:x + win[2]]
                pb = b[z:z + win[0], y:y + win[1], x:x + win[2]]
                ma, mb = (w3 * pa).sum(), (w3 * pb).sum()
                va = (w3 * pa * pa).sum() - ma * ma
                vb = (w3 * pb * pb).sum() - mb * mb
                cov = (w3 * pa * pb).sum() - ma * mb
                vals.append(((2 * ma * mb + c1) * (2 * cov + c2))
                            / ((ma * ma + mb * mb + c1) * (va + vb + c2)))
    return float(np.mean(vals))


def test_matches_direct_reference():
    a = _rand_vol((8, 9, 10), seed=3)
    b = np.clip(a + 0.05 * _rand_vol((8, 9, 10), seed=4) - 0.025, 0, 1)
    got = ssim_volume(a, b, win_size=5, sigma=1.5)
    want = _ssim_direct(a.astype(np.float64), b.astype(np.float64),
                        (5, 5, 5), 1.5, 1.0)
    assert got == pytest.approx(want, abs=2e-5)


def test_2d_volume_window_degrades():
    """Z == 1 (dataDim 2): the z window shrinks to 1 and SSIM still works."""
    x = _rand_vol((1, 24, 24, 1), seed=5)
    noisy = x + 0.1 * _rand_vol((1, 24, 24, 1), seed=6) - 0.05
    assert ssim_volume(x, x) == pytest.approx(1.0, abs=1e-5)
    assert 0.0 < ssim_volume(noisy, x) < 1.0


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        ssim_volume(_rand_vol((4, 4, 4)), _rand_vol((4, 4, 5)))
