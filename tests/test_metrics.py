"""Image-quality metrics (utils/metrics.py): PSNR + SSIM.

SSIM is pinned two ways: invariants (identity, symmetry, range,
monotone degradation) and a brute-force single-window cross-check that
recomputes the Wang-et-al. statistics directly at one location.
"""

import numpy as np
import pytest

from learn_nerf_tpu.utils.metrics import _gaussian_kernel, psnr, ssim


def test_psnr_basics():
    a = np.random.RandomState(0).randint(0, 256, (24, 24, 3)).astype(np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.astype(np.float64) + 10.0
    # Uniform +10 error: MSE=100 -> 10*log10(255^2/100).
    assert psnr(a, b) == pytest.approx(10 * np.log10(255.0**2 / 100.0))


def test_ssim_identity_symmetry_range():
    rng = np.random.RandomState(1)
    a = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    b = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    assert ssim(a, a) == pytest.approx(1.0)
    assert ssim(a, b) == pytest.approx(ssim(b, a))
    assert -1.0 <= ssim(a, b) <= 1.0
    # Unrelated noise images: structurally dissimilar.
    assert ssim(a, b) < 0.2


def test_ssim_monotone_under_noise():
    rng = np.random.RandomState(2)
    # Smooth structured image (gradient + blob) so structure exists.
    y, x = np.mgrid[0:40, 0:40]
    img = 128 + 60 * np.sin(x / 6.0) * np.cos(y / 9.0)
    scores = []
    for sigma in (0.0, 5.0, 20.0, 60.0):
        noisy = img + rng.randn(*img.shape) * sigma
        scores.append(ssim(img, np.clip(noisy, 0, 255)))
    assert scores[0] == pytest.approx(1.0)
    assert scores == sorted(scores, reverse=True)


def test_ssim_grayscale_matches_single_channel():
    rng = np.random.RandomState(3)
    a = rng.rand(20, 20) * 255
    b = np.clip(a + rng.randn(20, 20) * 12, 0, 255)
    assert ssim(a, b) == pytest.approx(ssim(a[..., None], b[..., None]))


def test_ssim_brute_force_single_window():
    """An image exactly the window size has ONE valid window: the mean
    SSIM must equal the direct Wang-et-al. formula with Gaussian-weighted
    population moments."""
    rng = np.random.RandomState(4)
    a = rng.rand(11, 11) * 255
    b = np.clip(a + rng.randn(11, 11) * 25, 0, 255)
    k1 = _gaussian_kernel()
    w = np.outer(k1, k1)
    mu_a = (w * a).sum()
    mu_b = (w * b).sum()
    var_a = (w * a * a).sum() - mu_a**2
    var_b = (w * b * b).sum() - mu_b**2
    cov = (w * a * b).sum() - mu_a * mu_b
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    expected = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    assert ssim(a, b) == pytest.approx(expected, rel=1e-12)


def test_ssim_errors():
    a = np.zeros((8, 8))
    with pytest.raises(ValueError, match="smaller than"):
        ssim(a, a)
    with pytest.raises(ValueError, match="shape mismatch"):
        ssim(np.zeros((16, 16)), np.zeros((16, 17)))
