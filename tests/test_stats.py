"""Metrics suite tests: torch/skimage-free implementations verified against
known values and reference semantics."""

import numpy as np
import pytest

from deepliif_tpu import stats


def test_compute_metrics_perfect_and_zero():
    a = np.zeros((10, 10)); a[2:5, 2:5] = 1
    m = stats.compute_metrics(a, a)
    assert m['IOU'] == 1 and m['Dice'] == 1 and m['PixAcc'] == 1
    empty = np.zeros((10, 10))
    m2 = stats.compute_metrics(empty, empty)
    assert m2['IOU'] == 1  # reference zero-TP empty-GT convention
    m3 = stats.compute_metrics(a, empty)
    assert m3['IOU'] == 0


def test_compute_metrics_half_overlap():
    gt = np.zeros((10, 10)); gt[0:2, 0:4] = 1         # 8 px
    mk = np.zeros((10, 10)); mk[0:2, 2:6] = 1         # 8 px, overlap 4
    m = stats.compute_metrics(mk, gt)
    assert abs(m['IOU'] - 4 / 12) < 1e-9
    assert abs(m['Dice'] - 8 / 16) < 1e-9
    assert abs(m['precision'] - 0.5) < 1e-9


def test_aji_identical_and_disjoint():
    img = np.zeros((20, 20))
    img[2:6, 2:6] = 1
    img[10:15, 10:15] = 1
    assert stats.compute_aji(img, img) == 1.0
    other = np.zeros((20, 20)); other[0:3, 15:19] = 1
    assert stats.compute_aji(img, other) == 0.0


def test_ssim_identical_is_one_and_matches_structure():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (64, 64), np.uint8).astype(np.float64)
    assert stats.ssim(a, a, data_range=255) == pytest.approx(1.0, abs=1e-7)
    noisy = a + rng.normal(0, 25, a.shape)
    s = stats.ssim(noisy, a, data_range=255)
    assert 0 < s < 0.99


def test_ssim_matches_reference_tolerance_contract():
    """The reference consistency gate is 1-SSIM < 0.0003 for identical
    pipelines; small perturbations must stay well below it."""
    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, (128, 128, 3), np.uint8).astype(np.float64)
    b = a.copy()
    b[0, 0, 0] += 1  # one-pixel LSB difference
    assert 1 - stats.ssim(b, a, data_range=255) < 0.0003


def test_psnr_and_mse():
    a = np.zeros((8, 8)); b = np.full((8, 8), 10.0)
    assert stats.mse(a, b) == 100.0
    assert stats.psnr(a, b) == pytest.approx(10 * np.log10(255 ** 2 / 100))


def test_swd_self_is_small():
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(4)]
    res_same = stats.swd(imgs, imgs, n_levels=2, n_descriptors=256, seed=3)
    other = [rng.integers(100, 200, (64, 64, 3), np.uint8) for _ in range(4)]
    res_diff = stats.swd(imgs, other, n_levels=2, n_descriptors=256, seed=3)
    assert res_same['mean'] < res_diff['mean']


def test_frechet_distance_zero_for_identical():
    rng = np.random.default_rng(4)
    f = rng.normal(size=(100, 16))
    assert stats.frechet_distance(f, f) == pytest.approx(0.0, abs=1e-6)
    g = f + 5.0
    assert stats.frechet_distance(f, g) > 10


def test_get_cell_count_metrics_on_sample(tmp_path):
    import os
    src = '/root/reference/Datasets/Sample_Dataset/val'
    if not os.path.isdir(src):
        pytest.skip('reference dataset absent')
    import shutil
    for f in ('Lung1.png', 'Bladder1.png'):
        shutil.copy(os.path.join(src, f), tmp_path / f)
    m = stats.get_cell_count_metrics(str(tmp_path), seg_thresh=150)
    assert m['Lung1']['num_total'] == 60
    assert m['Bladder1']['num_total'] == 183
    assert (tmp_path / 'metrics.json').exists()


def test_detection_adapters():
    from deepliif_tpu.stats.adapters import (detection_points_from_mask,
                                             match_detections,
                                             split_touching_cells)
    mask = np.zeros((60, 60), bool)
    mask[10:20, 10:20] = True
    mask[30:45, 30:45] = True
    pts = detection_points_from_mask(mask)
    assert len(pts) == 2
    yy, xx = np.mgrid[:60, :80]
    m2 = ((yy - 30) ** 2 + (xx - 25) ** 2 < 15 ** 2) | \
         ((yy - 30) ** 2 + (xx - 52) ** 2 < 15 ** 2)
    lab = split_touching_cells(m2)
    assert len(np.unique(lab)) - 1 == 2  # touching circles separated
    m = match_detections([(10, 10), (30, 30), (55, 55)], [(11, 9), (29, 31)],
                         max_distance=5)
    assert m['tp'] == 2 and m['fp'] == 1 and m['fn'] == 0


def test_ssim_reference_protocol_mode():
    """gaussian_weights/sigma/use_sample_covariance reproduce the skimage
    call the reference evaluation makes (ComputeStatistics.py:84)."""
    from deepliif_tpu import stats
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (64, 64), np.uint8).astype(np.float64) / 255
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1)
    assert stats.ssim(a, a, data_range=255, gaussian_weights=True,
                      sigma=1.5, use_sample_covariance=False) == 1.0
    g = stats.ssim(a, b, data_range=1.0, gaussian_weights=True,
                   sigma=1.5, use_sample_covariance=False)
    u = stats.ssim(a, b, data_range=1.0)
    assert 0 < g < 1 and 0 < u < 1 and g != u  # different windows
    # uint8 inputs default to the dtype range (skimage convention)
    au = (a * 255).astype(np.uint8)
    bu = (b * 255).astype(np.uint8)
    assert abs(stats.ssim(au, bu) - stats.ssim(au, bu, data_range=255)) < 1e-12


def test_swd_reference_protocol():
    """Paired patch indices (the reference protocol): identical image sets
    give exactly 0, and results carry the reference's x1e3 scale."""
    from deepliif_tpu import stats
    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, (4, 64, 64, 3), np.uint8)
    b = rng.integers(0, 255, (4, 64, 64, 3), np.uint8)
    same = stats.swd(a, a)
    assert same['mean'] == 0.0           # unpaired sampling would be noisy
    diff = stats.swd(a, b)
    assert diff['mean'] > 1.0            # x1e3 scale: O(10-100) for noise
    with pytest.raises(ValueError, match='too small'):
        stats.swd(np.zeros((2, 6, 6, 3), np.uint8),
                  np.zeros((2, 6, 6, 3), np.uint8))


def test_postprocess_marker_uses_channel_max(monkeypatch):
    """The engine converts the inferred marker with the reference's
    grayscale convention — per-pixel MAX over RGB (to_array(marker, True),
    ref models/__init__.py:874) — not PIL luma."""
    from PIL import Image
    from deepliif_tpu import postprocessing as pp
    from deepliif_tpu.models import postprocess

    captured = {}
    real = pp.compute_final_results

    def spy(orig, seg, marker, *a, **kw):
        captured['marker'] = marker
        return real(orig, seg, marker, *a, **kw)

    monkeypatch.setattr(pp, 'compute_final_results', spy)
    rng = np.random.default_rng(2)
    marker_rgb = rng.integers(0, 255, (32, 32, 3), np.uint8)
    images = {'Seg': Image.fromarray(np.zeros((32, 32, 3), np.uint8)),
              'mod3-Marker': Image.fromarray(marker_rgb)}
    orig = Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8))
    postprocess(orig, images, 512, 'DeepLIIF')
    np.testing.assert_array_equal(captured['marker'], marker_rgb.max(axis=2))
