"""Native C kernels: build, and parity against the pure-Python/scipy paths."""

import numpy as np
import pytest
from scipy import ndimage

from deepliif_tpu import native
from deepliif_tpu import postprocessing as pp

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='no C++ compiler available')


def _random_mask(seed, h=100, w=120, density=0.3):
    rng = np.random.default_rng(seed)
    return (rng.random((h, w)) < density).astype(np.uint8)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_label8_matches_scipy_up_to_ordering(seed):
    m = _random_mask(seed)
    res = native.label8(m)
    assert res is not None
    lab_c, n_c = res
    lab_s, n_s = ndimage.label(m, structure=np.ones((3, 3), bool))
    assert n_c == n_s
    # same partition: label pairs must be in bijection
    flat_c, flat_s = lab_c.ravel(), lab_s.ravel()
    nz = flat_c != 0
    pairs = set(zip(flat_c[nz].tolist(), flat_s[nz].tolist()))
    assert len(pairs) == n_c  # one-to-one
    # native labels are in raster first-pixel order
    first = {}
    for i, l in enumerate(flat_c):
        if l and l not in first:
            first[l] = i
    order = sorted(first, key=first.get)
    assert order == sorted(order)


@pytest.mark.parametrize('seed', [3, 4, 5])
def test_moore_trace_matches_python(seed):
    m = _random_mask(seed, 60, 60, 0.4) * pp.LABEL_CELL
    lab, n = ndimage.label(m != 0, structure=np.ones((3, 3), bool))
    flat = lab.ravel()
    first = np.full(n + 1, flat.size, np.int64)
    np.minimum.at(first, flat, np.arange(flat.size))
    for li in range(1, n + 1):
        fy, fx = divmod(int(first[li]), m.shape[1])
        # isolate this component like the classification stage does
        comp = np.where(lab == li, np.uint8(pp.LABEL_CELL), np.uint8(0))
        bbox_py, bd_py = pp.get_cell_boundary(comp, fx, fy, _use_native=False)
        res = native.moore_trace(comp, fx, fy)
        assert res is not None
        bbox_c, bd_c = res
        if len(bd_py) == 1:
            assert bd_c == bd_py
        else:
            assert bbox_c == bbox_py, (li, bbox_c, bbox_py)
            assert bd_c == bd_py, li


def test_moore_trace_single_pixel():
    m = np.zeros((10, 10), np.uint8)
    m[5, 5] = pp.LABEL_CELL
    res = native.moore_trace(m, 5, 5)
    assert res[1] == [(5, 5)]


def test_golden_counts_still_match_with_native():
    import json
    import os
    from PIL import Image
    src = '/root/reference/Datasets/Sample_Dataset/val'
    if not os.path.isdir(src):
        pytest.skip('reference dataset absent')
    with open(os.path.join(src, 'metrics.json')) as f:
        golden = json.load(f)['Lung1']
    img = Image.open(os.path.join(src, 'Lung1.png'))
    w, h = img.size
    _, _, scoring = pp.compute_final_results(
        img.crop((0, 0, h, h)), img.crop((w - h, 0, w, h)), None, '40x',
        seg_thresh=150)
    assert scoring['num_total'] == golden['num_total']
    assert scoring['num_pos'] == golden['num_pos']
