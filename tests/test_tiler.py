"""Tiler geometry parity: exact coordinates, mirror padding, stitch
round-trip (stitching a tile batch equal to the input reproduces the input)."""

import numpy as np
import pytest

from deepliif_tpu.utils.tiler import InferenceTiler


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (h, w, 3), np.uint8)


@pytest.mark.parametrize('h,w,ts,ov', [
    (512, 512, 512, 32),     # single tile
    (512, 3072, 512, 32),    # training-row shape
    (949, 1381, 512, 32),    # ROI_1 shape (irregular)
    (100, 80, 512, 32),      # smaller than patch -> mirror pad
    (600, 600, 256, 16),
])
def test_stitch_identity(h, w, ts, ov):
    img = _img(h, w)
    tiler = InferenceTiler(img, ts, ov)
    tiles = tiler.tiles()
    assert tiles.shape[1:] == (ts, ts, 3)
    tiler.stitch_batch('out', tiles)
    res = tiler.results()['out']
    np.testing.assert_array_equal(res, img)


def test_tile_coords_match_reference_walk():
    """Coordinates must follow the reference loop: step=center, clamp at edge
    (util/__init__.py:256-261)."""
    h, w, ts, ov = 700, 1000, 512, 32
    tiler = InferenceTiler(_img(h, w), ts, ov)
    patch = ts
    cw = patch - 2 * ov
    expected = []
    y = 0
    while y < h:
        yy = min(y, h - patch)
        x = 0
        while x < w:
            xx = min(x, w - patch)
            expected.append((xx, yy))
            x += cw
        y += cw
    assert tiler.coords == expected


def test_mirror_pad_small_image():
    img = _img(40, 60)
    tiler = InferenceTiler(img, 128, 0)
    tiles = tiler.tiles()
    assert tiles.shape == (1, 128, 128, 3)
    # left 60 columns of the first 40 rows = original
    np.testing.assert_array_equal(tiles[0, :40, :60], img)
    # mirrored horizontally next to it
    np.testing.assert_array_equal(tiles[0, :40, 60:120], img[:, ::-1])
    # results crop back to original size
    tiler.stitch_batch('out', tiles)
    assert tiler.results()['out'].shape == (40, 60, 3)


def test_multi_image_list_input():
    a, b = _img(100, 200, 1), _img(100, 200, 2)
    tiler = InferenceTiler([a, b], 128, 8)
    ta, tb = tiler.tiles()
    assert ta.shape == tb.shape
    assert not np.array_equal(ta, tb)


def test_iterator_api_matches_batch():
    img = _img(300, 300)
    tiler = InferenceTiler(img, 128, 8)
    it_tiles = np.stack(list(iter(tiler)))
    np.testing.assert_array_equal(it_tiles, tiler.tiles())
