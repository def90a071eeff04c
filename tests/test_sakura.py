"""Sakura .svslide container reader (utils/sakura.py) against synthetic
slides — a Bio-Formats-only format in the reference
(util/__init__.py:559-617) now read natively."""

import io
import sqlite3

import numpy as np
import pytest
from PIL import Image

from deepliif_tpu.utils.sakura import SakuraReader, is_svslide
from deepliif_tpu.utils.wsi import WSIReader


def _png(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='PNG')
    return buf.getvalue()


def _make_svslide(tmp_path, canvas, tile=(64, 48), name='slide', lens=20.0,
                  handler_row=True, size_row=True, split_channels=True,
                  drop=(), ds=1, extra_image_rows=(), hr_ref=False):
    """Build a Sakura-layout SQLite slide from ``canvas``. Channel
    payloads are grayscale PNGs (lossless) so region reads compare
    exactly; real scanners write grayscale JPEGs but the container
    layout is identical."""
    h, w = canvas.shape[:2]
    tw, th = tile
    path = tmp_path / f'{name}.svslide'
    con = sqlite3.connect(path)
    con.execute('CREATE TABLE SVSlideDataXPO '
                '(OID INTEGER PRIMARY KEY, m_slideId TEXT)')
    con.execute('INSERT INTO SVSlideDataXPO VALUES (1, ?)', (name,))
    if hr_ref:
        con.execute('CREATE TABLE SVHRScanDataXPO (OID INTEGER PRIMARY KEY, '
                    'm_nominalLensMagnification REAL, '
                    'm_scannedImage INTEGER)')
        con.execute('INSERT INTO SVHRScanDataXPO VALUES (1, ?, 1)', (lens,))
    else:
        con.execute('CREATE TABLE SVHRScanDataXPO (OID INTEGER PRIMARY KEY, '
                    'm_nominalLensMagnification REAL)')
        con.execute('INSERT INTO SVHRScanDataXPO VALUES (1, ?)', (lens,))
    if size_row:
        con.execute('CREATE TABLE SVScannedImageDataXPO '
                    '(OID INTEGER PRIMARY KEY, m_imageWidth INTEGER, '
                    'm_imageHeight INTEGER)')
        con.execute('INSERT INTO SVScannedImageDataXPO VALUES (1, ?, ?)',
                    (w * ds, h * ds))
        for i, (ew, eh) in enumerate(extra_image_rows):
            con.execute('INSERT INTO SVScannedImageDataXPO VALUES (?, ?, ?)',
                        (10 + i, ew, eh))
    if handler_row:
        con.execute('CREATE TABLE DataManagerSQLiteHandler '
                    '(UniqueTableName TEXT)')
        con.execute('INSERT INTO DataManagerSQLiteHandler VALUES (?)', ('T',))
    con.execute('CREATE TABLE T (id TEXT PRIMARY KEY, data BLOB)')
    for y in range(0, h, th):
        for x in range(0, w, tw):
            if (x, y) in drop:
                continue
            # edge tiles are stored full-size (scanner pads); pad with white
            part = np.full((th, tw, 3), 255, np.uint8)
            block = canvas[y:y + th, x:x + tw]
            part[:block.shape[0], :block.shape[1]] = block
            if split_channels:
                for c in range(3):
                    con.execute('INSERT INTO T VALUES (?, ?)',
                                (f'T;{x * ds}|{y * ds};{ds};{c}',
                                 _png(part[..., c])))
            else:
                con.execute('INSERT INTO T VALUES (?, ?)',
                            (f'T;{x * ds}|{y * ds};{ds};0', _png(part)))
    con.commit()
    con.close()
    return str(path)


@pytest.fixture
def canvas():
    rng = np.random.default_rng(23)
    return rng.integers(0, 255, (130, 150, 3), np.uint8)


def test_grid_regions_exact(tmp_path, canvas):
    path = _make_svslide(tmp_path, canvas)
    r = SakuraReader(path)
    assert r.size == (150, 130)
    np.testing.assert_array_equal(r.read_region(0, 0, 150, 130), canvas)
    # off-grid window crossing tile boundaries
    np.testing.assert_array_equal(r.read_region(50, 30, 70, 60),
                                  canvas[30:90, 50:120])
    r.close()


def test_channel_split_and_combined_variants(tmp_path, canvas):
    split = SakuraReader(_make_svslide(tmp_path, canvas, name='a'))
    combined = SakuraReader(_make_svslide(tmp_path, canvas, name='b',
                                          split_channels=False))
    np.testing.assert_array_equal(split.read_region(10, 10, 100, 100),
                                  combined.read_region(10, 10, 100, 100))
    split.close()
    combined.close()


def test_sparse_positions_fill_white(tmp_path, canvas):
    path = _make_svslide(tmp_path, canvas, drop={(64, 48)})
    r = SakuraReader(path)
    out = r.read_region(0, 0, 150, 130)
    assert (out[48:96, 64:128] == 255).all()
    np.testing.assert_array_equal(out[:48], canvas[:48])
    r.close()


def test_data_table_discovery_without_handler_row(tmp_path, canvas):
    path = _make_svslide(tmp_path, canvas, handler_row=False)
    r = SakuraReader(path)
    np.testing.assert_array_equal(r.read_region(0, 0, 150, 130), canvas)
    r.close()


def test_size_falls_back_to_tile_grid(tmp_path, canvas):
    path = _make_svslide(tmp_path, canvas, size_row=False)
    r = SakuraReader(path)
    # grid bound: ceil to whole stored tiles (64x48 grid over 150x130)
    assert r.size == (192, 144)
    np.testing.assert_array_equal(
        r.read_region(0, 0, 150, 130), canvas)
    r.close()


def test_magnification_probe(tmp_path, canvas):
    r = SakuraReader(_make_svslide(tmp_path, canvas, lens=40.0))
    assert r.get_magnification() == 40.0
    r.close()


def test_is_svslide_detection(tmp_path, canvas):
    path = _make_svslide(tmp_path, canvas)
    assert is_svslide(path)
    other = tmp_path / 'plain.db'
    con = sqlite3.connect(other)
    con.execute('CREATE TABLE t (x)')
    con.commit()
    con.close()
    assert not is_svslide(str(other))
    with pytest.raises(ValueError):
        SakuraReader(str(other))


def test_wsi_dispatch_and_salvage(tmp_path, canvas):
    """SlideReader routes .svslide here; a corrupt channel blob degrades
    to zeros for that tile only (the reference salvage contract,
    util/__init__.py:618-691)."""
    path = _make_svslide(tmp_path, canvas)
    con = sqlite3.connect(path)
    con.execute('UPDATE T SET data=? WHERE id=?',
                (b'\x00garbage', 'T;64|48;1;1'))
    con.commit()
    con.close()
    r = WSIReader(path)
    assert r.size == (150, 130)
    info = r.get_information()
    assert (info['size_x'], info['size_y']) == (150, 130)
    assert info['magnification'] == 20.0
    out = r.read_region(0, 0, 150, 130)
    np.testing.assert_array_equal(out[:48], canvas[:48])   # intact rows
    assert (out[48:96, 64:128] == 0).all()                  # salvaged tile
    r.close()


def test_overview_rows_do_not_shrink_canvas(tmp_path, canvas):
    """SVScannedImageDataXPO may also hold overview/label image rows; the
    HR-scan size must win (ADVICE r4: join through SVHRScanDataXPO /
    sanity-check against the tile-grid extent)."""
    # bogus rows BEFORE and after the real one by OID order would
    # previously win the first-non-null probe; both fail the grid check
    path = _make_svslide(tmp_path, canvas, name='ovr',
                         extra_image_rows=[(40, 30), (5000, 4000)])
    r = SakuraReader(path)
    assert r.size == (150, 130)
    np.testing.assert_array_equal(r.read_region(0, 0, 150, 130), canvas)
    r.close()


def test_hr_scan_join_selects_referenced_row(tmp_path, canvas):
    """With SVHRScanDataXPO.m_scannedImage present, only the referenced
    SVScannedImageDataXPO row is considered."""
    path = _make_svslide(tmp_path, canvas, name='href', hr_ref=True,
                         extra_image_rows=[(149, 129)])
    r = SakuraReader(path)
    assert r.size == (150, 130)
    r.close()


def test_downsample_units_consistent(tmp_path, canvas):
    """When the finest stored level has downsample > 1, metadata sizes
    (level-0 pixels) must be converted to reader units so .size and
    read_region agree (ADVICE r4)."""
    path = _make_svslide(tmp_path, canvas, name='ds2', ds=2)
    r = SakuraReader(path)
    assert r.size == (150, 130)
    np.testing.assert_array_equal(r.read_region(0, 0, 150, 130), canvas)
    np.testing.assert_array_equal(r.read_region(50, 30, 70, 60),
                                  canvas[30:90, 50:120])
    r.close()
