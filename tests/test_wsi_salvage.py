"""Corrupt/truncated-slide behavior: the salvage chain and clean errors.

The reference degrades WSI reads gracefully (zarr -> Bio-Formats ->
tile-by-tile salvage -> zeros, /root/reference/deepliif/util/__init__.py:
618-691). These tests drive our equivalent (utils/wsi.py::WSIReader.
read_region) against deliberately damaged files: data corruption inside a
slide must salvage the readable parts and zero the rest, while files
damaged beyond recovery must fail fast with a clear exception rather than
hang or return garbage."""

import numpy as np
import pytest

from deepliif_tpu.utils.tiff import TiledTiffReader, write_pyramid_tiff
from deepliif_tpu.utils.wsi import WSIReader


def _corrupt_first_tile(path):
    """Overwrite the first tile's compressed bytes so decode fails; returns
    the corrupted page-0 tile's pixel box (x0, y0, x1, y1)."""
    r = TiledTiffReader(path)
    page = r.pages[0]
    off = page['offsets'][0]
    tw, th = page['tile_w'], page['tile_h']
    r.close()
    with open(path, 'r+b') as fh:
        fh.seek(off)
        fh.write(b'\xff' * 16)
    return 0, 0, tw, th


def test_corrupt_tile_salvaged_to_zeros(tmp_path):
    rng = np.random.default_rng(0)
    canvas = rng.integers(0, 255, (1200, 1400, 3), np.uint8)
    path = str(tmp_path / 'slide.tiff')
    write_pyramid_tiff(path, canvas, levels=(1,))
    _corrupt_first_tile(path)

    # the direct tiled read must surface the decode failure...
    r = TiledTiffReader(path)
    with pytest.raises(Exception):
        r.read_region(0, 0, 1400, 1200)
    r.close()

    # ...and WSIReader's salvage chain turns it into zeros at salvage-block
    # granularity (1024 px) while every other block survives byte-exact
    w = WSIReader(path)
    out = w.read_region(0, 0, 1400, 1200)
    w.close()
    assert out.shape == (1200, 1400, 3)
    assert (out[:1024, :1024] == 0).all()
    np.testing.assert_array_equal(out[:1024, 1024:], canvas[:1024, 1024:])
    np.testing.assert_array_equal(out[1024:], canvas[1024:])


def test_region_away_from_corruption_reads_clean(tmp_path):
    """Damage in one tile must not degrade regions that never touch it."""
    rng = np.random.default_rng(1)
    canvas = rng.integers(0, 255, (800, 800, 3), np.uint8)
    path = str(tmp_path / 'slide.tiff')
    write_pyramid_tiff(path, canvas, levels=(1,))
    x0, y0, x1, y1 = _corrupt_first_tile(path)
    w = WSIReader(path)
    out = w.read_region(x1, y1, 300, 300)
    w.close()
    np.testing.assert_array_equal(out, canvas[y1:y1 + 300, x1:x1 + 300])


def test_truncated_tiff_fails_fast(tmp_path):
    """A TIFF cut off mid-file (IFD unreachable) raises instead of hanging
    or fabricating pixels."""
    rng = np.random.default_rng(2)
    canvas = rng.integers(0, 255, (300, 300, 3), np.uint8)
    path = str(tmp_path / 'trunc.tiff')
    write_pyramid_tiff(path, canvas, levels=(1,))
    data = open(path, 'rb').read()
    with open(path, 'wb') as fh:
        fh.write(data[:len(data) // 2])
    with pytest.raises(Exception):
        WSIReader(path)


def test_bogus_bytes_with_slide_extension_fail_fast(tmp_path):
    for ext in ('svs', 'czi', 'mrxs'):
        path = str(tmp_path / f'junk.{ext}')
        with open(path, 'wb') as fh:
            fh.write(b'this is not a slide' * 100)
        with pytest.raises(Exception):
            WSIReader(path)


def test_corrupt_czi_subblock_salvaged_to_zeros(tmp_path):
    """zstd payload corruption inside one CZI subblock: the mosaic reader
    raises, and WSIReader salvages by zeroing the unreadable block."""
    pytest.importorskip('zstandard')
    from czi_fixture import write_czi
    from deepliif_tpu.utils.czi import CziReader

    rng = np.random.default_rng(3)
    h = w = 64
    blocks = []
    canvas = np.zeros((h, 2 * w, 3), np.uint8)
    for i in range(2):
        tile = rng.integers(0, 255, (h, w, 3), np.uint8)
        canvas[:, i * w:(i + 1) * w] = tile
        blocks.append(dict(data=tile, x=i * w, y=0, compression=5))
    path = str(tmp_path / 'mosaic.czi')
    write_czi(path, blocks)

    # destroy the first (x=0) subblock's zstd frame magic (incompressible
    # data is stored in raw zstd blocks, so mid-stream corruption would
    # decode silently — the frame header is the detectable spot)
    import struct

    from deepliif_tpu.utils.czi import SEG_HDR, parse_dir_entry

    r = CziReader(path)
    first = min(r.blocks, key=lambda b: b.dims['X'][0])
    r.close()
    with open(path, 'r+b') as fh:
        fh.seek(first.file_pos)
        _sid, alloc, used = SEG_HDR.unpack(fh.read(SEG_HDR.size))
        payload = fh.read(used if used > 0 else alloc)
        meta_size, _att, _dsize = struct.unpack_from('<iiq', payload)
        _entry, entry_end = parse_dir_entry(payload, 16)
        data_off = first.file_pos + SEG_HDR.size + max(256, entry_end) \
            + meta_size
        fh.seek(data_off)
        fh.write(b'\xff' * 4)

    r = CziReader(path)
    with pytest.raises(Exception):
        r.read_region(0, 0, 2 * w, h)
    r.close()

    wr = WSIReader(path)
    out = wr.read_region(0, 0, 2 * w, h)
    wr.close()
    # salvage granularity (1024 px) exceeds this tiny mosaic, so the whole
    # region degrades to zeros — bounded, clean, and non-throwing
    assert out.shape == (h, 2 * w, 3)
    assert (out == 0).all()


def test_corrupt_mirax_tile_salvaged_to_zeros(tmp_path):
    """PNG tile corruption inside a MIRAX data file: the container reader
    raises, and WSIReader salvages instead of propagating."""
    from mirax_fixture import write_mrxs
    from deepliif_tpu.utils.mirax import MiraxReader

    rng = np.random.default_rng(4)
    canvas = rng.integers(0, 255, (64, 64, 3), np.uint8)
    path = str(tmp_path / 'slide.mrxs')
    write_mrxs(path, {(0, 0): canvas}, (1, 1), (64, 64))

    # corrupt the PNG stream (position buffer is zlib, so the first PNG
    # magic in a data file is tile imagery, not positions)
    r = MiraxReader(path)
    data_files = list(r.data_files)
    r.close()
    stomped = False
    for df in data_files:
        blob = open(df, 'rb').read()
        at = blob.find(b'\x89PNG\r\n\x1a\n')
        if at >= 0:
            with open(df, 'r+b') as fh:
                fh.seek(at + 50)
                fh.write(b'\xff' * 16)
            stomped = True
            break
    assert stomped, 'no PNG tile found in MIRAX data files'

    r = MiraxReader(path)
    with pytest.raises(Exception):
        r.read_region(0, 0, 64, 64)
    r.close()

    wr = WSIReader(path)
    out = wr.read_region(0, 0, 64, 64)
    wr.close()
    assert out.shape == (64, 64, 3)
    assert (out == 0).all()
