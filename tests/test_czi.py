"""Zeiss CZI reading (reference gets .czi via Bio-Formats,
util/__init__.py:559-691). Fixtures emit the published segment layout
(tests/czi_fixture.py)."""

import numpy as np
import pytest

from czi_fixture import write_czi
from deepliif_tpu.utils.czi import CziReader
from deepliif_tpu.utils.wsi import WSIReader, get_wsi_resolution


def _mosaic_canvas(rng, h=300, w=400):
    return rng.integers(0, 255, (h, w, 3), np.uint8)


def _mosaic_blocks(canvas, bh=150, bw=200, x0=0, y0=0, **kw):
    blocks = []
    for by in range(0, canvas.shape[0], bh):
        for bx in range(0, canvas.shape[1], bw):
            blocks.append(dict(data=canvas[by:by + bh, bx:bx + bw],
                               x=x0 + bx, y=y0 + by, **kw))
    return blocks


def test_uncompressed_bgr_mosaic_region_reads(tmp_path):
    rng = np.random.default_rng(0)
    canvas = _mosaic_canvas(rng)
    p = str(tmp_path / 'slide.czi')
    write_czi(p, _mosaic_blocks(canvas))
    r = CziReader(p)
    assert r.size == (400, 300)
    # regions straddling block boundaries, and the full mosaic
    for (x, y, w, h) in [(0, 0, 400, 300), (150, 100, 200, 150),
                         (190, 140, 20, 20), (350, 250, 50, 50)]:
        np.testing.assert_array_equal(r.read_region(x, y, w, h),
                                      canvas[y:y + h, x:x + w])
    r.close()


def test_nonzero_origin_normalization(tmp_path):
    """CZI mosaic coordinates need not start at 0: the reader normalizes
    to the bounding-box origin."""
    rng = np.random.default_rng(1)
    canvas = _mosaic_canvas(rng, 200, 240)
    p = str(tmp_path / 'offset.czi')
    write_czi(p, _mosaic_blocks(canvas, 100, 120, x0=1000, y0=-50))
    r = CziReader(p)
    assert r.size == (240, 200)
    np.testing.assert_array_equal(r.read_region(30, 40, 100, 90),
                                  canvas[40:130, 30:130])
    r.close()


def test_pyramid_and_other_channel_blocks_skipped(tmp_path):
    """Only full-resolution blocks of the first channel compose the mosaic:
    pyramid blocks (stored < logical) and C>0 blocks are ignored."""
    rng = np.random.default_rng(2)
    canvas = _mosaic_canvas(rng, 128, 128)
    other = rng.integers(0, 255, (128, 128, 3), np.uint8)
    blocks = _mosaic_blocks(canvas, 128, 128, dims={'C': (0, 1, 1)})
    # pyramid block: covers the same 128x128 logical area, stores 64x64
    blocks.append(dict(data=other[::2, ::2], x=0, y=0, logical=(128, 128),
                       pyramid_type=1, dims={'C': (0, 1, 1)}))
    # second channel at full resolution
    blocks.append(dict(data=other, x=0, y=0, dims={'C': (1, 1, 1)}))
    p = str(tmp_path / 'pyr.czi')
    write_czi(p, blocks)
    r = CziReader(p)
    assert len(r.blocks) == 1
    np.testing.assert_array_equal(r.read_region(0, 0, 128, 128), canvas)
    r.close()


def test_gray8_blocks(tmp_path):
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 255, (96, 96), np.uint8)
    p = str(tmp_path / 'gray.czi')
    write_czi(p, [dict(data=gray, x=0, y=0)])
    r = CziReader(p)
    region = r.read_region(10, 10, 40, 40)
    np.testing.assert_array_equal(region,
                                  np.repeat(gray[10:50, 10:50, None], 3, 2))
    r.close()


def test_jpeg_compressed_blocks(tmp_path):
    rng = np.random.default_rng(4)
    base = rng.integers(60, 200, (4, 4, 3), np.uint8)
    from PIL import Image
    canvas = np.asarray(Image.fromarray(base).resize((128, 128),
                                                     Image.BILINEAR))
    p = str(tmp_path / 'jpg.czi')
    write_czi(p, _mosaic_blocks(canvas, 64, 64, compression=1))
    r = CziReader(p)
    region = r.read_region(0, 0, 128, 128)
    err = np.abs(region.astype(int) - canvas.astype(int)).mean()
    assert err < 6.0, err
    r.close()


def test_zstd_compressed_blocks_roundtrip(tmp_path):
    """zstd0 (raw stream) and zstd1 (sized header) subblocks decode
    byte-exactly via the zstandard codec."""
    pytest.importorskip('zstandard')
    rng = np.random.default_rng(6)
    canvas = _mosaic_canvas(rng, 128, 160)
    for comp in (5, 6):
        p = str(tmp_path / f'zstd{comp}.czi')
        write_czi(p, _mosaic_blocks(canvas, 64, 80, compression=comp))
        r = CziReader(p)
        np.testing.assert_array_equal(r.read_region(0, 0, 160, 128), canvas)
        np.testing.assert_array_equal(r.read_region(70, 50, 60, 40),
                                      canvas[50:90, 70:130])
        r.close()
    # 1-byte zstd1 header (no parameter chunk) is also legal
    p = str(tmp_path / 'zstd1_short.czi')
    write_czi(p, [dict(data=canvas, x=0, y=0, compression=6,
                       zstd1_header=b'\x01')])
    r = CziReader(p)
    np.testing.assert_array_equal(r.read_region(0, 0, 160, 128), canvas)
    r.close()


def test_zstd1_hilo_packing_raises(tmp_path):
    """hi-lo byte packing is a 16-bit-pixel transform; an 8-bit subblock
    carrying the enabled flag gets a clear error instead of bad pixels."""
    pytest.importorskip('zstandard')
    rng = np.random.default_rng(8)
    canvas = _mosaic_canvas(rng, 32, 32)
    p = str(tmp_path / 'hilo.czi')
    write_czi(p, [dict(data=canvas, x=0, y=0, compression=6,
                       zstd1_header=b'\x03\x01\x01')])
    r = CziReader(p)
    with pytest.raises(ValueError, match='hi-lo'):
        r._block_pixels(r.blocks[0])
    r.close()


def test_unsupported_compression_raises(tmp_path):
    rng = np.random.default_rng(6)
    canvas = _mosaic_canvas(rng, 32, 32)
    p = str(tmp_path / 'jxr.czi')
    write_czi(p, [dict(data=canvas, x=0, y=0, compression=4)])  # jpeg-xr
    r = CziReader(p)
    with pytest.raises(ValueError, match='jpeg-xr'):
        r._block_pixels(r.blocks[0])
    r.close()


def test_jpegxr_decoder_hook(tmp_path, monkeypatch):
    """JPEG-XR subblocks decode through the pluggable codec chain
    (round-3 VERDICT item 9): DEEPLIIF_JXR_DECODER=module:function, or
    imagecodecs.jpegxr_decode when that wheel is installed. Neither codec
    exists in this environment, so the hook is exercised with a stand-in
    decoder module; the stream framing (payload extraction, gray->RGB
    expansion, stored-size crop/pad) is what's under test."""
    import sys
    import types

    rng = np.random.default_rng(7)
    canvas = _mosaic_canvas(rng, 32, 32)
    p = str(tmp_path / 'jxr2.czi')
    # the fixture writes the pixels as raw BGR bytes under compression=4;
    # the stand-in 'codec' reverses exactly that framing
    write_czi(p, [dict(data=canvas, x=0, y=0, compression=4)])

    mod = types.ModuleType('fake_jxr')
    mod.decode = lambda data: np.frombuffer(
        data, np.uint8).reshape(32, 32, 3)[:, :, ::-1]
    monkeypatch.setitem(sys.modules, 'fake_jxr', mod)
    monkeypatch.setenv('DEEPLIIF_JXR_DECODER', 'fake_jxr:decode')

    r = CziReader(p)
    out = r._block_pixels(r.blocks[0])
    np.testing.assert_array_equal(out, canvas)
    r.close()

    # the imagecodecs route takes precedence when the wheel exists
    ic = types.ModuleType('imagecodecs')
    ic.jpegxr_decode = lambda data: np.full((32, 32, 3), 7, np.uint8)
    monkeypatch.setitem(sys.modules, 'imagecodecs', ic)
    r = CziReader(p)
    out = r._block_pixels(r.blocks[0])
    assert (out == 7).all()
    r.close()

    # 16-bit decoder output (Gray16 fluorescence subblocks) must be
    # REFUSED, not truncated mod 256 into silent garbage
    ic.jpegxr_decode = lambda data: np.full((32, 32), 300, np.uint16)
    r = CziReader(p)
    with pytest.raises(ValueError, match='uint16'):
        r._block_pixels(r.blocks[0])
    r.close()

    # gray+alpha decodes take the gray plane
    ic.jpegxr_decode = lambda data: np.dstack(
        [np.full((32, 32), 9, np.uint8), np.full((32, 32), 255, np.uint8)])
    r = CziReader(p)
    out = r._block_pixels(r.blocks[0])
    assert out.shape == (32, 32, 3) and (out == 9).all()
    r.close()


def test_magnification_and_wsi_dispatch(tmp_path):
    """WSIReader routes .czi to CziReader; magnification parses from the
    instrument XML and drives tile-size selection (reference
    get_wsi_resolution, models/__init__.py:730-782)."""
    rng = np.random.default_rng(7)
    canvas = _mosaic_canvas(rng, 160, 160)
    xml = ('<ImageDocument><Metadata><Information><Instrument>'
           '<Objectives><Objective Id="Objective:1">'
           '<NominalMagnification>20</NominalMagnification>'
           '</Objective></Objectives>'
           '</Instrument></Information></Metadata></ImageDocument>')
    p = str(tmp_path / 'mag.czi')
    write_czi(p, _mosaic_blocks(canvas, 80, 80), metadata_xml=xml)
    reader = WSIReader(p)
    assert reader.get_magnification() == 20.0
    info = reader.get_information()
    assert (info['size_x'], info['size_y']) == (160, 160)
    np.testing.assert_array_equal(reader.read_region(40, 40, 80, 80),
                                  canvas[40:120, 40:120])
    reader.close()
    assert get_wsi_resolution(p) == 256  # 20x -> 256 tiles
