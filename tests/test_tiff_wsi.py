"""Tiled BigTIFF writer/reader round-trip + WSI region streaming."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from deepliif_tpu.utils.tiff import TiledTiffReader, write_pyramid_tiff
from deepliif_tpu.utils.wsi import WSIReader


def test_pyramid_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    canvas = rng.integers(0, 255, (700, 900, 3), np.uint8)
    path = str(tmp_path / 'test.ome.tiff')
    write_pyramid_tiff(path, canvas)

    r = TiledTiffReader(path)
    assert len(r.pages) == 4  # full + /2 + /4 + /8
    assert r.size == (900, 700)
    full = r.read_region(0, 0, 900, 700)
    np.testing.assert_array_equal(full, canvas)
    # arbitrary region crossing tile boundaries
    reg = r.read_region(200, 100, 300, 400)
    np.testing.assert_array_equal(reg, canvas[100:500, 200:500])
    # pyramid level 1 is the /2 decimation
    lvl1 = r.read_region(0, 0, 450, 350, level=1)
    np.testing.assert_array_equal(lvl1, canvas[::2, ::2][:350, :450])
    r.close()


def test_pil_can_open_our_tiff(tmp_path):
    """Interop check: the BigTIFF we write is readable by PIL/libtiff."""
    canvas = np.zeros((300, 300, 3), np.uint8)
    canvas[50:100, 50:100] = (255, 0, 0)
    path = str(tmp_path / 'interop.tiff')
    write_pyramid_tiff(path, canvas, levels=(1,))
    try:
        img = Image.open(path)
        arr = np.asarray(img.convert('RGB'))
    except Exception:
        pytest.skip('PIL lacks BigTIFF support in this build')
    np.testing.assert_array_equal(arr, canvas)


def test_wsi_reader_uses_tiled_fast_path(tmp_path):
    rng = np.random.default_rng(1)
    canvas = rng.integers(0, 255, (600, 800, 3), np.uint8)
    path = str(tmp_path / 'slide.tiff')
    write_pyramid_tiff(path, canvas)
    r = WSIReader(path)
    assert r._tiled is not None
    info = r.get_information()
    assert (info['size_x'], info['size_y']) == (800, 600)
    np.testing.assert_array_equal(r.read_region(100, 50, 200, 150),
                                  canvas[50:200, 100:300])
    r.close()


def test_test_wsi_command_end_to_end(tmp_path):
    """Region-streamed WSI inference with a tiny model writes pyramid outputs
    and a scoring json."""
    import jax
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.utils import checkpoints
    from deepliif_tpu.utils.wsi import infer_results_for_wsi

    md = tmp_path / 'model'
    md.mkdir()
    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=8, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3))
    params = dl.init_params(jax.random.PRNGKey(7), d, with_discriminators=False)
    checkpoints.save_networks(str(md), params)
    with open(md / 'config.json', 'w') as f:
        json.dump({'model': 'DeepLIIF', 'modalities_no': 2, 'seg_gen': True,
                   'seg_no': 1, 'input_no': 1, 'netG': 'resnet_6blocks',
                   'net_gs': 'unet_32', 'ngf': 8, 'ndf': 8, 'norm': 'batch',
                   'no_dropout': False, 'padding': 'zero',
                   'upsample': 'convtranspose', 'scale_size': 64,
                   'seg_weights': [0.4, 0.3, 0.3],
                   'modalities_names': ['IHC', 'A', 'B'],
                   'background_colors': [(201, 211, 208), (10, 10, 10)]}, f)

    rng = np.random.default_rng(2)
    slide = rng.integers(0, 255, (200, 260, 3), np.uint8)
    wsi_dir = tmp_path / 'wsi'
    wsi_dir.mkdir()
    write_pyramid_tiff(str(wsi_dir / 'slide.tiff'), slide)

    out = tmp_path / 'out'
    scoring = infer_results_for_wsi(str(wsi_dir), 'slide.tiff', str(out),
                                    str(md), tile_size=64, region_size=128)
    assert {'num_total', 'num_pos', 'num_neg', 'percent_pos'} <= set(scoring)
    files = os.listdir(out)
    assert any(f.endswith('.ome.tiff') for f in files), files
    assert 'slide.json' in files
    # stitched canvases readable and full-size
    seg_file = [f for f in files if 'Seg' in f and f.endswith('.ome.tiff')][0]
    r = TiledTiffReader(str(out / seg_file))
    assert r.size == (260, 200)
    r.close()


# ---------------------------------------------------------------------------
# SVS-class layouts (round 2): JPEG tiles, strips, magnification metadata
# ---------------------------------------------------------------------------

def _svs_fixture(path, h=600, w=700, mag=20):
    """Synthetic .svs-layout slide: JPEG-compressed 256px tiles + Aperio
    ImageDescription with AppMag."""
    from deepliif_tpu.utils.tiff import write_pyramid_tiff
    rng = np.random.default_rng(0)
    # smooth-ish content so JPEG stays close
    base = rng.integers(60, 200, (h // 50 + 1, w // 50 + 1, 3), np.uint8)
    canvas = np.asarray(Image.fromarray(base).resize((w, h), Image.BILINEAR))
    desc = (f'Aperio Image Library v12.0.15\n{w}x{h} [0,0 {w}x{h}] '
            f'(256x256) JPEG/RGB Q=85|AppMag = {mag}|MPP = 0.5')
    write_pyramid_tiff(path, canvas, levels=(1, 4), compression='jpeg',
                       description=desc)
    return canvas


def test_jpeg_tiled_svs_layout_region_reads(tmp_path):
    """JPEG-tiled (SVS-layout) slides read region-correct (lossy-close)."""
    from deepliif_tpu.utils.tiff import TiledTiffReader
    p = str(tmp_path / 'slide.svs')
    canvas = _svs_fixture(p)
    r = TiledTiffReader(p)
    assert r.size == (700, 600)
    # straddles tile borders and image edge
    for (x, y, w, h) in [(0, 0, 300, 300), (200, 100, 400, 300),
                         (500, 400, 200, 200)]:
        region = r.read_region(x, y, w, h)
        ref = canvas[y:y + h, x:x + w]
        err = np.abs(region.astype(int) - ref.astype(int)).mean()
        assert err < 6.0, (x, y, err)  # JPEG quality-85 tolerance
    r.close()


def test_jpeg2000_tiled_svs_layout_region_reads(tmp_path):
    """JPEG-2000-compressed tiles (Aperio 33003/34712 class slides, round-2
    VERDICT missing item 5) decode via PIL's openjpeg codec. The default
    PIL J2K encode is lossless, so reads are exact."""
    from deepliif_tpu.utils.tiff import TiledTiffReader, write_pyramid_tiff
    rng = np.random.default_rng(1)
    h, w = 520, 610
    base = rng.integers(40, 220, (h // 40 + 1, w // 40 + 1, 3), np.uint8)
    canvas = np.asarray(Image.fromarray(base).resize((w, h), Image.BILINEAR))
    p = str(tmp_path / 'slide_j2k.svs')
    write_pyramid_tiff(p, canvas, levels=(1, 4), compression='jpeg2000')
    r = TiledTiffReader(p)
    assert r.size == (w, h)
    for (x, y, rw, rh) in [(0, 0, 256, 256), (200, 100, 300, 300),
                           (400, 350, 210, 170)]:
        region = r.read_region(x, y, rw, rh)
        np.testing.assert_array_equal(region, canvas[y:y + rh, x:x + rw])
    r.close()


def test_svs_magnification_autodetect(tmp_path):
    from deepliif_tpu.utils.wsi import WSIReader, get_wsi_resolution
    p = str(tmp_path / 'slide.svs')
    _svs_fixture(p, mag=20)
    reader = WSIReader(p)
    assert reader.get_magnification() == 20.0
    reader.close()
    # 20x -> tile size 256 (reference models/__init__.py:730-782)
    assert get_wsi_resolution(p) == 256
    assert get_wsi_resolution('40') == 512
    assert get_wsi_resolution(str(tmp_path / 'nope.svs')) is None


def test_ome_nominal_magnification_parsing():
    from deepliif_tpu.utils.tiff import parse_magnification
    ome = ('<OME><Instrument><Objective ID="Objective:0" '
           'NominalMagnification="40.0"/></Instrument></OME>')
    assert parse_magnification(ome) == 40.0
    assert parse_magnification('Magnification: 10') == 10.0
    assert parse_magnification('no info here') is None
    assert parse_magnification(None) is None


def test_strip_organized_tiff_reads(tmp_path):
    """PIL writes strip-organized TIFFs; our reader must read them exactly."""
    from deepliif_tpu.utils.tiff import TiledTiffReader
    rng = np.random.default_rng(1)
    canvas = rng.integers(0, 255, (150, 200, 3), np.uint8)
    p = str(tmp_path / 'strips.tif')
    Image.fromarray(canvas).save(p)  # uncompressed strips
    r = TiledTiffReader(p)
    assert r.size == (200, 150)
    region = r.read_region(30, 40, 100, 90)
    np.testing.assert_array_equal(region, canvas[40:130, 30:130])
    r.close()


# ---------------------------------------------------------------------------
# Hamamatsu .ndpi specifics (round 3): SourceLens tag, >4 GiB offset wrap,
# zeroed-SOF JPEG strips (reference reads .ndpi via Bio-Formats,
# util/__init__.py:559-617)
# ---------------------------------------------------------------------------

def _write_ndpi(path, canvas, rows_per_strip, source_lens=20.0,
                strip_positions=None, jpeg=False, zero_sof=False):
    """Classic (32-bit) TIFF with NDPI marker tags and strip-organized RGB
    data. ``strip_positions`` places strip payloads at explicit file offsets
    (sparse-seek) while storing them modulo 2**32, as real >4 GiB .ndpi
    files do."""
    import io
    import struct

    h, w, _ = canvas.shape
    rps = rows_per_strip
    n = (h + rps - 1) // rps
    assert n >= 2, 'fixture keeps offset/count arrays out-of-line'
    strips = []
    for s in range(n):
        block = np.ascontiguousarray(canvas[s * rps:(s + 1) * rps])
        if jpeg:
            buf = io.BytesIO()
            Image.fromarray(block).save(buf, 'JPEG', quality=95)
            data = bytearray(buf.getvalue())
            if zero_sof:
                i = 2
                while i + 4 <= len(data):
                    marker = data[i + 1]
                    seg_len = struct.unpack('>H', bytes(data[i + 2:i + 4]))[0]
                    if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8,
                                                                 0xCC):
                        data[i + 5:i + 9] = b'\x00\x00\x00\x00'
                        break
                    i += 2 + seg_len
            data = bytes(data)
        else:
            data = block.tobytes()
        strips.append(data)

    entries = []  # (tag, type, count, 4-byte raw value field)

    def e(tag, typ, count, raw4):
        entries.append((tag, typ, count, raw4.ljust(4, b'\x00')))

    ifd_size = 2 + 12 * 12 + 4   # 12 entries
    bps_off = 8 + ifd_size
    so_off = bps_off + 6
    sc_off = so_off + 4 * n
    data_start = sc_off + 4 * n
    if strip_positions is None:
        strip_positions, pos = [], data_start
        for d in strips:
            strip_positions.append(pos)
            pos += len(d)
    stored_offsets = [p & 0xFFFFFFFF for p in strip_positions]

    u16 = lambda v: struct.pack('<H', v)
    u32 = lambda v: struct.pack('<I', v)
    e(256, 4, 1, u32(w))
    e(257, 4, 1, u32(h))
    e(258, 3, 3, u32(bps_off))
    e(259, 3, 1, u16(7 if jpeg else 1))
    e(262, 3, 1, u16(6 if jpeg else 2))
    e(273, 4, n, u32(so_off))
    e(277, 3, 1, u16(3))
    e(278, 4, 1, u32(rps))
    e(279, 4, n, u32(sc_off))
    e(284, 3, 1, u16(1))
    e(65420, 4, 1, u32(1))
    e(65421, 11, 1, struct.pack('<f', source_lens))
    entries.sort()
    assert len(entries) == 12

    with open(path, 'wb') as fh:
        fh.write(struct.pack('<2sHI', b'II', 42, 8))
        fh.write(struct.pack('<H', len(entries)))
        for tag, typ, count, raw in entries:
            fh.write(struct.pack('<HHI', tag, typ, count) + raw)
        fh.write(struct.pack('<I', 0))
        fh.write(struct.pack('<3H', 8, 8, 8))
        fh.write(struct.pack(f'<{n}I', *stored_offsets))
        fh.write(struct.pack(f'<{n}I', *[len(d) for d in strips]))
        for posn, data in zip(strip_positions, strips):
            fh.seek(posn)
            fh.write(data)
    return path


def test_ndpi_source_lens_magnification(tmp_path):
    rng = np.random.default_rng(2)
    canvas = rng.integers(0, 255, (96, 120, 3), np.uint8)
    p = str(tmp_path / 'slide.ndpi')
    _write_ndpi(p, canvas, rows_per_strip=64, source_lens=40.0)
    reader = WSIReader(p)
    assert reader.get_magnification() == 40.0
    np.testing.assert_array_equal(reader.read_region(10, 20, 60, 50),
                                  canvas[20:70, 10:70])
    reader.close()


def test_ndpi_macro_lens_skipped(tmp_path):
    """SourceLens -1/-2 mark macro/map images and must not be reported as
    the objective power; fall through to description parsing (none here)."""
    rng = np.random.default_rng(3)
    canvas = rng.integers(0, 255, (64, 64, 3), np.uint8)
    p = str(tmp_path / 'macro.ndpi')
    _write_ndpi(p, canvas, rows_per_strip=32, source_lens=-1.0)
    reader = WSIReader(p)
    assert reader.get_magnification() is None
    reader.close()


def test_ndpi_offsets_beyond_4gib(tmp_path):
    """>4 GiB .ndpi: strip offsets stored modulo 2**32 are reconstructed by
    monotonic carry. The fixture sparse-seeks the last strip past 4 GiB."""
    rng = np.random.default_rng(4)
    canvas = rng.integers(0, 255, (96, 100, 3), np.uint8)
    p = str(tmp_path / 'big.ndpi')
    # strip 0 in the low file, strip 1 above 4 GiB with a wrapped offset
    _write_ndpi(p, canvas, rows_per_strip=64,
                strip_positions=[4096, 0x100000000 + 64])
    assert os.path.getsize(p) > 0xFFFFFFFF
    r = TiledTiffReader(p)
    assert r.pages[0]['strip_offsets'] == (4096, 0x100000000 + 64)
    np.testing.assert_array_equal(r.read_region(0, 0, 100, 96), canvas)
    r.close()


def test_ndpi_zeroed_sof_jpeg_strips(tmp_path):
    """JPEG strips whose SOF dimensions are zeroed (the .ndpi >65535-px
    idiom) decode using the dimensions from the TIFF tags."""
    from deepliif_tpu.utils.tiff import patch_jpeg_sof
    rng = np.random.default_rng(5)
    base = rng.integers(60, 200, (4, 5, 3), np.uint8)
    canvas = np.asarray(Image.fromarray(base).resize((160, 128),
                                                     Image.BILINEAR))
    p = str(tmp_path / 'wide.ndpi')
    _write_ndpi(p, canvas, rows_per_strip=64, jpeg=True, zero_sof=True)
    r = TiledTiffReader(p)
    region = r.read_region(0, 0, 160, 128)
    err = np.abs(region.astype(int) - canvas.astype(int)).mean()
    assert err < 6.0, err
    r.close()
    # the patcher is a no-op on streams with valid dimensions
    import io
    buf = io.BytesIO()
    Image.fromarray(canvas).save(buf, 'JPEG')
    assert patch_jpeg_sof(buf.getvalue(), 128, 160) == buf.getvalue()


def test_patch_jpeg_sof_oversized_dimension_raises(tmp_path):
    """A zeroed SOF whose true extent exceeds 65535 cannot be patched —
    clear error instead of black regions from a PIL decode failure."""
    import io
    from deepliif_tpu.utils.tiff import patch_jpeg_sof
    buf = io.BytesIO()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, 'JPEG')
    data = bytearray(buf.getvalue())
    i = 2
    while True:  # zero the SOF dims
        marker = data[i + 1]
        seg_len = int.from_bytes(data[i + 2:i + 4], 'big')
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            data[i + 5:i + 9] = b'\x00' * 4
            break
        i += 2 + seg_len
    with pytest.raises(ValueError, match='65535'):
        patch_jpeg_sof(bytes(data), 16, 70000)
    # patchable when dimensions fit
    fixed = patch_jpeg_sof(bytes(data), 16, 16)
    assert np.asarray(Image.open(io.BytesIO(fixed))).shape[:2] == (16, 16)


def test_wsi_region_producer_propagates_errors():
    """A producer-thread failure must reach the consumer, not hang it
    (round-3 review finding)."""
    import queue
    from deepliif_tpu.utils.wsi import _region_producer

    class Bad:
        def read_region(self, *a):
            raise MemoryError('region allocation failed')

    q = queue.Queue()
    _region_producer(Bad(), [(0, 0, 4, 4)], q)
    item = q.get_nowait()
    assert item[0] == 'error' and isinstance(item[1], MemoryError)

    class Good:
        def read_region(self, x, y, w, h):
            return np.zeros((h, w, 3), np.uint8)

    q2 = queue.Queue()
    _region_producer(Good(), [(0, 0, 4, 4), (4, 0, 4, 4)], q2)
    assert q2.get_nowait()[0] == (0, 0, 4, 4)
    assert q2.get_nowait()[0] == (4, 0, 4, 4)
    assert q2.get_nowait() is None


# ---------------------------------------------------------------------------
# macro-first vendor layouts (Leica .scn, Ventana .bif)
# ---------------------------------------------------------------------------

SCN_XML = ('<?xml version="1.0"?><scn xmlns="http://www.leica-microsystems'
           '.com/scn/2010/10/01"><collection><image><scanSettings>'
           '<objectiveSettings><objective>40</objective></objectiveSettings>'
           '</scanSettings></image></collection></scn>')

BIF_XMP = ('<?xml version="1.0"?><x:xmpmeta xmlns:x="adobe:ns:meta/">'
           '<iScan Magnification="20" ScanMode="Regular" /></x:xmpmeta>')


def _macro_first_slide(tmp_path, ext, desc):
    from deepliif_tpu.utils.tiff import write_pyramid_tiff
    rng = np.random.default_rng(7)
    canvas = rng.integers(0, 255, (300, 400, 3), np.uint8)
    macro = rng.integers(0, 255, (60, 80, 3), np.uint8)
    path = str(tmp_path / f'slide{ext}')
    write_pyramid_tiff(path, canvas, levels=(1, 2), compression=False,
                       description=desc, macro=macro)
    return path, canvas, macro


@pytest.mark.parametrize('ext,desc,mag', [
    ('.scn', SCN_XML, 40.0),      # Leica: objective in SCN XML
    ('.bif', BIF_XMP, 20.0),      # Ventana: Magnification attr in XMP
])
def test_macro_first_vendor_slide(tmp_path, ext, desc, mag):
    """Leica .scn / Ventana .bif store a macro image AHEAD of the
    full-resolution pyramid (read via Bio-Formats in the reference,
    util/__init__.py:559-617): the reader must pick the largest page as
    level 0 and find the magnification on whichever page carries it."""
    from deepliif_tpu.utils.tiff import TiledTiffReader
    from deepliif_tpu.utils.wsi import WSIReader, get_wsi_resolution

    path, canvas, macro = _macro_first_slide(tmp_path, ext, desc)

    r = TiledTiffReader(path)
    assert r.size == (400, 300)          # the main page, not the macro
    assert r.get_magnification() == mag
    np.testing.assert_array_equal(r.read_region(0, 0, 400, 300), canvas)
    np.testing.assert_array_equal(r.read_region(50, 40, 120, 90),
                                  canvas[40:130, 50:170])
    # level indices stay relative to the full-resolution page
    np.testing.assert_array_equal(r.read_region(0, 0, 200, 150, level=1),
                                  canvas[::2, ::2])
    r.close()

    w = WSIReader(path)
    assert w.size == (400, 300)
    info = w.get_information()
    assert info['magnification'] == mag
    np.testing.assert_array_equal(w.read_region(10, 20, 60, 50),
                                  canvas[20:70, 10:70])
    w.close()

    assert get_wsi_resolution(path) == (512 if mag == 40 else 256)


def test_macro_page_does_not_shadow_plain_pyramids(tmp_path):
    """Regression: files whose first page IS the largest (Aperio, OME, our
    own writes) keep byte-identical behavior under the base-page logic."""
    from deepliif_tpu.utils.tiff import TiledTiffReader, write_pyramid_tiff
    rng = np.random.default_rng(8)
    canvas = rng.integers(0, 255, (200, 260, 3), np.uint8)
    path = str(tmp_path / 'plain.tif')
    write_pyramid_tiff(path, canvas, levels=(1, 2), compression=False,
                       description='Aperio Fake |AppMag = 40|')
    r = TiledTiffReader(path)
    assert r._base == 0
    assert r.size == (260, 200)
    assert r.get_magnification() == 40.0
    np.testing.assert_array_equal(r.read_region(0, 0, 260, 200), canvas)
    r.close()


def test_scn_collection_xml_macro_objective_listed_first(tmp_path):
    """Real Leica collection XML lists the macro image's low-power
    objective before the main image's — the parser must not return the
    first match."""
    from deepliif_tpu.utils.tiff import parse_magnification
    xml = ('<scn><collection>'
           '<image name="macro"><scanSettings><objectiveSettings>'
           '<objective>0.8</objective></objectiveSettings></scanSettings>'
           '</image>'
           '<image name="main"><scanSettings><objectiveSettings>'
           '<objective>40</objective></objectiveSettings></scanSettings>'
           '</image></collection></scn>')
    assert parse_magnification(xml) == 40.0


# -- Trestle (MedScan) overlapped tiles ---------------------------------------

def _make_trestle(tmp_path, true, tile=64, ox=16, oy=16, name='tr'):
    """Re-tile ``true`` into Trestle's overlapped layout: raw tile (j, i)
    holds the tile-sized window of the true image starting at the tile
    ADVANCE grid (advance = tile - overlap), so adjacent raw tiles repeat
    overlap-wide strips. Written as a plain tiled TIFF with
    Software=MedScan + OverlapsXY (openslide's published Trestle notes)."""
    th_, tw_ = true.shape[:2]
    ax, ay = tile - ox, tile - oy
    tx = (tw_ - tile) // ax + 1
    ty = (th_ - tile) // ay + 1
    assert (tx - 1) * ax + tile == tw_ and (ty - 1) * ay + tile == th_
    raw = np.zeros((ty * tile, tx * tile, 3), np.uint8)
    for j in range(ty):
        for i in range(tx):
            raw[j * tile:(j + 1) * tile, i * tile:(i + 1) * tile] = \
                true[j * ay:j * ay + tile, i * ax:i * ax + tile]
    path = str(tmp_path / f'{name}.tif')
    write_pyramid_tiff(
        path, raw, levels=(1,), tile=tile, compression=False,
        description=f'OverlapsXY={ox} {oy} Background Color=FFFFFF',
        software='MedScan 1.0')
    return path


def test_trestle_overlaps_subtracted(tmp_path):
    rng = np.random.default_rng(7)
    true = rng.integers(0, 255, (112, 160, 3), np.uint8)  # 2x3 tile grid
    path = _make_trestle(tmp_path, true)
    r = TiledTiffReader(path)
    assert r.size == (160, 112)
    assert r.pages[r._base]['overlap'] == (16, 16)
    assert r.pages[r._base]['fill'] == (255, 255, 255)
    np.testing.assert_array_equal(r.read_region(0, 0, 160, 112), true)
    # window straddling overlapped tile seams
    np.testing.assert_array_equal(r.read_region(40, 40, 70, 60),
                                  true[40:100, 40:110])
    r.close()
    # and through the WSI dispatch
    w = WSIReader(path)
    assert w.size == (160, 112)
    np.testing.assert_array_equal(w.read_region(30, 10, 100, 90),
                                  true[10:100, 30:130])
    w.close()


def test_trestle_non_square_tiles(tmp_path):
    """Trestle with tile_w != tile_h: the row grid must use tile HEIGHT
    (ADVICE r4 — _effective_dims previously used tile width for both
    axes, corrupting .size and the overlap subtraction)."""
    rng = np.random.default_rng(9)
    tw, th, ox, oy = 64, 32, 16, 8
    ax, ay = tw - ox, th - oy
    tx, ty = 3, 4
    true = rng.integers(0, 255, ((ty - 1) * ay + th, (tx - 1) * ax + tw, 3),
                        np.uint8)
    raw = np.zeros((ty * th, tx * tw, 3), np.uint8)
    for j in range(ty):
        for i in range(tx):
            raw[j * th:(j + 1) * th, i * tw:(i + 1) * tw] = \
                true[j * ay:j * ay + th, i * ax:i * ax + tw]
    path = str(tmp_path / 'nsq.tif')
    write_pyramid_tiff(
        path, raw, levels=(1,), tile=(tw, th), compression=False,
        description=f'OverlapsXY={ox} {oy}', software='MedScan 1.0')
    r = TiledTiffReader(path)
    assert r.size == (true.shape[1], true.shape[0])
    np.testing.assert_array_equal(
        r.read_region(0, 0, true.shape[1], true.shape[0]), true)
    # seam-straddling window
    np.testing.assert_array_equal(r.read_region(30, 20, 90, 60),
                                  true[20:80, 30:120])
    r.close()


def test_non_trestle_software_ignores_overlap_keys(tmp_path):
    """OverlapsXY in a description without the MedScan Software tag (e.g.
    an unrelated producer echoing metadata) must not shrink geometry."""
    rng = np.random.default_rng(8)
    canvas = rng.integers(0, 255, (128, 128, 3), np.uint8)
    path = str(tmp_path / 'plain.tif')
    write_pyramid_tiff(path, canvas, levels=(1,), tile=64,
                       compression=False, description='OverlapsXY=16 16')
    r = TiledTiffReader(path)
    assert r.size == (128, 128)
    np.testing.assert_array_equal(r.read_region(0, 0, 128, 128), canvas)
    r.close()


def test_philips_tiff_objective_lens_power():
    """Philips TIFF exports put the objective power in a DICOM attribute
    element inside the ImageDescription XML."""
    from deepliif_tpu.utils.tiff import parse_magnification
    xml = ('<DataObject ObjectType="DPUfsImport">'
           '<Attribute Name="DICOM_OBJECTIVE_LENS_POWER" Group="0x0048" '
           'Element="0x0112" PMSVR="IDoubleArray">&quot;40&quot;'
           '</Attribute></DataObject>')
    assert parse_magnification(xml) == 40.0
    assert parse_magnification(xml.replace('&quot;', '"')) == 40.0
