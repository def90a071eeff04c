"""Native DICOM WSI reader (utils/dicom.py) against synthetic VL Whole
Slide Microscopy instances — the container class the reference reads via
Bio-Formats (util/__init__.py:559-617)."""

import io
import struct

import numpy as np
import pytest

from deepliif_tpu.utils.dicom import DicomWsiReader
from deepliif_tpu.utils.wsi import WSIReader, get_wsi_resolution

EXPLICIT_LE = '1.2.840.10008.1.2.1'
JPEG_BASELINE = '1.2.840.10008.1.2.4.50'
SHORT_VRS = {'US': '<H', 'UL': '<I', 'SL': '<i'}


def _el(group, elem, vr, value):
    """One explicit-VR-LE data element."""
    if vr in SHORT_VRS and not isinstance(value, bytes):
        value = struct.pack(SHORT_VRS[vr], value)
    elif isinstance(value, str):
        value = value.encode('ascii')
    if len(value) % 2:
        value += b'\x00' if vr not in ('DS', 'IS', 'CS', 'UI', 'LO') \
            else b' '
    head = struct.pack('<HH2s', group, elem, vr.encode())
    if vr in ('OB', 'OW', 'SQ', 'UN', 'UT'):
        head += struct.pack('<HI', 0, len(value))
    else:
        head += struct.pack('<H', len(value))
    return head + value


def _sq(group, elem, items, undefined=False):
    """Sequence of items; each item is pre-encoded element bytes."""
    body = b''
    for it in items:
        if undefined:
            body += struct.pack('<HHI', 0xFFFE, 0xE000, 0xFFFFFFFF)
            body += it + struct.pack('<HHI', 0xFFFE, 0xE00D, 0)
        else:
            body += struct.pack('<HHI', 0xFFFE, 0xE000, len(it)) + it
    head = struct.pack('<HH2sHI', group, elem, b'SQ', 0,
                       0xFFFFFFFF if undefined else len(body))
    if undefined:
        body += struct.pack('<HHI', 0xFFFE, 0xE0DD, 0)
    return head + body


def _meta(ts):
    body = _el(0x0002, 0x0010, 'UI', ts)
    return (b'\x00' * 128 + b'DICM'
            + _el(0x0002, 0x0000, 'UL', len(body)) + body)


def _wsi_dcm(tmp_path, name, canvas, tile=32, ts=EXPLICIT_LE, mag='40',
             sparse=False, undefined_sq=False):
    """Synthesize a WSI instance: tiled frames over ``canvas``,
    TILED_FULL (or per-frame positions when sparse), objective power in
    the Optical Path Sequence."""
    h, w = canvas.shape[:2]
    ty, tx = (h + tile - 1) // tile, (w + tile - 1) // tile
    frames = []
    for j in range(ty):
        for i in range(tx):
            t = np.zeros((tile, tile, 3), np.uint8)
            src = canvas[j * tile:(j + 1) * tile, i * tile:(i + 1) * tile]
            t[:src.shape[0], :src.shape[1]] = src
            frames.append(t)

    ds = b''
    ds += _el(0x0008, 0x0016, 'UI', '1.2.840.10008.5.1.4.1.1.77.1.6')
    ds += _el(0x0020, 0x9311, 'CS',
              'TILED_SPARSE' if sparse else 'TILED_FULL')
    ds += _el(0x0028, 0x0002, 'US', 3)
    ds += _el(0x0028, 0x0008, 'IS', str(len(frames)))
    ds += _el(0x0028, 0x0010, 'US', tile)
    ds += _el(0x0028, 0x0011, 'US', tile)
    ds += _el(0x0048, 0x0006, 'UL', w)
    ds += _el(0x0048, 0x0007, 'UL', h)
    if mag is not None:
        ds += _sq(0x0048, 0x0105,  # Optical Path Sequence
                  [_el(0x0048, 0x0112, 'DS', mag)],
                  undefined=undefined_sq)
    if sparse:
        # Per-Frame Functional Groups: plane positions (1-based), frames
        # deliberately emitted in REVERSE order to prove positions win
        items = []
        for k in reversed(range(len(frames))):
            fx = (k % tx) * tile + 1
            fy = (k // tx) * tile + 1
            items.append(_sq(0x0048, 0x021A,
                             [_el(0x0048, 0x021E, 'SL', fx)
                              + _el(0x0048, 0x021F, 'SL', fy)]))
        ds += _sq(0x5200, 0x9230, items)
        frames = frames[::-1]

    if ts == EXPLICIT_LE:
        px = b''.join(f.tobytes() for f in frames)
        ds += _el(0x7FE0, 0x0010, 'OB', px)
    else:
        from PIL import Image
        ds += struct.pack('<HH2sHI', 0x7FE0, 0x0010, b'OB', 0, 0xFFFFFFFF)
        ds += struct.pack('<HHI', 0xFFFE, 0xE000, 0)     # empty BOT
        for f in frames:
            buf = io.BytesIO()
            Image.fromarray(f).save(buf, 'JPEG', quality=95)
            data = buf.getvalue()
            if len(data) % 2:
                data += b'\x00'
            ds += struct.pack('<HHI', 0xFFFE, 0xE000, len(data)) + data
        ds += struct.pack('<HHI', 0xFFFE, 0xE0DD, 0)

    path = str(tmp_path / name)
    with open(path, 'wb') as fh:
        fh.write(_meta(ts) + ds)
    return path


@pytest.fixture
def canvas():
    rng = np.random.default_rng(11)
    return rng.integers(0, 255, (70, 90, 3), np.uint8)


def test_native_tiled_full(tmp_path, canvas):
    path = _wsi_dcm(tmp_path, 's.dcm', canvas)
    r = DicomWsiReader(path)
    assert r.size == (90, 70)
    assert r.get_magnification() == 40.0
    np.testing.assert_array_equal(r.read_region(0, 0, 90, 70), canvas)
    np.testing.assert_array_equal(r.read_region(25, 30, 50, 35),
                                  canvas[30:65, 25:75])
    r.close()


def test_jpeg_encapsulated(tmp_path):
    # smooth gradient: JPEG-friendly content so q95 error stays small
    yy, xx = np.mgrid[0:70, 0:90]
    smooth = np.stack([yy * 3 % 256, xx * 2 % 256, (yy + xx) % 256],
                      axis=-1).astype(np.uint8)
    path = _wsi_dcm(tmp_path, 'j.dcm', smooth, ts=JPEG_BASELINE, mag='20')
    r = DicomWsiReader(path)
    assert r.size == (90, 70)
    assert r.get_magnification() == 20.0
    out = r.read_region(0, 0, 90, 70).astype(int)
    assert np.abs(out - smooth.astype(int)).mean() < 6  # JPEG q95 noise
    r.close()


def test_tiled_sparse_positions_win(tmp_path, canvas):
    """Frames stored in reverse order with per-frame plane positions must
    still assemble correctly (TILED_SPARSE organization)."""
    path = _wsi_dcm(tmp_path, 'sp.dcm', canvas, sparse=True)
    r = DicomWsiReader(path)
    np.testing.assert_array_equal(r.read_region(0, 0, 90, 70), canvas)
    r.close()


def test_undefined_length_sequence(tmp_path, canvas):
    """Optical Path Sequence with undefined length (delimiter-terminated)
    parses; magnification still found inside it."""
    path = _wsi_dcm(tmp_path, 'u.dcm', canvas, undefined_sq=True)
    r = DicomWsiReader(path)
    assert r.get_magnification() == 40.0
    r.close()


def test_wsireader_routing_and_resolution(tmp_path, canvas):
    path = _wsi_dcm(tmp_path, 'w.dcm', canvas)
    w = WSIReader(path)
    assert w.size == (90, 70)
    assert w.get_information()['magnification'] == 40.0
    np.testing.assert_array_equal(w.read_region(10, 5, 40, 30),
                                  canvas[5:35, 10:50])
    w.close()
    assert get_wsi_resolution(path) == 512


def test_unsupported_transfer_syntax(tmp_path, canvas):
    path = _wsi_dcm(tmp_path, 'b.dcm', canvas)
    raw = open(path, 'rb').read()
    # Explicit VR Big Endian (retired) — same length as the original UID
    bad = raw.replace(EXPLICIT_LE.encode(), b'1.2.840.10008.1.2.2')
    p2 = tmp_path / 'bad.dcm'
    p2.write_bytes(bad)
    with pytest.raises(ValueError, match='transfer syntax'):
        DicomWsiReader(str(p2))


def _el_impl(group, elem, value, vr_hint=None):
    """Implicit-VR-LE element: tag + 4-byte length + value."""
    if vr_hint in SHORT_VRS and not isinstance(value, bytes):
        value = struct.pack(SHORT_VRS[vr_hint], value)
    elif isinstance(value, str):
        value = value.encode('ascii')
    if len(value) % 2:
        value += b' '
    return struct.pack('<HHI', group, elem, len(value)) + value


def test_implicit_vr_little_endian(tmp_path, canvas):
    """Implicit VR LE (the default transfer syntax): no VRs in the
    stream — sequences recognized by the item-tag peek, integers decoded
    through the per-tag VR table."""
    h, w = canvas.shape[:2]
    tile = 32
    ty, tx = (h + tile - 1) // tile, (w + tile - 1) // tile
    frames = []
    for j in range(ty):
        for i in range(tx):
            t = np.zeros((tile, tile, 3), np.uint8)
            src = canvas[j * tile:(j + 1) * tile, i * tile:(i + 1) * tile]
            t[:src.shape[0], :src.shape[1]] = src
            frames.append(t)
    opt_item = _el_impl(0x0048, 0x0112, '40')        # objective power DS
    opt_sq = (struct.pack('<HHI', 0x0048, 0x0105, len(opt_item) + 8)
              + struct.pack('<HHI', 0xFFFE, 0xE000, len(opt_item))
              + opt_item)
    ds = b''
    ds += _el_impl(0x0020, 0x9311, 'TILED_FULL')
    ds += _el_impl(0x0028, 0x0002, 3, 'US')
    ds += _el_impl(0x0028, 0x0008, str(len(frames)))  # IS, ascii
    ds += _el_impl(0x0028, 0x0010, tile, 'US')
    ds += _el_impl(0x0028, 0x0011, tile, 'US')
    ds += _el_impl(0x0048, 0x0006, w, 'UL')
    ds += _el_impl(0x0048, 0x0007, h, 'UL')
    ds += opt_sq
    ds += _el_impl(0x7FE0, 0x0010, b''.join(f.tobytes() for f in frames))
    path = str(tmp_path / 'impl.dcm')
    with open(path, 'wb') as fh:
        fh.write(_meta('1.2.840.10008.1.2') + ds)

    r = DicomWsiReader(path)
    assert r.size == (90, 70)
    assert r.get_magnification() == 40.0
    np.testing.assert_array_equal(r.read_region(0, 0, 90, 70), canvas)
    np.testing.assert_array_equal(r.read_region(33, 10, 40, 50),
                                  canvas[10:60, 33:73])
    r.close()


def test_wsi_inference_end_to_end_on_dcm(tmp_path):
    """`test-wsi` over a .dcm instance: region streaming + stitching +
    scoring run unchanged on the DICOM reader (the format only changes
    WSIReader's dispatch)."""
    import json
    import os
    import jax
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.utils import checkpoints
    from deepliif_tpu.utils.wsi import infer_results_for_wsi

    md = tmp_path / 'model'
    md.mkdir()
    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=8, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3))
    params = dl.init_params(jax.random.PRNGKey(7), d,
                            with_discriminators=False)
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

    rng = np.random.default_rng(5)
    slide = rng.integers(0, 255, (120, 120, 3), np.uint8)
    wsi_dir = tmp_path / 'wsi'
    wsi_dir.mkdir()
    _wsi_dcm(wsi_dir, 'slide.dcm', slide, tile=32)

    out = tmp_path / 'out'
    scoring = infer_results_for_wsi(str(wsi_dir), 'slide.dcm', str(out),
                                    str(md), tile_size=64, region_size=128)
    assert {'num_total', 'num_pos', 'num_neg', 'percent_pos'} <= set(scoring)
    files = os.listdir(out)
    assert any(f.startswith('slide_Seg') and f.endswith('.ome.tiff')
               for f in files), files
    assert 'slide.json' in files


def test_implicit_pixel_data_resembling_item_tag(tmp_path):
    """Native pixel data whose first bytes equal an (FFFE,E000) item tag
    must not be misparsed as a sequence by the implicit-VR heuristic."""
    tile = 32
    canvas = np.zeros((32, 32, 3), np.uint8)
    canvas[0, 0] = (0xFE, 0xFF, 0x00)   # little-endian FFFE...
    canvas[0, 1] = (0xE0, 0x40, 0x00)   # ...E000 + plausible length bytes
    ds = b''
    ds += _el_impl(0x0028, 0x0002, 3, 'US')
    ds += _el_impl(0x0028, 0x0008, '1')
    ds += _el_impl(0x0028, 0x0010, tile, 'US')
    ds += _el_impl(0x0028, 0x0011, tile, 'US')
    ds += _el_impl(0x0048, 0x0006, 32, 'UL')
    ds += _el_impl(0x0048, 0x0007, 32, 'UL')
    ds += _el_impl(0x7FE0, 0x0010, canvas.tobytes())
    path = str(tmp_path / 'p.dcm')
    with open(path, 'wb') as fh:
        fh.write(_meta('1.2.840.10008.1.2') + ds)
    r = DicomWsiReader(path)
    np.testing.assert_array_equal(r.read_region(0, 0, 32, 32), canvas)
    r.close()


def test_mismatched_plane_positions_raise(tmp_path, canvas):
    """Fewer per-frame positions than frames must fail loudly, not
    assemble the slide wrong or crash mid-read."""
    path = _wsi_dcm(tmp_path, 'mm.dcm', canvas, sparse=True)
    raw = bytearray(open(path, 'rb').read())
    # drop the last plane-position pair by renaming its tags
    off = raw.rfind(struct.pack('<HH', 0x0048, 0x021E))
    raw[off:off + 4] = struct.pack('<HH', 0x0049, 0x021E)
    off = raw.rfind(struct.pack('<HH', 0x0048, 0x021F))
    raw[off:off + 4] = struct.pack('<HH', 0x0049, 0x021F)
    p2 = tmp_path / 'mm2.dcm'
    p2.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match='plane positions'):
        DicomWsiReader(str(p2))


def test_unsupported_native_pixel_format_raises(tmp_path):
    """16-bit / planar / YBR native frames must be rejected, not silently
    reshaped into garbage."""
    tile = 32
    ds = b''
    ds += _el_impl(0x0028, 0x0002, 3, 'US')
    ds += _el_impl(0x0028, 0x0008, '1')
    ds += _el_impl(0x0028, 0x0010, tile, 'US')
    ds += _el_impl(0x0028, 0x0011, tile, 'US')
    ds += _el_impl(0x0028, 0x0100, 16, 'US')    # BitsAllocated=16
    ds += _el_impl(0x0048, 0x0006, 32, 'UL')
    ds += _el_impl(0x0048, 0x0007, 32, 'UL')
    ds += _el_impl(0x7FE0, 0x0010, b'\x00' * (tile * tile * 3 * 2))
    path = str(tmp_path / 'b16.dcm')
    with open(path, 'wb') as fh:
        fh.write(_meta('1.2.840.10008.1.2') + ds)
    with pytest.raises(ValueError, match='unsupported native pixel'):
        DicomWsiReader(path)


def test_truncated_pixel_data_raises(tmp_path, canvas):
    path = _wsi_dcm(tmp_path, 't.dcm', canvas)
    raw = open(path, 'rb').read()
    p2 = tmp_path / 'trunc.dcm'
    p2.write_bytes(raw[:-2048])
    with pytest.raises(ValueError):
        DicomWsiReader(str(p2))
