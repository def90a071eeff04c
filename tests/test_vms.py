"""Hamamatsu .vms/.vmu container readers (utils/vms.py) against
synthetic slides — more Bio-Formats-only formats in the reference
(util/__init__.py:559-617) now read natively."""

import os
import struct

import numpy as np
import pytest
from PIL import Image

from deepliif_tpu.utils.vms import NgrPiece, VmsReader, VmuReader
from deepliif_tpu.utils.wsi import WSIReader, get_wsi_resolution


def _make_vms(tmp_path, canvas, piece=(64, 48), name='slide', lens='20'):
    """Split ``canvas`` into a JPEG piece grid + .vms index. Uses PNG
    payloads (lossless) so region reads compare exactly; real scanners
    write JPEG but the container layout is identical."""
    h, w = canvas.shape[:2]
    pw, ph = piece
    cols, rows = (w + pw - 1) // pw, (h + ph - 1) // ph
    lines = ['[Virtual Microscope Specimen]', 'NoLayers=1',
             f'NoJpegColumns={cols}', f'NoJpegRows={rows}',
             f'SourceLens={lens}']
    for r in range(rows):
        for c in range(cols):
            part = canvas[r * ph:(r + 1) * ph, c * pw:(c + 1) * pw]
            fn = f'{name}({c},{r}).png'
            Image.fromarray(part).save(tmp_path / fn)
            if (c, r) == (0, 0):
                lines.append(f'ImageFile={fn}')
            elif r == 0:
                lines.append(f'ImageFile({c})={fn}')
            else:
                lines.append(f'ImageFile({c},{r})={fn}')
    # aux files the reader must tolerate but not require
    Image.fromarray(canvas[::4, ::4]).save(tmp_path / f'{name}_map.png')
    lines.append(f'MapFile={name}_map.png')
    path = tmp_path / f'{name}.vms'
    path.write_text('\n'.join(lines) + '\n')
    return str(path)


@pytest.fixture
def canvas():
    rng = np.random.default_rng(21)
    return rng.integers(0, 255, (130, 150, 3), np.uint8)


def test_grid_regions_exact(tmp_path, canvas):
    path = _make_vms(tmp_path, canvas)
    r = VmsReader(path)
    assert r.size == (150, 130)
    np.testing.assert_array_equal(r.read_region(0, 0, 150, 130), canvas)
    # crossing piece boundaries both ways
    np.testing.assert_array_equal(r.read_region(50, 30, 80, 70),
                                  canvas[30:100, 50:130])
    # off-edge read zero-fills
    reg = r.read_region(140, 120, 32, 32)
    np.testing.assert_array_equal(reg[:10, :10], canvas[120:, 140:])
    assert (reg[10:] == 0).all()
    r.close()


def test_single_piece_and_row_key_forms(tmp_path, canvas):
    """ImageFile alone (1x1 grid) and ImageFile(c) single-row keys."""
    one = _make_vms(tmp_path, canvas[:48, :64], piece=(64, 48), name='one')
    r = VmsReader(one)
    assert r.size == (64, 48)
    np.testing.assert_array_equal(r.read_region(0, 0, 64, 48),
                                  canvas[:48, :64])
    row = _make_vms(tmp_path, canvas[:48], piece=(64, 48), name='row')
    r2 = VmsReader(row)
    assert r2.size == (150, 48)
    np.testing.assert_array_equal(r2.read_region(100, 0, 50, 48),
                                  canvas[:48, 100:150])


def test_wsireader_dispatch_and_magnification(tmp_path, canvas):
    path = _make_vms(tmp_path, canvas, lens='40')
    r = WSIReader(path)
    assert r._tiled is not None
    info = r.get_information()
    assert (info['size_x'], info['size_y']) == (150, 130)
    assert info['magnification'] == 40.0
    # SourceLens drives the tile-size autodetect like .ndpi
    assert get_wsi_resolution(path) == 512
    r.close()


def test_missing_piece_raises(tmp_path, canvas):
    path = _make_vms(tmp_path, canvas, name='broken')
    os.remove(tmp_path / 'broken(1,0).png')
    # the INI still names it; open succeeds, the salvage chain in
    # WSIReader.read_region covers the unreadable piece with zeros
    r = WSIReader(path)
    reg = r.read_region(0, 0, 150, 130)
    np.testing.assert_array_equal(reg[:48, :64], canvas[:48, :64])
    assert (reg[:48, 64:128] == 0).all()
    # a .vms whose INI lacks a grid entry fails loudly at open
    bad = tmp_path / 'bad.vms'
    bad.write_text('[Virtual Microscope Specimen]\nNoLayers=1\n'
                   'NoJpegColumns=2\nNoJpegRows=1\nImageFile=x.png\n')
    with pytest.raises(ValueError, match='missing piece'):
        VmsReader(str(bad))


# ---------------------------------------------------------------- .vmu


def _write_ngr(path, img8, column_width, data_offset=36):
    """Encode uint8 RGB as an NGR file (16-bit LE samples, high byte =
    the uint8 value, laid out in column blocks)."""
    h, w = img8.shape[:2]
    assert w % column_width == 0
    hdr = bytearray(data_offset)
    hdr[0:2] = b'GN'
    struct.pack_into('<iii', hdr, 4, w, h, column_width)
    struct.pack_into('<i', hdr, 24, data_offset)
    img16 = (img8.astype(np.uint16) << 8) | 0x7f  # low byte is discarded
    blocks = [img16[:, cb * column_width:(cb + 1) * column_width]
              for cb in range(w // column_width)]
    data = b''.join(np.ascontiguousarray(b).astype('<u2').tobytes()
                    for b in blocks)
    with open(path, 'wb') as f:
        f.write(bytes(hdr) + data)


def _make_vmu(tmp_path, canvas, piece=(64, 48), column_width=16,
              name='uslide', lens='40'):
    h, w = canvas.shape[:2]
    pw, ph = piece
    cols, rows = (w + pw - 1) // pw, (h + ph - 1) // ph
    lines = ['[Uncompressed Virtual Microscope Specimen]', 'NoLayers=1',
             f'NoJpegColumns={cols}', f'NoJpegRows={rows}',
             f'SourceLens={lens}', 'PixelOrder=RGB', 'BitsPerPixel=36']
    for r in range(rows):
        for c in range(cols):
            part = canvas[r * ph:(r + 1) * ph, c * pw:(c + 1) * pw]
            cw = (column_width if part.shape[1] % column_width == 0
                  else part.shape[1])  # remainder piece: one block
            fn = f'{name}({c},{r}).ngr'
            _write_ngr(tmp_path / fn, part, cw)
            if (c, r) == (0, 0):
                lines.append(f'ImageFile={fn}')
            elif r == 0:
                lines.append(f'ImageFile({c})={fn}')
            else:
                lines.append(f'ImageFile({c},{r})={fn}')
    path = tmp_path / f'{name}.vmu'
    path.write_text('\n'.join(lines) + '\n')
    return str(path)


def test_ngr_piece_windowed_reads(tmp_path, canvas):
    img = canvas[:48, :64]
    _write_ngr(tmp_path / 'p.ngr', img, column_width=16)
    ngr = NgrPiece(str(tmp_path / 'p.ngr'))
    assert ngr.size == (64, 48)
    np.testing.assert_array_equal(ngr.read_window(0, 0, 64, 48), img)
    # window crossing column-block boundaries, off-grid rows
    np.testing.assert_array_equal(ngr.read_window(9, 5, 41, 30),
                                  img[5:30, 9:41])
    # single interior block
    np.testing.assert_array_equal(ngr.read_window(16, 10, 32, 20),
                                  img[10:20, 16:32])


def test_vmu_grid_regions_exact(tmp_path, canvas):
    # 150 is not a multiple of 16: the remainder piece gets a narrower
    # column width (min(16, 22))
    path = _make_vmu(tmp_path, canvas, piece=(64, 48), column_width=16)
    r = VmuReader(path)
    assert r.size == (150, 130)
    np.testing.assert_array_equal(r.read_region(0, 0, 150, 130), canvas)
    np.testing.assert_array_equal(r.read_region(50, 30, 80, 70),
                                  canvas[30:100, 50:130])
    reg = r.read_region(140, 120, 32, 32)
    np.testing.assert_array_equal(reg[:10, :10], canvas[120:, 140:])
    assert (reg[10:] == 0).all()
    assert r.get_magnification() == 40.0
    r.close()


def test_vmu_wsireader_dispatch(tmp_path, canvas):
    path = _make_vmu(tmp_path, canvas)
    r = WSIReader(path)
    info = r.get_information()
    assert (info['size_x'], info['size_y']) == (150, 130)
    assert info['magnification'] == 40.0
    assert get_wsi_resolution(path) == 512
    r.close()


def test_wsi_inference_end_to_end_on_vmu(tmp_path):
    """`test-wsi` over a .vmu container: region streaming + stitching +
    scoring run unchanged on the NGR reader (the format only changes
    WSIReader's dispatch)."""
    import json
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
    _make_vmu(wsi_dir, slide, piece=(64, 48), column_width=16, name='slide')

    out = tmp_path / 'out'
    scoring = infer_results_for_wsi(str(wsi_dir), 'slide.vmu', str(out),
                                    str(md), tile_size=64, region_size=128)
    assert {'num_total', 'num_pos', 'num_neg', 'percent_pos'} <= set(scoring)
    files = os.listdir(out)
    assert any(f.startswith('slide_Seg') and f.endswith('.ome.tiff')
               for f in files), files
    assert 'slide.json' in files


def test_vmu_salvage_truncated_and_bad_magic(tmp_path, canvas):
    path = _make_vmu(tmp_path, canvas, name='trunc')
    # truncate one interior piece's pixel data: affected rows zero-fill,
    # the rest of the slide still reads exactly
    victim = tmp_path / 'trunc(1,0).ngr'
    victim.write_bytes(victim.read_bytes()[:36 + 16 * 6 * 10])
    r = VmuReader(path)
    reg = r.read_region(0, 0, 150, 130)
    np.testing.assert_array_equal(reg[:, :64], canvas[:, :64])
    np.testing.assert_array_equal(reg[48:], canvas[48:])
    assert (reg[20:48, 64:128] == 0).all()
    r.close()
    # a piece that is not NGR at all -> open fails loudly
    bad = tmp_path / 'notngr'
    bad.mkdir()
    p2 = _make_vmu(bad, canvas[:48, :64], name='x')
    (bad / 'x(0,0).ngr').write_bytes(b'XX' + b'\0' * 40)
    with pytest.raises(ValueError, match='not an NGR'):
        VmuReader(p2)
