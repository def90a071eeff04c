"""Hamamatsu .vms container reader (utils/vms.py) against synthetic
slides — another Bio-Formats-only format in the reference
(util/__init__.py:559-617) now read natively."""

import os

import numpy as np
import pytest
from PIL import Image

from deepliif_tpu.utils.vms import VmsReader
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
