"""Olympus cellSens .vsi/.ets reader (utils/vsi.py) against synthetic
stores — another Bio-Formats-only format in the reference
(util/__init__.py:559-691) now read natively."""

import io
import struct

import numpy as np
import pytest
from PIL import Image

from deepliif_tpu.utils.vsi import EtsFile, VsiReader
from deepliif_tpu.utils.wsi import WSIReader


def _encode(tile, codec):
    if codec == 'raw':
        return np.ascontiguousarray(tile).astype('<u2').tobytes() \
            if tile.dtype == np.uint16 else np.ascontiguousarray(
                tile).tobytes()
    buf = io.BytesIO()
    img = Image.fromarray(tile if tile.shape[-1] == 3 else tile[:, :, 0])
    if codec == 'png':
        img.save(buf, 'PNG')
    elif codec == 'j2k':
        img.save(buf, 'JPEG2000', codec='j2k')
    else:
        img.save(buf, 'JPEG', quality=95)
    return buf.getvalue()


def _write_ets(path, canvas, tile=(32, 32), codec='raw', levels=1,
               ndim=4, pixel_type=0, drop=(), compression=0,
               split_channels=False):
    """Synthesize an ETS store from uint8/uint16 RGB ``canvas``: SIS
    volume header, ETS additional header, per-level tile chunks and the
    used-chunk table. ``drop`` skips (x, y) level-0 chunks (sparse).
    ``split_channels`` writes one grayscale plane per RGB channel
    (fluorescence layout: channel index in coords[2])."""
    th, tw = tile[1], tile[0]
    spp = 1 if split_channels else canvas.shape[2]
    chunks = []  # (coords tuple, payload)
    for lvl in range(levels):
        img = canvas[::2 ** lvl, ::2 ** lvl]
        gh = (img.shape[0] + th - 1) // th
        gw = (img.shape[1] + tw - 1) // tw
        for ty in range(gh):
            for tx in range(gw):
                if lvl == 0 and (tx, ty) in drop:
                    continue
                t = np.zeros((th, tw, canvas.shape[2]), canvas.dtype)
                part = img[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
                t[:part.shape[0], :part.shape[1]] = part
                if split_channels:
                    for c in range(canvas.shape[2]):
                        coords = [tx, ty, c] + [0] * (ndim - 4) + [lvl]
                        chunks.append((coords,
                                       _encode(t[:, :, c:c + 1], codec)))
                else:
                    coords = [tx, ty] + [0] * (ndim - 3) + [lvl]
                    chunks.append((coords, _encode(t, codec)))
    sis = struct.Struct('<4siii q i 4x q i')
    ets = struct.Struct('<4si iiiii iii')
    add_off = sis.size
    data_off = add_off + ets.size
    payloads, offs = b'', []
    for _, p in chunks:
        offs.append(data_off + len(payloads))
        payloads += p
    chunk_off = data_off + len(payloads)
    rec = struct.Struct(f'<4x{ndim}i q i 4x')
    with open(path, 'wb') as f:
        f.write(sis.pack(b'SIS\x00', sis.size, 1, ndim, add_off, ets.size,
                         chunk_off, len(chunks)))
        f.write(ets.pack(b'ETS\x00', 1, pixel_type, spp, 0, compression, 90,
                         tw, th, 1))
        f.write(payloads)
        for (coords, p), off in zip(chunks, offs):
            f.write(rec.pack(*coords, off, len(p)))
    return str(path)


def _make_vsi(tmp_path, canvas, name='slide', **kw):
    """A .vsi stub + _name_/stack1/frame_t.ets pixel store (plus a tiny
    overview stack the locator must skip)."""
    vsi = tmp_path / f'{name}.vsi'
    vsi.write_bytes(b'II*\x00' + b'\x00' * 8)  # TIFF stub, never parsed
    stack = tmp_path / f'_{name}_' / 'stack1'
    stack.mkdir(parents=True)
    _write_ets(stack / 'frame_t.ets', canvas, **kw)
    over = tmp_path / f'_{name}_' / 'stack10000'
    over.mkdir()
    _write_ets(over / 'frame_t.ets', canvas[::8, ::8], tile=(16, 16))
    return str(vsi)


@pytest.fixture
def canvas():
    rng = np.random.default_rng(33)
    return rng.integers(0, 255, (96, 128, 3), np.uint8)


def test_ets_raw_regions_exact(tmp_path, canvas):
    path = _write_ets(tmp_path / 'a.ets', canvas, tile=(32, 32))
    ets = EtsFile(path)
    assert ets.size == (128, 96)
    np.testing.assert_array_equal(ets.read_region(0, 0, 128, 96), canvas)
    np.testing.assert_array_equal(ets.read_region(17, 9, 60, 50),
                                  canvas[9:59, 17:77])
    reg = ets.read_region(120, 90, 16, 16)
    np.testing.assert_array_equal(reg[:6, :8], canvas[90:, 120:])
    assert (reg[6:] == 0).all()


def test_ets_pyramid_picks_level0_and_sparse_fills(tmp_path, canvas):
    path = _write_ets(tmp_path / 'p.ets', canvas, tile=(32, 32), levels=3,
                      drop={(1, 1)})
    ets = EtsFile(path)
    assert ets.size == (128, 96)  # level-0 grid, not a coarser level
    reg = ets.read_region(0, 0, 128, 96)
    np.testing.assert_array_equal(reg[:32], canvas[:32])
    assert (reg[32:64, 32:64] == 0).all()  # dropped chunk = background
    np.testing.assert_array_equal(reg[64:], canvas[64:])


def test_ets_payload_sniffing_png_j2k_jpeg(tmp_path, canvas):
    # PNG and J2K are lossless -> exact; JPEG is lossy -> close
    for codec in ('png', 'j2k'):
        path = _write_ets(tmp_path / f'{codec}.ets', canvas, codec=codec,
                          compression=5)
        np.testing.assert_array_equal(
            EtsFile(path).read_region(0, 0, 128, 96), canvas)
    yy, xx = np.mgrid[0:96, 0:128]
    smooth = np.stack([yy * 2, xx, (yy + xx)], -1).astype(np.uint8)
    path = _write_ets(tmp_path / 'j.ets', smooth, codec='jpeg',
                      compression=2)
    reg = EtsFile(path).read_region(0, 0, 128, 96)
    assert np.abs(reg.astype(int) - smooth.astype(int)).mean() < 3


def test_ets_uint16_narrowing(tmp_path, canvas):
    wide = (canvas.astype(np.uint16) << 8) | 0x3c
    path = _write_ets(tmp_path / 'w.ets', wide, pixel_type=2)
    np.testing.assert_array_equal(
        EtsFile(path).read_region(0, 0, 128, 96), canvas)


def test_vsi_locator_and_wsireader_dispatch(tmp_path, canvas):
    path = _make_vsi(tmp_path, canvas)
    r = VsiReader(path)
    assert r.size == (128, 96)  # the WSI stack, not the overview
    np.testing.assert_array_equal(r.read_region(0, 0, 128, 96), canvas)
    r.close()
    w = WSIReader(path)
    assert w._tiled is not None
    info = w.get_information()
    assert (info['size_x'], info['size_y']) == (128, 96)
    np.testing.assert_array_equal(w.read_region(40, 20, 50, 60),
                                  canvas[20:80, 40:90])
    w.close()


def test_ets_salvage_and_bad_magic(tmp_path, canvas):
    path = _write_ets(tmp_path / 't.ets', canvas, tile=(32, 32))
    # truncate the last chunk's payload mid-tile: zero tail, loud nowhere
    ets = EtsFile(path)
    off, length = ets._tiles[(3, 2)]
    data = open(path, 'rb').read()
    # chunk table sits at the end; keep it, cut this tile's payload short
    patched = bytearray(data)
    patched[off + 64:off + length] = b'\x00' * (length - 64)
    open(path, 'wb').write(bytes(patched))
    reg = EtsFile(path).read_region(96, 64, 32, 32)
    assert (reg[1:] == 0).all()  # only ~64 bytes of row 0 survive
    bad = tmp_path / 'bad.ets'
    bad.write_bytes(b'XXXX' + b'\x00' * 60)
    with pytest.raises(ValueError, match='not an ETS'):
        EtsFile(str(bad))
    empty = tmp_path / 'e.vsi'
    empty.write_bytes(b'II*\x00')
    with pytest.raises(ValueError, match='no ETS pixel stores'):
        VsiReader(str(empty))


def test_ets_channel_planes_merge_to_rgb(tmp_path, canvas):
    """Fluorescence layout: one grayscale plane per channel with equal
    level-0 extents must compose to RGB, not silently read one channel
    (ADVICE r4)."""
    path = _write_ets(tmp_path / 'chan.ets', canvas, tile=(32, 32),
                      split_channels=True)
    ets = EtsFile(path)
    assert ets.size == (128, 96)
    assert len(ets._planes) == 3
    np.testing.assert_array_equal(ets.read_region(0, 0, 128, 96), canvas)
    np.testing.assert_array_equal(ets.read_region(17, 9, 60, 50),
                                  canvas[9:59, 17:77])


def test_ets_channel_planes_with_pyramid(tmp_path, canvas):
    """Channel planes + pyramid levels: only the level-0 planes merge."""
    path = _write_ets(tmp_path / 'chanp.ets', canvas, tile=(32, 32),
                      split_channels=True, levels=2)
    ets = EtsFile(path)
    assert ets.size == (128, 96)
    np.testing.assert_array_equal(ets.read_region(0, 0, 128, 96), canvas)


def test_ets_many_equal_planes_warns_and_reads_first(tmp_path, canvas):
    """>4 equal-extent planes (a Z-stack): deterministic first plane +
    a warning, not an arbitrary pick."""
    import warnings as _w
    gray = np.repeat(canvas[:, :, :1], 6, axis=-1)  # 6 identical "Z" planes
    path = _write_ets(tmp_path / 'z.ets', gray, tile=(32, 32),
                      split_channels=True)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter('always')
        ets = EtsFile(path)
        assert any('planes share' in str(r.message) for r in rec)
    assert len(ets._planes) == 1
    np.testing.assert_array_equal(ets.read_region(0, 0, 128, 96),
                                  np.repeat(gray[:, :, :1], 3, axis=-1))
