"""Native OME-Zarr (NGFF) reader/writer (utils/ngff.py) — the zarr-v2
slide container the reference reads via Bio-Formats
(util/__init__.py:559-617; Bio-Formats >=6.x ships the OMEZarrReader)."""

import json
import os
import struct
import zlib

import numpy as np
import pytest

from deepliif_tpu.utils.ngff import (OmeZarrReader, is_ome_zarr,
                                     write_ome_zarr)
from deepliif_tpu.utils.wsi import WSIReader


@pytest.fixture
def canvas():
    rng = np.random.default_rng(11)
    return rng.integers(0, 255, (300, 420, 3), np.uint8)


def test_roundtrip_and_regions(tmp_path, canvas):
    path = str(tmp_path / 'slide.zarr')
    write_ome_zarr(path, canvas, levels=(1, 2), chunk=128)
    r = OmeZarrReader(path)
    assert r.size == (420, 300)
    np.testing.assert_array_equal(r.read_region(0, 0, 420, 300), canvas)
    # region crossing chunk boundaries
    np.testing.assert_array_equal(r.read_region(100, 50, 200, 180),
                                  canvas[50:230, 100:300])
    # region hanging off the slide edge: out-of-bounds pixels are zero
    reg = r.read_region(400, 280, 64, 64)
    np.testing.assert_array_equal(reg[:20, :20], canvas[280:, 400:])
    assert (reg[20:] == 0).all() and (reg[:, 20:] == 0).all()
    r.close()


def test_uncompressed_store(tmp_path, canvas):
    path = str(tmp_path / 'raw.zarr')
    write_ome_zarr(path, canvas, levels=(1,), chunk=256, compressor=None)
    meta = json.load(open(os.path.join(path, '0', '.zarray')))
    assert meta['compressor'] is None
    r = OmeZarrReader(path)
    np.testing.assert_array_equal(r.read_region(10, 20, 100, 90),
                                  canvas[20:110, 10:110])


def test_missing_chunk_reads_fill_value(tmp_path, canvas):
    path = str(tmp_path / 'holes.zarr')
    write_ome_zarr(path, canvas, levels=(1,), chunk=128)
    # delete one chunk file per channel for the (y=0, x=1) tile
    for ci in range(3):
        os.remove(os.path.join(path, '0', f'{ci}.0.1'))
    r = OmeZarrReader(path)
    reg = r.read_region(0, 0, 420, 300)
    assert (reg[:128, 128:256] == 0).all()
    np.testing.assert_array_equal(reg[:, :128], canvas[:, :128])


def test_wsireader_dispatch_and_magnification(tmp_path, canvas):
    path = str(tmp_path / 'slide.zarr')
    write_ome_zarr(path, canvas, chunk=128, magnification=20)
    assert is_ome_zarr(path)
    r = WSIReader(path)
    assert r._tiled is not None
    info = r.get_information()
    assert (info['size_x'], info['size_y']) == (420, 300)
    assert info['magnification'] == 20.0
    np.testing.assert_array_equal(r.read_region(64, 32, 100, 100),
                                  canvas[32:132, 64:164])
    r.close()


def _write_array(adir, arr, chunks, compressor=None, sep='.',
                 dtype_str=None, skip_attrs=False):
    """Hand-built zarr v2 array (not via write_ome_zarr) so reader tests
    do not depend on our writer's conventions."""
    os.makedirs(adir, exist_ok=True)
    meta = {'zarr_format': 2, 'shape': list(arr.shape),
            'chunks': list(chunks), 'dtype': dtype_str or arr.dtype.str,
            'compressor': compressor, 'fill_value': 0, 'order': 'C',
            'filters': None}
    if sep != '.':
        meta['dimension_separator'] = sep
    with open(os.path.join(adir, '.zarray'), 'w') as f:
        json.dump(meta, f)
    grid = [range((s + c - 1) // c) for s, c in zip(arr.shape, chunks)]
    import itertools
    for idx in itertools.product(*grid):
        block = np.zeros(chunks, arr.dtype)
        src = arr[tuple(slice(i * c, (i + 1) * c)
                        for i, c in zip(idx, chunks))]
        block[tuple(slice(0, s) for s in src.shape)] = src
        raw = block.tobytes()
        if compressor and compressor['id'] == 'zlib':
            raw = zlib.compress(raw)
        key = sep.join(str(i) for i in idx)
        fn = os.path.join(adir, *key.split('/')) if sep == '/' \
            else os.path.join(adir, key)
        os.makedirs(os.path.dirname(fn), exist_ok=True)
        with open(fn, 'wb') as f:
            f.write(raw)


def test_5d_tczyx_nested_store(tmp_path):
    """bioformats2raw-style layout: 5D tczyx, '/'-separated chunk keys,
    multiscales in a series child group."""
    rng = np.random.default_rng(3)
    vol = rng.integers(0, 255, (1, 3, 1, 200, 250), np.uint8)
    root = tmp_path / 'b2r.zarr'
    series = root / '0'
    _write_array(str(series / '0'), vol, (1, 1, 1, 64, 64), sep='/')
    (root / '.zattrs').write_text(json.dumps(
        {'bioformats2raw.layout': 3}))
    (root / '.zgroup').write_text(json.dumps({'zarr_format': 2}))
    (series / '.zgroup').write_text(json.dumps({'zarr_format': 2}))
    (series / '.zattrs').write_text(json.dumps({'multiscales': [{
        'version': '0.4',
        'axes': [{'name': n} for n in ('t', 'c', 'z', 'y', 'x')],
        'datasets': [{'path': '0'}]}]}))
    r = OmeZarrReader(str(root))
    assert r.size == (250, 200)
    expect = np.moveaxis(vol[0, :, 0], 0, -1)
    np.testing.assert_array_equal(r.read_region(0, 0, 250, 200), expect)
    np.testing.assert_array_equal(r.read_region(33, 57, 100, 80),
                                  expect[57:137, 33:133])


def test_yx_grayscale_and_uint16(tmp_path):
    """2-D single-channel uint16 arrays read as replicated-gray RGB."""
    rng = np.random.default_rng(4)
    plane = rng.integers(0, 65535, (96, 128), np.uint16)
    adir = tmp_path / 'gray.zarr'
    _write_array(str(adir), plane, (32, 32),
                 compressor={'id': 'zlib', 'level': 1})
    r = OmeZarrReader(str(adir))
    reg = r.read_region(0, 0, 128, 96)
    expect = (plane >> 8).astype(np.uint8)
    np.testing.assert_array_equal(reg[..., 0], expect)
    np.testing.assert_array_equal(reg[..., 1], expect)


def test_implicit_tczyx_axes_pre_0_4(tmp_path):
    """NGFF <=0.3 multiscales have no 'axes'; dims default to tczyx."""
    rng = np.random.default_rng(6)
    vol = rng.integers(0, 255, (3, 40, 50), np.uint8)  # cyx
    root = tmp_path / 'old.zarr'
    _write_array(str(root / '0'), vol, (1, 16, 16))
    (root / '.zattrs').write_text(json.dumps(
        {'multiscales': [{'version': '0.3', 'datasets': [{'path': '0'}]}]}))
    r = OmeZarrReader(str(root))
    assert r.size == (50, 40)
    np.testing.assert_array_equal(r.read_region(0, 0, 50, 40),
                                  np.moveaxis(vol, 0, -1))


def _blosc_frame(payload, codec, nbytes, blocksize=None, flags_extra=0):
    blocksize = blocksize or nbytes
    if codec == 'memcpy':
        head = struct.pack('<BBBBIII', 2, 1, 0x2 | flags_extra, 1,
                           nbytes, blocksize, 16 + len(payload))
        return head + payload
    code = {'zlib': 3, 'zstd': 4, 'lz4': 1}[codec]
    nblocks = (nbytes + blocksize - 1) // blocksize
    # single-stream blocks: [int32 csize][cdata] at each bstarts offset
    blocks, bstarts = [], []
    off = 16 + 4 * nblocks
    for j in range(nblocks):
        raw = payload[j * blocksize:(j + 1) * blocksize]
        comp = zlib.compress(raw) if codec == 'zlib' else raw
        if len(comp) >= len(raw):
            comp = raw  # stored verbatim, csize == neblock
        blk = struct.pack('<i', len(comp)) + comp
        bstarts.append(off)
        blocks.append(blk)
        off += len(blk)
    head = struct.pack('<BBBBIII', 2, 1, (code << 5) | flags_extra, 1,
                       nbytes, blocksize, off)
    return head + struct.pack(f'<{nblocks}i', *bstarts) + b''.join(blocks)


def test_blosc_chunks(tmp_path):
    """blosc-container chunks: memcpy mode and zlib-coded blocks decode;
    lz4 (no decoder in this environment) raises a clear error."""
    rng = np.random.default_rng(8)
    plane = rng.integers(0, 255, (32, 32), np.uint8)
    for codec in ('memcpy', 'zlib'):
        adir = tmp_path / f'blosc_{codec}.zarr'
        _write_array(str(adir), plane, (32, 32))
        # overwrite the chunk with a blosc frame + fix the metadata
        meta = json.load(open(adir / '.zarray'))
        meta['compressor'] = {'id': 'blosc', 'cname': codec, 'clevel': 5,
                              'shuffle': 0}
        (adir / '.zarray').write_text(json.dumps(meta))
        frame = _blosc_frame(plane.tobytes(), codec, plane.nbytes,
                             blocksize=512)
        (adir / '0.0').write_bytes(frame)
        r = OmeZarrReader(str(adir))
        np.testing.assert_array_equal(
            r.read_region(0, 0, 32, 32)[..., 0], plane)

    adir = tmp_path / 'blosc_lz4.zarr'
    _write_array(str(adir), plane, (32, 32))
    meta = json.load(open(adir / '.zarray'))
    meta['compressor'] = {'id': 'blosc', 'cname': 'lz4', 'clevel': 5,
                          'shuffle': 0}
    (adir / '.zarray').write_text(json.dumps(meta))
    (adir / '0.0').write_bytes(_blosc_frame(plane.tobytes(), 'lz4',
                                            plane.nbytes))
    r = OmeZarrReader(str(adir))
    with pytest.raises(ValueError, match='lz4'):
        r.arr.chunk((0, 0))


def test_blosc_byte_shuffle_uint16(tmp_path):
    """zlib-coded frame with the byte-shuffle flag: each block is
    unshuffled independently (c-blosc shuffles per block, and memcpyed
    frames are stored unshuffled)."""
    rng = np.random.default_rng(9)
    plane = rng.integers(0, 65535, (16, 16), np.uint16)
    adir = tmp_path / 'shuf.zarr'
    _write_array(str(adir), plane, (16, 16))
    meta = json.load(open(adir / '.zarray'))
    meta['compressor'] = {'id': 'blosc', 'cname': 'zlib', 'shuffle': 1}
    (adir / '.zarray').write_text(json.dumps(meta))
    raw = plane.tobytes()
    blocksize = 128  # -> 4 blocks, shuffled independently
    shuffled = b''.join(
        np.frombuffer(raw[o:o + blocksize], np.uint8)
        .reshape(-1, 2).T.tobytes()
        for o in range(0, len(raw), blocksize))
    frame = _blosc_frame(shuffled, 'zlib', len(raw), blocksize=blocksize,
                         flags_extra=0x1)
    frame = frame[:3] + bytes([2]) + frame[4:]  # typesize = 2
    (adir / '0.0').write_bytes(frame)
    r = OmeZarrReader(str(adir))
    np.testing.assert_array_equal(
        r.read_region(0, 0, 16, 16)[..., 0], (plane >> 8).astype(np.uint8))


def test_wsi_inference_end_to_end_on_zarr(tmp_path):
    """`test-wsi` over an OME-Zarr store: region streaming + stitching +
    scoring run unchanged on the NGFF reader (the format only changes
    WSIReader's dispatch)."""
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
    write_ome_zarr(str(wsi_dir / 'slide.zarr'), slide, levels=(1, 2),
                   chunk=64)

    out = tmp_path / 'out'
    scoring = infer_results_for_wsi(str(wsi_dir), 'slide.zarr', str(out),
                                    str(md), tile_size=64, region_size=128)
    assert {'num_total', 'num_pos', 'num_neg', 'percent_pos'} <= set(scoring)
    files = os.listdir(out)
    assert any(f.startswith('slide_Seg') and f.endswith('.ome.tiff')
               for f in files), files
    assert 'slide.json' in files
