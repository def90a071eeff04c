"""Synthetic MIRAX (.mrxs) container writer for testing
deepliif_tpu.utils.mirax.

Emits the documented multi-file layout (Slidedat.ini + Index.dat +
Data####.dat with linked index pages, a zlib position buffer, and
JPEG/PNG/BMP tile images) so the reader can be validated without real
3DHISTECH files or a JVM. Test-only — the reference has no MIRAX writer
either (it only reads them via Bio-Formats)."""

import io
import os
import struct
import zlib

import numpy as np
from PIL import Image

SLIDE_ID = 'TESTSLIDE0000000000000000'


def _encode_tile(arr, fmt):
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    if fmt == 'JPEG':
        img.save(buf, 'JPEG', quality=95)
    elif fmt == 'PNG':
        img.save(buf, 'PNG')
    elif fmt == 'BMP24':
        img.save(buf, 'BMP')
    else:
        raise ValueError(fmt)
    return buf.getvalue()


def write_mrxs(path, tiles, cameras, tile_size, *, divisions=1,
               overlap=(0.0, 0.0), image_format='PNG', positions=None,
               raw_position_buffer=False, fill_bgr=0xFFFFFF,
               magnification=20.0, page_size=0):
    """Write ``path`` (.mrxs) + its companion container directory.

    tiles       {(gx, gy): HxWx3 uint8} — stored level-0 images on the
                subtile grid (cameras_x*divisions wide)
    cameras     (cameras_x, cameras_y)
    tile_size   (tile_w, tile_h) of stored images
    positions   optional {(cx, cy): (x, y)} camera positions — written as
                a VIMSLIDE_POSITION_BUFFER (zlib unless
                raw_position_buffer); omit for the overlap-grid fallback
    page_size   max index entries per data page (0 = all in one page),
                exercising the linked page chain
    """
    cameras_x, cameras_y = cameras
    tile_w, tile_h = tile_size
    stem = path[:-5]
    os.makedirs(stem, exist_ok=True)

    # -- data files: tiles in Data0000, position buffer in Data0001 ---------
    data0 = io.BytesIO()
    entries = []  # (image_number, offset, length, fileno)
    grid_w = cameras_x * divisions
    for (gx, gy), arr in sorted(tiles.items()):
        blob = _encode_tile(np.ascontiguousarray(arr, np.uint8),
                            image_format)
        entries.append((gy * grid_w + gx, data0.tell(), len(blob), 0))
        data0.write(blob)

    data_files = ['Data0000.dat']
    pos_record = None
    if positions is not None:
        buf = b''.join(
            struct.pack('<Bii', 1, *positions.get((cx, cy), (0, 0)))
            if (cx, cy) in positions else struct.pack('<Bii', 0, 0, 0)
            for cy in range(cameras_y) for cx in range(cameras_x))
        if not raw_position_buffer:
            buf = zlib.compress(buf)
        pos_record = (0, len(buf), 1)
        with open(os.path.join(stem, 'Data0001.dat'), 'wb') as fh:
            fh.write(buf)
        data_files.append('Data0001.dat')
    with open(os.path.join(stem, 'Data0000.dat'), 'wb') as fh:
        fh.write(data0.getvalue())

    # -- Slidedat.ini -------------------------------------------------------
    level_section = 'LAYER_0_LEVEL_0_SECTION'
    ini = [
        '[GENERAL]',
        'SLIDE_VERSION=1.9',
        f'SLIDE_ID={SLIDE_ID}',
        f'IMAGENUMBER_X={cameras_x}',
        f'IMAGENUMBER_Y={cameras_y}',
        f'CameraImageDivisionsPerSide={divisions}',
        f'OBJECTIVE_MAGNIFICATION={magnification}',
        '[HIERARCHICAL]',
        'HIER_COUNT=1',
        'NONHIER_COUNT=1',
        'INDEXFILE=Index.dat',
        'HIER_0_NAME=Slide zoom level',
        'HIER_0_COUNT=1',
        'HIER_0_VAL_0=ZoomLevel_0',
        f'HIER_0_VAL_0_SECTION={level_section}',
        'NONHIER_0_NAME=VIMSLIDE_POSITION_BUFFER',
        'NONHIER_0_COUNT=1',
        'NONHIER_0_VAL_0=default',
        '[DATAFILE]',
        f'FILE_COUNT={len(data_files)}',
    ]
    ini += [f'FILE_{i}={name}' for i, name in enumerate(data_files)]
    ini += [
        f'[{level_section}]',
        f'DIGITIZER_WIDTH={tile_w}',
        f'DIGITIZER_HEIGHT={tile_h}',
        f'OVERLAP_X={overlap[0]}',
        f'OVERLAP_Y={overlap[1]}',
        f'IMAGE_FORMAT={image_format}',
        f'IMAGE_FILL_COLOR_BGR={fill_bgr}',
    ]
    with open(os.path.join(stem, 'Slidedat.ini'), 'w',
              encoding='utf-8-sig') as fh:
        fh.write('\n'.join(ini) + '\n')

    # -- Index.dat ----------------------------------------------------------
    idx = io.BytesIO()
    idx.write(b'01.02')
    idx.write(SLIDE_ID.encode('ascii'))
    root_pos = idx.tell()
    idx.write(b'\x00' * 8)  # hier_root, nonhier_root patched below

    def _write_pages(recs, per_page):
        """Write a linked page chain; returns the first page's offset."""
        if per_page <= 0:
            per_page = max(1, len(recs))
        chunks = [recs[i:i + per_page]
                  for i in range(0, len(recs), per_page)] or [[]]
        offsets = []
        for chunk in chunks:
            offsets.append(idx.tell())
            idx.write(b'\x00' * (8 + 16 * len(chunk)))
        for k, chunk in enumerate(chunks):
            nxt = offsets[k + 1] if k + 1 < len(chunks) else 0
            payload = struct.pack('<ii', len(chunk), nxt)
            payload += b''.join(struct.pack('<4i', *r) for r in chunk)
            pos = idx.tell()
            idx.seek(offsets[k])
            idx.write(payload)
            idx.seek(pos)
        return offsets[0]

    hier_page = _write_pages(entries, page_size)
    nonhier_page = (_write_pages([(0, *pos_record)], 0)
                    if pos_record is not None else 0)
    hier_root = idx.tell()
    idx.write(struct.pack('<i', hier_page))
    nonhier_root = idx.tell()
    idx.write(struct.pack('<i', nonhier_page))
    idx.seek(root_pos)
    idx.write(struct.pack('<ii', hier_root, nonhier_root))
    with open(os.path.join(stem, 'Index.dat'), 'wb') as fh:
        fh.write(idx.getvalue())

    # -- the .mrxs file itself: a small thumbnail ---------------------------
    Image.new('RGB', (16, 16), (200, 200, 200)).save(path, 'BMP')
    return path
