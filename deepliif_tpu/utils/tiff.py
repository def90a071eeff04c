"""Minimal self-contained tiled TIFF/BigTIFF I/O.

The reference writes pyramidal BigTIFFs via tifffile and reads WSIs via a
zarr view over tiled TIFF pages (reference util/__init__.py:559-691,
774-792). Neither tifffile nor zarr is available in this environment, so
this module implements the needed subset directly:

  * write_pyramid_tiff: tiled (256px) BigTIFF, deflate-compressed, RGB,
    with /2 /4 /8 reduced-resolution pyramid pages — the same layout as the
    reference's write_big_tiff_file;
  * TiledTiffReader: random-access region reads that decode only the tiles
    intersecting the request — the WSI fast path (bounded memory).

Only the tags this framework writes are supported by the reader; PIL remains
the fallback for foreign files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF tags
IMAGE_WIDTH = 256
IMAGE_LENGTH = 257
BITS_PER_SAMPLE = 258
COMPRESSION = 259          # 1 = none, 8 = deflate
PHOTOMETRIC = 262          # 2 = RGB
SAMPLES_PER_PIXEL = 277
PLANAR_CONFIG = 284
TILE_WIDTH = 322
TILE_LENGTH = 323
TILE_OFFSETS = 324
TILE_BYTE_COUNTS = 325
NEW_SUBFILE_TYPE = 254
SAMPLE_FORMAT = 339

TYPE_SHORT = 3    # uint16
TYPE_LONG = 4     # uint32
TYPE_LONG8 = 16   # uint64 (BigTIFF)

TILE = 256


def _tile_grid(h, w, tile=TILE):
    ty = (h + tile - 1) // tile
    tx = (w + tile - 1) // tile
    return ty, tx


IMAGE_DESCRIPTION = 270


def make_ome_xml(size_x, size_y, channel_names=None, size_c=3,
                 pixel_type='uint8'):
    """Minimal OME-XML ImageDescription (the reference embeds OME metadata
    via tifffile/bioformats, util/__init__.py:793-914)."""
    channel_names = channel_names or []
    channels = ''.join(
        f'<Channel ID="Channel:0:{i}" Name="{nm}" SamplesPerPixel="1"/>'
        for i, nm in enumerate(channel_names))
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0"><Pixels ID="Pixels:0" DimensionOrder="XYCZT" '
        f'Type="{pixel_type}" SizeX="{size_x}" SizeY="{size_y}" '
        f'SizeC="{max(size_c, len(channel_names) or 1)}" SizeZ="1" SizeT="1">'
        f'{channels}</Pixels></Image></OME>')


def write_pyramid_tiff(path, canvas, levels=(1, 2, 4, 8), tile=TILE,
                       compression=True, channel_names=None):
    """Write an HxWx3 uint8 canvas as a pyramidal tiled BigTIFF."""
    canvas = np.ascontiguousarray(canvas, np.uint8)
    if canvas.ndim == 2:
        canvas = np.repeat(canvas[..., None], 3, -1)
    pages = []
    for f in levels:
        if f == 1:
            pages.append(canvas)
        else:
            pages.append(canvas[::f, ::f])  # nearest decimation (fast)

    with open(path, 'wb') as fh:
        # BigTIFF header
        fh.write(struct.pack('<2sHHHQ', b'II', 43, 8, 0, 0))
        header_next_ifd_pos = 8  # offset of the 'first IFD offset' field
        prev_next_field = header_next_ifd_pos

        for page_idx, img in enumerate(pages):
            h, w = img.shape[:2]
            ty, tx = _tile_grid(h, w, tile)
            offsets, counts = [], []
            for j in range(ty):
                for i in range(tx):
                    t = img[j * tile:(j + 1) * tile, i * tile:(i + 1) * tile]
                    if t.shape[0] != tile or t.shape[1] != tile:
                        pad = np.zeros((tile, tile, 3), np.uint8)
                        pad[:t.shape[0], :t.shape[1]] = t
                        t = pad
                    raw = t.tobytes()
                    data = zlib.compress(raw, 6) if compression else raw
                    offsets.append(fh.tell())
                    counts.append(len(data))
                    fh.write(data)

            # out-of-line arrays
            bps_off = fh.tell()
            fh.write(struct.pack('<3H', 8, 8, 8))
            off_arr_off = fh.tell()
            fh.write(struct.pack(f'<{len(offsets)}Q', *offsets))
            cnt_arr_off = fh.tell()
            fh.write(struct.pack(f'<{len(counts)}Q', *counts))
            desc_off = desc_len = 0
            if page_idx == 0 and channel_names:
                desc = make_ome_xml(w, h, channel_names).encode() + b'\x00'
                desc_off = fh.tell()
                desc_len = len(desc)
                fh.write(desc)

            entries = []

            def entry(tag, typ, count, value):
                entries.append((tag, typ, count, value))

            if page_idx > 0:
                entry(NEW_SUBFILE_TYPE, TYPE_LONG, 1, 1)
            if desc_len:
                entry(IMAGE_DESCRIPTION, 2, desc_len, desc_off)  # type ASCII
            entry(IMAGE_WIDTH, TYPE_LONG, 1, w)
            entry(IMAGE_LENGTH, TYPE_LONG, 1, h)
            entry(BITS_PER_SAMPLE, TYPE_SHORT, 3, bps_off)
            entry(COMPRESSION, TYPE_SHORT, 1, 8 if compression else 1)
            entry(PHOTOMETRIC, TYPE_SHORT, 1, 2)
            entry(SAMPLES_PER_PIXEL, TYPE_SHORT, 1, 3)
            entry(PLANAR_CONFIG, TYPE_SHORT, 1, 1)
            entry(TILE_WIDTH, TYPE_SHORT, 1, tile)
            entry(TILE_LENGTH, TYPE_SHORT, 1, tile)
            entry(TILE_OFFSETS, TYPE_LONG8, len(offsets), off_arr_off)
            entry(TILE_BYTE_COUNTS, TYPE_LONG8, len(counts), cnt_arr_off)
            entries.sort()

            ifd_off = fh.tell()
            fh.write(struct.pack('<Q', len(entries)))
            for tag, typ, count, value in entries:
                fh.write(struct.pack('<HHQQ', tag, typ, count, value))
            next_field_pos = fh.tell()
            fh.write(struct.pack('<Q', 0))

            # patch previous next-IFD pointer
            end = fh.tell()
            fh.seek(prev_next_field)
            fh.write(struct.pack('<Q', ifd_off))
            fh.seek(end)
            prev_next_field = next_field_pos
    return path


class TiledTiffReader:
    """Random-access reader for (Big)TIFFs with tiled RGB uint8 pages."""

    def __init__(self, path):
        self.path = path
        self.fh = open(path, 'rb')
        magic = self.fh.read(4)
        if magic[:2] != b'II':
            raise ValueError('only little-endian TIFF supported')
        version = struct.unpack('<H', magic[2:4])[0]
        if version == 43:
            self.big = True
            offsize, zero = struct.unpack('<HH', self.fh.read(4))
            self.first_ifd = struct.unpack('<Q', self.fh.read(8))[0]
        elif version == 42:
            self.big = False
            self.first_ifd = struct.unpack('<I', self.fh.read(4))[0]
        else:
            raise ValueError(f'not a TIFF file: {path}')
        self.pages = self._read_ifds()
        if not self.pages:
            raise ValueError('no TIFF pages found')

    def _read_value_array(self, typ, count, raw):
        fmt = {TYPE_SHORT: 'H', TYPE_LONG: 'I', TYPE_LONG8: 'Q'}[typ]
        size = struct.calcsize('<' + fmt) * count
        inline_cap = 8 if self.big else 4
        if size <= inline_cap:
            return struct.unpack(f'<{count}{fmt}', raw[:size])
        off = struct.unpack('<Q' if self.big else '<I', raw[:inline_cap])[0]
        pos = self.fh.tell()
        self.fh.seek(off)
        vals = struct.unpack(f'<{count}{fmt}', self.fh.read(size))
        self.fh.seek(pos)
        return vals

    def _read_ifds(self):
        pages = []
        off = self.first_ifd
        while off:
            self.fh.seek(off)
            if self.big:
                n = struct.unpack('<Q', self.fh.read(8))[0]
                entry_size, count_fmt = 20, '<HHQ8s'
            else:
                n = struct.unpack('<H', self.fh.read(2))[0]
                entry_size, count_fmt = 12, '<HHI4s'
            raw = self.fh.read(entry_size * n)
            tags = {}
            for i in range(n):
                chunk = raw[i * entry_size:(i + 1) * entry_size]
                tag, typ, count, val = struct.unpack(count_fmt, chunk)
                tags[tag] = (typ, count, val)
            next_raw = self.fh.read(8 if self.big else 4)
            off = struct.unpack('<Q' if self.big else '<I', next_raw)[0]

            def get(tag, default=None):
                if tag not in tags:
                    return default
                typ, count, val = tags[tag]
                return self._read_value_array(typ, count, val)

            page = {
                'width': get(IMAGE_WIDTH, (0,))[0],
                'height': get(IMAGE_LENGTH, (0,))[0],
                'tile_w': (get(TILE_WIDTH) or (None,))[0],
                'tile_h': (get(TILE_LENGTH) or (None,))[0],
                'compression': get(COMPRESSION, (1,))[0],
                'spp': get(SAMPLES_PER_PIXEL, (1,))[0],
                'offsets': get(TILE_OFFSETS),
                'counts': get(TILE_BYTE_COUNTS),
            }
            pages.append(page)
        return pages

    @property
    def size(self):
        return (self.pages[0]['width'], self.pages[0]['height'])

    def read_region(self, x, y, w, h, level=0):
        """Decode only the tiles intersecting (x, y, w, h) on ``level``."""
        page = self.pages[level]
        tw, th = page['tile_w'], page['tile_h']
        if tw is None:
            raise ValueError('page is not tiled')
        spp = page['spp']
        ty, tx = _tile_grid(page['height'], page['width'], tw)
        out = np.zeros((h, w, spp), np.uint8)
        j0, j1 = y // th, min((y + h - 1) // th, ty - 1)
        i0, i1 = x // tw, min((x + w - 1) // tw, tx - 1)
        for j in range(j0, j1 + 1):
            for i in range(i0, i1 + 1):
                idx = j * tx + i
                self.fh.seek(page['offsets'][idx])
                data = self.fh.read(page['counts'][idx])
                if page['compression'] == 8:
                    data = zlib.decompress(data)
                tile = np.frombuffer(data, np.uint8).reshape(th, tw, spp)
                ty0, tx0 = j * th, i * tw
                sy0, sx0 = max(y, ty0), max(x, tx0)
                sy1 = min(y + h, ty0 + th)
                sx1 = min(x + w, tx0 + tw)
                out[sy0 - y:sy1 - y, sx0 - x:sx1 - x] = \
                    tile[sy0 - ty0:sy1 - ty0, sx0 - tx0:sx1 - tx0]
        return out

    def close(self):
        self.fh.close()
