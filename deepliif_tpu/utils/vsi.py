"""Olympus cellSens (.vsi / .ets) slide reading.

The reference reaches this format only through Bio-Formats' JVM bridge
(reference util/__init__.py:559-691). A cellSens acquisition is a
multi-file container: ``Name.vsi`` is a TIFF carrying overview images
and proprietary metadata, and the full-resolution pixels live in ETS
files under a sibling directory::

    Name.vsi
    _Name_/stack1/frame_t.ets      one ETS pixel store per image stack

ETS is a chunked tile store (layout as documented by the Bio-Formats
project's CellSens notes), little-endian throughout:

  * SIS volume header: ``SIS`` magic; int32 header size, version and
    dimension count; int64 offset + int32 size of the additional
    header; int64 offset + int32 count of the used-chunk table.
  * ETS additional header: ``ETS`` magic; int32 version, pixel type,
    channel count, colorspace, compression type and quality; int32
    tile width, height and depth.
  * Used-chunk table: per chunk an int32 pad, ``ndim`` int32 tile
    coordinates (x index, y index, then higher dims — the last of
    which distinguishes pyramid levels), an int64 file offset, an
    int32 payload byte length and an int32 pad.

Tile payloads are raw interleaved samples or a self-describing
compressed stream. Rather than trusting the compression enum (whose
values differ across cellSens generations), each payload is sniffed by
magic — JPEG (FFD8), JPEG-2000 (JP2 box or raw J2K codestream), PNG or
BMP go through PIL; anything else is treated as raw. Absent chunks are
background (rendered as zeros). The canvas size is the level-0 tile
grid extent: the ETS store pads edge tiles, and the unpadded size is
only recorded in the .vsi's proprietary metadata blocks, which this
reader does not parse.
"""

from __future__ import annotations

import glob
import io
import os
import struct

import numpy as np

_SIS_HDR = struct.Struct('<4siii q i 4x q i')  # magic..chunk table
_ETS_HDR = struct.Struct('<4si iiiii iii')     # magic, version, pixel info

# ETS pixel-type codes (Bio-Formats CellSens notes); value -> numpy dtype
_PIXEL_TYPES = {0: np.uint8, 1: np.int8, 2: np.uint16, 3: np.int16,
                4: np.uint32, 5: np.int32, 6: np.float32, 9: np.float64}


def _sniff_decode(buf, tile_h, tile_w, spp, dtype):
    """Decode one tile payload: compressed streams are self-describing
    (sniffed by magic), anything else is raw interleaved samples."""
    compressed = (buf[:2] == b'\xff\xd8'                  # JPEG
                  or buf[:4] == b'\xffO\xffQ'             # raw J2K codestream
                  or buf[4:8] == b'jP  '                  # JP2 box
                  or buf[:8] == b'\x89PNG\r\n\x1a\n'      # PNG
                  or buf[:2] == b'BM')                    # BMP
    if compressed:
        from PIL import Image
        img = Image.open(io.BytesIO(buf))
        arr = np.asarray(img.convert('RGB') if spp == 3 else img.convert('L'))
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return arr
    n = tile_h * tile_w * spp
    vals = np.frombuffer(buf, np.dtype(dtype).newbyteorder('<'),
                         count=min(len(buf) // np.dtype(dtype).itemsize, n))
    out = np.zeros(n, dtype)                              # short read -> 0
    out[:vals.size] = vals
    return out.reshape(tile_h, tile_w, spp)


class EtsFile:
    """One ETS pixel store; exposes the level-0 tile grid.

    ``.size`` = padded (w, h); ``read_region`` decodes only intersecting
    tiles (bounded memory). Multi-level stores keep only the level whose
    tile grid is largest (level 0); other levels are decimations the
    pipeline recomputes itself when writing pyramids (utils.tiff).
    """

    def __init__(self, path):
        self.path = path
        with open(path, 'rb') as f:
            head = f.read(_SIS_HDR.size)
            if len(head) < _SIS_HDR.size:
                raise ValueError(f'{path}: truncated SIS header')
            (magic, _hsize, _ver, ndim, add_off, _add_size,
             chunk_off, n_chunks) = _SIS_HDR.unpack(head)
            if magic.rstrip(b'\x00') != b'SIS':
                raise ValueError(f'{path}: not an ETS (SIS) file')
            if not (0 < ndim <= 16 and n_chunks >= 0):
                raise ValueError(f'{path}: bad SIS geometry ndim={ndim}')
            f.seek(add_off)
            ahead = f.read(_ETS_HDR.size)
            (emagic, _ever, pixel_type, size_c, _colorspace,
             self.compression, _quality, self.tile_w, self.tile_h,
             _tile_z) = _ETS_HDR.unpack(ahead)
            if emagic.rstrip(b'\x00') != b'ETS':
                raise ValueError(f'{path}: missing ETS header')
            if pixel_type not in _PIXEL_TYPES:
                raise ValueError(f'{path}: pixel type {pixel_type}')
            self.dtype = _PIXEL_TYPES[pixel_type]
            self.spp = size_c
            if not (0 < self.tile_w <= 65536 and 0 < self.tile_h <= 65536
                    and self.spp in (1, 3, 4)):
                raise ValueError(f'{path}: bad tile geometry')
            # used-chunk table; group by dims beyond (x, y) — the group
            # with the largest tile-grid extent is the level-0 plane
            f.seek(chunk_off)
            rec = struct.Struct(f'<4x{ndim}i q i 4x')
            buf = f.read(rec.size * n_chunks)
            planes = {}
            for i in range(len(buf) // rec.size):
                vals = rec.unpack_from(buf, i * rec.size)
                coords, off, length = vals[:ndim], vals[ndim], vals[ndim + 1]
                x, y = (coords[0], coords[1]) if ndim >= 2 else (coords[0], 0)
                planes.setdefault(tuple(coords[2:]), {})[(x, y)] = (
                    off, length)
            if not planes:
                raise ValueError(f'{path}: no used chunks')
        # Fluorescence / multi-channel stores hold SEVERAL planes with the
        # SAME level-0 extent (one grayscale plane per channel, identical
        # grids). Merge up to 3 of them as RGB channels instead of
        # silently reading one arbitrary channel; more than 4 equal
        # planes (e.g. a Z stack) cannot be told apart without the .vsi
        # proprietary metadata, so warn and read the first deterministic
        # plane.
        def _extent(p):
            return (max(x for x, _ in p) + 1) * (max(y for _, y in p) + 1)

        best = max(_extent(p) for p in planes.values())
        eq = sorted(k for k, p in planes.items() if _extent(p) == best)
        if 1 < len(eq) <= 4 and self.spp == 1:
            self._planes = [planes[k] for k in eq[:3]]
        else:
            if len(eq) > 1:
                import warnings
                warnings.warn(
                    f'{path}: {len(eq)} ETS planes share the level-0 '
                    'extent; reading the first (channel/Z identity needs '
                    'the .vsi proprietary metadata)', stacklevel=2)
            self._planes = [planes[eq[0]]]
        self._tiles = self._planes[0]
        self.grid_w = max(x for x, _ in self._tiles) + 1
        self.grid_h = max(y for _, y in self._tiles) + 1
        self.size = (self.grid_w * self.tile_w, self.grid_h * self.tile_h)

    def _plane_tile(self, plane, tx, ty):
        loc = plane.get((tx, ty))
        if loc is None:                                   # sparse: background
            return np.zeros((self.tile_h, self.tile_w, self.spp), self.dtype)
        off, length = loc
        try:
            with open(self.path, 'rb') as f:
                f.seek(off)
                return _sniff_decode(f.read(length), self.tile_h,
                                     self.tile_w, self.spp, self.dtype)
        except Exception:
            return np.zeros((self.tile_h, self.tile_w, self.spp), self.dtype)

    def _tile(self, tx, ty):
        if len(self._planes) == 1:
            return self._plane_tile(self._planes[0], tx, ty)
        # merged channel planes: one grayscale plane per RGB channel
        return np.concatenate(
            [self._plane_tile(p, tx, ty)[:, :, :1] for p in self._planes],
            axis=-1)

    def read_region(self, x, y, w, h):
        """uint8 (h, w, 3) RGB region; wide sample types are narrowed by
        their high byte (like the .vmu NGR path), floats are clipped."""
        out = np.zeros((h, w, 3), np.uint8)
        x0, y0 = max(0, x), max(0, y)
        x1, y1 = min(self.size[0], x + w), min(self.size[1], y + h)
        if x1 <= x0 or y1 <= y0:
            return out
        for ty in range(y0 // self.tile_h, (y1 - 1) // self.tile_h + 1):
            for tx in range(x0 // self.tile_w, (x1 - 1) // self.tile_w + 1):
                px, py = tx * self.tile_w, ty * self.tile_h
                a_x, b_x = max(x0, px), min(x1, px + self.tile_w)
                a_y, b_y = max(y0, py), min(y1, py + self.tile_h)
                if b_x <= a_x or b_y <= a_y:
                    continue
                t = self._tile(tx, ty)[a_y - py:b_y - py, a_x - px:b_x - px]
                out[a_y - y:b_y - y, a_x - x:b_x - x] = _to_rgb8(t)
        return out

    def close(self):
        pass


def _to_rgb8(t):
    """Narrow any ETS sample type to uint8 RGB."""
    if t.dtype == np.uint8:
        pass
    elif t.dtype == np.uint16:
        t = (t >> 8).astype(np.uint8)
    elif t.dtype in (np.float32, np.float64):
        t = np.clip(t * 255.0, 0, 255).astype(np.uint8)
    else:  # signed/uint32: clip into display range
        t = np.clip(t, 0, 255).astype(np.uint8)
    if t.shape[-1] == 1:
        t = np.repeat(t, 3, -1)
    elif t.shape[-1] == 2:   # two merged channel planes: pad blue with 0
        t = np.concatenate([t, np.zeros_like(t[:, :, :1])], axis=-1)
    return t[:, :, :3]


def find_ets_for_vsi(path):
    """Locate the level-0 pixel store for ``Name.vsi``: the largest ETS
    under ``_Name_/`` (cellSens puts one stack dir per image; the WSI
    stack dwarfs overview/label stacks)."""
    base = os.path.dirname(os.path.abspath(path))
    stem = os.path.splitext(os.path.basename(path))[0]
    cands = sorted(glob.glob(os.path.join(base, f'_{stem}_', '**', '*.ets'),
                             recursive=True))
    if not cands:
        raise ValueError(f'{path}: no ETS pixel stores under _{stem}_/')
    best, best_area = None, -1
    for c in cands:
        try:
            ets = EtsFile(c)
        except ValueError:
            continue
        area = ets.size[0] * ets.size[1]
        if area > best_area:
            best, best_area = ets, area
    if best is None:
        raise ValueError(f'{path}: no readable ETS store')
    return best


class VsiReader:
    """Region reader over a .vsi acquisition or a bare .ets store
    (plugs into utils.wsi; same contract as the other readers)."""

    def __init__(self, path):
        self.path = path
        self._ets = (EtsFile(path) if path.lower().endswith('.ets')
                     else find_ets_for_vsi(path))
        self.size = self._ets.size

    def read_region(self, x, y, w, h):
        return self._ets.read_region(x, y, w, h)

    def get_magnification(self):
        return None  # recorded only in .vsi proprietary metadata blocks

    def read_description(self):
        return None

    def close(self):
        self._ets.close()
