"""Hamamatsu VMS (.vms) and VMU (.vmu) slide reading.

The reference reads legacy Hamamatsu slides through Bio-Formats' JVM
bridge (reference util/__init__.py:500-556, 559-691). A VMS slide is a
multi-file container: ``Name.vms`` is an INI-style index and the pixel
payload is a grid of plain JPEG files::

    Name.vms                [Virtual Microscope Specimen]
    Name(0,0).jpg ...       level-0 pieces, NoJpegColumns x NoJpegRows
    Name_map.jpg            low-resolution map
    Name_macro.jpg          macro photo
    Name.opt                restart-marker offsets (random JPEG access)

INI keys (as documented by the openslide project's Hamamatsu notes):
``NoLayers``/``NoJpegColumns``/``NoJpegRows`` describe the piece grid;
the level-0 piece at column c, row r is ``ImageFile`` for (0, 0),
``ImageFile(c)`` for (c, 0), and ``ImageFile(c,r)`` otherwise;
``MapFile``/``MacroImage``/``OptimisationFile`` name the aux files;
``SourceLens`` is the objective magnification (same key as .ndpi).

All pieces share one size except the last column/row (remainders). This
reader decodes whole pieces lazily with a small LRU instead of using the
optimisation file's restart-marker table for sub-piece access — bounded
and correct, but a region read touching a multi-gigapixel piece decodes
that full piece once (the LRU then serves neighbouring regions). The
newer .ndpi format has a true tiled fast path in utils.tiff.

The sibling uncompressed container, ``.vmu``, uses the same INI scheme
(section ``[Uncompressed Virtual Microscope Specimen]``) but its pieces
are NGR files instead of JPEGs: a small binary header (``GN`` magic;
width, height, column width and pixel-data offset as little-endian
int32 at byte offsets 4, 8, 12 and 24) followed by 16-bit little-endian
RGB samples arranged in column blocks — the image is split into
column-width-wide vertical strips stored one after another, each strip
row-major. ``VmuReader`` below maps that layout directly; samples are
narrowed to uint8 by taking the high byte.
"""

from __future__ import annotations

import os
import re
import struct

import numpy as np
from PIL import Image

Image.MAX_IMAGE_PIXELS = None

_SECTION = 'Virtual Microscope Specimen'
_SECTION_VMU = 'Uncompressed Virtual Microscope Specimen'


def parse_vms(path, section=_SECTION):
    """Parse the .vms/.vmu INI into a flat {key: value} dict.

    Keys for deeper focal layers (``ImageFile(c,r,layer)``) are kept
    verbatim; the caller selects layer 0.
    """
    keys = {}
    cur = None
    with open(path, 'r', errors='replace') as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith((';', '#')):
                continue
            if line.startswith('[') and line.endswith(']'):
                cur = line[1:-1]
                continue
            if cur != section or '=' not in line:
                continue
            k, v = line.split('=', 1)
            keys[k.strip()] = v.strip()
    if not keys:
        raise ValueError(f'{path}: no [{section}] section')
    return keys


_IMGKEY = re.compile(r'^ImageFile(?:\((\d+)(?:,(\d+))?\))?$')


class VmsReader:
    """Region reader over a .vms container (plugs into utils.wsi).

    Contract: ``.size`` = (w, h); ``read_region(x, y, w, h)`` -> uint8
    (h, w, 3) RGB; ``close()``; ``get_magnification()``.
    """

    _SECTION_NAME = _SECTION

    def __init__(self, path):
        self.path = path
        self.keys = parse_vms(path, self._SECTION_NAME)
        if int(self.keys.get('NoLayers', '1')) < 1:
            raise ValueError(f'{path}: NoLayers < 1')
        base = os.path.dirname(os.path.abspath(path))
        self.cols = int(self.keys.get('NoJpegColumns', '1'))
        self.rows = int(self.keys.get('NoJpegRows', '1'))
        self.pieces = {}  # (col, row) -> file path
        for k, v in self.keys.items():
            m = _IMGKEY.match(k)
            if not m:
                continue
            c = int(m.group(1)) if m.group(1) is not None else 0
            r = int(m.group(2)) if m.group(2) is not None else 0
            self.pieces[(c, r)] = os.path.join(base, v)
        missing = [(c, r) for r in range(self.rows) for c in range(self.cols)
                   if (c, r) not in self.pieces]
        if missing:
            raise ValueError(f'{path}: missing piece files {missing}')
        # piece geometry: all pieces share (0,0)'s size except the last
        # column/row; totals come from the edge pieces
        self._sizes = {}
        pw, ph = self._piece_size(0, 0)
        lw = self._piece_size(self.cols - 1, 0)[0] if self.cols > 1 else pw
        lh = self._piece_size(0, self.rows - 1)[1] if self.rows > 1 else ph
        self.piece_w, self.piece_h = pw, ph
        self.size = (pw * (self.cols - 1) + lw, ph * (self.rows - 1) + lh)
        self._cache = {}  # (col, row) -> ndarray, tiny LRU

    def _piece_size(self, c, r):
        key = (c, r)
        if key not in self._sizes:
            try:
                with Image.open(self.pieces[key]) as im:
                    self._sizes[key] = im.size
            except Exception:
                # unreadable piece: assume the anchor's size so the grid
                # stays navigable; _piece_window then renders it as zeros
                # (per-piece salvage). The anchor itself must open.
                if key == (0, 0):
                    raise
                self._sizes[key] = self._piece_size(0, 0)
        return self._sizes[key]

    def _piece(self, c, r):
        """Decode piece (c, r); an unreadable/missing piece file renders
        as zeros (per-piece salvage, finer than WSIReader's 1024px
        fallback — mirrors the reference's tile-by-tile salvage,
        reference util/__init__.py:618-691)."""
        key = (c, r)
        hit = self._cache.pop(key, None)
        if hit is None:
            try:
                with Image.open(self.pieces[key]) as im:
                    hit = np.asarray(im.convert('RGB'))
            except Exception:
                pw, ph = self._piece_size(0, 0)
                hit = np.zeros((ph, pw, 3), np.uint8)
        self._cache[key] = hit
        while len(self._cache) > 2:
            self._cache.pop(next(iter(self._cache)))
        return hit

    def get_magnification(self):
        try:
            return float(self.keys['SourceLens'])
        except (KeyError, ValueError):
            return None

    def read_description(self):
        return None

    def _piece_window(self, c, r, ax, ay, bx, by):
        """Pixels [ay:by, ax:bx] of piece (c, r) in piece-local coords."""
        return self._piece(c, r)[ay:by, ax:bx]

    def read_region(self, x, y, w, h):
        out = np.zeros((h, w, 3), np.uint8)
        x0, y0 = max(0, x), max(0, y)
        x1, y1 = min(self.size[0], x + w), min(self.size[1], y + h)
        if x1 <= x0 or y1 <= y0:
            return out
        c0, c1 = x0 // self.piece_w, (x1 - 1) // self.piece_w
        r0, r1 = y0 // self.piece_h, (y1 - 1) // self.piece_h
        for r in range(r0, min(r1, self.rows - 1) + 1):
            for c in range(c0, min(c1, self.cols - 1) + 1):
                px, py = c * self.piece_w, r * self.piece_h
                pw, ph = self._piece_size(c, r)
                a_x, b_x = max(x0, px), min(x1, px + pw)
                a_y, b_y = max(y0, py), min(y1, py + ph)
                if b_x <= a_x or b_y <= a_y:
                    continue
                out[a_y - y:b_y - y, a_x - x:b_x - x] = self._piece_window(
                    c, r, a_x - px, a_y - py, b_x - px, b_y - py)
        return out

    def close(self):
        self._cache.clear()
        self._sizes.clear()


class NgrPiece:
    """One NGR payload file (the .vmu pixel format).

    Header: ``GN`` magic; little-endian int32 width, height and column
    width at byte offsets 4/8/12; little-endian int32 pixel-data offset
    at byte 24. Pixels are 16-bit little-endian RGB triplets laid out in
    column blocks: vertical strips ``column_width`` pixels wide, stored
    strip after strip, each strip row-major. Random access to any window
    therefore needs only ``rows x column_width`` bytes per intersecting
    strip — no whole-file read.
    """

    _HDR = 28

    def __init__(self, path):
        self.path = path
        with open(path, 'rb') as f:
            head = f.read(self._HDR)
        if len(head) < self._HDR or head[:2] != b'GN':
            raise ValueError(f'{path}: not an NGR file')
        self.w, self.h, self.column_width = struct.unpack_from(
            '<iii', head, 4)
        (self.data_offset,) = struct.unpack_from('<i', head, 24)
        if (self.w <= 0 or self.h <= 0 or self.column_width <= 0
                or self.w % self.column_width
                or self.data_offset < self._HDR):
            raise ValueError(
                f'{path}: bad NGR geometry {self.w}x{self.h} '
                f'cw={self.column_width} off={self.data_offset}')

    @property
    def size(self):
        return (self.w, self.h)

    def read_window(self, x0, y0, x1, y1):
        """uint8 (y1-y0, x1-x0, 3) RGB for in-bounds window [x0:x1, y0:y1)."""
        cw = self.column_width
        out = np.zeros((y1 - y0, x1 - x0, 3), np.uint16)
        nrows = y1 - y0
        with open(self.path, 'rb') as f:
            for cb in range(x0 // cw, (x1 - 1) // cw + 1):
                ax, bx = max(x0, cb * cw), min(x1, (cb + 1) * cw)
                f.seek(self.data_offset + (cb * self.h + y0) * cw * 6)
                buf = f.read(nrows * cw * 6)
                vals = np.frombuffer(buf, '<u2', count=len(buf) // 2)
                strip = np.zeros(nrows * cw * 3, np.uint16)  # short read
                strip[:vals.size] = vals[:strip.size]        # -> zero tail
                strip = strip.reshape(nrows, cw, 3)
                out[:, ax - x0:bx - x0] = strip[:, ax - cb * cw:bx - cb * cw]
        return (out >> 8).astype(np.uint8)


class VmuReader(VmsReader):
    """Region reader over a .vmu container (uncompressed NGR pieces).

    Same INI grid scheme as .vms but under the
    ``[Uncompressed Virtual Microscope Specimen]`` section, with NGR
    files as pieces. Unlike the JPEG pieces of .vms (decoded whole,
    LRU-cached), NGR's column-block layout supports true windowed reads,
    so region access is bounded-memory even for multi-gigapixel pieces.
    The reference reaches this format only through Bio-Formats' JVM
    bridge (reference util/__init__.py:559-691); per-piece salvage
    renders unreadable pieces as zeros like the reference's tile loop
    (util/__init__.py:618-691).
    """

    _SECTION_NAME = _SECTION_VMU

    def __init__(self, path):
        self._ngrs = {}
        super().__init__(path)

    def _ngr(self, c, r):
        key = (c, r)
        if key not in self._ngrs:
            self._ngrs[key] = NgrPiece(self.pieces[key])
        return self._ngrs[key]

    def _piece_size(self, c, r):
        key = (c, r)
        if key not in self._sizes:
            try:
                self._sizes[key] = self._ngr(c, r).size
            except Exception:
                if key == (0, 0):
                    raise
                self._sizes[key] = self._piece_size(0, 0)
        return self._sizes[key]

    def _piece_window(self, c, r, ax, ay, bx, by):
        try:
            return self._ngr(c, r).read_window(ax, ay, bx, by)
        except Exception:
            return np.zeros((by - ay, bx - ax, 3), np.uint8)

    def close(self):
        super().close()
        self._ngrs.clear()
