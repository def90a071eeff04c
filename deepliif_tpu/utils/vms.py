"""Hamamatsu VMS (.vms) slide reading.

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

Uncompressed .vmu (NGR payload) is intentionally not handled: the NGR
layout is not publicly documented well enough to implement without
sample files, and Bio-Formats-era datasets ship .vms/.ndpi.
"""

from __future__ import annotations

import os
import re

import numpy as np
from PIL import Image

Image.MAX_IMAGE_PIXELS = None

_SECTION = 'Virtual Microscope Specimen'


def parse_vms(path):
    """Parse the .vms INI into a flat {key: value} dict (level-0 layer).

    Keys for deeper focal layers (``ImageFile(c,r,layer)``) are kept
    verbatim; the caller selects layer 0.
    """
    keys = {}
    section = None
    with open(path, 'r', errors='replace') as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith((';', '#')):
                continue
            if line.startswith('[') and line.endswith(']'):
                section = line[1:-1]
                continue
            if section != _SECTION or '=' not in line:
                continue
            k, v = line.split('=', 1)
            keys[k.strip()] = v.strip()
    if not keys:
        raise ValueError(f'{path}: no [{_SECTION}] section')
    return keys


_IMGKEY = re.compile(r'^ImageFile(?:\((\d+)(?:,(\d+))?\))?$')


class VmsReader:
    """Region reader over a .vms container (plugs into utils.wsi).

    Contract: ``.size`` = (w, h); ``read_region(x, y, w, h)`` -> uint8
    (h, w, 3) RGB; ``close()``; ``get_magnification()``.
    """

    def __init__(self, path):
        self.path = path
        self.keys = parse_vms(path)
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
            with Image.open(self.pieces[key]) as im:
                self._sizes[key] = im.size
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
                piece = self._piece(c, r)
                a_x, b_x = max(x0, px), min(x1, px + piece.shape[1])
                a_y, b_y = max(y0, py), min(y1, py + piece.shape[0])
                if b_x <= a_x or b_y <= a_y:
                    continue
                out[a_y - y:b_y - y, a_x - x:b_x - x] = \
                    piece[a_y - py:b_y - py, a_x - px:b_x - px]
        return out

    def close(self):
        self._cache.clear()
        self._sizes.clear()
