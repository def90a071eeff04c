"""Sakura (.svslide) slide reading.

The reference reads exotic slide containers through Bio-Formats' JVM
bridge (reference util/__init__.py:500-556, 559-691). A Sakura slide is
a single SQLite 3 database; per the openslide project's published format
notes (openslide.org/formats/sakura/):

- the database contains an ``SVSlideDataXPO`` row describing the slide
  (this table's presence is the format's magic),
- tile pixel data lives in a table whose name is recorded in
  ``DataManagerSQLiteHandler.UniqueTableName`` (columns ``id`` TEXT,
  ``data`` BLOB),
- each stored tile is ONE COLOR CHANNEL of an RGB tile, compressed as a
  grayscale JPEG; the three channels share a position and differ only in
  the trailing color index of the id,
- tile ids encode position/level/channel as
  ``<prefix>;<x>|<y>;<downsample>;<color>`` with ``x, y`` in level-0
  pixels (multiples of tile-size x downsample) and color 0/1/2 = R/G/B,
- scan geometry (image size, lens magnification) hangs off
  ``SVHRScanDataXPO`` / ``SVScannedImageDataXPO`` rows.

Because no Sakura sample is available in this environment, this reader
is deliberately defensive about the XPO schema: the authoritative
geometry (levels, grid, tile size) is derived from the tile-id index and
the JPEG payloads themselves, and the XPO tables are only probed — by
case-insensitive column-name match — for the image size and nominal
magnification. A file whose ids follow the documented shape reads
correctly even if its metadata tables differ from the columns probed
here.

Level 0 only (the deepliif pipeline rescales from full resolution;
reference get_wsi_resolution, models/__init__.py:730-782).
"""

from __future__ import annotations

import io
import re
import sqlite3
from collections import OrderedDict

import numpy as np
from PIL import Image

_TILEID = re.compile(r'^(.*);(-?\d+)\|(-?\d+);(\d+);(\d+)$')

_MAGIC = b'SQLite format 3\x00'


def is_svslide(path):
    """True when `path` is an SQLite db carrying the Sakura magic table."""
    try:
        with open(path, 'rb') as f:
            if f.read(16) != _MAGIC:
                return False
        con = sqlite3.connect(f'file:{path}?mode=ro', uri=True)
        try:
            row = con.execute(
                "SELECT name FROM sqlite_master WHERE type='table' "
                "AND name='SVSlideDataXPO'").fetchone()
            return row is not None
        finally:
            con.close()
    except Exception:
        return False


def _q(name):
    """Quote an SQL identifier read from the (untrusted) slide file:
    double embedded quotes so a hostile table/column name cannot break
    out of the quoted context."""
    return '"' + str(name).replace('"', '""') + '"'


def _columns(con, table):
    try:
        return [r[1] for r in con.execute(f'PRAGMA table_info({_q(table)})')]
    except sqlite3.Error:
        return []


def _probe_scalar(con, table, needles):
    """First non-null value of the first column of `table` whose
    lower-cased name contains any needle; None when absent."""
    cols = _columns(con, table)
    for needle in needles:
        for c in cols:
            if needle in c.lower():
                try:
                    row = con.execute(
                        f'SELECT {_q(c)} FROM {_q(table)} '
                        f'WHERE {_q(c)} IS NOT NULL LIMIT 1').fetchone()
                except sqlite3.Error:
                    continue
                if row and row[0] is not None:
                    return row[0]
    return None


class SakuraReader:
    """Region reader over a .svslide SQLite container (level 0).

    Contract: ``.size`` = (w, h); ``read_region(x, y, w, h)`` -> uint8
    (h, w, 3) RGB; ``close()``; ``get_magnification()``.
    """

    def __init__(self, path, cache_tiles=64):
        self.path = path
        with open(path, 'rb') as f:
            if f.read(16) != _MAGIC:
                raise ValueError(f'{path}: not an SQLite database')
        # check_same_thread=False: utils.wsi prefetches regions on a
        # producer thread; reads are serialized per region so a single
        # read-only connection is safe.
        self._con = sqlite3.connect(f'file:{path}?mode=ro', uri=True,
                                    check_same_thread=False)
        if not self._con.execute(
                "SELECT name FROM sqlite_master WHERE type='table' "
                "AND name='SVSlideDataXPO'").fetchone():
            self._con.close()
            raise ValueError(f'{path}: no SVSlideDataXPO table '
                             '(not a Sakura slide)')
        self._data_table = self._find_data_table()
        # index every stored tile id once: {(x, y) -> {color: id}} at the
        # finest downsample present (level 0)
        ds_index = {}
        for (tid,) in self._con.execute(
                f'SELECT id FROM {_q(self._data_table)}'):
            m = _TILEID.match(tid if isinstance(tid, str) else str(tid))
            if not m:
                continue
            x, y = int(m.group(2)), int(m.group(3))
            ds, color = int(m.group(4)), int(m.group(5))
            ds_index.setdefault(ds, {}).setdefault((x, y), {})[color] = tid
        if not ds_index:
            self._con.close()
            raise ValueError(f'{path}: no parseable tile ids in '
                             f'"{self._data_table}"')
        self._ds = min(ds_index)
        self.tiles = ds_index[self._ds]
        # tile pixel size from one decoded channel (constant per slide)
        probe = next(iter(self.tiles.values()))
        ch = self._decode_channel(next(iter(probe.values())))
        self.tile_h, self.tile_w = ch.shape[:2]
        self._cache = OrderedDict()
        self._cache_n = max(1, int(cache_tiles))
        self.size = self._image_size()

    # -- container plumbing --------------------------------------------------

    def _find_data_table(self):
        con = self._con
        name = _probe_scalar(con, 'DataManagerSQLiteHandler',
                             ('uniquetablename', 'tablename'))
        if name:
            cols = [c.lower() for c in _columns(con, str(name))]
            if 'id' in cols and 'data' in cols:
                return str(name)
        # fallback: any non-XPO table shaped like (id, data)
        for (t,) in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"):
            if t.endswith('XPO') or t == 'DataManagerSQLiteHandler':
                continue
            cols = [c.lower() for c in _columns(con, t)]
            if 'id' in cols and 'data' in cols:
                return t
        raise ValueError(f'{self.path}: no tile data table '
                         '(DataManagerSQLiteHandler.UniqueTableName)')

    def _scan_size_rows(self):
        """Candidate (w, h) rows from SVScannedImageDataXPO — preferring
        the rows the HR scan references (openslide joins
        SVHRScanDataXPO.m_scannedImage -> SVScannedImageDataXPO.OID to
        skip overview/label images), falling back to all rows."""
        con = self._con
        tbl = 'SVScannedImageDataXPO'
        cols = _columns(con, tbl)
        wcol = next((c for c in cols if 'imagewidth' in c.lower()), None)
        hcol = next((c for c in cols if 'imageheight' in c.lower()), None)
        if not (wcol and hcol):
            return []
        rows = []
        hr_cols = _columns(con, 'SVHRScanDataXPO')
        ref = next((c for c in hr_cols if 'scannedimage' in c.lower()), None)
        oid = next((c for c in cols if c.lower() == 'oid'), None)
        if ref and oid:
            try:
                rows = con.execute(
                    f'SELECT s.{_q(wcol)}, s.{_q(hcol)} FROM {_q(tbl)} s '
                    f'JOIN "SVHRScanDataXPO" h ON s.{_q(oid)} = h.{_q(ref)} '
                    f'WHERE s.{_q(wcol)} IS NOT NULL '
                    f'AND s.{_q(hcol)} IS NOT NULL').fetchall()
            except sqlite3.Error:
                rows = []
        if not rows:
            try:
                rows = con.execute(
                    f'SELECT {_q(wcol)}, {_q(hcol)} FROM {_q(tbl)} '
                    f'WHERE {_q(wcol)} IS NOT NULL '
                    f'AND {_q(hcol)} IS NOT NULL').fetchall()
            except sqlite3.Error:
                return []
        out = []
        for w, h in rows:
            try:
                w, h = int(w), int(h)
            except (TypeError, ValueError):
                continue
            if w > 0 and h > 0:
                out.append((w, h))
        return out

    def _image_size(self):
        # the id grid bounds the canvas (reader-coordinate units, i.e.
        # finest-stored-level pixels)
        step_x = self.tile_w * self._ds
        step_y = self.tile_h * self._ds
        xs = [p[0] for p in self.tiles]
        ys = [p[1] for p in self.tiles]
        grid_w = (max(xs) + step_x) // self._ds
        grid_h = (max(ys) + step_y) // self._ds
        # metadata sizes are level-0 pixels; when several image rows exist
        # (HR scan + overview/label), take the largest-area HR-referenced
        # one, convert to reader units, and sanity-check against the tile
        # grid — a row describing the wrong image falls outside
        # (grid - tile, grid] and is rejected in favor of the grid bound.
        best = None
        for w0, h0 in self._scan_size_rows():
            w, h = w0 // self._ds, h0 // self._ds
            if (grid_w - self.tile_w < w <= grid_w
                    and grid_h - self.tile_h < h <= grid_h):
                if best is None or w * h > best[0] * best[1]:
                    best = (w, h)
        return best if best else (grid_w, grid_h)

    # -- pixels --------------------------------------------------------------

    def _decode_channel(self, tid):
        row = self._con.execute(
            f'SELECT data FROM {_q(self._data_table)} WHERE id=?',
            (tid,)).fetchone()
        if row is None or row[0] is None:
            raise ValueError(f'{self.path}: missing tile blob {tid!r}')
        arr = np.asarray(Image.open(io.BytesIO(row[0])))
        return arr

    def _tile_pixels(self, pos):
        """Assembled (tile_h, tile_w, 3) RGB tile at grid position `pos`
        (level-0 pixel coords), LRU-cached."""
        got = self._cache.get(pos)
        if got is not None:
            self._cache.move_to_end(pos)
            return got
        chans = self.tiles[pos]
        if set(chans) >= {0, 1, 2}:
            planes = [self._decode_channel(chans[c]) for c in (0, 1, 2)]
            planes = [p[..., 0] if p.ndim == 3 else p for p in planes]
            tile = np.stack(planes, axis=-1)
        else:
            # tolerance for non-split variants: one id per position,
            # decoded as-is (RGB kept, grayscale replicated)
            arr = self._decode_channel(next(iter(chans.values())))
            tile = (np.repeat(arr[..., None], 3, axis=-1)
                    if arr.ndim == 2 else arr[..., :3])
        tile = np.ascontiguousarray(tile, dtype=np.uint8)
        self._cache[pos] = tile
        while len(self._cache) > self._cache_n:
            self._cache.popitem(last=False)
        return tile

    def read_region(self, x, y, w, h):
        """Read (h, w, 3) uint8 at level 0; only tiles intersecting the
        request are decoded, positions with no stored tile stay white
        (scanner background)."""
        out = np.empty((h, w, 3), np.uint8)
        out[:] = 255
        ds = self._ds
        step_x, step_y = self.tile_w * ds, self.tile_h * ds
        gx0 = (x * ds) // step_x * step_x
        gy0 = (y * ds) // step_y * step_y
        for by in range(gy0, (y + h) * ds, step_y):
            for bx in range(gx0, (x + w) * ds, step_x):
                tile = self.tiles.get((bx, by))
                if tile is None:
                    continue
                tx, ty = bx // ds, by // ds  # level-0 pixel position
                ix0, ix1 = max(x, tx), min(x + w, tx + self.tile_w)
                iy0, iy1 = max(y, ty), min(y + h, ty + self.tile_h)
                if ix0 >= ix1 or iy0 >= iy1:
                    continue
                try:
                    pix = self._tile_pixels((bx, by))
                except Exception:
                    # undecodable blob: zero this tile only, keep reading
                    # (the reference salvage contract, util/__init__.py:
                    # 618-691 degrades per-tile, not per-region)
                    out[iy0 - y:iy1 - y, ix0 - x:ix1 - x] = 0
                    continue
                out[iy0 - y:iy1 - y, ix0 - x:ix1 - x] = \
                    pix[iy0 - ty:iy1 - ty, ix0 - tx:ix1 - tx]
        return out

    # -- metadata -------------------------------------------------------------

    def read_description(self):
        return None

    def get_magnification(self):
        """Nominal lens magnification from SVHRScanDataXPO (the field
        Bio-Formats surfaces for this format; reference
        get_wsi_resolution, models/__init__.py:730-782)."""
        v = _probe_scalar(self._con, 'SVHRScanDataXPO',
                          ('lensmagnification', 'magnification'))
        try:
            return float(v) if v is not None else None
        except (TypeError, ValueError):
            return None

    def close(self):
        self._con.close()
