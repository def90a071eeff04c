"""3DHISTECH MIRAX (.mrxs) slide reading.

The reference reads .mrxs slides through Bio-Formats' in-process JVM
bridge (reference util/__init__.py:500-556, 559-691).  A MIRAX slide is a
multi-file container: ``Name.mrxs`` is a thumbnail, and the real payload
lives in a sibling ``Name/`` directory::

    Name.mrxs
    Name/
      Slidedat.ini        key/value description of the whole container
      Index.dat           record index: which data file/offset holds what
      Data0000.dat ...    concatenated tile images + binary buffers

This module implements that container layout directly — as documented by
the openslide project's MIRAX format notes — so TPU WSI inference can
stream bounded regions without a JVM:

  * ``Slidedat.ini``: camera grid (``IMAGENUMBER_X/Y``), per-camera
    subdivision (``CameraImageDivisionsPerSide``), zoom-level sections
    (tile size, overlap, image format, fill color), data-file list and
    the hierarchical/nonhierarchical record layout of the index;
  * ``Index.dat``: version + slide-id header, then two root tables of
    int32 pointers (hierarchical records = zoom-level tiles,
    nonhierarchical records = position buffers and friends) into linked
    data pages of ``(image_number, offset, length, fileno)`` entries;
  * camera positions: the zlib-compressed ``VIMSLIDE_POSITION_BUFFER``
    (one ``flag:u8, x:i32, y:i32`` record per camera) when present,
    otherwise the overlap-derived regular grid;
  * tiles: JPEG / PNG / BMP24 via PIL, pasted at their camera position
    (cameras overlap; subtiles within a camera are contiguous).  Region
    reads decode only intersecting tiles, so memory stays bounded by the
    region size like the TIFF fast path.  Missing tiles render as the
    slide's ``IMAGE_FILL_COLOR_BGR``.

Only the full-resolution level (``ZoomLevel_0``) is exposed: WSI
inference streams level-0 regions (utils/wsi.py) and builds its own
output pyramid.  Validated against synthetic containers written by
tests/mirax_fixture.py; real-scanner slides with format revisions not
covered by the published notes may still need conversion.
"""

from __future__ import annotations

import io
import os
import struct
import zlib

import numpy as np

_I32 = struct.Struct('<i')


def _read_i32(fh):
    return _I32.unpack(fh.read(4))[0]


def parse_slidedat(path):
    """Parse Slidedat.ini into {section: {key: value}} (string values).

    MIRAX writes a plain INI, usually with a UTF-8 BOM; keys are
    case-sensitive and values are unquoted."""
    sections = {}
    current = None
    with open(path, 'r', encoding='utf-8-sig', errors='replace') as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith((';', '#')):
                continue
            if line.startswith('[') and line.endswith(']'):
                current = line[1:-1]
                sections[current] = {}
            elif '=' in line and current is not None:
                key, _, val = line.partition('=')
                sections[current][key.strip()] = val.strip()
    return sections


class _Tile:
    """One level-0 stored image: grid slot + where its bytes live."""

    __slots__ = ('gx', 'gy', 'fileno', 'offset', 'length')

    def __init__(self, gx, gy, fileno, offset, length):
        self.gx = gx
        self.gy = gy
        self.fileno = fileno
        self.offset = offset
        self.length = length


class MiraxReader:
    """Random-access region reader over a MIRAX container (level 0)."""

    def __init__(self, path):
        self.path = path
        stem = path[:-5] if path.lower().endswith('.mrxs') else path
        self.dirname = stem
        ini_path = os.path.join(stem, 'Slidedat.ini')
        if not os.path.isfile(ini_path):
            raise ValueError(
                f'MIRAX container directory missing: {stem!r} — a .mrxs '
                'slide is a multi-file set; copy the whole directory, not '
                'just the .mrxs thumbnail')
        self.ini = parse_slidedat(ini_path)
        gen = self.ini.get('GENERAL', {})
        hier = self.ini.get('HIERARCHICAL', {})
        datafile = self.ini.get('DATAFILE', {})

        self.cameras_x = int(gen['IMAGENUMBER_X'])
        self.cameras_y = int(gen['IMAGENUMBER_Y'])
        self.divisions = int(gen.get('CameraImageDivisionsPerSide', '1'))
        self.slide_id = gen.get('SLIDE_ID', '')
        self._mag = gen.get('OBJECTIVE_MAGNIFICATION')

        self.data_files = [
            os.path.join(stem, datafile[f'FILE_{i}'])
            for i in range(int(datafile.get('FILE_COUNT', '0')))]
        self._fhs = {}

        # locate ZoomLevel_0 among the hierarchical records and its
        # per-level section (tile geometry + codec)
        level_slot, section = self._find_level0(hier)
        sec = self.ini.get(section, {})
        self.tile_w = int(sec['DIGITIZER_WIDTH'])
        self.tile_h = int(sec['DIGITIZER_HEIGHT'])
        self.overlap_x = float(sec.get('OVERLAP_X', '0'))
        self.overlap_y = float(sec.get('OVERLAP_Y', '0'))
        self.image_format = sec.get('IMAGE_FORMAT', 'JPEG').upper()
        fill = int(sec.get('IMAGE_FILL_COLOR_BGR', '0'))
        self.fill_rgb = (fill & 0xFF, (fill >> 8) & 0xFF, (fill >> 16) & 0xFF)

        index_path = os.path.join(stem, hier.get('INDEXFILE', 'Index.dat'))
        with open(index_path, 'rb') as fh:
            self._parse_index(fh, hier, level_slot)

        self._positions = self._camera_positions(hier)
        self._compute_bounds()

    # -- container parsing --------------------------------------------------

    @staticmethod
    def _find_level0(hier):
        """Return (flat slot index, ini section name) of ZoomLevel_0.

        The index file's hierarchical root table has one pointer per
        (hierarchy, value) pair, flattened in declaration order."""
        slot = 0
        for i in range(int(hier.get('HIER_COUNT', '0'))):
            count = int(hier.get(f'HIER_{i}_COUNT', '0'))
            for j in range(count):
                if hier.get(f'HIER_{i}_VAL_{j}', '') == 'ZoomLevel_0':
                    section = hier.get(f'HIER_{i}_VAL_{j}_SECTION')
                    if not section:
                        raise ValueError(
                            'Slidedat.ini: ZoomLevel_0 has no SECTION key')
                    return slot + j, section
            slot += count
        raise ValueError('MIRAX index has no ZoomLevel_0 hierarchy value')

    def _parse_index(self, fh, hier, level_slot):
        version = fh.read(5).decode('ascii', errors='replace')
        if not version.replace('.', '').isdigit():
            raise ValueError(f'not a MIRAX index file (version {version!r})')
        slide_id = fh.read(len(self.slide_id)).decode('ascii',
                                                      errors='replace')
        if self.slide_id and slide_id != self.slide_id:
            raise ValueError('Index.dat slide id does not match Slidedat.ini')
        hier_root = _read_i32(fh)
        self._nonhier_root = _read_i32(fh)
        fh.seek(hier_root + 4 * level_slot)
        page_ptr = _read_i32(fh)
        self.tiles = {}
        grid_w = self.cameras_x * self.divisions
        for image_number, offset, length, fileno in self._walk_pages(
                fh, page_ptr):
            gx, gy = image_number % grid_w, image_number // grid_w
            self.tiles[(gx, gy)] = _Tile(gx, gy, fileno, offset, length)
        if not self.tiles:
            raise ValueError('MIRAX slide has no level-0 tiles')

    @staticmethod
    def _walk_pages(fh, page_ptr):
        """Yield (a, b, c, d) int32 entries across a linked page chain.
        Each data page is ``count:i32, next:i32`` followed by ``count``
        4-int32 entries; next == 0 terminates."""
        while page_ptr:
            fh.seek(page_ptr)
            count = _read_i32(fh)
            page_ptr = _read_i32(fh)
            buf = fh.read(16 * count)
            for k in range(count):
                yield struct.unpack_from('<4i', buf, 16 * k)

    def _nonhier_record(self, fh, hier, name, value):
        """(offset, length, fileno) of one nonhierarchical record, or None.
        Nonhier slots follow the hierarchical ones' flattening rule in
        their own root table."""
        slot = 0
        found = None
        for i in range(int(hier.get('NONHIER_COUNT', '0'))):
            count = int(hier.get(f'NONHIER_{i}_COUNT', '0'))
            if hier.get(f'NONHIER_{i}_NAME', '') == name:
                for j in range(count):
                    if hier.get(f'NONHIER_{i}_VAL_{j}', '') == value:
                        found = slot + j
                        break
            if found is not None:
                break
            slot += count
        if found is None:
            return None
        fh.seek(self._nonhier_root + 4 * found)
        page_ptr = _read_i32(fh)
        for _pad, offset, length, fileno in self._walk_pages(fh, page_ptr):
            return offset, length, fileno
        return None

    def _camera_positions(self, hier):
        """Per-camera level-0 pixel positions.

        Preferred: the VIMSLIDE_POSITION_BUFFER nonhier record — one
        ``flag:u8, x:i32, y:i32`` little-endian record per camera in
        row-major camera order, zlib-compressed (raw accepted).  Fallback:
        the regular grid implied by the camera overlap (adjacent cameras
        overlap by OVERLAP_X/Y level-0 pixels; a camera spans
        divisions*tile_w by divisions*tile_h)."""
        rec = None
        index_path = os.path.join(self.dirname,
                                  hier.get('INDEXFILE', 'Index.dat'))
        with open(index_path, 'rb') as fh:
            rec = self._nonhier_record(fh, hier,
                                       'VIMSLIDE_POSITION_BUFFER', 'default')
        n = self.cameras_x * self.cameras_y
        if rec is not None:
            offset, length, fileno = rec
            raw = self._read_blob(fileno, offset, length)
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                pass
            if len(raw) >= 9 * n:
                pos = {}
                for c in range(n):
                    flag, x, y = struct.unpack_from('<Bii', raw, 9 * c)
                    if flag:
                        pos[(c % self.cameras_x, c // self.cameras_x)] = (x, y)
                if pos:
                    return pos
        cam_w = self.divisions * self.tile_w
        cam_h = self.divisions * self.tile_h
        sx = cam_w - int(round(self.overlap_x))
        sy = cam_h - int(round(self.overlap_y))
        return {(cx, cy): (cx * sx, cy * sy)
                for cy in range(self.cameras_y)
                for cx in range(self.cameras_x)}

    def _compute_bounds(self):
        xs, ys = [], []
        for (gx, gy) in self.tiles:
            p = self._tile_pos(gx, gy)
            if p is None:
                continue
            xs.append(p[0])
            ys.append(p[1])
        if not xs:
            raise ValueError('no positioned level-0 tiles in MIRAX slide')
        self.origin_x = min(xs)
        self.origin_y = min(ys)
        self.size = (max(xs) - self.origin_x + self.tile_w,
                     max(ys) - self.origin_y + self.tile_h)

    def _tile_pos(self, gx, gy):
        """Absolute level-0 position of grid tile (gx, gy): its camera's
        position plus the contiguous subtile offset within the camera."""
        cam = self._positions.get((gx // self.divisions,
                                   gy // self.divisions))
        if cam is None:
            return None
        return (cam[0] + (gx % self.divisions) * self.tile_w,
                cam[1] + (gy % self.divisions) * self.tile_h)

    # -- pixel access -------------------------------------------------------

    def _read_blob(self, fileno, offset, length):
        fh = self._fhs.get(fileno)
        if fh is None:
            fh = self._fhs[fileno] = open(self.data_files[fileno], 'rb')
        fh.seek(offset)
        return fh.read(length)

    def _tile_pixels(self, tile):
        from PIL import Image
        data = self._read_blob(tile.fileno, tile.offset, tile.length)
        img = Image.open(io.BytesIO(data)).convert('RGB')
        out = np.asarray(img)
        if out.shape[:2] != (self.tile_h, self.tile_w):
            full = np.empty((self.tile_h, self.tile_w, 3), np.uint8)
            full[:] = self.fill_rgb
            full[:out.shape[0], :out.shape[1]] = \
                out[:self.tile_h, :self.tile_w]
            return full
        return out

    def read_region(self, x, y, w, h):
        """Read (h, w, 3) uint8 at origin-normalized (x, y); only tiles
        intersecting the request are decoded, unpainted area keeps the
        slide's fill color."""
        ax, ay = x + self.origin_x, y + self.origin_y
        out = np.empty((h, w, 3), np.uint8)
        out[:] = self.fill_rgb
        for (gx, gy), tile in self.tiles.items():
            p = self._tile_pos(gx, gy)
            if p is None:
                continue
            bx, by = p
            ix0, ix1 = max(ax, bx), min(ax + w, bx + self.tile_w)
            iy0, iy1 = max(ay, by), min(ay + h, by + self.tile_h)
            if ix0 >= ix1 or iy0 >= iy1:
                continue
            pix = self._tile_pixels(tile)
            out[iy0 - ay:iy1 - ay, ix0 - ax:ix1 - ax] = \
                pix[iy0 - by:iy1 - by, ix0 - bx:ix1 - bx]
        return out

    # -- metadata -----------------------------------------------------------

    def read_description(self):
        return None

    def get_magnification(self):
        """Objective magnification from GENERAL.OBJECTIVE_MAGNIFICATION
        (the field Bio-Formats surfaces as nominal magnification for this
        format; reference get_wsi_resolution, models/__init__.py:730-782)."""
        try:
            return float(self._mag) if self._mag is not None else None
        except ValueError:
            return None

    def get_information(self):
        w, h = self.size
        return {'size_x': w, 'size_y': h, 'pixel_type': 'uint8',
                'magnification': self.get_magnification()}

    def close(self):
        for fh in self._fhs.values():
            fh.close()
        self._fhs.clear()
