"""Minimal DICOM WSI (VL Whole Slide Microscopy) reader.

The reference reads DICOM slides through Bio-Formats' JVM
(/root/reference/deepliif/util/__init__.py:559-617, reader class covers
DICOM WSI among its 150+ formats); here the container is parsed natively:

- File Meta (group 0002, explicit VR LE) -> transfer syntax.
- Data set in Explicit VR Little Endian, including nested sequences
  (defined and undefined lengths), walked once into a flat tag list.
- Pixel Data: native interleaved 8-bit frames, or encapsulated fragments
  (JPEG baseline 1.2.840.10008.1.2.4.50/.51, JPEG 2000 .90/.91 — decoded
  by PIL) with the standard one-fragment-per-frame layout.
- TILED_FULL dimension organization: frame k covers tile
  (row = k // tiles_across, col = k % tiles_across) of the total pixel
  matrix; per-frame positions (TILED_SPARSE) are read from the Per-Frame
  Functional Groups when present.
- Objective magnification from Objective Lens Power (0048,0112) inside
  the Optical Path Sequence.

One .dcm instance is one pyramid level (DICOM WSI stores levels as
separate instances), which matches the engine's level-0 streaming reads.
"""

from __future__ import annotations

import io
import struct

import numpy as np

_EXPLICIT_LE = '1.2.840.10008.1.2.1'
_IMPLICIT_LE = '1.2.840.10008.1.2'
_ENCAPSULATED = {
    '1.2.840.10008.1.2.4.50': 'JPEG',      # baseline
    '1.2.840.10008.1.2.4.51': 'JPEG',      # extended
    '1.2.840.10008.1.2.4.90': 'JPEG2000',  # lossless
    '1.2.840.10008.1.2.4.91': 'JPEG2000',
}
_LONG_VRS = {b'OB', b'OW', b'OF', b'OL', b'OD', b'OV', b'SQ', b'UC',
             b'UR', b'UT', b'UN'}

TAG_ROWS = (0x0028, 0x0010)
TAG_COLS = (0x0028, 0x0011)
TAG_FRAMES = (0x0028, 0x0008)
TAG_SPP = (0x0028, 0x0002)
TAG_MATRIX_COLS = (0x0048, 0x0006)
TAG_MATRIX_ROWS = (0x0048, 0x0007)
TAG_OBJECTIVE = (0x0048, 0x0112)
TAG_DIM_ORG = (0x0020, 0x9311)
TAG_PIXEL_DATA = (0x7FE0, 0x0010)
TAG_TS = (0x0002, 0x0010)
TAG_META_LEN = (0x0002, 0x0000)
TAG_COL_POS = (0x0048, 0x021E)   # Column Position In Total Image Pixel Matrix
TAG_ROW_POS = (0x0048, 0x021F)   # Row Position In Total Image Pixel Matrix


def _looks_like_sq(buf, pos, length):
    """Implicit-VR SQ heuristic: a non-empty sequence value begins with an
    (FFFE,E000) item tag whose declared length fits inside the element
    (the standard dictionary-free disambiguation; the fit check keeps
    binary values that merely start with FE FF 00 E0 from misparsing)."""
    if length < 8 or pos + 8 > len(buf):
        return False
    group, elem = struct.unpack_from('<HH', buf, pos)
    if (group, elem) != (0xFFFE, 0xE000):
        return False
    item_len = struct.unpack_from('<I', buf, pos + 4)[0]
    return item_len == 0xFFFFFFFF or (length == 0xFFFFFFFF
                                      or 8 + item_len <= length)


def _parse_elements(buf, pos, end, out, explicit=True):
    """Parse data elements in [pos, end) into ``out`` as (tag,
    vr, value_bytes) leaves, descending into sequences. Stops at ``end`` or at
    an (FFFE,E00D) item delimiter (consumed — the caller is an
    undefined-length item). Returns (next_pos, px|None) where px is the
    pixel data's (value_offset, declared_length) — length 0xFFFFFFFF for
    encapsulated data, whose fragments the caller parses.

    ``explicit`` False parses Implicit VR Little Endian: no VR in the
    stream (leaves carry b'??'; consumers fall back to a per-tag VR
    table), 4-byte lengths, sequences recognized by _looks_like_sq."""
    while pos + 8 <= end:
        group, elem = struct.unpack_from('<HH', buf, pos)
        tag = (group, elem)
        if tag == (0xFFFE, 0xE00D):
            return pos + 8, None
        pos += 4
        if explicit:
            vr = buf[pos:pos + 2]
            pos += 2
            if vr in _LONG_VRS:
                pos += 2
                length = struct.unpack_from('<I', buf, pos)[0]
                pos += 4
            else:
                length = struct.unpack_from('<H', buf, pos)[0]
                pos += 2
        else:
            vr = b'??'
            length = struct.unpack_from('<I', buf, pos)[0]
            pos += 4
        if tag == TAG_PIXEL_DATA:
            # value offset for native (defined length) or encapsulated
            # (undefined, fragments follow); pixel data is the last
            # element of a valid instance, so parsing stops here — this
            # also keeps the whole-slide value out of the leaf list (the
            # mmap stays unmaterialized) and exempts it from the
            # implicit-VR sequence heuristic below
            return pos, (pos, length)
        is_sq = (vr == b'SQ' or (vr == b'UN' and length == 0xFFFFFFFF)
                 or (not explicit and tag not in _TAG_VRS
                     and (length == 0xFFFFFFFF
                          or _looks_like_sq(buf, pos, length))))
        if is_sq:
            sq_end = end if length == 0xFFFFFFFF else pos + length
            pos = _parse_sq_items(buf, pos, sq_end, out,
                                  undefined=length == 0xFFFFFFFF,
                                  explicit=explicit)
        else:
            if length == 0xFFFFFFFF:
                raise ValueError(f'undefined length on non-SQ tag {tag}')
            out.append((tag, vr, buf[pos:pos + length]))
            pos += length
    return pos, None


def _parse_sq_items(buf, pos, end, out, undefined, explicit=True):
    """Sequence value: (FFFE,E000) items until ``end`` (defined-length
    SQ) or an (FFFE,E0DD) delimiter (undefined). Returns next_pos."""
    while pos + 8 <= end:
        group, elem = struct.unpack_from('<HH', buf, pos)
        length = struct.unpack_from('<I', buf, pos + 4)[0]
        pos += 8
        if (group, elem) == (0xFFFE, 0xE0DD):
            return pos
        if (group, elem) != (0xFFFE, 0xE000):
            raise ValueError(f'malformed sequence at {pos - 8}')
        if length == 0xFFFFFFFF:
            pos, _ = _parse_elements(buf, pos, end, out,
                                     explicit=explicit)  # stops at E00D
        else:
            _parse_elements(buf, pos, pos + length, out, explicit=explicit)
            pos += length
    if undefined:
        raise ValueError('unterminated undefined-length sequence')
    return pos


# VRs of the tags this reader consumes — implicit-VR streams carry no VR,
# so decoding falls back to this table
_TAG_VRS = {
    TAG_ROWS: b'US', TAG_COLS: b'US', TAG_SPP: b'US',
    TAG_FRAMES: b'IS', TAG_MATRIX_COLS: b'UL', TAG_MATRIX_ROWS: b'UL',
    TAG_COL_POS: b'SL', TAG_ROW_POS: b'SL', TAG_OBJECTIVE: b'DS',
    (0x0028, 0x0100): b'US',    # BitsAllocated
    (0x0028, 0x0006): b'US',    # PlanarConfiguration
    (0x0028, 0x0004): b'CS',    # PhotometricInterpretation
}


def _decode_int(vr, v, default=None, tag=None):
    """Integer from a (vr, value_bytes) leaf: binary VRs by format,
    string VRs (IS etc.) by ascii; implicit-VR leaves (b'??') resolve
    through the per-tag table."""
    if vr == b'??':
        vr = _TAG_VRS.get(tag, b'??')
    fmt = {b'US': '<H', b'UL': '<I', b'SL': '<i', b'SS': '<h'}.get(vr)
    if fmt:
        return struct.unpack(fmt, v)[0]
    s = v.decode('ascii', errors='replace').strip('\x00 ')
    return int(s) if s else default


def _parse_fragments(buf, pos):
    """Encapsulated pixel data: Basic Offset Table item, then fragments."""
    frags = []
    first = True
    while pos + 8 <= len(buf):
        group, elem = struct.unpack_from('<HH', buf, pos)
        length = struct.unpack_from('<I', buf, pos + 4)[0]
        pos += 8
        if group == 0xFFFE and elem == 0xE0DD:
            break
        if group != 0xFFFE or elem != 0xE000:
            raise ValueError('malformed encapsulated pixel data')
        if first:
            first = False   # Basic Offset Table (possibly empty) — skip
        else:
            frags.append((pos, length))
        pos += length
    return frags


class DicomWsiReader:
    """Random-access region reader over one DICOM WSI instance."""

    def __init__(self, path):
        import mmap
        self.path = path
        self._fh = open(path, 'rb')
        # mmap, not read(): parsing touches only headers, and frames are
        # decoded O(region) on demand — a multi-GB level-0 instance never
        # materializes in RAM (the streaming contract of utils/wsi.py)
        buf = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_READ)
        self._buf = buf
        if buf[128:132] != b'DICM':
            buf.close()
            self._fh.close()
            raise ValueError(f'not a DICOM part-10 file: {path}')

        # file meta (always explicit VR LE); (0002,0000) meta group length
        meta = []
        pos = 132
        _parse_elements(buf, pos, pos + 12, meta)
        meta_len = struct.unpack(
            '<I', {t: v for t, _, v in meta}[TAG_META_LEN])[0]
        hdr_end = pos + 12 + meta_len
        meta2 = []
        _parse_elements(buf, pos + 12, hdr_end, meta2)
        ts = {t: v for t, _, v in meta2}[TAG_TS] \
            .decode('ascii').rstrip('\x00 ')
        if ts not in (_EXPLICIT_LE, _IMPLICIT_LE) \
                and ts not in _ENCAPSULATED:
            raise ValueError(f'unsupported DICOM transfer syntax {ts} '
                             f'(convert to Explicit VR Little Endian)')
        self.codec = _ENCAPSULATED.get(ts)

        leaves = []
        _, px_off = _parse_elements(buf, hdr_end, len(buf), leaves,
                                    explicit=ts != _IMPLICIT_LE)
        tags = {}
        for tag, vr, val in leaves:
            tags.setdefault(tag, (vr, val))   # first occurrence wins
        self._tags = tags
        self._positions = self._frame_positions(leaves)

        def _int(tag, default=None):
            if tag not in tags:
                return default
            return _decode_int(*tags[tag], default=default, tag=tag)

        self.tile_h = _int(TAG_ROWS)
        self.tile_w = _int(TAG_COLS)
        self.spp = _int(TAG_SPP, 3)
        self.n_frames = _int(TAG_FRAMES, 1)
        mw = _int(TAG_MATRIX_COLS)
        mh = _int(TAG_MATRIX_ROWS)
        if mw is None or mh is None:    # plain single-frame instance
            mw, mh = self.tile_w, self.tile_h
        self.size = (mw, mh)
        self.tiles_across = (mw + self.tile_w - 1) // self.tile_w
        if self._positions is not None \
                and len(self._positions) != self.n_frames:
            raise ValueError(
                f'{len(self._positions)} per-frame plane positions for '
                f'{self.n_frames} frames')

        if px_off is None:
            raise ValueError('DICOM instance has no pixel data')
        if self.codec is not None:
            self._frames = _parse_fragments(buf, px_off[0])
            if len(self._frames) != self.n_frames:
                raise ValueError(
                    f'{len(self._frames)} fragments for {self.n_frames} '
                    f'frames (multi-fragment frames unsupported)')
        else:
            # native frames: only 8-bit interleaved RGB/grayscale is
            # decodable without a transform — reject the rest loudly
            # rather than reshaping garbage
            bits = _int((0x0028, 0x0100), 8)
            planar = _int((0x0028, 0x0006), 0)
            photo = tags.get((0x0028, 0x0004))
            photo = (photo[1].decode('ascii', errors='replace')
                     .strip('\x00 ') if photo else 'RGB')
            if bits != 8 or planar != 0 \
                    or photo not in ('RGB', 'MONOCHROME1', 'MONOCHROME2'):
                raise ValueError(
                    f'unsupported native pixel format (BitsAllocated='
                    f'{bits}, PlanarConfiguration={planar}, '
                    f'PhotometricInterpretation={photo})')
            self._frame_bytes = self.tile_h * self.tile_w * self.spp
            self._px_off = px_off[0]
            need = self.n_frames * self._frame_bytes
            if px_off[1] < need or self._px_off + need > len(buf):
                raise ValueError(
                    f'pixel data truncated: need {need} bytes for '
                    f'{self.n_frames} frames, have {px_off[1]}')

    def _frame_positions(self, leaves):
        """TILED_SPARSE per-frame (col, row) origins, 0-based, in leaf
        order — None for TILED_FULL (computed arithmetically)."""
        cols = [_decode_int(vr, v, tag=t) - 1
                for t, vr, v in leaves if t == TAG_COL_POS]
        rows = [_decode_int(vr, v, tag=t) - 1
                for t, vr, v in leaves if t == TAG_ROW_POS]
        if not cols and not rows:
            return None
        if len(cols) != len(rows):
            raise ValueError(f'{len(cols)} column vs {len(rows)} row '
                             f'plane positions')
        return list(zip(cols, rows))

    def _frame_origin(self, k):
        if self._positions is not None:
            return self._positions[k]
        return ((k % self.tiles_across) * self.tile_w,
                (k // self.tiles_across) * self.tile_h)

    def _decode_frame(self, k):
        if self.codec is not None:
            off, length = self._frames[k]
            from PIL import Image
            img = Image.open(io.BytesIO(self._buf[off:off + length]))
            arr = np.asarray(img.convert('RGB') if self.spp == 3
                             else img.convert('L'))
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return arr
        start = self._px_off + k * self._frame_bytes
        arr = np.frombuffer(self._buf, np.uint8, self._frame_bytes, start)
        return arr.reshape(self.tile_h, self.tile_w, self.spp)

    def get_magnification(self):
        if TAG_OBJECTIVE not in self._tags:
            return None
        _, v = self._tags[TAG_OBJECTIVE]
        try:
            return float(v.decode('ascii').strip('\x00 \\'))
        except ValueError:
            return None

    def _intersecting_frames(self, x, y, w, h):
        if self._positions is not None:
            # sparse: no grid invariant — scan (rare layout, small counts)
            return [k for k in range(self.n_frames)
                    if not (self._positions[k][0] >= x + w
                            or self._positions[k][1] >= y + h
                            or self._positions[k][0] + self.tile_w <= x
                            or self._positions[k][1] + self.tile_h <= y)]
        # TILED_FULL: direct row/col range indexing, O(region) not O(slide)
        ta = self.tiles_across
        j0, j1 = y // self.tile_h, min((y + h - 1) // self.tile_h,
                                       (self.size[1] - 1) // self.tile_h)
        i0, i1 = x // self.tile_w, min((x + w - 1) // self.tile_w, ta - 1)
        return [j * ta + i
                for j in range(j0, j1 + 1) for i in range(i0, i1 + 1)
                if j * ta + i < self.n_frames]

    def read_region(self, x, y, w, h):
        """(h, w, 3) uint8 region of the total pixel matrix."""
        out = np.zeros((h, w, 3), np.uint8)
        for k in self._intersecting_frames(x, y, w, h):
            fx, fy = self._frame_origin(k)
            tile = self._decode_frame(k)
            if tile.shape[2] == 1:
                tile = np.repeat(tile, 3, axis=2)
            sy0, sx0 = max(y, fy), max(x, fx)
            sy1 = min(y + h, fy + tile.shape[0])
            sx1 = min(x + w, fx + tile.shape[1])
            out[sy0 - y:sy1 - y, sx0 - x:sx1 - x] = \
                tile[sy0 - fy:sy1 - fy, sx0 - fx:sx1 - fx, :3]
        return out

    def read_description(self, level=0):
        return None

    def close(self):
        if self._buf is not None:
            self._buf.close()
            self._fh.close()
            self._buf = None
