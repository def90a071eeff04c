"""Zeiss CZI slide reading.

The reference reads .czi slides (and other proprietary formats) through
Bio-Formats' in-process JVM bridge (reference util/__init__.py:500-556,
559-691). This module implements the published CZI segment layout directly
so TPU WSI inference can stream bounded regions from Zeiss slides without
a JVM:

  * segment stream: 32-byte-aligned segments, each headed by a 16-byte
    ASCII id + allocated/used sizes — ZISRAWFILE (file header),
    ZISRAWDIRECTORY (subblock directory), ZISRAWSUBBLOCK (pixel blocks),
    ZISRAWMETADATA (XML document);
  * mosaic assembly: full-resolution subblocks (logical size == stored
    size on X and Y) of the reference plane (minimum C/Z/T/... indices,
    every scene and mosaic tile) pasted into the origin-normalized scene
    bounding box — region reads decode only intersecting blocks, so
    memory stays bounded by the region size like the TIFF fast path;
  * pixel formats Gray8 and Bgr24 (returned as RGB), uncompressed,
    per-block JPEG, or zstd (zstd0 raw streams and zstd1 sized-header
    payloads). JPEG-XR subblocks decode through a pluggable codec
    (imagecodecs.jpegxr_decode when installed, or a
    DEEPLIIF_JXR_DECODER=module:function hook — see _decode_jpegxr);
    with no codec available they raise a clear error with conversion
    guidance (no JXR implementation exists in this environment).

Validated against synthetic mosaics written by tests/czi_fixture.py,
which emits the same segment layout libCZI produces.
"""

from __future__ import annotations

import io
import os
import re
import struct

import numpy as np

SEG_HDR = struct.Struct('<16sqq')          # id, allocated size, used size
FILE_HDR = struct.Struct('<iiii16s16siqqiq')
# major, minor, res1, res2, primary guid, file guid, file part,
# directory pos, metadata pos, update pending, attachment directory pos
DIR_ENTRY_FIXED = struct.Struct('<2siqiiBB4si')
# schema 'DV', pixel type, file position, file part, compression,
# pyramid type, reserved, reserved, dimension count
DIM_ENTRY = struct.Struct('<4siifi')       # name, start, size, coord, stored

PIXEL_GRAY8 = 0
PIXEL_BGR24 = 3

COMPRESSION_NAMES = {0: 'uncompressed', 1: 'jpeg', 2: 'lzw', 4: 'jpeg-xr',
                     5: 'zstd0', 6: 'zstd1'}


class SubBlock:
    """One directory entry: where a pixel block lives and what it covers."""

    __slots__ = ('pixel_type', 'file_pos', 'compression', 'pyramid_type',
                 'dims')

    def __init__(self, pixel_type, file_pos, compression, pyramid_type, dims):
        self.pixel_type = pixel_type
        self.file_pos = file_pos
        self.compression = compression
        self.pyramid_type = pyramid_type
        self.dims = dims  # {name: (start, size, stored_size)}

    def is_full_res(self):
        x = self.dims.get('X')
        y = self.dims.get('Y')
        return (x is not None and y is not None
                and x[1] == x[2] and y[1] == y[2])


def parse_dir_entry(buf, off):
    """Decode one DV directory entry at ``off``; returns (SubBlock, end)."""
    (schema, pixel_type, file_pos, _part, compression, pyramid_type,
     _r1, _r2, ndims) = DIR_ENTRY_FIXED.unpack_from(buf, off)
    if schema != b'DV':
        raise ValueError(f'unsupported CZI directory entry schema {schema!r}')
    off += DIR_ENTRY_FIXED.size
    dims = {}
    for _ in range(ndims):
        name, start, size, _coord, stored = DIM_ENTRY.unpack_from(buf, off)
        dims[name.rstrip(b'\x00').decode('ascii')] = (start, size, stored)
        off += DIM_ENTRY.size
    return SubBlock(pixel_type, file_pos, compression, pyramid_type,
                    dims), off


def _zstd_subblock(data, comp, max_size):
    """Decompress a zstd0/zstd1 CZI subblock payload to raw pixel bytes.

    zstd1 (compression 6) prepends a sized header: byte 0 is the header
    length (counting itself); a 3-byte header carries the hi-lo
    byte-packing parameter chunk (id 1, enabled flag) — packing splits
    16-bit samples into low/high planes before compression and is only
    defined for 16-bit pixel types, which this reader does not expose."""
    try:
        import zstandard
    except ImportError as e:
        raise ValueError('zstd-compressed CZI subblock but no zstandard '
                         'codec in this environment') from e
    if comp == 6:
        n = data[0]
        if n < 1 or n > len(data):
            raise ValueError('corrupt zstd1 CZI subblock header')
        if n >= 3 and data[1] == 1 and data[2] == 1:
            raise ValueError('zstd1 hi-lo byte packing is only defined for '
                             '16-bit pixel types (unsupported here)')
        data = data[n:]
    return zstandard.ZstdDecompressor().decompress(bytes(data),
                                                   max_output_size=max_size)


def _decode_jpegxr(data):
    """Decode a JPEG-XR (ITU-T T.832) subblock via a pluggable codec.

    No JPEG-XR implementation exists in this environment (PIL has no JXR
    plugin; imagecodecs/glymur are not installed; the format's only open
    decoders are jxrlib descendants), so decoding is delegated, in order:

      1. ``imagecodecs.jpegxr_decode`` when the imagecodecs wheel is
         installed (the standard scientific-Python JXR binding, and what
         tifffile/czifile use themselves);
      2. a user hook ``DEEPLIIF_JXR_DECODER=module:function`` where
         ``function(bytes) -> ndarray`` (e.g. a jxrlib ctypes wrapper).

    Decoder contract: uint8 pixels in DISPLAY order — (h, w) or
    (h, w, 1) grayscale, (h, w, 2) gray+alpha, or (h, w, >=3) with the
    first three channels R, G, B (what imagecodecs.jpegxr_decode returns
    for Bgr24-class streams). Non-uint8 output (16-bit fluorescence
    subblocks) is refused by the caller rather than truncated.

    Otherwise raises with conversion guidance. The reference defers this
    codec to Bio-Formats' bundled JXR Java decoder
    (/root/reference/deepliif/util/__init__.py:559-691); everything the
    reference's own docs/datasets exercise decodes natively here, and
    this hook completes the Zeiss family wherever a codec is available."""
    try:
        import imagecodecs
    except ImportError:
        imagecodecs = None
    if imagecodecs is not None and hasattr(imagecodecs, 'jpegxr_decode'):
        return np.asarray(imagecodecs.jpegxr_decode(bytes(data)))
    hook = os.environ.get('DEEPLIIF_JXR_DECODER')
    if hook:
        mod_name, _, fn_name = hook.partition(':')
        import importlib
        fn = getattr(importlib.import_module(mod_name), fn_name or 'decode')
        return np.asarray(fn(bytes(data)))
    raise ValueError(
        "unsupported CZI subblock compression 'jpeg-xr': no codec in this "
        'environment. Install the imagecodecs wheel (provides '
        'jpegxr_decode), set DEEPLIIF_JXR_DECODER=module:function to a '
        'decoder taking the raw stream, or convert the slide to TIFF '
        '(e.g. with ZEN/bfconvert) first')


class CziReader:
    """Random-access region reader over a CZI mosaic (full-res plane)."""

    def __init__(self, path):
        self.path = path
        self.fh = open(path, 'rb')
        sid, _alloc, _used = SEG_HDR.unpack(self.fh.read(SEG_HDR.size))
        if not sid.startswith(b'ZISRAWFILE'):
            raise ValueError(f'not a CZI file: {path}')
        (_major, _minor, _r1, _r2, _pguid, _fguid, _part, dir_pos, meta_pos,
         _upd, _att_pos) = FILE_HDR.unpack(self.fh.read(FILE_HDR.size))
        self._meta_pos = meta_pos
        self._xml = None
        entries = self._read_directory(dir_pos)
        self.blocks = self._select_reference_plane(entries)
        if not self.blocks:
            raise ValueError('CZI file has no full-resolution subblocks')
        xs = [b.dims['X'] for b in self.blocks]
        ys = [b.dims['Y'] for b in self.blocks]
        self.origin_x = min(x[0] for x in xs)
        self.origin_y = min(y[0] for y in ys)
        w = max(x[0] + x[1] for x in xs) - self.origin_x
        h = max(y[0] + y[1] for y in ys) - self.origin_y
        self.size = (w, h)

    def _read_directory(self, pos):
        self.fh.seek(pos)
        sid, alloc, used = SEG_HDR.unpack(self.fh.read(SEG_HDR.size))
        if not sid.startswith(b'ZISRAWDIRECTORY'):
            raise ValueError('CZI subblock directory not found')
        payload = self.fh.read(used if used > 0 else alloc)
        count = struct.unpack_from('<i', payload, 0)[0]
        off = 128  # int32 count + 124 reserved bytes
        entries = []
        for _ in range(count):
            entry, off = parse_dir_entry(payload, off)
            entries.append(entry)
        return entries

    @staticmethod
    def _select_reference_plane(entries):
        """Full-resolution blocks at the minimum index of every non-spatial
        dimension (first channel / z-plane / timepoint), keeping all scenes
        (S) and mosaic tiles (M) so the whole slide area is covered."""
        full = [e for e in entries if e.is_full_res()]
        free_dims = {'X', 'Y', 'S', 'M'}
        mins = {}
        for e in full:
            for name, (start, _size, _stored) in e.dims.items():
                if name not in free_dims:
                    mins[name] = min(mins.get(name, start), start)
        return [e for e in full
                if all(e.dims[n][0] == mins[n]
                       for n in e.dims if n not in free_dims)]

    # -- pixel access -------------------------------------------------------

    def _block_pixels(self, block):
        """Decode one subblock to (stored_h, stored_w, 3) uint8 RGB."""
        self.fh.seek(block.file_pos)
        sid, alloc, used = SEG_HDR.unpack(self.fh.read(SEG_HDR.size))
        if not sid.startswith(b'ZISRAWSUBBLOCK'):
            raise ValueError('directory entry does not point at a subblock')
        payload = self.fh.read(used if used > 0 else alloc)
        meta_size, _att_size, data_size = struct.unpack_from('<iiq', payload)
        entry, entry_end = parse_dir_entry(payload, 16)
        base = max(256, entry_end)
        data = payload[base + meta_size:base + meta_size + data_size]
        sw = block.dims['X'][2]
        sh = block.dims['Y'][2]
        comp = block.compression
        if comp == 1:  # JPEG — a complete per-block stream
            from PIL import Image
            out = np.asarray(Image.open(io.BytesIO(data)).convert('RGB'))
            full = np.zeros((sh, sw, 3), np.uint8)
            full[:min(sh, out.shape[0]), :min(sw, out.shape[1])] = \
                out[:sh, :sw]
            return full
        if comp == 4:  # JPEG-XR (ITU-T T.832)
            out = _decode_jpegxr(data)
            if out.dtype != np.uint8:
                # e.g. Gray16 fluorescence subblocks: truncating mod 256
                # would be silent garbage; match the uncompressed path's
                # explicit unsupported-pixel-type refusal
                raise ValueError(
                    f'JPEG-XR subblock decoded to {out.dtype} pixels; only '
                    '8-bit (Gray8/Bgr24-class) subblocks are supported '
                    '(convert 16-bit slides to 8-bit TIFF first)')
            if out.ndim == 3 and out.shape[2] == 2:  # gray + alpha
                out = out[:, :, 0]
            if out.ndim == 2:
                out = np.repeat(out[:, :, None], 3, axis=2)
            elif out.shape[2] > 3:
                out = out[:, :, :3]
            full = np.zeros((sh, sw, 3), np.uint8)
            full[:min(sh, out.shape[0]), :min(sw, out.shape[1])] = \
                out[:sh, :sw]
            return full
        if comp in (5, 6):  # zstd0 / zstd1
            n_bytes = sh * sw * (3 if block.pixel_type == PIXEL_BGR24 else 1)
            data = _zstd_subblock(data, comp, n_bytes)
        elif comp != 0:
            name = COMPRESSION_NAMES.get(comp, str(comp))
            raise ValueError(
                f'unsupported CZI subblock compression {name!r}: no codec '
                'in this environment (supported: uncompressed, jpeg, zstd)')
        if block.pixel_type == PIXEL_BGR24:
            arr = np.frombuffer(data, np.uint8)[:sh * sw * 3]
            return arr.reshape(sh, sw, 3)[:, :, ::-1]
        if block.pixel_type == PIXEL_GRAY8:
            arr = np.frombuffer(data, np.uint8)[:sh * sw]
            return np.repeat(arr.reshape(sh, sw, 1), 3, axis=2)
        raise ValueError(f'unsupported CZI pixel type {block.pixel_type} '
                         '(supported: Gray8, Bgr24)')

    def read_region(self, x, y, w, h):
        """Read (h, w, 3) uint8 at origin-normalized (x, y); only blocks
        intersecting the request are decoded."""
        ax, ay = x + self.origin_x, y + self.origin_y
        out = np.zeros((h, w, 3), np.uint8)
        for block in self.blocks:
            bx, bw, _ = block.dims['X']
            by, bh, _ = block.dims['Y']
            ix0, ix1 = max(ax, bx), min(ax + w, bx + bw)
            iy0, iy1 = max(ay, by), min(ay + h, by + bh)
            if ix0 >= ix1 or iy0 >= iy1:
                continue
            pix = self._block_pixels(block)
            out[iy0 - ay:iy1 - ay, ix0 - ax:ix1 - ax] = \
                pix[iy0 - by:iy1 - by, ix0 - bx:ix1 - bx]
        return out

    # -- metadata -----------------------------------------------------------

    def read_description(self):
        """The file's XML metadata document (or None)."""
        if self._xml is None and self._meta_pos:
            self.fh.seek(self._meta_pos)
            sid, alloc, used = SEG_HDR.unpack(self.fh.read(SEG_HDR.size))
            if sid.startswith(b'ZISRAWMETADATA'):
                payload = self.fh.read(used if used > 0 else alloc)
                xml_size, _att = struct.unpack_from('<ii', payload)
                self._xml = payload[256:256 + xml_size].decode(
                    'utf-8', errors='replace')
        return self._xml

    def get_magnification(self):
        """Objective magnification from <NominalMagnification> in the
        instrument metadata (reference get_wsi_resolution reads the same
        OME field via Bio-Formats, models/__init__.py:730-782)."""
        xml = self.read_description() or ''
        m = re.search(r'<NominalMagnification>\s*([0-9.]+)', xml)
        if m:
            return float(m.group(1))
        from .tiff import parse_magnification
        return parse_magnification(xml)

    def get_information(self):
        w, h = self.size
        return {'size_x': w, 'size_y': h, 'pixel_type': 'uint8',
                'magnification': self.get_magnification()}

    def close(self):
        self.fh.close()
