"""Synthetic CZI writer for testing deepliif_tpu.utils.czi.

Emits the published Zeiss segment layout (32-byte-aligned segments:
ZISRAWFILE header, ZISRAWSUBBLOCK pixel blocks, ZISRAWMETADATA XML,
ZISRAWDIRECTORY) so the reader can be validated without real Zeiss files
or a JVM. Test-only — the reference has no CZI writer either (it only
reads them via Bio-Formats)."""

import io
import struct

import numpy as np

from deepliif_tpu.utils.czi import (DIM_ENTRY, DIR_ENTRY_FIXED, SEG_HDR,
                                    FILE_HDR, PIXEL_BGR24, PIXEL_GRAY8)


def _pack_dir_entry(pixel_type, file_pos, compression, pyramid_type, dims):
    out = DIR_ENTRY_FIXED.pack(b'DV', pixel_type, file_pos, 0, compression,
                               pyramid_type, 0, b'\x00' * 4, len(dims))
    for name, (start, size, stored) in dims.items():
        out += DIM_ENTRY.pack(name.encode('ascii').ljust(4, b'\x00'),
                              start, size, float(start), stored)
    return out


def _segment(fh, seg_id, payload):
    """Append one 32-byte-aligned segment; returns its file offset."""
    pad = (-fh.tell()) % 32
    fh.write(b'\x00' * pad)
    pos = fh.tell()
    alloc = len(payload) + ((-len(payload)) % 32)
    fh.write(SEG_HDR.pack(seg_id.ljust(16, b'\x00'), alloc, len(payload)))
    fh.write(payload.ljust(alloc, b'\x00'))
    return pos


def write_czi(path, blocks, metadata_xml=None):
    """Write a CZI mosaic.

    ``blocks``: list of dicts with keys
      data        HxWx3 (Bgr24) or HxW (Gray8) uint8 array — the STORED
                  pixels
      x, y        block position in mosaic pixel coordinates
      dims        optional extra dimension entries, e.g. {'C': (1, 1, 1)}
      compression 0 uncompressed (default), 1 jpeg, or any raw int
      logical     optional (w, h) logical size override: pyramid blocks
                  store fewer pixels than they logically cover
    """
    with open(path, 'wb') as fh:
        fh.write(SEG_HDR.pack(b'ZISRAWFILE'.ljust(16, b'\x00'), 512, 512))
        header_pos = fh.tell()
        fh.write(b'\x00' * 512)  # patched after positions are known

        entries = []
        for blk in blocks:
            data = np.ascontiguousarray(blk['data'], dtype=np.uint8)
            h, w = data.shape[:2]
            logical_w, logical_h = blk.get('logical', (w, h))
            pixel_type = PIXEL_BGR24 if data.ndim == 3 else PIXEL_GRAY8
            comp = blk.get('compression', 0)
            if comp == 1:
                from PIL import Image
                buf = io.BytesIO()
                Image.fromarray(data).save(buf, 'JPEG', quality=95)
                payload_data = buf.getvalue()
            else:
                raw = (data[:, :, ::-1] if data.ndim == 3  # RGB -> BGR
                       else data).tobytes()
                if comp in (5, 6):
                    import zstandard
                    payload_data = zstandard.ZstdCompressor().compress(raw)
                    if comp == 6:  # zstd1 sized header, hi-lo disabled
                        payload_data = blk.get(
                            'zstd1_header', b'\x03\x01\x00') + payload_data
                else:
                    payload_data = raw
            dims = {'X': (blk['x'], logical_w, w),
                    'Y': (blk['y'], logical_h, h)}
            dims.update(blk.get('dims', {}))
            entry = _pack_dir_entry(pixel_type, 0, comp,
                                    blk.get('pyramid_type', 0), dims)
            fixed = struct.pack('<iiq', 0, 0, len(payload_data))
            base = max(256, 16 + len(entry))
            payload = (fixed + entry).ljust(base, b'\x00') + payload_data
            pos = _segment(fh, b'ZISRAWSUBBLOCK', payload)
            entries.append((pos, pixel_type, comp,
                            blk.get('pyramid_type', 0), dims))

        meta_pos = 0
        if metadata_xml:
            xml = metadata_xml.encode('utf-8')
            payload = struct.pack('<ii', len(xml), 0).ljust(256, b'\x00') + xml
            meta_pos = _segment(fh, b'ZISRAWMETADATA', payload)

        dir_payload = struct.pack('<i', len(entries)).ljust(128, b'\x00')
        for pos, pixel_type, comp, pyr, dims in entries:
            dir_payload += _pack_dir_entry(pixel_type, pos, comp, pyr, dims)
        dir_pos = _segment(fh, b'ZISRAWDIRECTORY', dir_payload)

        fh.seek(header_pos)
        fh.write(FILE_HDR.pack(1, 0, 0, 0, b'\x00' * 16, b'\x00' * 16, 0,
                               dir_pos, meta_pos, 0, 0))
    return path
