"""OME-Zarr (OME-NGFF) whole-slide reader/writer, self-contained.

The reference reads every non-TIFF slide container through Bio-Formats'
JVM (reference util/__init__.py:559-691); recent Bio-Formats also covers
OME-NGFF — the zarr-v2-based format emitted by bioformats2raw and used by
modern pathology pipelines. Neither ``zarr`` nor ``numcodecs`` exists in
this environment, so this module speaks the on-disk format directly:

* zarr v2 arrays: ``.zarray`` JSON (shape/chunks/dtype/compressor/order/
  fill_value/dimension_separator), chunk files named ``i.j.k`` (flat) or
  ``i/j/k`` (nested), edge chunks stored full-size (padded).
* NGFF multiscales: group ``.zattrs`` with ``multiscales[0].datasets``
  (axes subset of t,c,z,y,x in that order per NGFF 0.4).
* Compressors: ``null``, ``zlib``, ``gzip``, ``zstd`` (via the
  ``zstandard`` module, same optional dependency as utils.czi), plus the
  blosc container for its memcpy / zlib / zstd codecs (byte-shuffle
  undone for any typesize; blosclz/lz4/snappy payloads have no decoder
  in this environment and raise a clear error).

Only ``y``/``x`` windows intersecting a ``read_region`` are decoded, so
memory stays O(region) like the TIFF fast path the reference gets from
its zarr view over tiled pages (reference util/__init__.py:582-616).
"""

from __future__ import annotations

import gzip
import json
import os
import struct
import zlib

import numpy as np

# blosc header flags (c-blosc frame format, 16-byte header)
_BLOSC_MEMCPYED = 0x2
_BLOSC_BYTE_SHUFFLE = 0x1
_BLOSC_BIT_SHUFFLE = 0x4
_BLOSC_CODECS = {0: 'blosclz', 1: 'lz4', 2: 'snappy', 3: 'zlib', 4: 'zstd'}


def _zstd_decompress(data, nbytes):
    try:
        import zstandard
    except ImportError:
        raise ValueError('zstd-compressed zarr chunk but no zstandard '
                         'module in this environment')
    return zstandard.ZstdDecompressor().decompress(bytes(data),
                                                   max_output_size=nbytes)


def _blosc_decompress(data, expect_nbytes):
    """Decode a c-blosc1 frame (the container numcodecs' Blosc writes).

    Header: version, versionlz, flags, typesize, nbytes, blocksize, cbytes.
    Non-memcpy frames carry an int32 offset table (one absolute offset per
    block); each block is one or more streams of [int32 csize][payload],
    a stream stored verbatim when csize equals its uncompressed size.
    """
    if len(data) < 16:
        raise ValueError('truncated blosc frame')
    flags, typesize = data[2], data[3]
    nbytes, blocksize, cbytes = struct.unpack_from('<III', data, 4)
    if nbytes != expect_nbytes:
        raise ValueError(f'blosc nbytes {nbytes} != chunk {expect_nbytes}')
    if flags & _BLOSC_BIT_SHUFFLE:
        raise ValueError('blosc bit-shuffle not supported')
    if flags & _BLOSC_MEMCPYED:
        # memcpyed frames store the ORIGINAL buffer; shuffle flags are
        # ignored by c-blosc's decompressor in this mode
        out = bytes(data[16:16 + nbytes])
    else:
        codec = _BLOSC_CODECS.get((flags >> 5) & 0x7, '?')
        if codec == 'zlib':
            dec = lambda b, n: zlib.decompress(bytes(b))
        elif codec == 'zstd':
            dec = _zstd_decompress
        else:
            raise ValueError(f'blosc codec {codec!r} has no decoder in '
                             'this environment (supported: memcpy, zlib, '
                             'zstd)')
        nblocks = (nbytes + blocksize - 1) // blocksize
        bstarts = struct.unpack_from(f'<{nblocks}i', data, 16)
        # split-mode frames (blosclz/lz4 byte-shuffle) never reach here:
        # zlib/zstd blosc blocks are single-stream
        unshuffle = flags & _BLOSC_BYTE_SHUFFLE and typesize > 1
        out = bytearray(nbytes)
        pos = 0
        for j in range(nblocks):
            neblock = min(blocksize, nbytes - pos)
            off = bstarts[j]
            (csize,) = struct.unpack_from('<i', data, off)
            payload = data[off + 4:off + 4 + csize]
            block = bytes(payload) if csize == neblock \
                else dec(payload, neblock)
            if unshuffle:
                # the shuffle filter operates per block; a non-divisible
                # tail stays in source order
                cut = (neblock // typesize) * typesize
                arr = np.frombuffer(block[:cut], np.uint8)
                block = arr.reshape(typesize, -1).T.tobytes() + block[cut:]
            out[pos:pos + neblock] = block
            pos += neblock
        out = bytes(out)
    return out


def _decompress(raw, compressor, nbytes):
    if compressor is None:
        return raw
    cid = compressor.get('id')
    if cid == 'zlib':
        return zlib.decompress(raw)
    if cid == 'gzip':
        return gzip.decompress(raw)
    if cid == 'zstd':
        return _zstd_decompress(raw, nbytes)
    if cid == 'blosc':
        return _blosc_decompress(raw, nbytes)
    raise ValueError(f'unsupported zarr compressor {cid!r}')


class _ZarrArray:
    """Random-access view over one zarr v2 array directory."""

    def __init__(self, path):
        self.path = path
        with open(os.path.join(path, '.zarray')) as f:
            meta = json.load(f)
        if meta.get('zarr_format') != 2:
            raise ValueError(f'unsupported zarr_format {meta.get("zarr_format")}')
        if meta.get('filters'):
            raise ValueError('zarr filters not supported')
        if meta.get('order', 'C') != 'C':
            raise ValueError('Fortran-order zarr arrays not supported')
        self.shape = tuple(meta['shape'])
        self.chunks = tuple(meta['chunks'])
        self.dtype = np.dtype(meta['dtype'])
        self.compressor = meta.get('compressor')
        self.fill_value = meta.get('fill_value') or 0
        self.sep = meta.get('dimension_separator', '.')
        self._nbytes = int(np.prod(self.chunks)) * self.dtype.itemsize
        self._cache = {}  # tiny LRU: chunk key -> ndarray

    def chunk(self, idx):
        key = self.sep.join(str(i) for i in idx)
        hit = self._cache.pop(key, None)
        if hit is not None:
            self._cache[key] = hit
            return hit
        fn = os.path.join(self.path, *key.split('/')) if self.sep == '/' \
            else os.path.join(self.path, key)
        if not os.path.exists(fn):
            arr = np.full(self.chunks, self.fill_value, self.dtype)
        else:
            with open(fn, 'rb') as f:
                raw = f.read()
            buf = _decompress(raw, self.compressor, self._nbytes)
            arr = np.frombuffer(buf, self.dtype).reshape(self.chunks)
        self._cache[key] = arr
        while len(self._cache) > 16:
            self._cache.pop(next(iter(self._cache)))
        return arr

    def read(self, starts, stops):
        """Read the hyper-rectangle [starts, stops) across chunk files."""
        out_shape = tuple(b - a for a, b in zip(starts, stops))
        out = np.full(out_shape, self.fill_value, self.dtype)
        first = [a // c for a, c in zip(starts, self.chunks)]
        last = [(b - 1) // c for b, c in zip(stops, self.chunks)]
        idx = list(first)
        while True:
            cstarts = [i * c for i, c in zip(idx, self.chunks)]
            src, dst = [], []
            for d in range(len(idx)):
                a = max(starts[d], cstarts[d])
                b = min(stops[d], cstarts[d] + self.chunks[d])
                src.append(slice(a - cstarts[d], b - cstarts[d]))
                dst.append(slice(a - starts[d], b - starts[d]))
            out[tuple(dst)] = self.chunk(idx)[tuple(src)]
            for d in range(len(idx) - 1, -1, -1):
                idx[d] += 1
                if idx[d] <= last[d]:
                    break
                idx[d] = first[d]
            else:
                break
        return out


def _find_group(path):
    """Resolve a user path to (group_dir, level0_array_dir, axes)."""
    path = path.rstrip('/')
    zattrs = os.path.join(path, '.zattrs')
    if os.path.exists(os.path.join(path, '.zarray')):
        return None, path, None  # bare array
    if not os.path.exists(zattrs):
        # bioformats2raw layout: the group may be a series child ('0/')
        child = os.path.join(path, '0')
        if os.path.exists(os.path.join(child, '.zattrs')) or \
                os.path.exists(os.path.join(child, '.zarray')):
            return _find_group(child)
        raise ValueError(f'{path}: no .zattrs/.zarray — not an OME-Zarr')
    with open(zattrs) as f:
        attrs = json.load(f)
    ms = attrs.get('multiscales')
    if not ms:
        return _find_group(os.path.join(path, '0'))
    ds = ms[0]['datasets'][0]['path']  # first dataset = highest resolution
    axes = ms[0].get('axes')
    names = [a['name'] if isinstance(a, dict) else a for a in axes] \
        if axes else None
    return path, os.path.join(path, ds), names


class OmeZarrReader:
    """WSI region reader over an OME-Zarr store (plugs into utils.wsi).

    Mirrors the contract of TiledTiffReader/CziReader: ``.size`` = (w, h),
    ``read_region(x, y, w, h)`` -> uint8 (h, w, 3), ``close()``.
    """

    def __init__(self, path):
        self.path = path
        self._group, arr_dir, names = _find_group(path)
        self.arr = _ZarrArray(arr_dir)
        nd = len(self.arr.shape)
        if names is None:
            # NGFF <=0.3 had implicit tczyx; trailing dims are always y,x.
            # A 3-d leading dim of size <=4 is a channel axis in practice
            # (cyx planes), not z.
            names = list('tczyx'[5 - nd:]) if 2 <= nd <= 5 else None
            if nd == 3 and self.arr.shape[0] <= 4:
                names = ['c', 'y', 'x']
        if names is None or len(names) != nd or 'y' not in names \
                or 'x' not in names:
            raise ValueError(f'cannot map {nd}-d zarr axes {names}')
        self.names = names
        self.y_dim, self.x_dim = names.index('y'), names.index('x')
        self.c_dim = names.index('c') if 'c' in names else None
        h, w = self.arr.shape[self.y_dim], self.arr.shape[self.x_dim]
        self.size = (w, h)

    def get_magnification(self):
        if self._group is None:
            return None
        try:
            with open(os.path.join(self._group, '.zattrs')) as f:
                attrs = json.load(f)
            meta = attrs.get('multiscales', [{}])[0].get('metadata', {})
            mag = meta.get('magnification') or meta.get('objective', {}).get(
                'nominalMagnification')
            return float(mag) if mag else None
        except Exception:
            return None

    def read_description(self):
        return None

    def read_region(self, x, y, w, h):
        a = self.arr
        x0, y0 = max(0, x), max(0, y)
        x1 = min(a.shape[self.x_dim], x + w)
        y1 = min(a.shape[self.y_dim], y + h)
        starts, stops = [], []
        for d in range(len(a.shape)):
            if d == self.y_dim:
                starts.append(y0), stops.append(max(y0, y1))
            elif d == self.x_dim:
                starts.append(x0), stops.append(max(x0, x1))
            elif d == self.c_dim:
                starts.append(0), stops.append(min(a.shape[d], 3))
            else:
                starts.append(0), stops.append(1)  # t/z: first plane
        block = a.read(starts, stops)
        # collapse to (h', w', c)
        order = [d for d in range(block.ndim)
                 if d not in (self.y_dim, self.x_dim)] \
            + [self.y_dim, self.x_dim]
        block = np.transpose(block, order)
        hp, wp = block.shape[-2], block.shape[-1]
        block = block.reshape((-1, hp, wp))   # leading singles fold into c'
        block = np.moveaxis(block, 0, -1)     # (h', w', c')
        block = _to_uint8_rgb(block)
        out = np.zeros((h, w, 3), np.uint8)
        out[y0 - y:y0 - y + block.shape[0],
            x0 - x:x0 - x + block.shape[1]] = block
        return out

    def close(self):
        self.arr._cache.clear()


def _to_uint8_rgb(block):
    """(h, w, c') any-dtype -> (h, w, 3) uint8."""
    if block.dtype == np.uint16:
        block = (block >> 8).astype(np.uint8)
    elif block.dtype.kind == 'f':
        block = np.clip(block, 0.0, 1.0)
        block = (block * 255.0 + 0.5).astype(np.uint8)
    elif block.dtype != np.uint8:
        block = np.clip(block, 0, 255).astype(np.uint8)
    c = block.shape[2]
    if c == 1:
        return np.repeat(block, 3, axis=2)
    if c == 2:
        return np.concatenate([block, block[..., :1] * 0], axis=2)
    return block[..., :3]


def is_ome_zarr(path):
    """Dispatch predicate for utils.wsi.WSIReader."""
    if path.lower().endswith('.zarr') and os.path.isdir(path):
        return True
    return os.path.isdir(path) and (
        os.path.exists(os.path.join(path, '.zattrs'))
        or os.path.exists(os.path.join(path, '.zarray')))


def write_ome_zarr(path, canvas, levels=(1, 2, 4, 8), chunk=1024,
                   compressor='zlib', magnification=None):
    """Write (h, w, 3) uint8 as an NGFF 0.4 multiscale group.

    Mirrors the /2,/4,/8 pyramid of the reference's BigTIFF writer
    (reference util/__init__.py:774-792) in (c, y, x) axis order. The
    store is plain zarr v2 (flat '.'-separated chunk keys), readable by
    zarr-python/numcodecs as written.
    """
    canvas = np.ascontiguousarray(canvas)
    assert canvas.ndim == 3 and canvas.shape[2] == 3 and \
        canvas.dtype == np.uint8, canvas.shape
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, '.zgroup'), 'w') as f:
        json.dump({'zarr_format': 2}, f)
    datasets = []
    for li, factor in enumerate(levels):
        lvl = canvas[::factor, ::factor]
        arr = np.moveaxis(lvl, -1, 0)  # (3, h, w)
        adir = os.path.join(path, str(li))
        os.makedirs(adir, exist_ok=True)
        chunks = (1, min(chunk, arr.shape[1]), min(chunk, arr.shape[2]))
        meta = {
            'zarr_format': 2, 'shape': list(arr.shape),
            'chunks': list(chunks), 'dtype': '|u1',
            'compressor': ({'id': 'zlib', 'level': 1}
                           if compressor == 'zlib' else None),
            'fill_value': 0, 'order': 'C', 'filters': None,
            'dimension_separator': '.',
        }
        with open(os.path.join(adir, '.zarray'), 'w') as f:
            json.dump(meta, f)
        for ci in range(arr.shape[0]):
            for yi in range(0, arr.shape[1], chunks[1]):
                for xi in range(0, arr.shape[2], chunks[2]):
                    block = np.zeros(chunks, np.uint8)
                    part = arr[ci:ci + 1, yi:yi + chunks[1], xi:xi + chunks[2]]
                    block[:, :part.shape[1], :part.shape[2]] = part
                    raw = block.tobytes()
                    if compressor == 'zlib':
                        raw = zlib.compress(raw, 1)
                    key = f'{ci}.{yi // chunks[1]}.{xi // chunks[2]}'
                    with open(os.path.join(adir, key), 'wb') as f:
                        f.write(raw)
        datasets.append({'path': str(li), 'coordinateTransformations': [
            {'type': 'scale', 'scale': [1.0, float(factor), float(factor)]}]})
    ms = {'version': '0.4', 'name': os.path.basename(path),
          'axes': [{'name': 'c', 'type': 'channel'},
                   {'name': 'y', 'type': 'space'},
                   {'name': 'x', 'type': 'space'}],
          'datasets': datasets}
    if magnification:
        ms['metadata'] = {'magnification': float(magnification)}
    with open(os.path.join(path, '.zattrs'), 'w') as f:
        json.dump({'multiscales': [ms]}, f)
