"""Utility subpackage: image conversion, tiling, IO, checkpoint import."""

from __future__ import annotations

import numpy as np


def tensor2im(arr):
    """Convert a network output (B,H,W,C) or (H,W,C) in [-1,1] to uint8 HWC.

    Matches the reference tensor2im (util/util.py:117-135): (x+1)/2*255 with a
    truncating cast, first batch element only, grayscale tiled to RGB.
    """
    a = np.asarray(arr, np.float32)
    if a.ndim == 4:
        a = a[0]
    if a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    return ((a + 1) / 2.0 * 255.0).astype(np.uint8)


def tensor_to_pil(arr):
    from PIL import Image
    return Image.fromarray(tensor2im(arr))


def image_variance_gray(img):
    """Grayscale variance excluding pure 0/255 pixels (reference
    util/__init__.py:479-487): the empty-tile short-circuit uses
    variance < 9 -> background."""
    if hasattr(img, 'convert'):
        px = np.asarray(img if img.mode == 'L' else img.convert('L'))
    else:
        px = luma_u8(np.asarray(img))
    val = px[(px != 255) & (px != 0)]
    if val.size == 0:
        return 0.0
    return float(np.var(val))


def luma_u8(rgb):
    """ITU-R 601 luma with truncation — PIL 'L' conversion semantics."""
    a = rgb.astype(np.uint32)
    return ((a[..., 0] * 299 + a[..., 1] * 587 + a[..., 2] * 114) // 1000).astype(np.uint8)


def image_variance_rgb(img):
    """Per-channel variance excluding pure white/black pixels (reference
    util/__init__.py:490-497)."""
    px = np.asarray(img.convert('RGB') if hasattr(img, 'convert') else img)
    nonwhite = np.any(px != [255, 255, 255], axis=-1)
    nonblack = np.any(px != [0, 0, 0], axis=-1)
    val = px[nonwhite & nonblack]
    if val.shape[0] == 0:
        return [0, 0, 0]
    return np.var(val, axis=0)


def image_to_input(img, scale_size=None):
    """PIL image -> normalized NHWC float32 array in [-1,1].

    Matches the reference inference transform (data/__init__.py:133-138):
    bicubic resize to a multiple-of-4 size (or to scale_size when given),
    /255 then (x-0.5)/0.5.
    """
    from PIL import Image
    if scale_size is not None and img.size != (scale_size, scale_size):
        img = img.resize((scale_size, scale_size), Image.BICUBIC)
    else:
        w, h = img.size
        w2, h2 = (w // 4) * 4, (h // 4) * 4
        if (w2, h2) != (w, h) and w2 > 0 and h2 > 0:
            img = img.resize((w2, h2), Image.BICUBIC)
    a = np.asarray(img, np.float32) / 255.0
    a = (a - 0.5) / 0.5
    if a.ndim == 2:
        a = a[..., None].repeat(3, axis=-1)
    return a[None]  # (1,H,W,C)
