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
    """Grayscale variance (reference util/__init__.py:485-497 semantics):
    used by the empty-tile short-circuit (variance < 9 -> background)."""
    a = np.asarray(img.convert('L') if hasattr(img, 'convert') else img, np.float32)
    return float(a.var())


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
