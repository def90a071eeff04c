"""Inception-V3 in JAX with the torchvision parameter layout.

Closes the round-2 gap "FID/IS default embedding is fixed-seed VGG"
(reference DeepLIIF_Statistics/fid.py:303-334 computes FID over Inception
pool3 features): the full architecture is implemented here and
`utils.torch_import.import_inception_v3` converts a torchvision
`inception_v3` state dict, so paper-comparable FID/IS is exactly one
weight download away (this environment has no egress and no torchvision).

Semantics match torchvision eval mode: BasicConv2d = conv(bias=False) +
BatchNorm2d(eps=1e-3, RUNNING stats) + ReLU; aux classifier ignored;
`transform_input=False`. `features(params, x)` returns the 2048-d pool3
embedding (the FID feature), `logits(params, x)` the 1000-way classifier
output (for Inception Score). Input is NHWC float, ImageNet-normalized
299x299 (`preprocess_uint8` handles uint8 RGB).

Parity-tested layer-by-layer against a reference-layout torch mirror with
random weights (tests/test_inception.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_DN = ('NHWC', 'HWIO', 'NHWC')
BN_EPS = 1e-3
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv_bn(p, x, stride=1, padding=0):
    """BasicConv2d: conv (no bias) + BN with running stats + ReLU."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        pad = [(padding, padding)] * 2
    else:
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(x, p['w'].astype(x.dtype), stride, pad,
                                     dimension_numbers=_DN)
    scale = (p['s'] / jnp.sqrt(p['v'] + BN_EPS)).astype(x.dtype)
    bias = (p['b'] - p['m'] * p['s'] / jnp.sqrt(p['v'] + BN_EPS)).astype(x.dtype)
    return jnp.maximum(y * scale + bias, 0)


def _maxpool3x3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), 'VALID')


def _avgpool3x3s1p1(x):
    # torch F.avg_pool2d(count_include_pad=True): always divides by 9
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


def _inception_a(p, x):
    b1 = _conv_bn(p['branch1x1'], x)
    b5 = _conv_bn(p['branch5x5_1'], x)
    b5 = _conv_bn(p['branch5x5_2'], b5, padding=2)
    b3 = _conv_bn(p['branch3x3dbl_1'], x)
    b3 = _conv_bn(p['branch3x3dbl_2'], b3, padding=1)
    b3 = _conv_bn(p['branch3x3dbl_3'], b3, padding=1)
    bp = _conv_bn(p['branch_pool'], _avgpool3x3s1p1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv_bn(p['branch3x3'], x, stride=2)
    bd = _conv_bn(p['branch3x3dbl_1'], x)
    bd = _conv_bn(p['branch3x3dbl_2'], bd, padding=1)
    bd = _conv_bn(p['branch3x3dbl_3'], bd, stride=2)
    bp = _maxpool3x3s2(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x):
    b1 = _conv_bn(p['branch1x1'], x)
    b7 = _conv_bn(p['branch7x7_1'], x)
    b7 = _conv_bn(p['branch7x7_2'], b7, padding=(0, 3))
    b7 = _conv_bn(p['branch7x7_3'], b7, padding=(3, 0))
    bd = _conv_bn(p['branch7x7dbl_1'], x)
    bd = _conv_bn(p['branch7x7dbl_2'], bd, padding=(3, 0))
    bd = _conv_bn(p['branch7x7dbl_3'], bd, padding=(0, 3))
    bd = _conv_bn(p['branch7x7dbl_4'], bd, padding=(3, 0))
    bd = _conv_bn(p['branch7x7dbl_5'], bd, padding=(0, 3))
    bp = _conv_bn(p['branch_pool'], _avgpool3x3s1p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv_bn(p['branch3x3_1'], x)
    b3 = _conv_bn(p['branch3x3_2'], b3, stride=2)
    b7 = _conv_bn(p['branch7x7x3_1'], x)
    b7 = _conv_bn(p['branch7x7x3_2'], b7, padding=(0, 3))
    b7 = _conv_bn(p['branch7x7x3_3'], b7, padding=(3, 0))
    b7 = _conv_bn(p['branch7x7x3_4'], b7, stride=2)
    bp = _maxpool3x3s2(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x):
    b1 = _conv_bn(p['branch1x1'], x)
    b3 = _conv_bn(p['branch3x3_1'], x)
    b3 = jnp.concatenate([
        _conv_bn(p['branch3x3_2a'], b3, padding=(0, 1)),
        _conv_bn(p['branch3x3_2b'], b3, padding=(1, 0)),
    ], axis=-1)
    bd = _conv_bn(p['branch3x3dbl_1'], x)
    bd = _conv_bn(p['branch3x3dbl_2'], bd, padding=1)
    bd = jnp.concatenate([
        _conv_bn(p['branch3x3dbl_3a'], bd, padding=(0, 1)),
        _conv_bn(p['branch3x3dbl_3b'], bd, padding=(1, 0)),
    ], axis=-1)
    bp = _conv_bn(p['branch_pool'], _avgpool3x3s1p1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def pool3(params, x):
    """Trunk forward to the 2048-d pre-fc embedding (the FID feature).
    x: (N, 299, 299, 3) ImageNet-normalized float."""
    x = _conv_bn(params['Conv2d_1a_3x3'], x, stride=2)        # 149
    x = _conv_bn(params['Conv2d_2a_3x3'], x)                  # 147
    x = _conv_bn(params['Conv2d_2b_3x3'], x, padding=1)       # 147
    x = _maxpool3x3s2(x)                                      # 73
    x = _conv_bn(params['Conv2d_3b_1x1'], x)
    x = _conv_bn(params['Conv2d_4a_3x3'], x)                  # 71
    x = _maxpool3x3s2(x)                                      # 35
    x = _inception_a(params['Mixed_5b'], x)
    x = _inception_a(params['Mixed_5c'], x)
    x = _inception_a(params['Mixed_5d'], x)
    x = _inception_b(params['Mixed_6a'], x)                   # 17
    x = _inception_c(params['Mixed_6b'], x)
    x = _inception_c(params['Mixed_6c'], x)
    x = _inception_c(params['Mixed_6d'], x)
    x = _inception_c(params['Mixed_6e'], x)
    x = _inception_d(params['Mixed_7a'], x)                   # 8
    x = _inception_e(params['Mixed_7b'], x)
    x = _inception_e(params['Mixed_7c'], x)                   # (N,8,8,2048)
    return x.mean(axis=(1, 2))                                # adaptive avgpool


def features(params, x):
    """2048-d pool3 embedding."""
    return pool3(params, x)


def logits(params, x):
    """1000-way classifier output (Inception Score input)."""
    f = pool3(params, x)
    return f @ params['fc']['w'] + params['fc']['b']


def preprocess_uint8(images_u8, size=299):
    """uint8 RGB (N,H,W,3) -> ImageNet-normalized (N,299,299,3) f32."""
    from PIL import Image
    out = np.empty((len(images_u8), size, size, 3), np.float32)
    for i, im in enumerate(np.asarray(images_u8)):
        out[i] = np.asarray(
            Image.fromarray(im).resize((size, size), Image.BILINEAR),
            np.float32) / 255.0
    out = (out - np.asarray(IMAGENET_MEAN, np.float32)) \
        / np.asarray(IMAGENET_STD, np.float32)
    return out


def make_features_fn(params, batch=16):
    """Batched uint8-images -> pool3 features callable for stats.fid."""
    fwd = jax.jit(features)

    def fn(images):
        feats = []
        for i in range(0, len(images), batch):
            x = jnp.asarray(preprocess_uint8(images[i:i + batch]))
            feats.append(np.asarray(fwd(params, x)))
        return np.concatenate(feats)
    return fn


def make_classifier_fn(params, batch=16):
    """Batched uint8-images -> class probabilities (Inception Score)."""
    fwd = jax.jit(logits)

    def fn(images):
        probs = []
        for i in range(0, len(images), batch):
            x = jnp.asarray(preprocess_uint8(images[i:i + batch]))
            lg = np.asarray(fwd(params, x))
            e = np.exp(lg - lg.max(1, keepdims=True))
            probs.append(e / e.sum(1, keepdims=True))
        return np.concatenate(probs)
    return fn
