"""VGG19 feature extractor for the perceptual (feature-matching) loss.

Mirrors the 5-slice split of the reference Vgg19 wrapper
(/root/reference/deepliif/models/networks.py:698-743): slices end after
relu1_1, relu2_1, relu3_1, relu4_1, relu5_1; loss weights
[1/32, 1/16, 1/8, 1/4, 1].

Pretrained torchvision weights cannot be downloaded in this environment; the
extractor loads them from a converted ``.npz`` if present (path via
``DEEPLIIF_VGG19_WEIGHTS`` env var or explicit argument; convert with
``deepliif_tpu.utils.torch_import.convert_vgg19``), else falls back to a
fixed-seed He-initialized network, which still provides a stable multi-scale
feature metric (documented deviation; set lambda_feat=0 to disable).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from . import layers as L

# VGG19 convolutional config split into the 5 slices (channels per conv).
SLICES = [
    [(3, 64)],                                        # conv1_1
    [(64, 64), 'pool', (64, 128)],                    # conv1_2, pool1, conv2_1
    [(128, 128), 'pool', (128, 256)],                 # conv2_2, pool2, conv3_1
    [(256, 256), (256, 256), (256, 256), 'pool', (256, 512)],  # conv3_2..4, pool3, conv4_1
    [(512, 512), (512, 512), (512, 512), 'pool', (512, 512)],  # conv4_2..4, pool4, conv5_1
]
LOSS_WEIGHTS = [1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0]


def init(key=None, weights_path=None):
    """Build VGG19 params: from converted npz if available, else random."""
    weights_path = weights_path or os.environ.get('DEEPLIIF_VGG19_WEIGHTS')
    if weights_path and os.path.exists(weights_path):
        data = np.load(weights_path)
        params = []
        i = 0
        for sl in SLICES:
            sp = []
            for item in sl:
                if item == 'pool':
                    continue
                sp.append({'w': jnp.asarray(data[f'conv{i}_w']),
                           'b': jnp.asarray(data[f'conv{i}_b'])})
                i += 1
            params.append(sp)
        return params

    if key is None:
        key = jax.random.PRNGKey(19)
    params = []
    for sl in SLICES:
        sp = []
        for item in sl:
            if item == 'pool':
                continue
            cin, cout = item
            key, sub = jax.random.split(key)
            sp.append(L.init_conv(sub, 3, 3, cin, cout, True, 'kaiming', 0.02))
        params.append(sp)
    return params


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')


def features(params, x):
    """x: NHWC in [-1, 1] (network outputs). Returns the 5 slice activations.

    The reference feeds tanh-range tensors straight into torchvision VGG
    without ImageNet renormalization; we match that behavior.
    """
    outs = []
    h = x
    for sp, sl in zip(params, SLICES):
        ci = 0
        for item in sl:
            if item == 'pool':
                h = _maxpool2(h)
            else:
                h = L.relu(L.conv2d(h, sp[ci], 1, 1))
                ci += 1
        outs.append(h)
    return outs


def vgg_loss(params, x, y):
    """Weighted L1 between feature slices (reference networks.py:731-743)."""
    fx = features(params, x)
    fy = features(params, y)
    loss = 0.0
    for w, a, b in zip(LOSS_WEIGHTS, fx, fy):
        loss = loss + w * jnp.abs(a - jax.lax.stop_gradient(b)).mean()
    return loss
