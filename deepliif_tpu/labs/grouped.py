"""Grouped-convolution ensemble execution.

The vmapped ensemble keeps per-net activations as (N, B, H, W, C) tensors;
with C=64 (ngf) the TPU lane dimension (128) is half empty and layouts pad
2x. This module runs N identical-architecture nets as ONE set of grouped
convolutions instead: activations are (B, H, W, N*C) — full lanes, one
tensor — with ``feature_group_count=N`` keeping the nets independent.

Numerically identical to the vmapped path (same convs, same per-net
batch-stat norms, verified by parity tests); inference-only (dropout off).
The translator->seg handoff needs NO data movement: the translators'
grouped output (B,H,W,M*3) concatenated after the input image IS the seg
stage's grouped input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nets import layers as L

_DN = ('NHWC', 'HWIO', 'NHWC')


def _gw(p):
    """Stacked kernel (N,kh,kw,ci,co) -> grouped kernel (kh,kw,ci,N*co)."""
    w = p['w']
    n, kh, kw, ci, co = w.shape
    return jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(kh, kw, ci, n * co)


def _gb(p):
    if 'b' not in p:
        return None
    return p['b'].reshape(-1)  # (N,co) -> (N*co,)


def gconv(x, p, n, stride=1, padding=0):
    pad = [(padding, padding)] * 2 if isinstance(padding, int) else padding
    out = jax.lax.conv_general_dilated(
        x, _gw(p).astype(x.dtype), (stride, stride), pad,
        dimension_numbers=_DN, feature_group_count=n)
    b = _gb(p)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def gconv_transpose(x, p, n, stride=2, padding=1, output_padding=1):
    k = p['w'].shape[1]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    out = jax.lax.conv_general_dilated(
        x, _gw(p).astype(x.dtype), (1, 1), [(lo, hi), (lo, hi)],
        lhs_dilation=(stride, stride), dimension_numbers=_DN,
        feature_group_count=n)
    b = _gb(p)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def gnorm(x, p, norm_type):
    """Per-net-per-channel norm == channel-wise norm on the grouped tensor.
    Inference-only path: per-sample statistics (see layers.batch_stat_norm)."""
    if norm_type == 'batch':
        return L.batch_stat_norm(x, {'scale': p['scale'].reshape(-1),
                                     'bias': p['bias'].reshape(-1)},
                                 per_sample=True)
    if norm_type == 'instance':
        return L.instance_norm(x)
    return x


def group_concat(a, b, n):
    """Per-group channel concat: (B,H,W,N*c1) + (B,H,W,N*c2) ->
    (B,H,W,N*(c1+c2)) with group g's channels contiguous."""
    B, H, W, _ = a.shape
    a5 = a.reshape(B, H, W, n, -1)
    b5 = b.reshape(B, H, W, n, -1)
    return jnp.concatenate([a5, b5], axis=-1).reshape(B, H, W, -1)


def grouped_resnet_apply(p, x, n, *, n_blocks=9, norm='batch',
                         padding_type='reflect', upsample='convtranspose'):
    """Grouped version of resnet.apply over N stacked nets.
    x: (B,H,W,N*cin) grouped input -> (B,H,W,N*cout)."""
    pad_head = padding_type if padding_type == 'reflect' else 'zero'

    h = L.pad2d(x, 3, pad_head)
    h = gconv(h, p['head_conv'], n, 1, 0)
    h = gnorm(h, p['head_norm'], norm)
    h = L.relu(h)
    for i in range(2):
        h = gconv(h, p[f'down{i}_conv'], n, 2, 1)
        h = gnorm(h, p[f'down{i}_norm'], norm)
        h = L.relu(h)
    res_pad = 0 if padding_type in ('reflect', 'replicate') else 1
    for i in range(n_blocks):
        r = h
        if res_pad == 0:
            r = L.pad2d(r, 1, padding_type)
        r = gconv(r, p[f'res{i}_conv1'], n, 1, res_pad)
        r = gnorm(r, p[f'res{i}_norm1'], norm)
        r = L.relu(r)
        if res_pad == 0:
            r = L.pad2d(r, 1, padding_type)
        r = gconv(r, p[f'res{i}_conv2'], n, 1, res_pad)
        r = gnorm(r, p[f'res{i}_norm2'], norm)
        h = h + r
    for i in range(2):
        if upsample == 'convtranspose':
            h = gconv_transpose(h, p[f'up{i}_conv'], n, 2, 1, 1)
        elif upsample == 'resize_conv':
            h = L.upsample_nearest(h, 2)
            h = L.pad2d(h, 1, 'reflect')
            h = gconv(h, p[f'up{i}_conv'], n, 1, 0)
        else:
            raise NotImplementedError(upsample)
        h = gnorm(h, p[f'up{i}_norm'], norm)
        h = L.relu(h)
    h = L.pad2d(h, 3, pad_head)
    h = gconv(h, p['tail_conv'], n, 1, 0)
    return jnp.tanh(h)


def grouped_unet_apply(p, x, n, *, num_downs, norm='batch'):
    """Grouped version of unet.apply over N stacked nets (inference)."""

    def block(bp, h, depth):
        outermost = depth == 0
        innermost = depth == num_downs - 1
        if outermost:
            d = gconv(h, bp['downconv'], n, 2, 1)
            d = block(bp['sub'], d, depth + 1)
            d = L.relu(d)
            d = gconv_transpose(d, bp['upconv'], n, 2, 1, 0)
            return jnp.tanh(d)
        if innermost:
            d = L.leaky_relu(h, 0.2)
            d = gconv(d, bp['downconv'], n, 2, 1)
            d = L.relu(d)
            d = gconv_transpose(d, bp['upconv'], n, 2, 1, 0)
            d = gnorm(d, bp['upnorm'], norm)
            return group_concat(h, d, n)
        d = L.leaky_relu(h, 0.2)
        d = gconv(d, bp['downconv'], n, 2, 1)
        d = gnorm(d, bp['downnorm'], norm)
        d = block(bp['sub'], d, depth + 1)
        d = L.relu(d)
        d = gconv_transpose(d, bp['upconv'], n, 2, 1, 0)
        d = gnorm(d, bp['upnorm'], norm)
        return group_concat(h, d, n)

    return block(p, x, 0)
