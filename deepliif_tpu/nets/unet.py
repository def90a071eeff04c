"""U-Net generator with skip connections.

Parity with the reference UnetGenerator / UnetSkipConnectionBlock
(/root/reference/deepliif/models/networks.py:516-615): recursive
encoder-decoder, 4x4 stride-2 convs down, 4x4 stride-2 transposed convs up,
LeakyReLU(0.2) before downconvs, ReLU before upconvs, skip = concat(x, up(x))
along channels, tanh output. num_downs 5..9 -> unet_32..unet_512. Dropout on
the intermediate ngf*8 blocks when enabled.

Params are a nested dict mirroring the recursion:
  {'downconv', 'downnorm', 'upconv', 'upnorm', 'sub'}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L


def _init_block(keys, outer_nc, inner_nc, input_nc, sub, outermost, innermost,
                norm, init_type, init_gain):
    use_bias = L.norm_use_bias(norm)
    has_norm = L.norm_has_params(norm)
    if input_nc is None:
        input_nc = outer_nc
    p = {'sub': sub}
    p['downconv'] = L.init_conv(next(keys), 4, 4, input_nc, inner_nc, use_bias,
                                init_type, init_gain)
    if outermost:
        p['upconv'] = L.init_conv(next(keys), 4, 4, inner_nc * 2, outer_nc, True,
                                  init_type, init_gain)
        p['downnorm'] = {}
        p['upnorm'] = {}
    elif innermost:
        p['upconv'] = L.init_conv(next(keys), 4, 4, inner_nc, outer_nc, use_bias,
                                  init_type, init_gain)
        p['downnorm'] = {}
        p['upnorm'] = L.init_norm(next(keys), outer_nc, init_type, init_gain) if has_norm else {}
    else:
        p['upconv'] = L.init_conv(next(keys), 4, 4, inner_nc * 2, outer_nc, use_bias,
                                  init_type, init_gain)
        p['downnorm'] = L.init_norm(next(keys), inner_nc, init_type, init_gain) if has_norm else {}
        p['upnorm'] = L.init_norm(next(keys), outer_nc, init_type, init_gain) if has_norm else {}
    return p


def init(key, input_nc, output_nc, num_downs, ngf=64, norm='batch',
         use_dropout=True, init_type='normal', init_gain=0.02):
    keys = iter(L.split_keys(key, 8 * num_downs))
    blk = _init_block(keys, ngf * 8, ngf * 8, None, None, False, True,
                      norm, init_type, init_gain)
    for _ in range(num_downs - 5):
        blk = _init_block(keys, ngf * 8, ngf * 8, None, blk, False, False,
                          norm, init_type, init_gain)
    blk = _init_block(keys, ngf * 4, ngf * 8, None, blk, False, False, norm, init_type, init_gain)
    blk = _init_block(keys, ngf * 2, ngf * 4, None, blk, False, False, norm, init_type, init_gain)
    blk = _init_block(keys, ngf, ngf * 2, None, blk, False, False, norm, init_type, init_gain)
    return _init_block(keys, output_nc, ngf, input_nc, blk, True, False,
                       norm, init_type, init_gain)


def _apply_block(p, x, depth, num_downs, norm, use_dropout, train, rngs):
    """depth 0 = outermost."""
    outermost = depth == 0
    innermost = depth == num_downs - 1
    if outermost:
        h = L.conv2d(x, p['downconv'], 2, 1)
        h = _apply_block(p['sub'], h, depth + 1, num_downs, norm, use_dropout, train, rngs)
        h = L.relu(h)
        if not train and L.ct_s2d_applicable(h.shape[1], h.shape[2],
                                             p['upconv']['w'].shape):
            # tiny-cout up-conv cannot fill the MXU lanes; see layers
            h = L.conv_transpose2d_s2d(h, p['upconv'])
        else:
            h = L.conv_transpose2d(h, p['upconv'], 2, 1, 0)
        return jnp.tanh(h)
    if innermost:
        h = L.leaky_relu(x, 0.2)
        h = L.conv2d(h, p['downconv'], 2, 1)
        h = L.relu(h)
        h = L.conv_transpose2d(h, p['upconv'], 2, 1, 0)
        h = L.apply_norm(h, p['upnorm'], norm, train)
        return jnp.concatenate([x, h], axis=-1)
    h = L.leaky_relu(x, 0.2)
    h = L.conv2d(h, p['downconv'], 2, 1)
    h = L.apply_norm(h, p['downnorm'], norm, train)
    h = _apply_block(p['sub'], h, depth + 1, num_downs, norm, use_dropout, train, rngs)
    h = L.relu(h)
    h = L.conv_transpose2d(h, p['upconv'], 2, 1, 0)
    h = L.apply_norm(h, p['upnorm'], norm, train)
    # dropout only on the intermediate ngf*8 blocks (reference networks.py:
    # 535-536, 604-605). Construction order outer->inner is: outermost(0),
    # ngf(1), ngf*2(2), ngf*4(3), then the (num_downs-5) intermediate ngf*8
    # blocks at depths 4 .. num_downs-2, innermost(num_downs-1).
    if use_dropout and 4 <= depth <= num_downs - 2:
        h = L.dropout(h, rngs[depth] if rngs is not None else None, 0.5, train)
    return jnp.concatenate([x, h], axis=-1)


def apply(p, x, *, num_downs, norm='batch', use_dropout=True,
          train=False, rng=None, dtype=None):
    if dtype is not None:
        x = x.astype(dtype)
    rngs = None
    if train and use_dropout and rng is not None:
        rngs = list(jax.random.split(rng, num_downs))
    return _apply_block(p, x, 0, num_downs, norm, use_dropout, train, rngs)
