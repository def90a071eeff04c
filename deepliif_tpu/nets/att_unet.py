"""Attention U-Net (8-level), parity with the reference AttU_Net
(/root/reference/deepliif/models/att_unet.py:31-199).

Encoder: 8 conv blocks (4x4 s2 p1, bias=True). The outermost uses
LeakyReLU(0.2) with no norm; the innermost ReLU with no norm; middle blocks
conv-BN-LeakyReLU. Decoder: transposed convs 4x4 s2 p1 (BN+ReLU; outermost
tanh, bias=True) with additive attention gates (1x1 convs + BN, sigmoid) on
the skip path before concat(skip, up).

Note the reference always uses BatchNorm2d here regardless of the ``norm``
option; we reproduce that (batch-statistics norm).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import layers as L

ENC_CH = [64, 128, 256, 512, 512, 512, 512, 512]
DEC_CH = [512, 512, 512, 512, 256, 128, 64]      # Up8..Up2 outputs
ATT_INT = [512, 512, 512, 512, 128, 64, 32]      # F_int for Att8..Att2


def init(key, img_ch=3, output_ch=3, init_type='normal', init_gain=0.02):
    keys = iter(L.split_keys(key, 128))
    p = {}
    cin = img_ch
    for i, cout in enumerate(ENC_CH):
        p[f'conv{i+1}'] = L.init_conv(next(keys), 4, 4, cin, cout, True, init_type, init_gain)
        if 0 < i < len(ENC_CH) - 1:
            p[f'conv{i+1}_norm'] = L.init_norm(next(keys), cout, init_type, init_gain)
        cin = cout

    # Up8 (innermost): ConvTranspose2d(512, 512, bias=False) + BN + ReLU
    p['up8'] = L.init_conv(next(keys), 4, 4, 512, 512, False, init_type, init_gain)
    p['up8_norm'] = L.init_norm(next(keys), 512, init_type, init_gain)
    # Up7..Up2 (middle): ConvTranspose2d(ch_in*2, ch_out, bias=False) + BN + ReLU
    ch_ins = [512, 512, 512, 512, 256, 128]
    ch_outs = [512, 512, 512, 256, 128, 64]
    for idx, (ci, co) in enumerate(zip(ch_ins, ch_outs)):
        lvl = 7 - idx
        p[f'up{lvl}'] = L.init_conv(next(keys), 4, 4, ci * 2, co, False, init_type, init_gain)
        p[f'up{lvl}_norm'] = L.init_norm(next(keys), co, init_type, init_gain)
    # Up1 (outermost): ConvTranspose2d(64*2, output_ch, bias=True) + Tanh
    p['up1'] = L.init_conv(next(keys), 4, 4, 128, output_ch, True, init_type, init_gain)

    # Attention blocks Att8..Att2: F_g = F_l = decoder ch, 1x1 convs + BN
    f_gl = [512, 512, 512, 512, 256, 128, 64]
    for idx, (fg, fi) in enumerate(zip(f_gl, ATT_INT)):
        lvl = 8 - idx
        p[f'att{lvl}_wg'] = L.init_conv(next(keys), 1, 1, fg, fi, True, init_type, init_gain)
        p[f'att{lvl}_wg_norm'] = L.init_norm(next(keys), fi, init_type, init_gain)
        p[f'att{lvl}_wx'] = L.init_conv(next(keys), 1, 1, fg, fi, True, init_type, init_gain)
        p[f'att{lvl}_wx_norm'] = L.init_norm(next(keys), fi, init_type, init_gain)
        p[f'att{lvl}_psi'] = L.init_conv(next(keys), 1, 1, fi, 1, True, init_type, init_gain)
        p[f'att{lvl}_psi_norm'] = L.init_norm(next(keys), 1, init_type, init_gain)
    return p


def _attention(p, lvl, g, x, ps):
    g1 = L.batch_stat_norm(L.conv2d(g, p[f'att{lvl}_wg'], 1, 0), p[f'att{lvl}_wg_norm'], per_sample=ps)
    x1 = L.batch_stat_norm(L.conv2d(x, p[f'att{lvl}_wx'], 1, 0), p[f'att{lvl}_wx_norm'], per_sample=ps)
    psi = L.relu(g1 + x1)
    psi = L.batch_stat_norm(L.conv2d(psi, p[f'att{lvl}_psi'], 1, 0), p[f'att{lvl}_psi_norm'], per_sample=ps)
    psi = 1.0 / (1.0 + jnp.exp(-psi))
    return x * psi


def apply(p, x, *, train=False, rng=None, dtype=None):
    ps = not train  # per-sample stats at inference (see layers.batch_stat_norm)
    if dtype is not None:
        x = x.astype(dtype)
    enc = []
    h = x
    for i in range(8):
        h = L.conv2d(h, p[f'conv{i+1}'], 2, 1)
        if 0 < i < 7:
            h = L.batch_stat_norm(h, p[f'conv{i+1}_norm'], per_sample=ps)
            h = L.leaky_relu(h, 0.2)
        elif i == 0:
            h = L.leaky_relu(h, 0.2)
        else:  # innermost
            h = L.relu(h)
        enc.append(h)

    d = L.conv_transpose2d(enc[7], p['up8'], 2, 1, 0)
    d = L.relu(L.batch_stat_norm(d, p['up8_norm'], per_sample=ps))
    skip = _attention(p, 8, d, enc[6], ps)
    d = jnp.concatenate([skip, d], axis=-1)

    for lvl, skip_i in zip(range(7, 1, -1), range(5, -1, -1)):
        d = L.conv_transpose2d(d, p[f'up{lvl}'], 2, 1, 0)
        d = L.relu(L.batch_stat_norm(d, p[f'up{lvl}_norm'], per_sample=ps))
        skip = _attention(p, lvl, d, enc[skip_i], ps)
        d = jnp.concatenate([skip, d], axis=-1)

    d = L.conv_transpose2d(d, p['up1'], 2, 1, 0)
    return jnp.tanh(d)
