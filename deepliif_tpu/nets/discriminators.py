"""PatchGAN discriminators.

Parity with the reference NLayerDiscriminator / PixelDiscriminator
(/root/reference/deepliif/models/networks.py:618-696). DeepLIIF uses
netD='n_layers' with n_layers_D=4 and conditional input
concat(input, output) -> 6 channels.
"""

from __future__ import annotations

from . import layers as L


def nlayer_init(key, input_nc, ndf=64, n_layers=3, norm='batch',
                init_type='normal', init_gain=0.02):
    use_bias = L.norm_use_bias(norm)
    has_norm = L.norm_has_params(norm)
    keys = iter(L.split_keys(key, 4 * (n_layers + 2)))
    p = {}
    p['conv0'] = L.init_conv(next(keys), 4, 4, input_nc, ndf, True, init_type, init_gain)
    nf_mult = 1
    for n in range(1, n_layers):
        nf_prev, nf_mult = nf_mult, min(2 ** n, 8)
        p[f'conv{n}'] = L.init_conv(next(keys), 4, 4, ndf * nf_prev, ndf * nf_mult,
                                    use_bias, init_type, init_gain)
        p[f'norm{n}'] = L.init_norm(next(keys), ndf * nf_mult, init_type, init_gain) if has_norm else {}
    nf_prev, nf_mult = nf_mult, min(2 ** n_layers, 8)
    p[f'conv{n_layers}'] = L.init_conv(next(keys), 4, 4, ndf * nf_prev, ndf * nf_mult,
                                       use_bias, init_type, init_gain)
    p[f'norm{n_layers}'] = L.init_norm(next(keys), ndf * nf_mult, init_type, init_gain) if has_norm else {}
    p['conv_out'] = L.init_conv(next(keys), 4, 4, ndf * nf_mult, 1, True, init_type, init_gain)
    return p


def nlayer_apply(p, x, *, n_layers=3, norm='batch', dtype=None):
    if dtype is not None:
        x = x.astype(dtype)
    x = L.leaky_relu(L.conv2d(x, p['conv0'], 2, 1), 0.2)
    for n in range(1, n_layers):
        x = L.conv2d(x, p[f'conv{n}'], 2, 1)
        x = L.apply_norm(x, p[f'norm{n}'], norm)
        x = L.leaky_relu(x, 0.2)
    x = L.conv2d(x, p[f'conv{n_layers}'], 1, 1)
    x = L.apply_norm(x, p[f'norm{n_layers}'], norm)
    x = L.leaky_relu(x, 0.2)
    out = L.conv2d(x, p['conv_out'], 1, 1)
    if out.shape[1] == 0 or out.shape[2] == 0:
        raise ValueError(
            f'NLayerDiscriminator(n_layers={n_layers}) patch map is empty for '
            f'this input size; use a larger image (>= {2 ** n_layers} * 4) or '
            f'fewer layers')
    return out


def pixel_init(key, input_nc, ndf=64, norm='batch', init_type='normal', init_gain=0.02):
    use_bias = L.norm_use_bias(norm)
    has_norm = L.norm_has_params(norm)
    keys = iter(L.split_keys(key, 6))
    p = {
        'conv0': L.init_conv(next(keys), 1, 1, input_nc, ndf, True, init_type, init_gain),
        'conv1': L.init_conv(next(keys), 1, 1, ndf, ndf * 2, use_bias, init_type, init_gain),
        'conv2': L.init_conv(next(keys), 1, 1, ndf * 2, 1, use_bias, init_type, init_gain),
    }
    p['norm1'] = L.init_norm(next(keys), ndf * 2, init_type, init_gain) if has_norm else {}
    return p


def pixel_apply(p, x, *, norm='batch', dtype=None):
    if dtype is not None:
        x = x.astype(dtype)
    x = L.leaky_relu(L.conv2d(x, p['conv0'], 1, 0), 0.2)
    x = L.conv2d(x, p['conv1'], 1, 0)
    x = L.apply_norm(x, p['norm1'], norm)
    x = L.leaky_relu(x, 0.2)
    return L.conv2d(x, p['conv2'], 1, 0)
