"""Import PyTorch DeepLIIF checkpoints into JAX parameter pytrees.

The reference saves per-net CPU state dicts named ``{epoch}_net_{name}.pth``
(reference base_model.py:190-212) and TorchScript archives ``{name}.pt``
(cli.py:763-830). This module reconstructs the torch Sequential index layout
of each architecture from its config (the same construction order as
reference networks.py) and maps every conv / conv-transpose / norm parameter
onto our NHWC pytrees:

  conv            OIHW        -> HWIO   (transpose 2,3,1,0)
  conv_transpose  (I,O,kh,kw) -> HWIO   (spatial flip + transpose 2,3,0,1)
  norm weight/bias            -> scale/bias (running stats discarded: the
                                 reference disables them at inference)
"""

from __future__ import annotations

import os
import re

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, 'detach') else np.asarray(t)


def conv_from_torch(sd, prefix):
    w = _np(sd[f'{prefix}.weight']).transpose(2, 3, 1, 0)
    p = {'w': np.ascontiguousarray(w)}
    if f'{prefix}.bias' in sd:
        p['b'] = _np(sd[f'{prefix}.bias'])
    return p


def convT_from_torch(sd, prefix):
    w = _np(sd[f'{prefix}.weight'])[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    p = {'w': np.ascontiguousarray(w)}
    if f'{prefix}.bias' in sd:
        p['b'] = _np(sd[f'{prefix}.bias'])
    return p


def norm_from_torch(sd, prefix):
    if f'{prefix}.weight' not in sd:
        return {}
    return {'scale': _np(sd[f'{prefix}.weight']),
            'bias': _np(sd[f'{prefix}.bias'])}


def load_state_dict(path):
    """Load a .pth state dict or extract one from a TorchScript .pt archive."""
    import torch
    if path.endswith('.pt'):
        net = torch.jit.load(path, map_location='cpu')
        return {k: v for k, v in net.state_dict().items()}
    return torch.load(path, map_location='cpu', weights_only=False)


def _strip_module_prefix(sd):
    return { (k[len('module.'):] if k.startswith('module.') else k): v
             for k, v in sd.items() }


# ---------------------------------------------------------------------------
# ResnetGenerator (reference networks.py:357-513)
# ---------------------------------------------------------------------------

def import_resnet_g(sd, n_blocks=9, norm='batch', use_dropout=True,
                    padding_type='reflect', upsample='convtranspose'):
    sd = _strip_module_prefix(sd)
    p = {}
    idx = 0
    idx += 1                               # pad
    p['head_conv'] = conv_from_torch(sd, f'model.{idx}'); idx += 1
    p['head_norm'] = norm_from_torch(sd, f'model.{idx}'); idx += 1
    idx += 1                               # relu
    for i in range(2):
        p[f'down{i}_conv'] = conv_from_torch(sd, f'model.{idx}'); idx += 1
        p[f'down{i}_norm'] = norm_from_torch(sd, f'model.{idx}'); idx += 1
        idx += 1                           # relu
    for i in range(n_blocks):
        base = f'model.{idx}.conv_block'
        j = 0
        if padding_type in ('reflect', 'replicate'):
            j += 1                         # pad
        p[f'res{i}_conv1'] = conv_from_torch(sd, f'{base}.{j}'); j += 1
        p[f'res{i}_norm1'] = norm_from_torch(sd, f'{base}.{j}'); j += 1
        j += 1                             # relu
        if use_dropout:
            j += 1                         # dropout
        if padding_type in ('reflect', 'replicate'):
            j += 1                         # pad
        p[f'res{i}_conv2'] = conv_from_torch(sd, f'{base}.{j}'); j += 1
        p[f'res{i}_norm2'] = norm_from_torch(sd, f'{base}.{j}')
        idx += 1
    for i in range(2):
        if upsample == 'convtranspose':
            p[f'up{i}_conv'] = convT_from_torch(sd, f'model.{idx}'); idx += 1
        elif upsample == 'resize_conv':
            idx += 2                       # upsample, pad
            p[f'up{i}_conv'] = conv_from_torch(sd, f'model.{idx}'); idx += 1
        elif upsample == 'pixel_shuffle':
            p[f'up{i}_conv'] = conv_from_torch(sd, f'model.{idx}'); idx += 1
            idx += 2                       # pixelshuffle, relu
        p[f'up{i}_norm'] = norm_from_torch(sd, f'model.{idx}'); idx += 1
        idx += 1                           # relu
    idx += 1                               # pad
    p['tail_conv'] = conv_from_torch(sd, f'model.{idx}')
    return p


# ---------------------------------------------------------------------------
# UnetGenerator (reference networks.py:516-615)
# ---------------------------------------------------------------------------

def import_unet_g(sd, num_downs, norm='batch', use_dropout=True):
    sd = _strip_module_prefix(sd)

    def block(prefix, depth):
        outermost = depth == 0
        innermost = depth == num_downs - 1
        p = {'sub': None, 'downnorm': {}, 'upnorm': {}}
        if outermost:
            p['downconv'] = conv_from_torch(sd, f'{prefix}.0')
            p['sub'] = block(f'{prefix}.1.model', depth + 1)
            p['upconv'] = convT_from_torch(sd, f'{prefix}.3')
        elif innermost:
            p['downconv'] = conv_from_torch(sd, f'{prefix}.1')
            p['upconv'] = convT_from_torch(sd, f'{prefix}.3')
            p['upnorm'] = norm_from_torch(sd, f'{prefix}.4')
        else:
            p['downconv'] = conv_from_torch(sd, f'{prefix}.1')
            p['downnorm'] = norm_from_torch(sd, f'{prefix}.2')
            p['sub'] = block(f'{prefix}.3.model', depth + 1)
            p['upconv'] = convT_from_torch(sd, f'{prefix}.5')
            p['upnorm'] = norm_from_torch(sd, f'{prefix}.6')
        return p

    return block('model.model', 0)


# ---------------------------------------------------------------------------
# AttU_Net (reference att_unet.py:117-199)
# ---------------------------------------------------------------------------

def import_att_unet(sd):
    sd = _strip_module_prefix(sd)
    p = {}
    for i in range(1, 9):
        p[f'conv{i}'] = conv_from_torch(sd, f'Conv{i}.conv.0')
        if 1 < i < 8:
            p[f'conv{i}_norm'] = norm_from_torch(sd, f'Conv{i}.conv.1')
    for lvl in range(2, 9):
        p[f'up{lvl}'] = convT_from_torch(sd, f'Up{lvl}.up.0')
        p[f'up{lvl}_norm'] = norm_from_torch(sd, f'Up{lvl}.up.1')
    p['up1'] = convT_from_torch(sd, 'Up1.up.0')
    for lvl in range(2, 9):
        p[f'att{lvl}_wg'] = conv_from_torch(sd, f'Att{lvl}.W_g.0')
        p[f'att{lvl}_wg_norm'] = norm_from_torch(sd, f'Att{lvl}.W_g.1')
        p[f'att{lvl}_wx'] = conv_from_torch(sd, f'Att{lvl}.W_x.0')
        p[f'att{lvl}_wx_norm'] = norm_from_torch(sd, f'Att{lvl}.W_x.1')
        p[f'att{lvl}_psi'] = conv_from_torch(sd, f'Att{lvl}.psi.0')
        p[f'att{lvl}_psi_norm'] = norm_from_torch(sd, f'Att{lvl}.psi.1')
    return p


# ---------------------------------------------------------------------------
# NLayerDiscriminator / PixelDiscriminator (reference networks.py:618-696)
# ---------------------------------------------------------------------------

def import_nlayer_d(sd, n_layers=3, norm='batch'):
    sd = _strip_module_prefix(sd)
    p = {}
    idx = 0
    p['conv0'] = conv_from_torch(sd, f'model.{idx}'); idx += 2  # conv, lrelu
    for n in range(1, n_layers + 1):
        p[f'conv{n}'] = conv_from_torch(sd, f'model.{idx}'); idx += 1
        p[f'norm{n}'] = norm_from_torch(sd, f'model.{idx}'); idx += 2  # norm, lrelu
    p['conv_out'] = conv_from_torch(sd, f'model.{idx}')
    return p


def import_pixel_d(sd, norm='batch'):
    sd = _strip_module_prefix(sd)
    return {
        'conv0': conv_from_torch(sd, 'net.0'),
        'conv1': conv_from_torch(sd, 'net.2'),
        'norm1': norm_from_torch(sd, 'net.3'),
        'conv2': conv_from_torch(sd, 'net.5'),
    }


# ---------------------------------------------------------------------------
# generic dispatch + model-dir import
# ---------------------------------------------------------------------------

def import_generator(sd, arch, norm='batch', use_dropout=True,
                     padding_type='reflect', upsample='convtranspose'):
    if arch.startswith('resnet_'):
        n_blocks = int(arch.split('_')[1].replace('blocks', ''))
        return import_resnet_g(sd, n_blocks, norm, use_dropout, padding_type, upsample)
    if arch == 'unet_512_attention':
        return import_att_unet(sd)
    if arch.startswith('unet_'):
        size = int(arch.split('_')[1])
        num_downs = {32: 5, 64: 6, 128: 7, 256: 8, 512: 9}[size]
        return import_unet_g(sd, num_downs, norm, use_dropout)
    raise NotImplementedError(f'import for generator [{arch}] not implemented')


def find_net_file(model_dir, name, epoch='latest'):
    """Locate a net checkpoint: eager {epoch}_net_{name}.pth, else {name}.pt."""
    pth = os.path.join(model_dir, f'{epoch}_net_{name}.pth')
    if os.path.exists(pth):
        return pth
    pt = os.path.join(model_dir, f'{name}.pt')
    if os.path.exists(pt):
        return pt
    return None


def import_deepliif_dir(model_dir, opt, epoch='latest'):
    """Import a reference DeepLIIF model directory into our param pytree.

    Handles both seg-net naming schemes: new GS0..GS4 and legacy G51..G55
    (reference util/util.py:208-269).
    """
    import jax.numpy as jnp
    from ..nets import layers as L

    m = opt.modalities_no
    mod_id_seg = getattr(opt, 'mod_id_seg', 'S') or 'S'
    input_id = int(getattr(opt, 'input_id', 0))

    net_g = getattr(opt, 'netG', getattr(opt, 'net_g', 'resnet_9blocks'))
    if isinstance(net_g, str):
        net_g = [net_g] * m
    net_gs = getattr(opt, 'net_gs', 'unet_512')
    if isinstance(net_gs, str):
        net_gs = [net_gs] * (m + 1)
    norm = getattr(opt, 'norm', 'batch')
    use_dropout = not getattr(opt, 'no_dropout', False)
    padding = getattr(opt, 'padding', 'zero')
    upsample = getattr(opt, 'upsample', 'convtranspose')

    g_list = []
    for i in range(1, m + 1):
        f = find_net_file(model_dir, f'G{i}', epoch)
        if f is None:
            raise FileNotFoundError(f'missing checkpoint for G{i} in {model_dir}')
        g_list.append(import_generator(load_state_dict(f), net_g[i - 1], norm,
                                       use_dropout, padding, upsample))
    params = {}
    params['G'] = (L.tree_stack(_as_jnp(g_list))
                   if len(set(net_g)) == 1 else _as_jnp(g_list))

    if getattr(opt, 'seg_gen', True):
        gs_list = []
        for i in range(m + 1):
            name = f'G{mod_id_seg}{input_id + i}'
            f = find_net_file(model_dir, name, epoch)
            if f is None:
                raise FileNotFoundError(f'missing checkpoint for {name} in {model_dir}')
            # seg generators are built with define_G defaults (reflect/convtranspose)
            gs_list.append(import_generator(load_state_dict(f), net_gs[i], norm,
                                            use_dropout, 'reflect', 'convtranspose'))
        params['GS'] = (L.tree_stack(_as_jnp(gs_list))
                        if len(set(net_gs)) == 1 else _as_jnp(gs_list))
    return params


def _import_named_generators(model_dir, names, archs, norm, use_dropout,
                             padding, upsample, epoch='latest'):
    from ..nets import layers as L
    out = []
    for name, arch in zip(names, archs):
        f = find_net_file(model_dir, name, epoch)
        if f is None:
            raise FileNotFoundError(f'missing checkpoint for {name} in {model_dir}')
        out.append(import_generator(load_state_dict(f), arch, norm,
                                    use_dropout, padding, upsample))
    return (L.tree_stack(_as_jnp(out)) if len(set(archs)) == 1
            else _as_jnp(out))


def import_ext_dir(model_dir, opt, epoch='latest'):
    """Import a DeepLIIFExt model dir: nets G_1..G_m + GS_1..GS_m
    (reference net naming, DeepLIIFExt_model.py:56-71)."""
    m = opt.modalities_no
    net_g = getattr(opt, 'netG', getattr(opt, 'net_g', 'resnet_9blocks'))
    if isinstance(net_g, str):
        net_g = [net_g] * m
    net_gs = getattr(opt, 'net_gs', 'unet_512')
    if isinstance(net_gs, str):
        net_gs = [net_gs] * m
    norm = getattr(opt, 'norm', 'batch')
    dropout = not getattr(opt, 'no_dropout', False)
    params = {'G': _import_named_generators(
        model_dir, [f'G_{i}' for i in range(1, m + 1)], net_g, norm, dropout,
        getattr(opt, 'padding', 'zero'), 'convtranspose', epoch)}
    if getattr(opt, 'seg_gen', True):
        params['GS'] = _import_named_generators(
            model_dir, [f'GS_{i}' for i in range(1, m + 1)], net_gs, norm,
            dropout, 'reflect', 'convtranspose', epoch)
    return params


def import_sdg_dir(model_dir, opt, epoch='latest'):
    m = opt.modalities_no
    net_g = getattr(opt, 'netG', getattr(opt, 'net_g', 'resnet_9blocks'))
    if isinstance(net_g, str):
        net_g = [net_g] * m
    return {'G': _import_named_generators(
        model_dir, [f'G_{i}' for i in range(1, m + 1)], net_g,
        getattr(opt, 'norm', 'batch'), not getattr(opt, 'no_dropout', False),
        getattr(opt, 'padding', 'zero'),
        getattr(opt, 'upsample', 'convtranspose'), epoch)}


def import_cyclegan_dir(model_dir, opt, epoch='latest'):
    """Import GA_i / GB_i generators; only the direction present on disk is
    required (test dirs may ship a single direction)."""
    m = opt.modalities_no
    net_g = getattr(opt, 'netG', getattr(opt, 'net_g', 'resnet_9blocks'))
    if isinstance(net_g, str):
        net_g = [net_g] * m
    norm = getattr(opt, 'norm', 'batch')
    dropout = not getattr(opt, 'no_dropout', False)
    params = {}
    for prefix in ('GA', 'GB'):
        names = [f'{prefix}_{i}' for i in range(1, m + 1)]
        if all(find_net_file(model_dir, n, epoch) for n in names):
            params[prefix] = _import_named_generators(
                model_dir, names, net_g, norm, dropout,
                getattr(opt, 'padding', 'zero'),
                getattr(opt, 'upsample', 'convtranspose'), epoch)
    if not params:
        raise FileNotFoundError(f'no GA_*/GB_* checkpoints in {model_dir}')
    return params


def _as_jnp(tree):
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.asarray, tree)


def convert_vgg19(torch_weights_path, out_npz):
    """Convert a torchvision vgg19 state dict (features.N.weight) to the npz
    layout read by deepliif_tpu.nets.vgg.init."""
    import torch
    sd = torch.load(torch_weights_path, map_location='cpu', weights_only=False)
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]  # first 13 convs
    out = {}
    for i, fi in enumerate(conv_idx):
        out[f'conv{i}_w'] = _np(sd[f'features.{fi}.weight']).transpose(2, 3, 1, 0)
        out[f'conv{i}_b'] = _np(sd[f'features.{fi}.bias'])
    np.savez(out_npz, **out)
    return out_npz


# ---------------------------------------------------------------------------
# Inception-V3 (torchvision layout) for FID / Inception Score
# ---------------------------------------------------------------------------

def _bconv_from_torch(sd, prefix):
    """BasicConv2d: conv (no bias) + BatchNorm2d with RUNNING stats (eval
    mode keeps them, unlike the DeepLIIF norm quirk)."""
    return {
        'w': np.ascontiguousarray(
            _np(sd[f'{prefix}.conv.weight']).transpose(2, 3, 1, 0)),
        's': _np(sd[f'{prefix}.bn.weight']),
        'b': _np(sd[f'{prefix}.bn.bias']),
        'm': _np(sd[f'{prefix}.bn.running_mean']),
        'v': _np(sd[f'{prefix}.bn.running_var']),
    }


_INCEPTION_BRANCHES = {
    'Mixed_5b': ['branch1x1', 'branch5x5_1', 'branch5x5_2', 'branch3x3dbl_1',
                 'branch3x3dbl_2', 'branch3x3dbl_3', 'branch_pool'],
    'Mixed_6a': ['branch3x3', 'branch3x3dbl_1', 'branch3x3dbl_2',
                 'branch3x3dbl_3'],
    'Mixed_6b': ['branch1x1', 'branch7x7_1', 'branch7x7_2', 'branch7x7_3',
                 'branch7x7dbl_1', 'branch7x7dbl_2', 'branch7x7dbl_3',
                 'branch7x7dbl_4', 'branch7x7dbl_5', 'branch_pool'],
    'Mixed_7a': ['branch3x3_1', 'branch3x3_2', 'branch7x7x3_1',
                 'branch7x7x3_2', 'branch7x7x3_3', 'branch7x7x3_4'],
    'Mixed_7b': ['branch1x1', 'branch3x3_1', 'branch3x3_2a', 'branch3x3_2b',
                 'branch3x3dbl_1', 'branch3x3dbl_2', 'branch3x3dbl_3a',
                 'branch3x3dbl_3b', 'branch_pool'],
}
_INCEPTION_BRANCHES['Mixed_5c'] = _INCEPTION_BRANCHES['Mixed_5b']
_INCEPTION_BRANCHES['Mixed_5d'] = _INCEPTION_BRANCHES['Mixed_5b']
_INCEPTION_BRANCHES['Mixed_6c'] = _INCEPTION_BRANCHES['Mixed_6b']
_INCEPTION_BRANCHES['Mixed_6d'] = _INCEPTION_BRANCHES['Mixed_6b']
_INCEPTION_BRANCHES['Mixed_6e'] = _INCEPTION_BRANCHES['Mixed_6b']
_INCEPTION_BRANCHES['Mixed_7c'] = _INCEPTION_BRANCHES['Mixed_7b']


def import_inception_v3(sd):
    """torchvision ``inception_v3`` state dict -> stats.inception pytree
    (AuxLogits ignored; fc kept for Inception Score logits)."""
    sd = _strip_module_prefix(sd)
    p = {}
    for stem in ('Conv2d_1a_3x3', 'Conv2d_2a_3x3', 'Conv2d_2b_3x3',
                 'Conv2d_3b_1x1', 'Conv2d_4a_3x3'):
        p[stem] = _bconv_from_torch(sd, stem)
    for block, branches in _INCEPTION_BRANCHES.items():
        p[block] = {br: _bconv_from_torch(sd, f'{block}.{br}')
                    for br in branches}
    if 'fc.weight' in sd:
        p['fc'] = {'w': np.ascontiguousarray(_np(sd['fc.weight']).T),
                   'b': _np(sd['fc.bias'])}
    return p


def convert_inception_v3(torch_weights_path, out_npz):
    """Convert torchvision inception_v3 weights (.pth) to an npz loadable by
    stats.load_inception_npz — the one-download step to paper-comparable
    FID/IS (reference DeepLIIF_Statistics/fid.py uses Inception pool3)."""
    import torch
    sd = torch.load(torch_weights_path, map_location='cpu', weights_only=False)
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    p = import_inception_v3(sd)
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict) and 'w' in node and not isinstance(
                node['w'], dict):
            for k, v in node.items():
                flat[f'{prefix}.{k}'] = v
        else:
            for k, v in node.items():
                walk(f'{prefix}.{k}' if prefix else k, v)

    walk('', p)
    np.savez(out_npz, **flat)
    return out_npz
