"""Fused int8 Pallas resblock kernel: parity with a pure-XLA reference of
the same contract (static quantize -> int8 conv -> dequant), interpret
mode on CPU. The integer contraction is exact, so the only tolerated
drift is f32 summation order in the stats epilogue."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepliif_tpu.ops import fused_resblock as FR

_DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                     ('NHWC', 'HWIO', 'NHWC'))


def _quant_w(rng, c):
    w = rng.normal(0, 0.02, (3, 3, c, c)).astype(np.float32)
    s = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    q = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s.astype(np.float32))


def _ref_conv_int8(x, w_q, deq, inv_a, padding, in_scale=None, in_bias=None,
                   in_relu=False):
    """The conv3x3_stats_int8 contract in plain XLA ops."""
    u = x
    if in_scale is not None:
        u = u * in_scale[:, None, None].astype(u.dtype) \
            + in_bias[:, None, None].astype(u.dtype)
    if in_relu:
        u = jnp.maximum(u, 0)
    q = jnp.clip(jnp.round(u * jnp.float32(inv_a).astype(u.dtype)),
                 -127, 127).astype(jnp.int8)
    if padding == 'reflect':
        qp = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
    else:
        qp = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y32 = jax.lax.conv_general_dilated(qp, w_q, (1, 1), 'VALID',
                                       dimension_numbers=_DN,
                                       preferred_element_type=jnp.int32)
    yf = y32.astype(jnp.float32) * deq
    st = jnp.stack([yf.sum(axis=(1, 2)), (yf * yf).sum(axis=(1, 2))], axis=1)
    return yf.astype(x.dtype), st


@pytest.mark.parametrize('padding', ['reflect', 'zero'])
def test_conv3x3_stats_int8_matches_reference(padding):
    rng = np.random.default_rng(0)
    c = 8
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 16, c)).astype(np.float32))
    w_q, w_s = _quant_w(rng, c)
    a = np.float32(np.abs(np.asarray(x)).max() / 127.0)
    sc = jnp.asarray(1 + 0.05 * rng.normal(0, 1, (2, c)).astype(np.float32))
    bi = jnp.asarray(0.02 * rng.normal(0, 1, (2, c)).astype(np.float32))

    y, st = FR.conv3x3_stats_int8(x, w_q, a * w_s, 1.0 / a, padding=padding,
                                  in_scale=sc, in_bias=bi, in_relu=True,
                                  interpret=True)
    yr, str_ = _ref_conv_int8(x, w_q, a * w_s, 1.0 / a, padding,
                              in_scale=sc, in_bias=bi, in_relu=True)
    assert float(jnp.abs(y - yr).max()) < 1e-6
    assert float(jnp.abs(st - str_).max()) < 1e-3


def test_conv3x3_stats_int8_no_affine():
    rng = np.random.default_rng(1)
    c = 8
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 16, c)).astype(np.float32))
    w_q, w_s = _quant_w(rng, c)
    a = np.float32(np.abs(np.asarray(x)).max() / 127.0)
    y, st = FR.conv3x3_stats_int8(x, w_q, a * w_s, 1.0 / a,
                                  padding='zero', interpret=True)
    yr, str_ = _ref_conv_int8(x, w_q, a * w_s, 1.0 / a, 'zero')
    assert float(jnp.abs(y - yr).max()) < 1e-6
    assert float(jnp.abs(st - str_).max()) < 1e-3


def _int8_blocks(rng, n, c, act_hint=1.0):
    out = []
    for _ in range(n):
        w1q, w1s = _quant_w(rng, c)
        w2q, w2s = _quant_w(rng, c)
        out.append({
            'w1q': w1q, 'w1s': w1s, 'a1': np.float32(act_hint / 127.0),
            'norm1': {'scale': jnp.asarray(1 + 0.02 * rng.normal(0, 1, (c,)).astype(np.float32)),
                      'bias': jnp.asarray(0.01 * rng.normal(0, 1, (c,)).astype(np.float32))},
            'w2q': w2q, 'w2s': w2s, 'a2': np.float32(act_hint / 127.0),
            'norm2': {'scale': jnp.asarray(1 + 0.02 * rng.normal(0, 1, (c,)).astype(np.float32)),
                      'bias': jnp.asarray(0.01 * rng.normal(0, 1, (c,)).astype(np.float32))},
        })
    return out


def _ref_chain_int8(x, blocks, padding):
    s_n, h, w_n, _ = x.shape
    for b in blocks:
        h1, st1 = _ref_conv_int8(x, b['w1q'], jnp.float32(b['a1']) * b['w1s'],
                                 1.0 / float(b['a1']), padding)
        sc1, bi1 = FR.finalize_norm(st1, b['norm1'], h, w_n)
        h2, st2 = _ref_conv_int8(h1, b['w2q'], jnp.float32(b['a2']) * b['w2s'],
                                 1.0 / float(b['a2']), padding,
                                 in_scale=sc1, in_bias=bi1, in_relu=True)
        sc2, bi2 = FR.finalize_norm(st2, b['norm2'], h, w_n)
        x = x + (h2 * sc2[:, None, None].astype(h2.dtype)
                 + bi2[:, None, None].astype(h2.dtype))
    return x


@pytest.mark.parametrize('padding', ['reflect', 'zero'])
def test_resblock_chain_int8_matches_reference(padding):
    rng = np.random.default_rng(2)
    c = 8
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 16, c)).astype(np.float32))
    blocks = _int8_blocks(rng, 2, c, act_hint=float(jnp.abs(x).max()))
    ref = _ref_chain_int8(x, blocks, padding)
    fused = FR.resblock_chain_int8(x, blocks, padding=padding,
                                   interpret=True)
    assert float(jnp.abs(ref - fused).max()) < 1e-4


def test_resblock_chain_int8_tracks_float_chain():
    """With fine quantization (generous activation scale headroom), the
    int8 chain approximates the float chain — guards against scale/dequant
    wiring mistakes that exact-parity tests against the same contract
    would not catch."""
    rng = np.random.default_rng(3)
    c = 8
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, c)).astype(np.float32))
    blocks_f, blocks_q = [], []
    for _ in range(1):
        w1 = rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32)
        w2 = rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32)
        n1 = {'scale': jnp.ones((c,), jnp.float32),
              'bias': jnp.zeros((c,), jnp.float32)}
        n2 = {'scale': jnp.ones((c,), jnp.float32),
              'bias': jnp.zeros((c,), jnp.float32)}
        blocks_f.append({'w1': jnp.asarray(w1), 'norm1': n1,
                         'w2': jnp.asarray(w2), 'norm2': n2})
        s1 = np.maximum(np.abs(w1).max(axis=(0, 1, 2)) / 127.0, 1e-12)
        s2 = np.maximum(np.abs(w2).max(axis=(0, 1, 2)) / 127.0, 1e-12)
        blocks_q.append({
            'w1q': jnp.asarray(np.clip(np.rint(w1 / s1), -127, 127).astype(np.int8)),
            'w1s': jnp.asarray(s1.astype(np.float32)),
            'a1': np.float32(float(jnp.abs(x).max()) / 127.0),
            'norm1': n1,
            'w2q': jnp.asarray(np.clip(np.rint(w2 / s2), -127, 127).astype(np.int8)),
            'w2s': jnp.asarray(s2.astype(np.float32)),
            'a2': np.float32(4.0 / 127.0),
            'norm2': n2,
        })
    yf = FR.resblock_chain(x, blocks_f, padding='zero', interpret=True)
    yq = FR.resblock_chain_int8(x, blocks_q, padding='zero', interpret=True)
    err = float(jnp.abs(yf - yq).max())
    assert err < 0.15, err


def test_generator_forward_fused_int8_parity():
    """quant_int8 + static scales: DEEPLIIF_FUSED=1 routes the resblocks
    through the int8 Pallas kernel; outputs track the unfused XLA int8
    ensemble (identical quantization lattice; only norm-affine rounding
    can flip a bucket)."""
    import os
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import layers as L

    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=32, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3), padding_type='zero',
                       quant_int8=True)
    params = dl.init_params(jax.random.PRNGKey(0), d,
                            with_discriminators=False)
    params = L.quantize_conv_tree_int8(params, act_scales=4.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    os.environ['DEEPLIIF_FUSED'] = '1'
    try:
        assert dl._translators_fused(x, d, params['G'])
        m1, s1 = dl.generator_forward(params, x, d)
    finally:
        os.environ.pop('DEEPLIIF_FUSED', None)
    os.environ['DEEPLIIF_FUSED'] = '0'
    try:
        m0, s0 = dl.generator_forward(params, x, d)
    finally:
        os.environ.pop('DEEPLIIF_FUSED', None)
    assert float(jnp.abs(m1 - m0).max()) < 0.05
    assert float(jnp.abs(s1 - s0).max()) < 0.05


def test_dynamic_int8_does_not_engage_fused():
    """Uncalibrated (dynamic-scale) int8 params keep the unfused XLA path:
    the fused int8 kernel needs static scales."""
    import os
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import layers as L

    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=32, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3), padding_type='zero',
                       quant_int8=True)
    params = dl.init_params(jax.random.PRNGKey(0), d,
                            with_discriminators=False)
    params_dyn = L.quantize_conv_tree_int8(params)  # no act_scales
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    os.environ['DEEPLIIF_FUSED'] = '1'
    try:
        assert not dl._translators_fused(x, d, params_dyn['G'])
    finally:
        os.environ.pop('DEEPLIIF_FUSED', None)


def test_int8_scope_resblocks_quantizes_only_resblock_convs():
    """DEEPLIIF_INT8_SCOPE=resblocks confines quantization to the trunk
    convs the fused kernel runs — all other convs keep the float path, so
    the program carries no XLA int8/int32 HBM temps."""
    from deepliif_tpu.nets import layers as L
    from deepliif_tpu.nets import resnet

    p = resnet.init(jax.random.PRNGKey(0), 3, 3, ngf=32, n_blocks=2,
                    norm='batch')
    q = L.quantize_conv_tree_int8(p, act_scales=2.0, scope='resblocks')
    for i in range(2):
        for j in (1, 2):
            assert 'w_q' in q[f'res{i}_conv{j}'] and 'a_s' in q[f'res{i}_conv{j}']
    for name in ('down0_conv', 'down1_conv', 'up0_conv', 'up1_conv',
                 'head_conv', 'tail_conv'):
        assert 'w_q' not in q[name], name
    # default scope still quantizes the interior stage convs
    q_all = L.quantize_conv_tree_int8(p, act_scales=2.0)
    assert 'w_q' in q_all['down1_conv']


def test_fused_int8_kill_switch_disables_fused_path(monkeypatch):
    """DEEPLIIF_FUSED_INT8=0 must route calibrated int8 back to the
    unfused XLA int8 path — NOT through the float fused kernel (the gate
    is shared between resnet.apply and _translators_fused)."""
    import os
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import layers as L, resnet

    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=32, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3), padding_type='zero',
                       quant_int8=True)
    params = dl.init_params(jax.random.PRNGKey(0), d,
                            with_discriminators=False)
    params = L.quantize_conv_tree_int8(params, act_scales=4.0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    monkeypatch.setenv('DEEPLIIF_FUSED', '1')
    assert dl._translators_fused(x, d, params['G'])
    assert resnet.int8_chain_ready(
        jax.tree_util.tree_map(lambda a: a[0], params['G']), 6)
    monkeypatch.setenv('DEEPLIIF_FUSED_INT8', '0')
    assert not dl._translators_fused(x, d, params['G'])
    assert not resnet.int8_chain_ready(
        jax.tree_util.tree_map(lambda a: a[0], params['G']), 6)
