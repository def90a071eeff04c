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
    # chain contract: w*s is the COMPLETE dequant (act scale folded in),
    # a* only quantizes the activation (layers.quantize_conv_tree_int8)
    a = np.float32(act_hint / 127.0)
    out = []
    for _ in range(n):
        w1q, w1s = _quant_w(rng, c)
        w2q, w2s = _quant_w(rng, c)
        out.append({
            'w1q': w1q, 'w1s': a * w1s, 'a1': a,
            'norm1': {'scale': jnp.asarray(1 + 0.02 * rng.normal(0, 1, (c,)).astype(np.float32)),
                      'bias': jnp.asarray(0.01 * rng.normal(0, 1, (c,)).astype(np.float32))},
            'w2q': w2q, 'w2s': a * w2s, 'a2': a,
            'norm2': {'scale': jnp.asarray(1 + 0.02 * rng.normal(0, 1, (c,)).astype(np.float32)),
                      'bias': jnp.asarray(0.01 * rng.normal(0, 1, (c,)).astype(np.float32))},
        })
    return out


def _ref_chain_int8(x, blocks, padding):
    s_n, h, w_n, _ = x.shape
    for b in blocks:
        h1, st1 = _ref_conv_int8(x, b['w1q'], b['w1s'],
                                 1.0 / float(b['a1']), padding)
        sc1, bi1 = FR.finalize_norm(st1, b['norm1'], h, w_n)
        h2, st2 = _ref_conv_int8(h1, b['w2q'], b['w2s'],
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
        a1 = np.float32(float(jnp.abs(x).max()) / 127.0)
        a2 = np.float32(4.0 / 127.0)
        blocks_q.append({
            'w1q': jnp.asarray(np.clip(np.rint(w1 / s1), -127, 127).astype(np.int8)),
            'w1s': jnp.asarray((a1 * s1).astype(np.float32)),
            'a1': a1,
            'norm1': n1,
            'w2q': jnp.asarray(np.clip(np.rint(w2 / s2), -127, 127).astype(np.int8)),
            'w2s': jnp.asarray((a2 * s2).astype(np.float32)),
            'a2': a2,
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


def test_uncalibrated_int8_engages_fused_dynamic(monkeypatch):
    """Uncalibrated int8 params engage the fused chain in per-chunk
    DYNAMIC mode (the round-5 default); DEEPLIIF_INT8_DYN=0 routes them
    back to the unfused XLA path."""
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import layers as L, resnet

    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=32, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3), padding_type='zero',
                       quant_int8=True)
    params = dl.init_params(jax.random.PRNGKey(0), d,
                            with_discriminators=False)
    params_dyn = L.quantize_conv_tree_int8(params)  # no act_scales
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    monkeypatch.setenv('DEEPLIIF_FUSED', '1')
    assert dl._translators_fused(x, d, params_dyn['G'])
    assert resnet.int8_chain_mode(
        jax.tree_util.tree_map(lambda a: a[0], params_dyn['G']),
        6) == 'dynamic'
    monkeypatch.setenv('DEEPLIIF_INT8_DYN', '0')
    assert not dl._translators_fused(x, d, params_dyn['G'])


def test_generator_forward_fused_int8_dynamic_tracks_f32(monkeypatch):
    """End-to-end: uncalibrated int8 through the fused DYNAMIC chain
    tracks the float forward at least as closely as the static chain
    (whose scale must cover the whole calibration range)."""
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import layers as L

    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=32, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3), padding_type='zero',
                       quant_int8=True)
    params = dl.init_params(jax.random.PRNGKey(0), d,
                            with_discriminators=False)
    import dataclasses
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    m_f32, s_f32 = dl.generator_forward(
        params, x, dataclasses.replace(d, quant_int8=False))

    params_dyn = L.quantize_conv_tree_int8(params)
    monkeypatch.setenv('DEEPLIIF_FUSED', '1')
    assert dl._translators_fused(x, d, params_dyn['G'])
    m_dyn, s_dyn = dl.generator_forward(params_dyn, x, d)

    scales = dl.calibrate_act_scales(params, x, d, per_channel=False)
    params_st = L.quantize_conv_tree_int8(params, act_scales=scales)
    m_st, s_st = dl.generator_forward(params_st, x, d)

    e_dyn = float(jnp.abs(m_dyn - m_f32).mean())
    e_st = float(jnp.abs(m_st - m_f32).mean())
    assert e_dyn < 0.02, e_dyn
    assert e_dyn <= e_st * 1.1, (e_dyn, e_st)


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


@pytest.mark.parametrize('padding', ['reflect', 'zero'])
def test_conv3x3_stats_int8_per_channel_inv_a(padding):
    """Per-input-channel activation scales: inv_a as a (C,) vector must
    quantize each lane by its own scale (round-5 per-channel calibration)."""
    rng = np.random.default_rng(7)
    c = 8
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 16, c)).astype(np.float32))
    w_q, w_s = _quant_w(rng, c)
    a_vec = np.maximum(np.abs(np.asarray(x)).max(axis=(0, 1, 2)) / 127.0,
                       1e-12).astype(np.float32)
    # folded dequant: quantize w * a_ci per output channel
    # (here w_q/w_s came from unfolded w, so emulate by scaling the ref conv
    # with the same w_q and a deq that matches: conv(q_c, w_q) * w_s only
    # approximates conv(x, w) when w was folded; for a pure wiring test we
    # just check the kernel computes clip(round(u * inv_a)) per channel.)
    inv_a = (1.0 / a_vec).astype(np.float32)
    deq = w_s  # arbitrary per-output scale; wiring test

    y, st = FR.conv3x3_stats_int8(x, w_q, deq, inv_a, padding=padding,
                                  interpret=True)

    # XLA reference with per-channel quantization
    q = jnp.clip(jnp.round(x * jnp.asarray(inv_a)), -127, 127).astype(jnp.int8)
    if padding == 'reflect':
        qp = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
    else:
        qp = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y32 = jax.lax.conv_general_dilated(qp, w_q, (1, 1), 'VALID',
                                       dimension_numbers=_DN,
                                       preferred_element_type=jnp.int32)
    yr = (y32.astype(jnp.float32) * deq).astype(x.dtype)
    assert float(jnp.abs(y - yr).max()) < 1e-6


def test_quantize_tree_per_channel_scales_fold_into_weights():
    """Per-channel act_scales: 'w_s' must carry the folded dequant (so
    int8 conv * w_s ~= float conv) and 'a_s' the (cin,) quantize scale."""
    from deepliif_tpu.nets import layers as L

    rng = np.random.default_rng(0)
    c = 16
    p = {'conv': {'w': jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c))
                                   .astype(np.float32)),
                  'b': jnp.zeros((c,), jnp.float32)}}
    # skewed per-channel input ranges: channel j spans ~ (j+1)/4
    chan_range = (np.arange(c, dtype=np.float32) + 1.0) / 4.0
    x = jnp.asarray((rng.uniform(-1, 1, (2, 16, 16, c)).astype(np.float32)
                     * chan_range))
    scales = {'conv': np.abs(np.asarray(x)).max(axis=(0, 1, 2))}
    q = L.quantize_conv_tree_int8(p, act_scales=scales)
    assert q['conv']['a_s'].shape == (c,)
    y_int8 = L.conv2d(x, q['conv'], 1, 1)
    y_f32 = L.conv2d(x, p['conv'], 1, 1)
    err_pc = float(jnp.abs(y_int8 - y_f32).max())
    # wiring correctness only: folding per-channel act scales into the
    # weights trades activation error for weight-lattice error, so
    # accuracy vs per-tensor is a wash on iid weights (measured,
    # experiments/measure_int8_calib.py) — the fidelity lever is the
    # per-chunk DYNAMIC kernel instead
    assert err_pc < 0.05, err_pc


def test_generator_forward_fused_int8_parity_per_channel():
    """Calibrated per-channel scales through the real calibrate/quantize
    pipeline: fused Pallas chain matches the unfused XLA int8 ensemble."""
    import os
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import layers as L

    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=32, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3), padding_type='zero',
                       quant_int8=True)
    params = dl.init_params(jax.random.PRNGKey(0), d,
                            with_discriminators=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    scales = dl.calibrate_act_scales(params, x, d)
    assert any(np.asarray(v).ndim == 1 for v in scales.values())
    qparams = L.quantize_conv_tree_int8(params, act_scales=scales)
    os.environ['DEEPLIIF_FUSED'] = '1'
    try:
        assert dl._translators_fused(x, d, qparams['G'])
        m1, s1 = dl.generator_forward(qparams, x, d)
    finally:
        os.environ.pop('DEEPLIIF_FUSED', None)
    os.environ['DEEPLIIF_FUSED'] = '0'
    try:
        m0, s0 = dl.generator_forward(qparams, x, d)
    finally:
        os.environ.pop('DEEPLIIF_FUSED', None)
    # fused and unfused compute u (norm affine) with different f32
    # rounding, so values on a quantization-bucket boundary can flip by
    # one lattice step; through 6 blocks that accumulates to ~0.05-0.06
    # here (the conv-level tests pin exact wiring)
    assert float(jnp.abs(m1 - m0).max()) < 0.1
    assert float(jnp.abs(s1 - s0).max()) < 0.1


def test_conv3x3_stats_int8_dynamic_scale_exact():
    """The kernel's in-VMEM dynamic scale must be EXACTLY the chunk's
    max-abs: with an identity int8 kernel (center tap = I) and deq = 1,
    the dequantized value at the argmax input is round(+-127) * m/127 = m
    bit-for-bit. With h == chunk_rows the halo rows duplicate interior
    rows (reflect) or are zeroed (zero pad), so m is the sample max."""
    rng = np.random.default_rng(11)
    c = 8
    x = jnp.asarray(rng.normal(0, 1, (3, 16, 16, c)).astype(np.float32))
    wq = np.zeros((3, 3, c, c), np.int8)
    wq[1, 1] = np.eye(c, dtype=np.int8)
    y, _ = FR.conv3x3_stats_int8(x, jnp.asarray(wq),
                                 jnp.ones((c,), jnp.float32), 1.0,
                                 padding='zero', interpret=True,
                                 chunk_rows=16, dynamic=True)
    for i in range(3):
        m_host = float(jnp.max(jnp.abs(x[i])))
        m_kernel = float(jnp.max(jnp.abs(y[i])))
        assert m_kernel == m_host, (i, m_kernel, m_host)


@pytest.mark.parametrize('padding', ['reflect', 'zero'])
def test_conv3x3_stats_int8_dynamic_matches_emulation(padding):
    """Dynamic kernel vs a per-sample XLA emulation with the same scale.
    The scale value is exact (test above), but 127/m computed inside the
    kernel program may differ from the host division by 1 ulp, flipping
    values that sit exactly on a rounding boundary — so the bound is a
    couple of lattice steps, not bit-equality."""
    rng = np.random.default_rng(11)
    c = 8
    x = jnp.asarray(rng.normal(0, 1, (3, 16, 16, c)).astype(np.float32))
    w_q, w_s = _quant_w(rng, c)

    y, st = FR.conv3x3_stats_int8(x, w_q, w_s, 1.0, padding=padding,
                                  interpret=True, chunk_rows=16,
                                  dynamic=True)

    outs, steps = [], []
    for s in range(x.shape[0]):
        xs = x[s:s + 1]
        m = jnp.maximum(jnp.max(jnp.abs(xs)), 1e-12)
        inv = jnp.float32(127.0) / m.astype(jnp.float32)
        q = jnp.clip(jnp.round(xs * inv), -127, 127).astype(jnp.int8)
        if padding == 'reflect':
            qp = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
        else:
            qp = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y32 = jax.lax.conv_general_dilated(qp, w_q, (1, 1), 'VALID',
                                           dimension_numbers=_DN,
                                           preferred_element_type=jnp.int32)
        outs.append(y32.astype(jnp.float32)
                    * (w_s * (m.astype(jnp.float32) / jnp.float32(127.0))))
        # one lattice step of the dequantized output per flipped q
        steps.append(float(m) / 127.0 * float(w_s.max()) * 127.0)
    yr = jnp.concatenate(outs)
    tol = 4 * max(steps) / 127.0 * 9  # a few boundary flips across 9 taps
    assert float(jnp.abs(y - yr).max()) < max(tol, 0.01)


def test_resblock_chain_int8_dynamic_beats_static_on_skewed_chunks():
    """A sample whose rows span very different ranges: per-chunk dynamic
    scales resolve the quiet rows far better than one static scale
    covering the loud ones."""
    rng = np.random.default_rng(12)
    c = 8
    base = rng.normal(0, 1, (1, 32, 16, c)).astype(np.float32)
    base[:, :16] *= 0.05          # quiet half
    base[:, 16:] *= 4.0           # loud half
    x = jnp.asarray(base)

    w1 = rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32)
    w2 = rng.normal(0, 0.05, (3, 3, c, c)).astype(np.float32)
    n1 = {'scale': jnp.ones((c,), jnp.float32),
          'bias': jnp.zeros((c,), jnp.float32)}
    n2 = {'scale': jnp.ones((c,), jnp.float32),
          'bias': jnp.zeros((c,), jnp.float32)}
    s1 = np.maximum(np.abs(w1).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    s2 = np.maximum(np.abs(w2).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    q1 = jnp.asarray(np.clip(np.rint(w1 / s1), -127, 127).astype(np.int8))
    q2 = jnp.asarray(np.clip(np.rint(w2 / s2), -127, 127).astype(np.int8))
    blocks_f = [{'w1': jnp.asarray(w1), 'norm1': n1,
                 'w2': jnp.asarray(w2), 'norm2': n2}]
    a = np.float32(float(jnp.abs(x).max()) / 127.0)  # static global scale
    a2 = np.float32(8.0 / 127.0)
    blocks_st = [{'w1q': q1, 'w1s': jnp.asarray((a * s1).astype(np.float32)),
                  'a1': a, 'norm1': n1,
                  'w2q': q2, 'w2s': jnp.asarray((a2 * s2).astype(np.float32)),
                  'a2': a2, 'norm2': n2}]
    blocks_dyn = [{'w1q': q1, 'w1s': jnp.asarray(s1.astype(np.float32)),
                   'norm1': n1,
                   'w2q': q2, 'w2s': jnp.asarray(s2.astype(np.float32)),
                   'norm2': n2}]

    yf = FR.resblock_chain(x, blocks_f, padding='zero', interpret=True,
                           chunk_rows=16)
    y_st = FR.resblock_chain_int8(x, blocks_st, padding='zero',
                                  interpret=True, chunk_rows=16)
    y_dyn = FR.resblock_chain_int8(x, blocks_dyn, padding='zero',
                                   interpret=True, chunk_rows=16,
                                   dynamic=True)
    e_st = float(jnp.abs(yf - y_st).mean())
    e_dyn = float(jnp.abs(yf - y_dyn).mean())
    assert e_dyn < e_st, (e_dyn, e_st)
