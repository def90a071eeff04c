"""Fused Pallas resblock kernel: parity with the unfused layers path
(interpret mode on CPU; the same kernel compiles via Mosaic on TPU —
numerics verified exact on hardware, experiments/bench_fused.json)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepliif_tpu.nets import layers as L
from deepliif_tpu.nets import resnet
from deepliif_tpu.ops import fused_resblock as FR


def _blocks(rng, n, c):
    out = []
    for _ in range(n):
        out.append({
            'w1': jnp.asarray(rng.normal(0, 0.02, (3, 3, c, c)).astype(np.float32)),
            'norm1': {'scale': jnp.asarray(1 + 0.02 * rng.normal(0, 1, (c,)).astype(np.float32)),
                      'bias': jnp.asarray(0.01 * rng.normal(0, 1, (c,)).astype(np.float32))},
            'w2': jnp.asarray(rng.normal(0, 0.02, (3, 3, c, c)).astype(np.float32)),
            'norm2': {'scale': jnp.asarray(1 + 0.02 * rng.normal(0, 1, (c,)).astype(np.float32)),
                      'bias': jnp.asarray(0.01 * rng.normal(0, 1, (c,)).astype(np.float32))},
        })
    return out


def _unfused_chain(x, blocks, padding):
    for b in blocks:
        h = x
        pad = 0 if padding == 'reflect' else 1
        if padding == 'reflect':
            h = L.pad2d(h, 1, 'reflect')
        h = L.conv2d(h, {'w': b['w1']}, 1, pad)
        h = L.batch_stat_norm(h, b['norm1'], per_sample=True)
        h = L.relu(h)
        if padding == 'reflect':
            h = L.pad2d(h, 1, 'reflect')
        h = L.conv2d(h, {'w': b['w2']}, 1, pad)
        h = L.batch_stat_norm(h, b['norm2'], per_sample=True)
        x = x + h
    return x


@pytest.mark.parametrize('padding', ['reflect', 'zero'])
def test_resblock_chain_matches_unfused(padding):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 16, 8)).astype(np.float32))
    blocks = _blocks(rng, 2, 8)
    ref = _unfused_chain(x, blocks, padding)
    fused = FR.resblock_chain(x, blocks, padding=padding, interpret=True)
    assert float(jnp.abs(ref - fused).max()) < 1e-4


def test_resnet_apply_allow_fused_parity():
    os.environ['DEEPLIIF_FUSED'] = '1'
    try:
        key = jax.random.PRNGKey(0)
        p = resnet.init(key, 3, 3, ngf=32, n_blocks=2, norm='batch')
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
        yf = resnet.apply(p, x, n_blocks=2, norm='batch', allow_fused=True)
        yu = resnet.apply(p, x, n_blocks=2, norm='batch', allow_fused=False)
        assert float(jnp.abs(yf - yu).max()) < 1e-4
    finally:
        os.environ.pop('DEEPLIIF_FUSED', None)


def test_generator_forward_fused_unroll_parity():
    """DEEPLIIF_FUSED=1 unrolls the translators through the kernel; outputs
    match the vmapped unfused ensemble."""
    from deepliif_tpu.models import deepliif as dl
    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=32, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3), padding_type='zero')
    params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    os.environ['DEEPLIIF_FUSED'] = '1'
    try:
        m1, s1 = dl.generator_forward(params, x, d)
    finally:
        os.environ.pop('DEEPLIIF_FUSED', None)
    os.environ['DEEPLIIF_FUSED'] = '0'
    try:
        m0, s0 = dl.generator_forward(params, x, d)
    finally:
        os.environ.pop('DEEPLIIF_FUSED', None)
    assert float(jnp.abs(m1 - m0).max()) < 1e-4
    assert float(jnp.abs(s1 - s0).max()) < 1e-4


def test_fused_gate_dtypes_on_tpu(monkeypatch):
    """Auto mode engages the kernel for bf16 (chunk 16) AND f32 on a TPU
    backend: conv3x3_stats auto-clamps f32 to chunk 8, which fits VMEM and
    beats the XLA path (40.4 vs 35.9 tiles/s b16 — docs/Performance.md
    'Fused Pallas resblock kernel'). Other dtypes fall back to XLA."""
    monkeypatch.delenv('DEEPLIIF_FUSED', raising=False)
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    ok = lambda dt: resnet._fused_ok(
        jax.ShapeDtypeStruct((1, 128, 128, 256), dt), 'batch', 'zero',
        False, True)
    assert ok(jnp.bfloat16)
    assert ok(jnp.float32)
    assert not ok(jnp.float16)
    # explicit overrides still win
    monkeypatch.setenv('DEEPLIIF_FUSED', '0')
    assert not ok(jnp.bfloat16)


def test_f32_chunk_clamp_survives_env_override(monkeypatch):
    """DEEPLIIF_FUSED_CHUNK (a bf16 tuning knob) must not break f32 graphs
    in the same process: _resolve_chunk clamps f32 to 8 regardless."""
    monkeypatch.setenv('DEEPLIIF_FUSED_CHUNK', '16')
    assert FR._resolve_chunk(16, jnp.bfloat16) == 16
    assert FR._resolve_chunk(16, jnp.float32) == 8
    monkeypatch.delenv('DEEPLIIF_FUSED_CHUNK')
    assert FR._resolve_chunk(16, jnp.float32) == 8
    assert FR._resolve_chunk(4, jnp.float32) == 4
