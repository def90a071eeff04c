"""Parity tests for the fused translator-stage Pallas kernels
(ops.fused_stages): stride-2 conv, phase-decomposed transposed conv, and the
space-to-depth tail, each with the fused input affine+ReLU and output stats.

These kernels are an OFF-by-default experiment (DEEPLIIF_FUSE_STAGES=1):
per-stage they beat the XLA lowerings on v5e, but the full ensemble loses
to XLA + fused resblocks + s2d tails (53.8 vs 59.3 tiles/s at batch 48, see
docs/Performance.md). The kernels stay parity-tested so the experiment
remains reproducible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepliif_tpu.nets import layers as L
from deepliif_tpu.nets import resnet
from deepliif_tpu.labs import fused_stages as FS


def _affine_relu_ref(x, sc, bi):
    return jnp.maximum(x * sc[:, None, None] + bi[:, None, None], 0)


@pytest.fixture()
def aff():
    sc = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    bi = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    return sc, bi


def test_conv3x3_s2_stats_parity(rng_key, aff):
    sc, bi = aff
    x = jax.random.normal(rng_key, (2, 64, 64, 16))
    w = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 32))
    ref = L.conv2d(_affine_relu_ref(x, sc, bi), {'w': w}, 2, 1)
    y, st = FS.conv3x3_s2_stats(x, w, in_scale=sc, in_bias=bi, in_relu=True,
                                chunk_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(y), atol=1e-4)
    st_ref = jnp.stack([ref.sum(axis=(1, 2)), (ref ** 2).sum(axis=(1, 2))],
                       axis=1)
    np.testing.assert_allclose(np.asarray(st_ref), np.asarray(st), atol=1e-2)


def test_convtranspose3_s2_stats_parity(rng_key, aff):
    sc, bi = aff
    x = jax.random.normal(rng_key, (2, 32, 32, 16))
    w = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 12))
    ref = L.conv_transpose2d(_affine_relu_ref(x, sc, bi), {'w': w}, 2, 1, 1)
    y, st = FS.convtranspose3_s2_stats(x, w, in_scale=sc, in_bias=bi,
                                       in_relu=True, chunk_rows=8,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(y), atol=1e-4)
    st_ref = jnp.stack([ref.sum(axis=(1, 2)), (ref ** 2).sum(axis=(1, 2))],
                       axis=1)
    np.testing.assert_allclose(np.asarray(st_ref), np.asarray(st), atol=1e-2)


@pytest.mark.parametrize('padding', ['reflect', 'zero'])
def test_tail_s2d_fused_parity(rng_key, aff, padding):
    sc, bi = aff
    x = jax.random.normal(rng_key, (2, 64, 64, 16))
    p = {'w': 0.1 * jax.random.normal(jax.random.PRNGKey(1), (7, 7, 16, 3)),
         'b': 0.1 * jax.random.normal(jax.random.PRNGKey(4), (3,))}
    ref = jnp.tanh(L.conv2d(L.pad2d(_affine_relu_ref(x, sc, bi), 3, padding),
                            p, 1, 0))
    y = FS.tail_s2d_fused(x, p, in_scale=sc, in_bias=bi, in_relu=True,
                          padding=padding, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(y), atol=1e-4)


@pytest.mark.parametrize('padding', ['reflect', 'zero'])
def test_full_fused_translator_parity(padding, monkeypatch):
    monkeypatch.setenv('DEEPLIIF_FUSE_STAGES', '1')
    monkeypatch.setenv('DEEPLIIF_FUSED', '1')
    p = resnet.init(jax.random.PRNGKey(0), 3, 3, ngf=32, n_blocks=2,
                    padding_type=padding)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y_f = resnet.apply(p, x, n_blocks=2, padding_type=padding, train=False,
                       allow_fused=True)
    monkeypatch.setenv('DEEPLIIF_FUSED', '0')
    monkeypatch.delenv('DEEPLIIF_FUSE_STAGES')
    y_u = resnet.apply(p, x, n_blocks=2, padding_type=padding, train=False)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u), atol=1e-4)
