"""Space-to-depth reformulations of tiny-output-channel convs.

The resnet tail (c7s1-3, reference networks.py:447-449) and the U-Net
outermost up-conv (networks.py:540-543) produce 3 channels — N=3 starves the
MXU lane dimension on TPU, so inference repacks 8x8 / 4x4 output blocks into
channels (layers.conv2d_s2d / conv_transpose2d_s2d). These tests force the
paths on (DEEPLIIF_S2D=1) and assert exact parity with the direct lowering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepliif_tpu.nets import layers as L
from deepliif_tpu.nets import resnet, unet


@pytest.fixture()
def s2d_on(monkeypatch):
    monkeypatch.setenv('DEEPLIIF_S2D', '1')


def test_conv2d_s2d_matches_direct(rng_key):
    p = {'w': jax.random.normal(rng_key, (7, 7, 16, 3)),
         'b': jax.random.normal(jax.random.PRNGKey(7), (3,))}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 38, 38, 16))
    direct = L.conv2d(x, p, 1, 0)
    s2d = L.conv2d_s2d(x, p)
    assert direct.shape == s2d.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(s2d),
                               rtol=0, atol=1e-4)


def test_conv_transpose2d_s2d_matches_direct(rng_key):
    p = {'w': jax.random.normal(rng_key, (4, 4, 8, 3)),
         'b': jax.random.normal(jax.random.PRNGKey(8), (3,))}
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 8))
    direct = L.conv_transpose2d(x, p, 2, 1, 0)
    s2d = L.conv_transpose2d_s2d(x, p)
    assert direct.shape == s2d.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(s2d),
                               rtol=0, atol=1e-4)


def test_s2d_gates():
    # engages only for tiny cout and block-tileable shapes
    assert not L.s2d_applicable(518, 518, 64)          # cout too big
    assert not L.s2d_applicable(37, 38, 3)             # (37-14) % 8 != 0
    assert not L.ct_s2d_applicable(15, 16, (4, 4, 8, 3))   # odd input
    assert not L.ct_s2d_applicable(16, 16, (4, 4, 8, 64))  # cout too big
    import os
    os.environ['DEEPLIIF_S2D'] = '1'
    try:
        assert L.s2d_applicable(518, 518, 3)
        assert L.ct_s2d_applicable(16, 16, (4, 4, 8, 3))
    finally:
        del os.environ['DEEPLIIF_S2D']


def test_resnet_apply_s2d_parity(rng_key, s2d_on, monkeypatch):
    p = resnet.init(rng_key, 3, 3, ngf=8, n_blocks=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    y_on = resnet.apply(p, x, n_blocks=2, train=False)
    monkeypatch.setenv('DEEPLIIF_S2D', '0')
    y_off = resnet.apply(p, x, n_blocks=2, train=False)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=0, atol=1e-5)


def test_unet_apply_s2d_parity(rng_key, s2d_on, monkeypatch):
    p = unet.init(rng_key, 3, 3, num_downs=5, ngf=8)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3))
    y_on = unet.apply(p, x, num_downs=5, train=False)
    monkeypatch.setenv('DEEPLIIF_S2D', '0')
    y_off = unet.apply(p, x, num_downs=5, train=False)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=0, atol=1e-5)
