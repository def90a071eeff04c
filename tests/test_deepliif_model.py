"""Flagship DeepLIIF model: ensemble forward, loss structure, train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepliif_tpu.config import Options, TRAIN_DEFAULTS
from deepliif_tpu.models import deepliif as dl
from deepliif_tpu.nets import vgg

TINY = dl.DeepLIIFDef(
    modalities_no=2,
    net_g=('resnet_6blocks',) * 2,
    net_gs=('unet_32',) * 3,
    ngf=8, ndf=8,
    seg_weights=(0.4, 0.3, 0.3),
    loss_g_weights=(1 / 3,) * 3,
    loss_d_weights=(1 / 3,) * 3,
)
SIZE = 64


@pytest.fixture(scope='module')
def tiny_params():
    return dl.init_params(jax.random.PRNGKey(0), TINY)


def test_ensemble_forward_shapes(tiny_params):
    x = jnp.zeros((2, SIZE, SIZE, 3))
    mods, seg = dl.generator_forward(tiny_params, x, TINY)
    assert mods.shape == (2, 2, SIZE, SIZE, 3)
    assert seg.shape == (2, SIZE, SIZE, 3)


def test_seg_is_weighted_sum(tiny_params):
    """seg weights of (1,0,0) must return the base-input seg branch alone."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, SIZE, SIZE, 3))
    _, seg_a = dl.generator_forward(tiny_params, x, TINY, seg_weights=(1.0, 0.0, 0.0))
    _, seg_b = dl.generator_forward(tiny_params, x, TINY, seg_weights=(0.0, 1.0, 0.0))
    assert float(jnp.abs(seg_a - seg_b).max()) > 1e-4
    _, seg_sum = dl.generator_forward(tiny_params, x, TINY, seg_weights=(0.5, 0.5, 0.0))
    np.testing.assert_allclose(np.asarray(seg_sum), np.asarray((seg_a + seg_b) / 2),
                               rtol=1e-4, atol=1e-5)


def _batch(key):
    ks = jax.random.split(key, 3)
    return {
        'A': jax.random.normal(ks[0], (1, SIZE, SIZE, 3)),
        'B_mods': jax.random.normal(ks[1], (2, 1, SIZE, SIZE, 3)),
        'B_seg': jax.random.normal(ks[2], (1, SIZE, SIZE, 3)),
    }


def test_train_step_updates_and_losses():
    opt = Options(d_params=dict(TRAIN_DEFAULTS))
    state, g_tx, d_tx = dl.create_train_state(jax.random.PRNGKey(0), TINY, opt)
    vgg_params = vgg.init(jax.random.PRNGKey(9))
    step = dl.make_train_step(TINY, g_tx, d_tx, vgg_params)
    batch = _batch(jax.random.PRNGKey(1))
    g0 = state.g_params['G']['head_conv']['w'][0]
    g0 = jnp.array(g0)
    state2, metrics, out = step(state, batch, jax.random.PRNGKey(2))
    assert int(state2.step) == 1
    for k in ('loss_G', 'loss_D', 'G_GAN', 'G_L1', 'G_VGG', 'G_GAN_S', 'G_L1_S',
              'D_fake', 'D_real', 'D_fake_S', 'D_real_S'):
        assert k in metrics, k
    assert np.isfinite(float(metrics['loss_G']))
    assert np.isfinite(float(metrics['loss_D']))
    # params actually moved
    g1 = state2.g_params['G']['head_conv']['w'][0]
    assert float(jnp.abs(g1 - g0).max()) > 0
    assert out['mods'].shape == (2, 1, SIZE, SIZE, 3)

    # second step runs from the returned state (donated buffers regenerate)
    state3, metrics3, _ = step(state2, _batch(jax.random.PRNGKey(5)),
                               jax.random.PRNGKey(6))
    assert int(state3.step) == 2


def test_eval_losses_do_not_update():
    opt = Options(d_params=dict(TRAIN_DEFAULTS))
    state, _, _ = dl.create_train_state(jax.random.PRNGKey(0), TINY, opt)
    vgg_params = vgg.init(jax.random.PRNGKey(9))
    ev = dl.make_eval_losses(TINY, vgg_params)
    m = ev(state, _batch(jax.random.PRNGKey(1)), jax.random.PRNGKey(2))
    assert np.isfinite(float(m['loss_G']))


def test_def_from_opt_roundtrip():
    opt = Options(d_params=dict(TRAIN_DEFAULTS))
    d = dl.def_from_opt(opt)
    assert d.modalities_no == 4
    assert d.net_g == ('resnet_9blocks',) * 4
    assert d.net_gs == ('unet_512',) * 5
    assert d.gan_mode == 'vanilla' and d.gan_mode_s == 'lsgan'
    assert d.seg_weights == (0.25, 0.15, 0.25, 0.1, 0.25)


def test_seg_only_forward_matches_full(tiny_params):
    """seg_only_forward skips zero-weight branches but must produce the same
    seg as the full ensemble for the same weights."""
    x = jax.random.normal(jax.random.PRNGKey(8), (1, SIZE, SIZE, 3))
    weights = (0.5, 0.0, 0.5)  # skip branch 1's translator
    _, seg_full = dl.generator_forward(tiny_params, x, TINY, seg_weights=weights)
    seg_fast, marker = dl.seg_only_forward(tiny_params, x, TINY,
                                           seg_weights=weights, marker_index=1)
    np.testing.assert_allclose(np.asarray(seg_fast), np.asarray(seg_full),
                               rtol=1e-4, atol=1e-5)
    assert marker is not None and marker.shape == (1, SIZE, SIZE, 3)


def test_fused_forward_matches_vmapped(tiny_params):
    """Grouped-conv ensemble must be numerically identical to the vmapped
    path (it is the same math in a different layout)."""
    x = jax.random.normal(jax.random.PRNGKey(11), (2, SIZE, SIZE, 3))
    m1, s1 = dl.generator_forward(tiny_params, x, TINY)
    m2, s2 = dl.fused_forward(tiny_params, x, TINY)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
