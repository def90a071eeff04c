"""DeepLIIFExt / SDG / CycleGAN / DeepLIIFKD: forward shapes + one train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from deepliif_tpu.config import Options, TRAIN_DEFAULTS
from deepliif_tpu.models import cyclegan, deepliif_ext, deepliif_kd, sdg
from deepliif_tpu.models import deepliif as dl
from deepliif_tpu.nets import vgg

SIZE = 64


def _opt():
    return Options(d_params=dict(TRAIN_DEFAULTS))


def test_ext_forward_and_step():
    d = deepliif_ext.DeepLIIFExtDef(
        modalities_no=2, net_g=('resnet_6blocks',) * 2, net_gs=('unet_32',) * 2,
        ngf=8, ndf=8, loss_g_weights=(0.5, 0.5), loss_d_weights=(0.5, 0.5))
    state, g_tx, d_tx = deepliif_ext.create_train_state(jax.random.PRNGKey(0), d, _opt())
    mods, segs = deepliif_ext.generator_forward(
        state.g_params, jnp.zeros((1, SIZE, SIZE, 3)), d)
    assert mods.shape == (2, 1, SIZE, SIZE, 3)
    assert segs.shape == (2, 1, SIZE, SIZE, 3)

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = {'A': jax.random.normal(ks[0], (1, SIZE, SIZE, 3)),
             'B_mods': jax.random.normal(ks[1], (2, 1, SIZE, SIZE, 3)),
             'B_segs': jax.random.normal(ks[2], (2, 1, SIZE, SIZE, 3))}
    step = deepliif_ext.make_train_step(d, g_tx, d_tx)
    state2, metrics, out = step(state, batch, jax.random.PRNGKey(2))
    for k in ('loss_G', 'loss_D', 'GS_GAN', 'GS_L1', 'DS_fake', 'DS_real'):
        assert k in metrics
    assert np.isfinite(float(metrics['loss_G']))


def test_sdg_forward_and_step():
    d = sdg.SDGDef(modalities_no=2, input_no=2, net_g=('resnet_6blocks',) * 2,
                   ngf=8, ndf=8, loss_g_weights=(0.5, 0.5),
                   loss_d_weights=(0.5, 0.5))
    state, g_tx, d_tx = sdg.create_train_state(jax.random.PRNGKey(0), d, _opt())
    x = jnp.zeros((1, SIZE, SIZE, 6))  # 2 input modalities concatenated
    mods, _ = sdg.generator_forward(state.g_params, x, d)
    assert mods.shape == (2, 1, SIZE, SIZE, 3)

    vgg_params = vgg.init(jax.random.PRNGKey(9))
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    batch = {'A': jax.random.normal(ks[0], (1, SIZE, SIZE, 6)),
             'B_mods': jax.random.normal(ks[1], (3, 1, SIZE, SIZE, 3))}
    step = sdg.make_train_step(d, g_tx, d_tx, vgg_params)
    state2, metrics, _ = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics['loss_G']))


def test_cyclegan_pool_and_steps():
    d = cyclegan.CycleGANDef(modalities_no=1, net_g=('resnet_6blocks',),
                             ngf=8, ndf=8, loss_g_weights=(1.0,),
                             loss_d_weights=(1.0,))
    state, g_tx, d_tx = cyclegan.create_train_state(jax.random.PRNGKey(0), d, _opt())
    vgg_params = vgg.init(jax.random.PRNGKey(9))
    g_step, d_step = cyclegan.make_train_steps(d, g_tx, d_tx, vgg_params)

    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    real_as = jax.random.normal(ks[0], (1, 1, SIZE, SIZE, 3))
    real_bs = jax.random.normal(ks[1], (1, 1, SIZE, SIZE, 3))

    pool_a = cyclegan.ImagePool(50, seed=0)
    pool_b = cyclegan.ImagePool(50, seed=1)
    state, gm, outs = g_step(state, real_as, real_bs, jax.random.PRNGKey(2))
    fb = jnp.asarray(pool_b.query(np.asarray(outs['fake_bs'][0])))[None]
    fa = jnp.asarray(pool_a.query(np.asarray(outs['fake_as'][0])))[None]
    state, dm = d_step(state, fb, fa, real_as, real_bs)
    assert np.isfinite(float(gm['loss_G'])) and np.isfinite(float(dm['loss_D']))
    assert int(state.step) == 1


def test_image_pool_swap_semantics():
    pool = cyclegan.ImagePool(2, seed=42)
    a = np.zeros((1, 4, 4, 3), np.float32)
    b = np.ones((1, 4, 4, 3), np.float32)
    out1 = pool.query(a)
    np.testing.assert_array_equal(out1, a)  # pool not full -> passthrough
    out2 = pool.query(b)
    np.testing.assert_array_equal(out2, b)
    # pool now full; subsequent queries either swap or pass through
    c = np.full((1, 4, 4, 3), 2, np.float32)
    out3 = pool.query(c)
    assert out3.shape == c.shape


def test_kd_kl_matches_torch_kldiv_batchmean():
    torch.manual_seed(0)
    s = torch.randn(1, 3, 8, 8)
    t = torch.randn(1, 3, 8, 8)
    ref = torch.nn.KLDivLoss(reduction='batchmean')(
        torch.nn.LogSoftmax(dim=-1)(s.view(1, 1, -1)),
        torch.nn.Softmax(dim=-1)(t.view(1, 1, -1)))
    # torch batchmean divides by first dim (=1) -> sum over elements
    ours = deepliif_kd.kd_kl(jnp.asarray(s.numpy().transpose(0, 2, 3, 1)),
                             jnp.asarray(t.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_kd_train_step_with_frozen_teacher():
    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=8, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3),
                       loss_g_weights=(1 / 3,) * 3, loss_d_weights=(1 / 3,) * 3)
    teacher_params = dl.init_params(jax.random.PRNGKey(42), d,
                                    with_discriminators=False)
    state, g_tx, d_tx = deepliif_kd.create_train_state(jax.random.PRNGKey(0), d, _opt())
    vgg_params = vgg.init(jax.random.PRNGKey(9))
    step = deepliif_kd.make_train_step(d, g_tx, d_tx, vgg_params,
                                       teacher_params, d)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = {'A': jax.random.normal(ks[0], (1, SIZE, SIZE, 3)),
             'B_mods': jax.random.normal(ks[1], (2, 1, SIZE, SIZE, 3)),
             'B_seg': jax.random.normal(ks[2], (1, SIZE, SIZE, 3))}
    state2, metrics, _ = step(state, batch, jax.random.PRNGKey(2))
    assert 'G_KD' in metrics and np.isfinite(float(metrics['G_KD']))
    assert float(metrics['G_KD']) >= 0  # KL divergence is non-negative
    # teacher unchanged by construction (stop_gradient); student moved
    assert int(state2.step) == 1
