"""Lock layer semantics against torch functional ops (CPU).

The reference compute path is torch; these tests pin our NHWC/JAX primitives
to the exact torch semantics the checkpoints and the SSIM>=0.9997 contract
depend on: conv padding, ConvTranspose2d output_padding, batch-stat norm
(BatchNorm2d without running stats), InstanceNorm2d, LeakyReLU, SmoothL1,
BCEWithLogits, and reflection padding.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from deepliif_tpu.nets import layers as L
from deepliif_tpu.nets import losses

TOL = 1e-4


def to_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def conv_params_from_torch(w, b=None):
    # torch conv weight OIHW -> HWIO
    p = {'w': jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))}
    if b is not None:
        p['b'] = jnp.asarray(b.detach().numpy())
    return p


def convT_params_from_torch(w, b=None):
    # torch ConvTranspose2d weight is (in, out, kH, kW); our layout is
    # forward-conv HWIO with spatial flip.
    wn = w.detach().numpy()[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    p = {'w': jnp.asarray(np.ascontiguousarray(wn))}
    if b is not None:
        p['b'] = jnp.asarray(b.detach().numpy())
    return p


@pytest.mark.parametrize('stride,pad,k', [(1, 0, 7), (2, 1, 3), (2, 1, 4), (1, 1, 4), (1, 0, 1)])
def test_conv2d_matches_torch(stride, pad, k):
    torch.manual_seed(0)
    x = torch.randn(2, 5, 16, 16)
    w = torch.randn(7, 5, k, k)
    b = torch.randn(7)
    ref = F.conv2d(x, w, b, stride=stride, padding=pad)
    out = L.conv2d(to_nhwc(x), conv_params_from_torch(w, b), stride, pad)
    np.testing.assert_allclose(np.asarray(out), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=TOL, atol=TOL)


@pytest.mark.parametrize('stride,pad,opad,k', [(2, 1, 1, 3), (2, 1, 0, 4)])
def test_conv_transpose2d_matches_torch(stride, pad, opad, k):
    torch.manual_seed(1)
    x = torch.randn(2, 6, 8, 8)
    w = torch.randn(6, 4, k, k)  # (in, out, kH, kW)
    b = torch.randn(4)
    ref = F.conv_transpose2d(x, w, b, stride=stride, padding=pad, output_padding=opad)
    out = L.conv_transpose2d(to_nhwc(x), convT_params_from_torch(w, b), stride, pad, opad)
    np.testing.assert_allclose(np.asarray(out), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=TOL, atol=TOL)


def test_batch_stat_norm_matches_torch_train_mode():
    torch.manual_seed(2)
    x = torch.randn(3, 4, 8, 8)
    bn = torch.nn.BatchNorm2d(4, affine=True, track_running_stats=False)
    with torch.no_grad():
        bn.weight.copy_(torch.randn(4) * 0.1 + 1)
        bn.bias.copy_(torch.randn(4) * 0.1)
    bn.train()
    ref = bn(x)
    p = {'scale': jnp.asarray(bn.weight.detach().numpy()),
         'bias': jnp.asarray(bn.bias.detach().numpy())}
    out = L.batch_stat_norm(to_nhwc(x), p)
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_batch_stat_norm_matches_eval_mode_without_running_stats():
    """The reference inference path disables running stats entirely
    (util/__init__.py:743-771): eval-mode BatchNorm then uses batch stats."""
    torch.manual_seed(3)
    x = torch.randn(1, 4, 8, 8)
    bn = torch.nn.BatchNorm2d(4, affine=True, track_running_stats=True)
    bn.running_mean = None
    bn.running_var = None
    bn.eval()
    ref = bn(x)
    p = {'scale': jnp.asarray(bn.weight.detach().numpy()),
         'bias': jnp.asarray(bn.bias.detach().numpy())}
    out = L.batch_stat_norm(to_nhwc(x), p)
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_instance_norm_matches_torch():
    torch.manual_seed(4)
    x = torch.randn(2, 3, 9, 9)
    ref = F.instance_norm(x)
    out = L.instance_norm(to_nhwc(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_reflection_pad_matches_torch():
    x = torch.arange(36, dtype=torch.float32).reshape(1, 1, 6, 6)
    ref = F.pad(x, (3, 3, 3, 3), mode='reflect')
    out = L.pad2d(to_nhwc(x), 3, 'reflect')
    np.testing.assert_allclose(np.asarray(out)[..., 0], ref.numpy()[:, 0])


def test_leaky_relu_and_activations():
    x = torch.randn(100)
    np.testing.assert_allclose(
        np.asarray(L.leaky_relu(jnp.asarray(x.numpy()), 0.2)),
        F.leaky_relu(x, 0.2).numpy(), rtol=TOL)


def test_smooth_l1_matches_torch():
    torch.manual_seed(5)
    a, b = torch.randn(50) * 3, torch.randn(50)
    ref = F.smooth_l1_loss(a, b)
    out = losses.smooth_l1(jnp.asarray(a.numpy()), jnp.asarray(b.numpy()))
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_bce_with_logits_matches_torch():
    torch.manual_seed(6)
    x = torch.randn(40)
    ref = F.binary_cross_entropy_with_logits(x, torch.ones_like(x))
    out = losses.gan_loss(jnp.asarray(x.numpy()), True, 'vanilla')
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
    ref0 = F.binary_cross_entropy_with_logits(x, torch.zeros_like(x))
    out0 = losses.gan_loss(jnp.asarray(x.numpy()), False, 'vanilla')
    np.testing.assert_allclose(float(out0), float(ref0), rtol=1e-5)


def test_lsgan_matches_torch_mse():
    torch.manual_seed(7)
    x = torch.randn(40)
    ref = F.mse_loss(x, torch.ones_like(x))
    out = losses.gan_loss(jnp.asarray(x.numpy()), True, 'lsgan')
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)


def test_pixel_shuffle_matches_torch():
    torch.manual_seed(8)
    x = torch.randn(1, 8, 4, 4)
    ref = F.pixel_shuffle(x, 2)
    out = L.pixel_shuffle(to_nhwc(x), 2)
    np.testing.assert_allclose(np.asarray(out), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=TOL, atol=TOL)


def test_upsample_nearest_matches_torch():
    torch.manual_seed(9)
    x = torch.randn(1, 3, 5, 5)
    ref = F.interpolate(x, scale_factor=2, mode='nearest')
    out = L.upsample_nearest(to_nhwc(x), 2)
    np.testing.assert_allclose(np.asarray(out), ref.numpy().transpose(0, 2, 3, 1),
                               rtol=TOL, atol=TOL)
