"""convert_vgg19 path: torchvision-layout state dict -> npz -> nets.vgg
feature slices numerically matching the torch forward (the reference VGGLoss
wrapper, networks.py:698-743)."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

# torchvision vgg19.features conv indices and channel plan
CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]
CHANNELS = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
            (256, 256), (256, 256), (256, 256), (256, 512), (512, 512),
            (512, 512), (512, 512), (512, 512)]
POOL_AFTER = {4, 9, 18, 27}  # maxpool positions in vgg19.features
SLICE_ENDS = [2, 7, 12, 21, 30]  # reference Vgg19 slice boundaries


def _make_state_dict(rng):
    sd = {}
    for fi, (cin, cout) in zip(CONV_IDX, CHANNELS):
        sd[f'features.{fi}.weight'] = torch.tensor(
            rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32))
        sd[f'features.{fi}.bias'] = torch.tensor(
            rng.normal(0, 0.01, (cout,)).astype(np.float32))
    return sd


def _torch_slices(sd, x_nchw):
    """Replicate the reference Vgg19 slice forward with functional ops."""
    import torch.nn.functional as F
    outs = []
    h = x_nchw
    conv_at = dict(zip(CONV_IDX, range(len(CONV_IDX))))
    for pos in range(SLICE_ENDS[-1]):
        if pos in conv_at:
            h = F.conv2d(h, sd[f'features.{pos}.weight'],
                         sd[f'features.{pos}.bias'], padding=1)
        elif pos in POOL_AFTER:
            h = F.max_pool2d(h, 2, 2)
        else:  # relu position
            h = F.relu(h)
        if pos + 1 in SLICE_ENDS:
            outs.append(h.detach().numpy().transpose(0, 2, 3, 1))
    return outs


def test_convert_vgg19_roundtrip(tmp_path):
    import jax
    from deepliif_tpu.nets import vgg
    from deepliif_tpu.utils.torch_import import convert_vgg19

    rng = np.random.default_rng(0)
    sd = _make_state_dict(rng)
    pth = tmp_path / 'vgg19.pth'
    torch.save(sd, pth)

    npz = tmp_path / 'vgg19.npz'
    convert_vgg19(str(pth), str(npz))

    params = vgg.init(weights_path=str(npz))
    x = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    ours = [np.asarray(f) for f in vgg.features(params, jax.numpy.asarray(x))]
    theirs = _torch_slices(sd, torch.tensor(x.transpose(0, 3, 1, 2)))

    assert len(ours) == len(theirs) == 5
    for i, (a, b) in enumerate(zip(ours, theirs)):
        assert a.shape == b.shape, (i, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3,
                                   err_msg=f'slice {i}')
