"""Inception-V3 import parity: the JAX implementation + torchvision-layout
importer must match a reference-layout torch forward (random weights incl.
random BN running stats — eval mode uses them). With real torchvision
weights (one download away; none here), the same path yields
paper-comparable FID/IS (reference DeepLIIF_Statistics/fid.py:303-334)."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deepliif_tpu.stats import inception as jinc  # noqa: E402
from deepliif_tpu.utils import torch_import as ti  # noqa: E402


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class InceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        import torch.nn.functional as F
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        import torch.nn.functional as F
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionE(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class TorchInceptionV3(nn.Module):
    """torchvision.models.Inception3 layout (transform_input=False, no aux)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048)
        self.fc = nn.Linear(2048, 1000)

    def forward(self, x):
        import torch.nn.functional as F
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ('Mixed_5b', 'Mixed_5c', 'Mixed_5d', 'Mixed_6a',
                     'Mixed_6b', 'Mixed_6c', 'Mixed_6d', 'Mixed_6e',
                     'Mixed_7a', 'Mixed_7b', 'Mixed_7c'):
            x = getattr(self, name)(x)
        pooled = x.mean((2, 3))
        return pooled, self.fc(pooled)


@pytest.fixture(scope='module')
def torch_net():
    torch.manual_seed(5)
    net = TorchInceptionV3()
    for m in net.modules():
        if isinstance(m, nn.Conv2d):
            nn.init.normal_(m.weight, 0, 0.05)
        elif isinstance(m, nn.BatchNorm2d):
            nn.init.normal_(m.weight, 1.0, 0.05)
            nn.init.normal_(m.bias, 0, 0.05)
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()
    return net


def test_inception_import_parity(torch_net):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        t_feat, t_logits = torch_net(torch.from_numpy(
            x.transpose(0, 3, 1, 2)))
    params = ti._as_jnp(ti.import_inception_v3(torch_net.state_dict()))
    j_feat = np.asarray(jinc.features(params, jnp.asarray(x)))
    j_logits = np.asarray(jinc.logits(params, jnp.asarray(x)))
    np.testing.assert_allclose(j_feat, t_feat.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(j_logits, t_logits.numpy(), rtol=2e-3,
                               atol=5e-3)


def test_inception_npz_roundtrip(torch_net, tmp_path):
    """convert_inception_v3 (.pth -> npz) + stats.load_inception_npz
    reproduce the directly-imported features exactly, and the
    DEEPLIIF_INCEPTION_NPZ hook upgrades default_features_fn to Inception."""
    import os
    from deepliif_tpu import stats
    pth = tmp_path / 'inception.pth'
    torch.save(torch_net.state_dict(), pth)
    npz = tmp_path / 'inception_v3.npz'
    ti.convert_inception_v3(str(pth), str(npz))
    params_direct = ti._as_jnp(ti.import_inception_v3(torch_net.state_dict()))
    params_npz = stats.load_inception_npz(str(npz))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 299, 299, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(jinc.features(params_npz, x)),
        np.asarray(jinc.features(params_direct, x)))
    old = os.environ.get('DEEPLIIF_INCEPTION_NPZ')
    os.environ['DEEPLIIF_INCEPTION_NPZ'] = str(npz)
    try:
        fn = stats.default_features_fn()
        imgs = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
        assert fn(imgs).shape == (2, 2048)   # Inception pool3, not VGG
    finally:
        if old is None:
            del os.environ['DEEPLIIF_INCEPTION_NPZ']
        else:
            os.environ['DEEPLIIF_INCEPTION_NPZ'] = old


def test_fid_with_inception_features(torch_net):
    """End-to-end: stats.fid over Inception features separates identical
    from different image sets."""
    from deepliif_tpu import stats
    params = ti._as_jnp(ti.import_inception_v3(torch_net.state_dict()))
    fn = jinc.make_features_fn(params, batch=4)
    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, (6, 64, 64, 3), np.uint8)
    b = rng.integers(0, 255, (6, 64, 64, 3), np.uint8)
    assert stats.fid(a, a.copy(), features_fn=fn) < 1e-6
    d = stats.fid(a, b, features_fn=fn)
    assert d > 0

    is_mean, is_std = stats.inception_score(
        a, classifier_fn=jinc.make_classifier_fn(params, batch=4), splits=2)
    assert is_mean >= 1.0


def test_missing_env_weights_raise_not_fallback(monkeypatch, tmp_path):
    """DEEPLIIF_INCEPTION_NPZ pointing at a missing file must raise — a
    silent VGG fallback would report FID on a different numeric scale."""
    from deepliif_tpu import stats
    monkeypatch.setenv('DEEPLIIF_INCEPTION_NPZ', str(tmp_path / 'nope.npz'))
    with pytest.raises(FileNotFoundError, match='DEEPLIIF_INCEPTION_NPZ'):
        stats.default_features_fn()
