"""End-to-end checkpoint-import parity: build torch nets with the reference's
layer layout, import their state dicts, and check our JAX forward matches the
torch forward within the serialize-parity budget (sum|diff| <= 10 over a
3x512x512 output, reference util/__init__.py:718-741; we test smaller sizes
with a per-pixel tolerance).
"""

import functools

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from deepliif_tpu.nets import resnet, unet, discriminators
from deepliif_tpu.utils import torch_import as ti

BN = functools.partial(nn.BatchNorm2d, affine=True, track_running_stats=False)


def torch_resnet_g(cin, cout, ngf=16, n_blocks=2, use_dropout=True,
                   padding_type='reflect'):
    """Reference-layout ResnetGenerator (reference networks.py:357-450);
    padding_type reflect|zero selects ReflectionPad2d vs ZeroPad2d head/tail
    and in-conv zero padding inside the blocks."""
    def block(dim):
        if padding_type == 'reflect':
            seq = [nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, bias=False)]
        else:
            seq = [nn.Conv2d(dim, dim, 3, padding=1, bias=False)]
        seq += [BN(dim), nn.ReLU(True)]
        if use_dropout:
            seq.append(nn.Dropout(0.5))
        if padding_type == 'reflect':
            seq += [nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3, bias=False)]
        else:
            seq += [nn.Conv2d(dim, dim, 3, padding=1, bias=False)]
        seq += [BN(dim)]
        m = nn.Module()
        m.conv_block = nn.Sequential(*seq)
        m.forward = lambda x, m=m: x + m.conv_block(x)
        return m

    head_pad = (nn.ReflectionPad2d(3) if padding_type == 'reflect'
                else nn.ZeroPad2d(3))
    layers = [head_pad, nn.Conv2d(cin, ngf, 7, bias=False), BN(ngf),
              nn.ReLU(True)]
    for i in range(2):
        mult = 2 ** i
        layers += [nn.Conv2d(ngf * mult, ngf * mult * 2, 3, 2, 1, bias=False),
                   BN(ngf * mult * 2), nn.ReLU(True)]
    for _ in range(n_blocks):
        layers.append(block(ngf * 4))
    for i in range(2):
        mult = 2 ** (2 - i)
        layers += [nn.ConvTranspose2d(ngf * mult, ngf * mult // 2, 3, 2, 1,
                                      output_padding=1, bias=False),
                   BN(ngf * mult // 2), nn.ReLU(True)]
    tail_pad = (nn.ReflectionPad2d(3) if padding_type == 'reflect'
                else nn.ZeroPad2d(3))
    layers += [tail_pad, nn.Conv2d(ngf, cout, 7), nn.Tanh()]
    net = nn.Module()
    net.model = nn.Sequential(*layers)
    net.forward = lambda x, net=net: net.model(x)
    return net


def torch_unet_g(cin, cout, num_downs, ngf=8):
    """Reference-layout UnetGenerator (no dropout for determinism)."""
    def blk(outer, inner, input_nc, sub, outermost=False, innermost=False):
        if input_nc is None:
            input_nc = outer
        down_conv = nn.Conv2d(input_nc, inner, 4, 2, 1, bias=False)
        if outermost:
            up = nn.ConvTranspose2d(inner * 2, outer, 4, 2, 1)
            seq = [down_conv, sub, nn.ReLU(True), up, nn.Tanh()]
        elif innermost:
            up = nn.ConvTranspose2d(inner, outer, 4, 2, 1, bias=False)
            seq = [nn.LeakyReLU(0.2, True), down_conv, nn.ReLU(True), up, BN(outer)]
        else:
            up = nn.ConvTranspose2d(inner * 2, outer, 4, 2, 1, bias=False)
            seq = [nn.LeakyReLU(0.2, True), down_conv, BN(inner), sub,
                   nn.ReLU(True), up, BN(outer)]
        m = nn.Module()
        m.model = nn.Sequential(*seq)
        if outermost:
            m.forward = lambda x, m=m: m.model(x)
        else:
            m.forward = lambda x, m=m: torch.cat([x, m.model(x)], 1)
        return m

    b = blk(ngf * 8, ngf * 8, None, None, innermost=True)
    for _ in range(num_downs - 5):
        b = blk(ngf * 8, ngf * 8, None, b)
    b = blk(ngf * 4, ngf * 8, None, b)
    b = blk(ngf * 2, ngf * 4, None, b)
    b = blk(ngf, ngf * 2, None, b)
    b = blk(cout, ngf, cin, b, outermost=True)
    net = nn.Module()
    net.model = b
    net.forward = lambda x, net=net: net.model(x)
    return net


def torch_nlayer_d(cin, ndf=8, n_layers=4):
    seq = [nn.Conv2d(cin, ndf, 4, 2, 1), nn.LeakyReLU(0.2, True)]
    nf = 1
    for n in range(1, n_layers):
        pf, nf = nf, min(2 ** n, 8)
        seq += [nn.Conv2d(ndf * pf, ndf * nf, 4, 2, 1, bias=False),
                BN(ndf * nf), nn.LeakyReLU(0.2, True)]
    pf, nf = nf, min(2 ** n_layers, 8)
    seq += [nn.Conv2d(ndf * pf, ndf * nf, 4, 1, 1, bias=False), BN(ndf * nf),
            nn.LeakyReLU(0.2, True), nn.Conv2d(ndf * nf, 1, 4, 1, 1)]
    net = nn.Module()
    net.model = nn.Sequential(*seq)
    net.forward = lambda x, net=net: net.model(x)
    return net


def _rand_init(net):
    torch.manual_seed(42)
    for m in net.modules():
        if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d)):
            nn.init.normal_(m.weight, 0, 0.2)
            if m.bias is not None:
                nn.init.normal_(m.bias, 0, 0.1)
        elif isinstance(m, nn.BatchNorm2d):
            nn.init.normal_(m.weight, 1.0, 0.1)
            nn.init.normal_(m.bias, 0, 0.1)
    net.eval()
    return net


def test_resnet_import_forward_parity():
    net = _rand_init(torch_resnet_g(3, 3, ngf=16, n_blocks=2))
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref = net(x).numpy().transpose(0, 2, 3, 1)
    params = ti._as_jnp(ti.import_resnet_g(
        net.state_dict(), n_blocks=2, norm='batch', use_dropout=True,
        padding_type='reflect', upsample='convtranspose'))
    out = resnet.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                       n_blocks=2, norm='batch', use_dropout=True,
                       padding_type='reflect')
    diff = np.abs(np.asarray(out) - ref)
    assert diff.max() < 1e-3, diff.max()


@pytest.mark.parametrize('num_downs,size', [(5, 32), (6, 64)])
def test_unet_import_forward_parity(num_downs, size):
    net = _rand_init(torch_unet_g(3, 3, num_downs))
    x = torch.randn(1, 3, size, size)
    with torch.no_grad():
        ref = net(x).numpy().transpose(0, 2, 3, 1)
    params = ti._as_jnp(ti.import_unet_g(net.state_dict(), num_downs, 'batch', False))
    out = unet.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                     num_downs=num_downs, norm='batch', use_dropout=False)
    diff = np.abs(np.asarray(out) - ref)
    assert diff.max() < 1e-3, diff.max()


def test_nlayer_d_import_forward_parity():
    net = _rand_init(torch_nlayer_d(6, ndf=8, n_layers=4))
    x = torch.randn(1, 6, 128, 128)
    with torch.no_grad():
        ref = net(x).numpy().transpose(0, 2, 3, 1)
    params = ti._as_jnp(ti.import_nlayer_d(net.state_dict(), n_layers=4))
    out = discriminators.nlayer_apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), n_layers=4)
    diff = np.abs(np.asarray(out) - ref)
    assert diff.max() < 2e-3, diff.max()


def torch_att_unet(cin=3, cout=3):
    """Reference-layout AttU_Net (att_unet.py:31-199) with named submodules."""
    def conv_block(ci, co, innermost=False, outermost=False):
        m = nn.Module()
        if outermost:
            m.conv = nn.Sequential(nn.Conv2d(ci, co, 4, 2, 1, bias=True),
                                   nn.LeakyReLU(0.2, True))
        elif innermost:
            m.conv = nn.Sequential(nn.Conv2d(ci, co, 4, 2, 1, bias=True),
                                   nn.ReLU(True))
        else:
            m.conv = nn.Sequential(nn.Conv2d(ci, co, 4, 2, 1, bias=True),
                                   BN(co), nn.LeakyReLU(0.2, True))
        m.forward = lambda x, m=m: m.conv(x)
        return m

    def up_conv(ci, co, innermost=False, outermost=False):
        m = nn.Module()
        if outermost:
            m.up = nn.Sequential(nn.ConvTranspose2d(ci * 2, co, 4, 2, 1),
                                 nn.Tanh())
        elif innermost:
            m.up = nn.Sequential(nn.ConvTranspose2d(ci, co, 4, 2, 1, bias=False),
                                 BN(co), nn.ReLU(True))
        else:
            m.up = nn.Sequential(nn.ConvTranspose2d(ci * 2, co, 4, 2, 1, bias=False),
                                 BN(co), nn.ReLU(True))
        m.forward = lambda x, m=m: m.up(x)
        return m

    def att_block(fg, fl, fi):
        m = nn.Module()
        m.W_g = nn.Sequential(nn.Conv2d(fg, fi, 1, bias=True), BN(fi))
        m.W_x = nn.Sequential(nn.Conv2d(fl, fi, 1, bias=True), BN(fi))
        m.psi = nn.Sequential(nn.Conv2d(fi, 1, 1, bias=True), BN(1), nn.Sigmoid())
        m.forward = lambda g, x, m=m: x * m.psi(torch.relu(m.W_g(g) + m.W_x(x)))
        return m

    net = nn.Module()
    chans = [64, 128, 256, 512, 512, 512, 512, 512]
    ci = cin
    for i, co in enumerate(chans):
        setattr(net, f'Conv{i+1}', conv_block(ci, co, innermost=(i == 7),
                                              outermost=(i == 0)))
        ci = co
    net.Up8 = up_conv(512, 512, innermost=True)
    net.Att8 = att_block(512, 512, 512)
    for lvl, (cin2, cout2, fi) in zip(range(7, 1, -1),
                                      [(512, 512, 512), (512, 512, 512),
                                       (512, 512, 512), (512, 256, 128),
                                       (256, 128, 64), (128, 64, 32)]):
        setattr(net, f'Up{lvl}', up_conv(cin2, cout2))
        setattr(net, f'Att{lvl}', att_block(cout2, cout2, fi))
    net.Up1 = up_conv(64, cout, outermost=True)

    def forward(x, net=net):
        enc = []
        h = x
        for i in range(8):
            h = getattr(net, f'Conv{i+1}')(h)
            enc.append(h)
        d = net.Up8(enc[7])
        s = net.Att8(d, enc[6])
        d = torch.cat((s, d), 1)
        for lvl, si in zip(range(7, 1, -1), range(5, -1, -1)):
            d = getattr(net, f'Up{lvl}')(d)
            s = getattr(net, f'Att{lvl}')(d, enc[si])
            d = torch.cat((s, d), 1)
        return net.Up1(d)

    net.forward = forward
    return net


def test_att_unet_import_forward_parity():
    from deepliif_tpu.nets import att_unet
    net = _rand_init(torch_att_unet())
    x = torch.randn(1, 3, 256, 256)
    with torch.no_grad():
        ref = net(x).numpy().transpose(0, 2, 3, 1)
    params = ti._as_jnp(ti.import_att_unet(net.state_dict()))
    out = att_unet.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    diff = np.abs(np.asarray(out) - ref)
    assert diff.max() < 2e-3, diff.max()
