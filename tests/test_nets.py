"""Shape / smoke tests for the network zoo (small spatial sizes for speed)."""

import jax
import jax.numpy as jnp
import pytest

from deepliif_tpu import nets
from deepliif_tpu.nets import layers as L


@pytest.mark.parametrize('net_g,size', [
    ('resnet_9blocks', 64),
    ('resnet_6blocks', 64),
    ('unet_32', 32),
    ('unet_64', 64),
])
def test_generator_shapes(net_g, size, rng_key):
    net = nets.define_g(3, 3, ngf=8, net_g=net_g)
    params = net.init(rng_key)
    x = jnp.zeros((2, size, size, 3))
    y = jax.jit(lambda p, x: net.apply(p, x))(params, x)
    assert y.shape == (2, size, size, 3)
    assert float(jnp.abs(y).max()) <= 1.0 + 1e-6  # tanh output


def test_unet_512_shape(rng_key):
    net = nets.define_g(3, 3, ngf=4, net_g='unet_512')
    params = net.init(rng_key)
    x = jnp.zeros((1, 512, 512, 3))
    y = net.apply(params, x)
    assert y.shape == (1, 512, 512, 3)


def test_att_unet_shape(rng_key):
    net = nets.define_g(3, 3, net_g='unet_512_attention')
    params = net.init(rng_key)
    x = jnp.zeros((1, 256, 256, 3))
    y = net.apply(params, x)
    assert y.shape == (1, 256, 256, 3)


@pytest.mark.parametrize('net_d,n_layers,expect', [
    ('basic', 3, 30),     # 256 -> 30x30 patch map for n=3
    ('n_layers', 4, 14),  # DeepLIIF default n_layers_D=4 on 256 input
    ('pixel', 0, 256),
])
def test_discriminator_shapes(net_d, n_layers, expect, rng_key):
    net = nets.define_d(6, ndf=16, net_d=net_d, n_layers_d=n_layers)
    params = net.init(rng_key)
    x = jnp.zeros((1, 256, 256, 6))
    y = net.apply(params, x)
    assert y.shape == (1, expect, expect, 1)


def test_discriminator_patch_size_matches_torch_formula(rng_key):
    """n_layers=4, 512 input: 3 stride-2 convs + 2 stride-1 k4 convs."""
    net = nets.define_d(6, ndf=8, net_d='n_layers', n_layers_d=4)
    params = net.init(rng_key)
    y = net.apply(params, jnp.zeros((1, 512, 512, 6)))
    assert y.shape[1] == y.shape[2] == 30


def test_ensemble_stacking_vmap(rng_key):
    """4 translators stacked and vmapped = the TPU ensemble pattern."""
    net = nets.define_g(3, 3, ngf=8, net_g='resnet_6blocks')
    keys = L.split_keys(rng_key, 4)
    stacked = L.tree_stack([net.init(k) for k in keys])
    x = jnp.ones((2, 64, 64, 3))
    ys = jax.vmap(lambda p: net.apply(p, x))(stacked)
    assert ys.shape == (4, 2, 64, 64, 3)
    # each net has different weights -> different outputs
    assert float(jnp.abs(ys[0] - ys[1]).max()) > 1e-4
    # vmapped output == per-net output
    y0 = net.apply(L.tree_unstack(stacked, 4)[0], x)
    assert float(jnp.abs(ys[0] - y0).max()) < 1e-5


def test_dropout_only_when_training(rng_key):
    net = nets.define_g(3, 3, ngf=8, net_g='resnet_6blocks', use_dropout=True)
    params = net.init(rng_key)
    x = jnp.ones((1, 64, 64, 3))
    y1 = net.apply(params, x)
    y2 = net.apply(params, x)
    assert float(jnp.abs(y1 - y2).max()) == 0.0  # inference deterministic
    r1 = net.apply(params, x, train=True, rng=jax.random.PRNGKey(1))
    r2 = net.apply(params, x, train=True, rng=jax.random.PRNGKey(2))
    assert float(jnp.abs(r1 - r2).max()) > 1e-6  # dropout active


def test_spectral_normalize_tree(rng_key):
    import numpy as np
    from deepliif_tpu.nets import layers as L2
    w = jax.random.normal(rng_key, (3, 3, 8, 16)) * 5.0
    params = {'conv': {'w': w, 'b': jnp.zeros(16)}}
    params = L2.add_spectral_u(params, jax.random.PRNGKey(1))
    assert 'u' in params['conv']
    normed, refreshed = L2.spectral_normalize_tree(params, n_iter=20)
    mat = np.asarray(normed['conv']['w']).reshape(-1, 16)
    sigma = np.linalg.svd(mat, compute_uv=False)[0]
    assert abs(sigma - 1.0) < 2e-2, sigma
    # stacked kernels too
    ws = jnp.stack([w, 2 * w])
    sp = L2.add_spectral_u({'c': {'w': ws}}, jax.random.PRNGKey(2))
    normed2, _ = L2.spectral_normalize_tree(sp, n_iter=20)
    for i in range(2):
        m = np.asarray(normed2['c']['w'][i]).reshape(-1, 16)
        assert abs(np.linalg.svd(m, compute_uv=False)[0] - 1.0) < 2e-2


def test_spectral_norm_model_forward(rng_key):
    from deepliif_tpu.models import deepliif as dl2
    d = dl2.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                        net_gs=('unet_32',) * 3, ngf=8, ndf=8, norm='spectral',
                        seg_weights=(0.4, 0.3, 0.3))
    params = dl2.init_params(rng_key, d, with_discriminators=False)
    mods, seg = dl2.generator_forward(params, jnp.zeros((1, 64, 64, 3)), d)
    assert mods.shape == (2, 1, 64, 64, 3)
    assert bool(jnp.isfinite(seg).all())


def test_unet_dropout_targets_intermediate_blocks(monkeypatch, rng_key):
    """Dropout must fire only on the intermediate ngf*8 blocks — depths
    4..num_downs-2 (reference networks.py:535-536), not the outer blocks."""
    from deepliif_tpu.nets import unet as unet_mod
    from deepliif_tpu.nets import layers as L2
    calls = []
    real_dropout = L2.dropout

    def spy(x, rng, rate=0.5, train=False):
        if train and rng is not None:
            calls.append(x.shape[-1])
        return real_dropout(x, rng, rate, train)

    monkeypatch.setattr(unet_mod.L, 'dropout', spy)
    ngf = 4
    num_downs = 7  # unet_128: depths 4,5 are the intermediate ngf*8 blocks
    net = nets.define_g(3, 3, ngf=ngf, net_g='unet_128', use_dropout=True)
    params = net.init(rng_key)
    net.apply(params, jnp.zeros((1, 128, 128, 3)), train=True,
              rng=jax.random.PRNGKey(0))
    # two intermediate blocks; dropout applies to the up output of each,
    # which has outer_nc = ngf*8 channels
    assert calls == [ngf * 8, ngf * 8], calls


def test_conv_bias_follows_reference_norm_rule():
    """Reference rule (networks.py): use_bias = norm_layer == InstanceNorm2d
    — ONLY instance-norm nets carry conv biases. A 'spectral'/'none' net
    with biases would be structurally incompatible with reference
    checkpoints."""
    from deepliif_tpu.nets import layers as L
    assert L.norm_use_bias('instance')
    for n in ('batch', 'none', 'spectral'):
        assert not L.norm_use_bias(n), n
    from deepliif_tpu.nets import resnet
    p = resnet.init(jax.random.PRNGKey(0), 3, 3, ngf=8, n_blocks=1,
                    norm='none')
    assert 'b' not in p['res0_conv1']


def test_resnet_init_supports_deep_block_counts():
    """define_g accepts any resnet_Nblocks; init's key pool must scale
    with n_blocks (a fixed pool of 64 crashed at 14+ blocks)."""
    from deepliif_tpu.nets import resnet
    p = resnet.init(jax.random.PRNGKey(0), 3, 3, ngf=4, n_blocks=16,
                    norm='batch')
    assert 'res15_conv2' in p
