"""SDG model: multi-input (channel-concat) multi-output translation, no seg.

Parity with the reference SDGModel
(/root/reference/deepliif/models/SDG_model.py:7-221): M generators consume
concat of all input modalities (input_nc * input_no channels); losses
GAN + SmoothL1*lambda_L1 + VGG*lambda_feat per modality.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from .. import nets
from ..nets import layers as L
from ..nets import losses, vgg
from . import register_model


@dataclasses.dataclass(frozen=True)
class SDGDef:
    modalities_no: int = 4
    input_no: int = 1
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    ndf: int = 64
    net_g: tuple = ('resnet_9blocks',) * 4
    net_d: str = 'n_layers'
    n_layers_d: int = 4
    norm: str = 'batch'
    use_dropout: bool = True
    padding_type: str = 'zero'
    upsample: str = 'convtranspose'
    gan_mode: str = 'vanilla'
    lambda_l1: float = 100.0
    lambda_feat: float = 100.0
    loss_g_weights: tuple = (0.25,) * 4
    loss_d_weights: tuple = (0.25,) * 4
    init_type: str = 'normal'
    init_gain: float = 0.02
    dtype: Any = None


def def_from_opt(opt):
    m = opt.modalities_no
    net_g = getattr(opt, 'netG', getattr(opt, 'net_g', 'resnet_9blocks'))
    if isinstance(net_g, str):
        net_g = (net_g,) * m
    return SDGDef(
        modalities_no=m, input_no=getattr(opt, 'input_no', 1),
        ngf=getattr(opt, 'ngf', 64), ndf=getattr(opt, 'ndf', 64),
        net_g=tuple(net_g),
        net_d=getattr(opt, 'netD', getattr(opt, 'net_d', 'n_layers')),
        n_layers_d=getattr(opt, 'n_layers_D', 4),
        norm=getattr(opt, 'norm', 'batch'),
        use_dropout=not getattr(opt, 'no_dropout', False),
        padding_type=getattr(opt, 'padding', 'zero'),
        upsample=getattr(opt, 'upsample', 'convtranspose'),
        gan_mode=getattr(opt, 'gan_mode', 'vanilla'),
        lambda_l1=float(getattr(opt, 'lambda_L1', 100.0)),
        lambda_feat=float(getattr(opt, 'lambda_feat', 100.0)),
        loss_g_weights=tuple(getattr(opt, 'loss_G_weights', (1 / m,) * m)),
        loss_d_weights=tuple(getattr(opt, 'loss_D_weights', (1 / m,) * m)),
    )


def _g_net(d):
    return nets.define_g(d.input_nc * d.input_no, d.output_nc, d.ngf,
                         d.net_g[0], d.norm, d.use_dropout, d.init_type,
                         d.init_gain, padding_type=d.padding_type,
                         upsample=d.upsample, dtype=d.dtype)


def _d_net(d):
    return nets.define_d(d.input_nc * d.input_no + d.output_nc, d.ndf,
                         d.net_d, d.n_layers_d, d.norm, d.init_type,
                         d.init_gain, dtype=d.dtype)


def init_params(key, d: SDGDef, with_discriminators=True):
    m = d.modalities_no
    keys = L.split_keys(key, 2)
    net = _g_net(d)
    p = {'G': L.tree_stack([net.init(k) for k in L.split_keys(keys[0], m)])}
    if with_discriminators:
        dn = _d_net(d)
        p['D'] = L.tree_stack([dn.init(k) for k in L.split_keys(keys[1], m)])
    return p


def generator_forward(params, x, d: SDGDef, *, train=False, rng=None):
    """x: (B,H,W,input_nc*input_no) -> (M,B,H,W,output_nc)."""
    net = _g_net(d)
    if train and rng is not None:
        rngs = jax.random.split(rng, d.modalities_no)
        return jax.vmap(jax.checkpoint(
            lambda p, r: net.apply(p, x, train=True, rng=r)))(
            params['G'], rngs), None
    return jax.vmap(lambda p: net.apply(p, x))(params['G']), None


def d_loss_fn(d_params, g_out, batch, d: SDGDef):
    x = batch['A']
    m = d.modalities_no
    real = batch['B_mods'][:m]
    fake = jax.lax.stop_gradient(g_out['mods'])
    dn = _d_net(d)
    xb = jnp.broadcast_to(x[None], (m,) + x.shape)
    pf = jax.vmap(lambda p, c: dn.apply(p, c))(
        d_params['D'], jnp.concatenate([xb, fake], -1))
    pr = jax.vmap(lambda p, c: dn.apply(p, c))(
        d_params['D'], jnp.concatenate([xb, real], -1))
    lf = jax.vmap(lambda p: losses.gan_loss(p, False, d.gan_mode))(pf)
    lr = jax.vmap(lambda p: losses.gan_loss(p, True, d.gan_mode))(pr)
    w = jnp.asarray(d.loss_d_weights, jnp.float32)
    return ((lf + lr) * 0.5 * w).sum(), {'D_fake': lf, 'D_real': lr}


def g_loss_fn(g_params, d_params, batch, d: SDGDef, vgg_params, rng):
    x = batch['A']
    m = d.modalities_no
    real = batch['B_mods'][:m]
    mods, _ = generator_forward(g_params, x, d, train=True, rng=rng)
    dn = _d_net(d)
    xb = jnp.broadcast_to(x[None], (m,) + x.shape)
    pf = jax.vmap(lambda p, c: dn.apply(p, c))(
        d_params['D'], jnp.concatenate([xb, mods], -1))
    l_gan = jax.vmap(lambda p: losses.gan_loss(p, True, d.gan_mode))(pf)
    l_l1 = jax.vmap(losses.smooth_l1)(mods, real) * d.lambda_l1
    l_vgg = jax.vmap(lambda a, b: vgg.vgg_loss(vgg_params, a, b))(mods, real) * d.lambda_feat
    w = jnp.asarray(d.loss_g_weights, jnp.float32)
    loss = ((l_gan + l_l1 + l_vgg) * w).sum()
    return loss, ({'G_GAN': l_gan, 'G_L1': l_l1, 'G_VGG': l_vgg},
                  {'mods': mods})


def create_train_state(key, d: SDGDef, opt, steps_per_epoch=1):
    from .deepliif import TrainState
    params = init_params(key, d)
    g_params = {'G': params['G']}
    d_params = {'D': params['D']}
    g_tx = nets.make_optimizer(opt, getattr(opt, 'lr_g', 2e-4), steps_per_epoch)
    d_tx = nets.make_optimizer(opt, getattr(opt, 'lr_d', 2e-4), steps_per_epoch)
    return TrainState(g_params, d_params, g_tx.init(g_params),
                      d_tx.init(d_params), jnp.zeros((), jnp.int32)), g_tx, d_tx


def make_train_step_body(d: SDGDef, g_tx, d_tx, vgg_params):
    from .deepliif import TrainState

    def step(state, batch, rng):
        mods, _ = generator_forward(state.g_params, batch['A'], d, train=True,
                                    rng=rng)
        g_out = {'mods': mods}
        (d_loss, d_terms), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, g_out, batch, d)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        (g_loss, (g_terms, g_out)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, d_params, batch, d,
                                     vgg_params, rng)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        return (TrainState(g_params, d_params, g_opt_state, d_opt_state,
                           state.step + 1),
                {'loss_G': g_loss, 'loss_D': d_loss, **g_terms, **d_terms},
                g_out)

    return step


def make_train_step(d, g_tx, d_tx, vgg_params):
    return jax.jit(make_train_step_body(d, g_tx, d_tx, vgg_params),
                   donate_argnums=(0,))


def make_eval_losses(d: SDGDef, vgg_params):
    """Validation losses without updates (reference family-generic
    calculate_losses(), cli.py:495-511)."""

    def eval_losses(state, batch, rng):
        mods, _ = generator_forward(state.g_params, batch['A'], d,
                                    train=True, rng=rng)
        d_loss, d_terms = d_loss_fn(state.d_params, {'mods': mods}, batch, d)
        g_loss, (g_terms, _) = g_loss_fn(state.g_params, state.d_params,
                                         batch, d, vgg_params, rng)
        return {'loss_G': g_loss, 'loss_D': d_loss, **g_terms, **d_terms}

    return jax.jit(eval_losses)


@register_model('SDG')
class SDGModel:
    def_from_opt = staticmethod(def_from_opt)
    init_params = staticmethod(init_params)
    generator_forward = staticmethod(generator_forward)
    make_train_step = staticmethod(make_train_step)
    make_eval_losses = staticmethod(make_eval_losses)
    create_train_state = staticmethod(create_train_state)
