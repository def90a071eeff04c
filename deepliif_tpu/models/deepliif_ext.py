"""DeepLIIFExt model: per-modality classified segmentation.

Parity with the reference DeepLIIFExtModel
(/root/reference/deepliif/models/DeepLIIFExt_model.py:7-319):
  * M translators G_i: A -> B_i;
  * M seg generators GS_i consuming concat(A, fake_B_1, fake_B_i) (9 ch);
  * mod discriminators on concat(A, B_i) (6 ch); seg discriminators on
    concat(A, B_1*, B_i*, BS_i) (12 ch) where B* are reals for both real and
    fake seg predictions (real_concatenated, ref :154-157);
  * losses: mods GAN(gan_mode)+SmoothL1*lambda_L1; segs GAN+SmoothL1 with
    uniform 1/M weights; NO VGG term (ref :251-266). Reference quirk kept:
    the G-side seg GAN term uses the *mod* criterion (vanilla) while the
    D-side uses gan_mode_s (ref :243-246 vs :204-211).

All M translator (and M seg) nets are stacked + vmapped as in the flagship.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from .. import nets
from ..nets import layers as L
from ..nets import losses
from . import register_model


@dataclasses.dataclass(frozen=True)
class DeepLIIFExtDef:
    modalities_no: int = 4
    seg_gen: bool = True
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    ndf: int = 64
    net_g: tuple = ('resnet_9blocks',) * 4
    net_gs: tuple = ('unet_512',) * 4
    net_d: str = 'n_layers'
    net_ds: str = 'n_layers'
    n_layers_d: int = 4
    norm: str = 'batch'
    use_dropout: bool = True
    padding_type: str = 'zero'
    gan_mode: str = 'vanilla'
    gan_mode_s: str = 'lsgan'
    lambda_l1: float = 100.0
    loss_g_weights: tuple = (0.25,) * 4
    loss_d_weights: tuple = (0.25,) * 4
    init_type: str = 'normal'
    init_gain: float = 0.02
    dtype: Any = None

    @property
    def loss_gs_weights(self):
        return (1.0 / self.modalities_no,) * self.modalities_no


def def_from_opt(opt):
    m = opt.modalities_no
    net_g = getattr(opt, 'netG', getattr(opt, 'net_g', 'resnet_9blocks'))
    if isinstance(net_g, str):
        net_g = (net_g,) * m
    net_gs = getattr(opt, 'net_gs', 'unet_512')
    if isinstance(net_gs, str):
        net_gs = (net_gs,) * m
    return DeepLIIFExtDef(
        modalities_no=m,
        seg_gen=getattr(opt, 'seg_gen', True),
        ngf=getattr(opt, 'ngf', 64), ndf=getattr(opt, 'ndf', 64),
        net_g=tuple(net_g), net_gs=tuple(net_gs),
        net_d=getattr(opt, 'netD', getattr(opt, 'net_d', 'n_layers')),
        net_ds=getattr(opt, 'net_ds', 'n_layers'),
        n_layers_d=getattr(opt, 'n_layers_D', 4),
        norm=getattr(opt, 'norm', 'batch'),
        use_dropout=not getattr(opt, 'no_dropout', False),
        padding_type=getattr(opt, 'padding', 'zero'),
        gan_mode=getattr(opt, 'gan_mode', 'vanilla'),
        gan_mode_s=getattr(opt, 'gan_mode_s', 'lsgan'),
        lambda_l1=float(getattr(opt, 'lambda_L1', 100.0)),
        loss_g_weights=tuple(getattr(opt, 'loss_G_weights', (1 / m,) * m)),
        loss_d_weights=tuple(getattr(opt, 'loss_D_weights', (1 / m,) * m)),
    )


def _g_net(d, arch):
    return nets.define_g(d.input_nc, d.output_nc, d.ngf, arch, d.norm,
                         d.use_dropout, d.init_type, d.init_gain,
                         padding_type=d.padding_type, dtype=d.dtype)


def _gs_net(d, arch):
    return nets.define_g(d.input_nc * 3, d.output_nc, d.ngf, arch, d.norm,
                         d.use_dropout, d.init_type, d.init_gain,
                         padding_type='reflect', dtype=d.dtype)


def _d_net(d):
    return nets.define_d(d.input_nc + d.output_nc, d.ndf, d.net_d,
                         d.n_layers_d, d.norm, d.init_type, d.init_gain,
                         dtype=d.dtype)


def _ds_net(d):
    return nets.define_d(d.input_nc * 3 + d.output_nc, d.ndf, d.net_ds,
                         d.n_layers_d, d.norm, d.init_type, d.init_gain,
                         dtype=d.dtype)


def init_params(key, d: DeepLIIFExtDef, with_discriminators=True):
    m = d.modalities_no
    keys = L.split_keys(key, 4)
    p = {}
    gk = L.split_keys(keys[0], m)
    net = _g_net(d, d.net_g[0])
    p['G'] = L.tree_stack([net.init(k) for k in gk])
    if d.seg_gen:
        gsk = L.split_keys(keys[1], m)
        gs = _gs_net(d, d.net_gs[0])
        p['GS'] = L.tree_stack([gs.init(k) for k in gsk])
    if with_discriminators:
        dn = _d_net(d)
        p['D'] = L.tree_stack([dn.init(k) for k in L.split_keys(keys[2], m)])
        if d.seg_gen:
            ds = _ds_net(d)
            p['DS'] = L.tree_stack([ds.init(k) for k in L.split_keys(keys[3], m)])
    return p


def generator_forward(params, x, d: DeepLIIFExtDef, *, train=False, rng=None):
    """Returns (fake_mods (M,B,H,W,C), fake_segs (M,B,H,W,C) or None)."""
    m = d.modalities_no
    if train and rng is not None:
        r1, r2 = jax.random.split(rng)
        mod_rngs = jax.random.split(r1, m)
        seg_rngs = jax.random.split(r2, m)
    else:
        mod_rngs = seg_rngs = None

    net = _g_net(d, d.net_g[0])
    if mod_rngs is not None:
        mods = jax.vmap(jax.checkpoint(
            lambda p, r: net.apply(p, x, train=True, rng=r)))(
            params['G'], mod_rngs)
    else:
        mods = jax.vmap(lambda p: net.apply(p, x))(params['G'])

    if not d.seg_gen:
        return mods, None

    # GS_i input: concat(A, fake_B_1, fake_B_i)
    base = jnp.broadcast_to(mods[0][None], mods.shape)
    xb = jnp.broadcast_to(x[None].astype(mods.dtype), mods.shape)
    seg_in = jnp.concatenate([xb, base, mods], axis=-1)  # (M,B,H,W,9)
    gs = _gs_net(d, d.net_gs[0])
    if seg_rngs is not None:
        segs = jax.vmap(jax.checkpoint(
            lambda p, xi, r: gs.apply(p, xi, train=True, rng=r)))(
            params['GS'], seg_in, seg_rngs)
    else:
        segs = jax.vmap(lambda p, xi: gs.apply(p, xi))(params['GS'], seg_in)
    return mods, segs


def _cond_seg(x, real_mods):
    """real_concatenated: concat(A, real_B_1, real_B_i) per modality."""
    m = real_mods.shape[0]
    xb = jnp.broadcast_to(x[None], real_mods.shape)
    base = jnp.broadcast_to(real_mods[0][None], real_mods.shape)
    return jnp.concatenate([xb, base, real_mods], axis=-1)  # (M,B,H,W,9)


def d_loss_fn(d_params, g_out, batch, d: DeepLIIFExtDef):
    x = batch['A']
    real_mods = batch['B_mods']
    fake_mods = jax.lax.stop_gradient(g_out['mods'])
    w_d = jnp.asarray(d.loss_d_weights, jnp.float32)
    dn = _d_net(d)

    xb = jnp.broadcast_to(x[None], fake_mods.shape)
    pf = jax.vmap(lambda p, c: dn.apply(p, c))(
        d_params['D'], jnp.concatenate([xb, fake_mods], -1))
    pr = jax.vmap(lambda p, c: dn.apply(p, c))(
        d_params['D'], jnp.concatenate([xb, real_mods], -1))
    lf = jax.vmap(lambda p: losses.gan_loss(p, False, d.gan_mode))(pf)
    lr = jax.vmap(lambda p: losses.gan_loss(p, True, d.gan_mode))(pr)
    loss = ((lf + lr) * 0.5 * w_d).sum()
    terms = {'D_fake': lf, 'D_real': lr}

    if d.seg_gen:
        real_segs = batch['B_segs']
        fake_segs = jax.lax.stop_gradient(g_out['segs'])
        cond = _cond_seg(x, real_mods)
        ds = _ds_net(d)
        pfs = jax.vmap(lambda p, c: ds.apply(p, c))(
            d_params['DS'], jnp.concatenate([cond, fake_segs], -1))
        prs = jax.vmap(lambda p, c: ds.apply(p, c))(
            d_params['DS'], jnp.concatenate([cond, real_segs], -1))
        lfs = jax.vmap(lambda p: losses.gan_loss(p, False, d.gan_mode_s))(pfs)
        lrs = jax.vmap(lambda p: losses.gan_loss(p, True, d.gan_mode_s))(prs)
        w_ds = jnp.asarray(d.loss_gs_weights, jnp.float32)
        loss = loss + ((lfs + lrs) * 0.5 * w_ds).sum()
        terms.update({'DS_fake': lfs, 'DS_real': lrs})
    return loss, terms


def g_loss_fn(g_params, d_params, batch, d: DeepLIIFExtDef, rng):
    x = batch['A']
    real_mods = batch['B_mods']
    mods, segs = generator_forward(g_params, x, d, train=True, rng=rng)
    w_g = jnp.asarray(d.loss_g_weights, jnp.float32)
    dn = _d_net(d)

    xb = jnp.broadcast_to(x[None], mods.shape)
    pf = jax.vmap(lambda p, c: dn.apply(p, c))(
        d_params['D'], jnp.concatenate([xb, mods], -1))
    l_gan = jax.vmap(lambda p: losses.gan_loss(p, True, d.gan_mode))(pf)
    l_l1 = jax.vmap(losses.smooth_l1)(mods, real_mods) * d.lambda_l1
    loss = ((l_gan + l_l1) * w_g).sum()
    terms = {'G_GAN': l_gan, 'G_L1': l_l1}

    if d.seg_gen:
        real_segs = batch['B_segs']
        cond = _cond_seg(x, real_mods)
        ds = _ds_net(d)
        pfs = jax.vmap(lambda p, c: ds.apply(p, c))(
            d_params['DS'], jnp.concatenate([cond, segs], -1))
        # reference quirk: G-side seg GAN uses the MOD criterion (ref :246)
        l_gan_s = jax.vmap(lambda p: losses.gan_loss(p, True, d.gan_mode))(pfs)
        l_l1_s = jax.vmap(losses.smooth_l1)(segs, real_segs) * d.lambda_l1
        w_gs = jnp.asarray(d.loss_gs_weights, jnp.float32)
        loss = loss + ((l_gan_s + l_l1_s) * w_gs).sum()
        terms.update({'GS_GAN': l_gan_s, 'GS_L1': l_l1_s})

    out = {'mods': mods}
    if segs is not None:
        out['segs'] = segs
    return loss, (terms, out)


def create_train_state(key, d: DeepLIIFExtDef, opt, steps_per_epoch=1):
    from .deepliif import TrainState
    params = init_params(key, d, with_discriminators=True)
    g_params = {k: params[k] for k in ('G', 'GS') if k in params}
    d_params = {k: params[k] for k in ('D', 'DS') if k in params}
    g_tx = nets.make_optimizer(opt, getattr(opt, 'lr_g', 2e-4), steps_per_epoch)
    d_tx = nets.make_optimizer(opt, getattr(opt, 'lr_d', 2e-4), steps_per_epoch)
    return TrainState(g_params, d_params, g_tx.init(g_params),
                      d_tx.init(d_params), jnp.zeros((), jnp.int32)), g_tx, d_tx


def make_train_step_body(d: DeepLIIFExtDef, g_tx, d_tx):
    from .deepliif import TrainState

    def step(state, batch, rng):
        mods, segs = generator_forward(state.g_params, batch['A'], d,
                                       train=True, rng=rng)
        g_out = {'mods': mods}
        if segs is not None:
            g_out['segs'] = segs
        (d_loss, d_terms), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, g_out, batch, d)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        (g_loss, (g_terms, g_out)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, d_params, batch, d, rng)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        new_state = TrainState(g_params, d_params, g_opt_state, d_opt_state,
                               state.step + 1)
        return new_state, {'loss_G': g_loss, 'loss_D': d_loss, **g_terms,
                           **d_terms}, g_out

    return step


def make_train_step(d, g_tx, d_tx):
    return jax.jit(make_train_step_body(d, g_tx, d_tx), donate_argnums=(0,))


def make_eval_losses(d: DeepLIIFExtDef, vgg_params=None):
    """Validation losses without updates — the reference computes val
    losses for EVERY family via the family-generic calculate_losses()
    (reference cli.py:495-511); Ext has no VGG term so vgg_params is
    accepted only for signature uniformity."""

    def eval_losses(state, batch, rng):
        mods, segs = generator_forward(state.g_params, batch['A'], d,
                                       train=True, rng=rng)
        g_out = {'mods': mods}
        if segs is not None:
            g_out['segs'] = segs
        d_loss, d_terms = d_loss_fn(state.d_params, g_out, batch, d)
        g_loss, (g_terms, _) = g_loss_fn(state.g_params, state.d_params,
                                         batch, d, rng)
        return {'loss_G': g_loss, 'loss_D': d_loss, **g_terms, **d_terms}

    return jax.jit(eval_losses)


@register_model('DeepLIIFExt')
class DeepLIIFExtModel:
    def_from_opt = staticmethod(def_from_opt)
    init_params = staticmethod(init_params)
    generator_forward = staticmethod(generator_forward)
    make_train_step = staticmethod(make_train_step)
    make_eval_losses = staticmethod(make_eval_losses)
    create_train_state = staticmethod(create_train_state)
