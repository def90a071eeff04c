"""CycleGAN model: unpaired multi-domain translation.

Parity with the reference CycleGANModel
(/root/reference/deepliif/models/CycleGAN_model.py:11-283): per-modality
GA_i / GB_i / DA_i / DB_i (stacked + vmapped), 50-capacity image pools with
50% swap (host-side ring buffers — between-step state stays off-device),
cycle L1 (lambda=10) + GAN + VGG losses. Reference ordering kept: G updates
BEFORE D (ref :269-283), D sees pool-mixed fakes.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import nets
from ..nets import layers as L
from ..nets import losses, vgg
from . import register_model


@dataclasses.dataclass(frozen=True)
class CycleGANDef:
    modalities_no: int = 1
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    ndf: int = 64
    net_g: tuple = ('resnet_9blocks',)
    net_d: str = 'n_layers'
    n_layers_d: int = 4
    norm: str = 'batch'
    use_dropout: bool = True
    padding_type: str = 'zero'
    upsample: str = 'convtranspose'
    gan_mode: str = 'lsgan'
    label_smoothing: float = 0.0
    lambda_a: float = 10.0
    lambda_b: float = 10.0
    loss_g_weights: tuple = (1.0,)
    loss_d_weights: tuple = (1.0,)
    init_type: str = 'normal'
    init_gain: float = 0.02
    dtype: Any = None

    @property
    def loss_cyc_weights(self):
        return (1.0 / self.modalities_no,) * self.modalities_no


def def_from_opt(opt):
    m = opt.modalities_no
    net_g = getattr(opt, 'netG', getattr(opt, 'net_g', 'resnet_9blocks'))
    if isinstance(net_g, str):
        net_g = (net_g,) * m
    return CycleGANDef(
        modalities_no=m,
        ngf=getattr(opt, 'ngf', 64), ndf=getattr(opt, 'ndf', 64),
        net_g=tuple(net_g),
        net_d=getattr(opt, 'netD', getattr(opt, 'net_d', 'n_layers')),
        n_layers_d=getattr(opt, 'n_layers_D', 4),
        norm=getattr(opt, 'norm', 'batch'),
        use_dropout=not getattr(opt, 'no_dropout', False),
        padding_type=getattr(opt, 'padding', 'zero'),
        upsample=getattr(opt, 'upsample', 'convtranspose'),
        gan_mode=getattr(opt, 'gan_mode', 'lsgan'),
        label_smoothing=float(getattr(opt, 'label_smoothing', 0.0)),
        loss_g_weights=tuple(getattr(opt, 'loss_G_weights', (1 / m,) * m)),
        loss_d_weights=tuple(getattr(opt, 'loss_D_weights', (1 / m,) * m)),
    )


def _ga_net(d):
    return nets.define_g(d.input_nc, d.output_nc, d.ngf, d.net_g[0], d.norm,
                         d.use_dropout, d.init_type, d.init_gain,
                         padding_type=d.padding_type, upsample=d.upsample,
                         dtype=d.dtype)


def _gb_net(d):
    return nets.define_g(d.output_nc, d.input_nc, d.ngf, d.net_g[0], d.norm,
                         d.use_dropout, d.init_type, d.init_gain,
                         padding_type=d.padding_type, upsample=d.upsample,
                         dtype=d.dtype)


def _da_net(d):
    return nets.define_d(d.output_nc, d.ndf, d.net_d, d.n_layers_d, d.norm,
                         d.init_type, d.init_gain, dtype=d.dtype)


def _db_net(d):
    return nets.define_d(d.input_nc, d.ndf, d.net_d, d.n_layers_d, d.norm,
                         d.init_type, d.init_gain, dtype=d.dtype)


def init_params(key, d: CycleGANDef, with_discriminators=True):
    m = d.modalities_no
    keys = L.split_keys(key, 4)
    p = {
        'GA': L.tree_stack([_ga_net(d).init(k) for k in L.split_keys(keys[0], m)]),
        'GB': L.tree_stack([_gb_net(d).init(k) for k in L.split_keys(keys[1], m)]),
    }
    if with_discriminators:
        p['DA'] = L.tree_stack([_da_net(d).init(k) for k in L.split_keys(keys[2], m)])
        p['DB'] = L.tree_stack([_db_net(d).init(k) for k in L.split_keys(keys[3], m)])
    return p


class ImagePool:
    """History buffer with 50% swap (reference util/image_pool.py:5-54)."""

    def __init__(self, pool_size=50, seed=None):
        self.pool_size = pool_size
        self.images = []
        self.rng = random.Random(seed)

    def query(self, images):
        if self.pool_size == 0:
            return images
        images = np.asarray(images)
        out = []
        for img in images:
            if len(self.images) < self.pool_size:
                self.images.append(img.copy())
                out.append(img)
            elif self.rng.random() > 0.5:
                idx = self.rng.randint(0, self.pool_size - 1)
                out.append(self.images[idx].copy())
                self.images[idx] = img.copy()
            else:
                out.append(img)
        return np.stack(out)


def generator_forward(params, real_as, real_bs, d: CycleGANDef, *, train=False,
                      rng=None):
    """real_as/real_bs: (M,B,H,W,C). Returns fake_bs, rec_as, fake_as, rec_bs."""
    ga, gb = _ga_net(d), _gb_net(d)
    m = d.modalities_no
    if train and rng is not None:
        r = jax.random.split(rng, 4)
        rgs = [jax.random.split(k, m) for k in r]
        fake_bs = jax.vmap(lambda p, x, k: ga.apply(p, x, train=True, rng=k))(
            params['GA'], real_as, rgs[0])
        rec_as = jax.vmap(lambda p, x, k: gb.apply(p, x, train=True, rng=k))(
            params['GB'], fake_bs, rgs[1])
        fake_as = jax.vmap(lambda p, x, k: gb.apply(p, x, train=True, rng=k))(
            params['GB'], real_bs, rgs[2])
        rec_bs = jax.vmap(lambda p, x, k: ga.apply(p, x, train=True, rng=k))(
            params['GA'], fake_as, rgs[3])
    else:
        fake_bs = jax.vmap(lambda p, x: ga.apply(p, x))(params['GA'], real_as)
        rec_as = jax.vmap(lambda p, x: gb.apply(p, x))(params['GB'], fake_bs)
        fake_as = jax.vmap(lambda p, x: gb.apply(p, x))(params['GB'], real_bs)
        rec_bs = jax.vmap(lambda p, x: ga.apply(p, x))(params['GA'], fake_as)
    return fake_bs, rec_as, fake_as, rec_bs


def inference_forward(params, x, d: CycleGANDef, bto_a=False):
    """Test path: GB when BtoA else GA (reference CycleGAN test flag)."""
    net = _gb_net(d) if bto_a else _ga_net(d)
    key = 'GB' if bto_a else 'GA'
    return jax.vmap(lambda p: net.apply(p, x))(params[key])


def g_loss_fn(g_params, d_params, real_as, real_bs, d: CycleGANDef, vgg_params,
              rng):
    fake_bs, rec_as, fake_as, rec_bs = generator_forward(
        g_params, real_as, real_bs, d, train=True, rng=rng)
    da, db = _da_net(d), _db_net(d)
    w_g = jnp.asarray(d.loss_g_weights, jnp.float32)
    w_cyc = jnp.asarray(d.loss_cyc_weights, jnp.float32)

    pa = jax.vmap(lambda p, x: da.apply(p, x))(d_params['DA'], fake_bs)
    # label smoothing scales the G-side real target too (reference
    # CycleGAN_model.py:113 shares one criterionGAN across G and D)
    loss_ga = (jax.vmap(lambda p: losses.gan_loss(
        p, True, d.gan_mode, d.label_smoothing))(pa) * w_g).sum()
    loss_ga = loss_ga + (jax.vmap(lambda a, b: vgg.vgg_loss(vgg_params, a, b))(
        fake_bs, real_bs) * w_g).sum()
    pb = jax.vmap(lambda p, x: db.apply(p, x))(d_params['DB'], fake_as)
    loss_gb = (jax.vmap(lambda p: losses.gan_loss(
        p, True, d.gan_mode, d.label_smoothing))(pb) * w_g).sum()
    loss_gb = loss_gb + (jax.vmap(lambda a, b: vgg.vgg_loss(vgg_params, a, b))(
        fake_as, real_as) * w_g).sum()

    cyc_a = (jax.vmap(losses.l1)(rec_as, real_as) * d.lambda_a * w_cyc).sum()
    cyc_b = (jax.vmap(losses.l1)(rec_bs, real_bs) * d.lambda_b * w_cyc).sum()

    loss = loss_ga + loss_gb + cyc_a + cyc_b
    terms = {'G_A': loss_ga, 'G_B': loss_gb, 'cycle_A': cyc_a, 'cycle_B': cyc_b}
    return loss, (terms, {'fake_bs': fake_bs, 'fake_as': fake_as,
                          'rec_as': rec_as, 'rec_bs': rec_bs})


def d_loss_fn(d_params, pooled_fake_bs, pooled_fake_as, real_as, real_bs,
              d: CycleGANDef):
    da, db = _da_net(d), _db_net(d)
    w_d = jnp.asarray(d.loss_d_weights, jnp.float32)

    def _basic(dnet, dp, real, fake):
        pr = jax.vmap(lambda p, x: dnet.apply(p, x))(dp, real)
        pf = jax.vmap(lambda p, x: dnet.apply(p, x))(dp, jax.lax.stop_gradient(fake))
        lr = jax.vmap(lambda p: losses.gan_loss(p, True, d.gan_mode,
                                                d.label_smoothing))(pr)
        lf = jax.vmap(lambda p: losses.gan_loss(p, False, d.gan_mode,
                                                d.label_smoothing))(pf)
        return ((lr + lf) * 0.5 * w_d).sum()

    loss_da = _basic(da, d_params['DA'], real_bs, pooled_fake_bs)
    loss_db = _basic(db, d_params['DB'], real_as, pooled_fake_as)
    return loss_da + loss_db, {'D_A': loss_da, 'D_B': loss_db}


def create_train_state(key, d: CycleGANDef, opt, steps_per_epoch=1):
    from .deepliif import TrainState
    params = init_params(key, d)
    g_params = {'GA': params['GA'], 'GB': params['GB']}
    d_params = {'DA': params['DA'], 'DB': params['DB']}
    g_tx = nets.make_optimizer(opt, getattr(opt, 'lr_g', 2e-4), steps_per_epoch)
    d_tx = nets.make_optimizer(opt, getattr(opt, 'lr_d', 2e-4), steps_per_epoch)
    return TrainState(g_params, d_params, g_tx.init(g_params),
                      d_tx.init(d_params), jnp.zeros((), jnp.int32)), g_tx, d_tx


def make_train_steps(d: CycleGANDef, g_tx, d_tx, vgg_params, mesh=None):
    """Two jitted steps with host-side pool query in between (the pool is
    cross-step state; everything else is fused).

    ``mesh``: data-parallel over the device mesh — state/vgg replicated,
    the (M, B, H, W, C) batch tensors sharded on axis 1 ('data'); the
    loss means over the sharded batch make XLA emit the gradient
    all-reduces inside each step. The reference wraps EVERY family in
    DP/DDP uniformly (reference networks.py:118-139) — the host
    image-pool between the two steps already materializes fakes on host,
    so sharding each step needs only these annotations."""
    from .deepliif import TrainState

    if mesh is not None:
        from .. import parallel
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = parallel.replicated(mesh)
        msh = NamedSharding(mesh, P(None, 'data'))
        g_jit = lambda f: jax.jit(f, in_shardings=(repl, msh, msh, repl))
        d_jit = lambda f: jax.jit(f, in_shardings=(repl, msh, msh, msh, msh))
    else:
        g_jit = d_jit = jax.jit

    @g_jit
    def g_step(state, real_as, real_bs, rng):
        (g_loss, (terms, outs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, state.d_params, real_as,
                                     real_bs, d, vgg_params, rng)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        new_state = TrainState(g_params, state.d_params, g_opt_state,
                               state.d_opt_state, state.step)
        return new_state, {'loss_G': g_loss, **terms}, outs

    @d_jit
    def d_step(state, pooled_fake_bs, pooled_fake_as, real_as, real_bs):
        (d_loss, terms), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, pooled_fake_bs, pooled_fake_as, real_as, real_bs, d)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        new_state = TrainState(state.g_params, d_params, state.g_opt_state,
                               d_opt_state, state.step + 1)
        return new_state, {'loss_D': d_loss, **terms}

    return g_step, d_step


def make_eval_losses(d: CycleGANDef, vgg_params):
    """Validation losses without updates (reference family-generic
    calculate_losses(), cli.py:495-511). D losses are computed on the
    CURRENT fakes — the image pool is training-only history state."""

    def eval_losses(state, batch, rng):
        m = d.modalities_no
        real_as = jnp.broadcast_to(batch['A'][None],
                                   (m,) + tuple(batch['A'].shape))
        real_bs = batch['B_mods'][:m]
        g_loss, (g_terms, outs) = g_loss_fn(
            state.g_params, state.d_params, real_as, real_bs, d,
            vgg_params, rng)
        d_loss, d_terms = d_loss_fn(
            state.d_params, outs['fake_bs'], outs['fake_as'], real_as,
            real_bs, d)
        return {'loss_G': g_loss, 'loss_D': d_loss, **g_terms, **d_terms}

    return jax.jit(eval_losses)


@register_model('CycleGAN')
class CycleGANModel:
    def_from_opt = staticmethod(def_from_opt)
    init_params = staticmethod(init_params)
    generator_forward = staticmethod(generator_forward)
    inference_forward = staticmethod(inference_forward)
    make_train_steps = staticmethod(make_train_steps)
    make_eval_losses = staticmethod(make_eval_losses)
    create_train_state = staticmethod(create_train_state)
    ImagePool = ImagePool
