"""Network zoo: factories mirroring the reference define_G / define_D
(/root/reference/deepliif/models/networks.py:142-238), plus optimizer and
LR-schedule factories (networks.py:46-81) built on optax.

Each factory returns a ``Net`` with ``init(key) -> params`` and
``apply(params, x, train=False, rng=None) -> y``; both are pure, so nets can
be stacked (layers.tree_stack) and vmapped into batched ensembles.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import optax

from . import att_unet, discriminators, layers, losses, resnet, unet, vgg  # noqa: F401


@dataclasses.dataclass(frozen=True)
class Net:
    kind: str
    config: dict
    init: Callable[..., Any]
    apply: Callable[..., Any]


def define_g(input_nc, output_nc, ngf=64, net_g='resnet_9blocks', norm='batch',
             use_dropout=True, init_type='normal', init_gain=0.02,
             padding_type='reflect', upsample='convtranspose', dtype=None):
    """Generator factory. Supported: resnet_Nblocks, unet_32..unet_512,
    unet_512_attention."""
    if net_g.startswith('resnet_'):
        blocks_str = net_g.split('_')[1].replace('blocks', '')
        if not blocks_str.isdigit():
            raise NotImplementedError(f'Generator [{net_g}] not recognized')
        n_blocks = int(blocks_str)
        cfg = dict(input_nc=input_nc, output_nc=output_nc, ngf=ngf,
                   n_blocks=n_blocks, norm=norm, use_dropout=use_dropout,
                   padding_type=padding_type, upsample=upsample)
        init = functools.partial(resnet.init, input_nc=input_nc, output_nc=output_nc,
                                 ngf=ngf, n_blocks=n_blocks, norm=norm,
                                 use_dropout=use_dropout, padding_type=padding_type,
                                 upsample=upsample, init_type=init_type,
                                 init_gain=init_gain)
        apply = functools.partial(resnet.apply, n_blocks=n_blocks, norm=norm,
                                  use_dropout=use_dropout, padding_type=padding_type,
                                  upsample=upsample, dtype=dtype)
        return Net('resnet', cfg, init, apply)

    if net_g == 'unet_512_attention':
        cfg = dict(input_nc=input_nc, output_nc=output_nc)
        init = functools.partial(att_unet.init, img_ch=input_nc, output_ch=output_nc,
                                 init_type=init_type, init_gain=init_gain)
        apply = functools.partial(att_unet.apply, dtype=dtype)
        return Net('att_unet', cfg, init, apply)

    if net_g.startswith('unet_'):
        size = int(net_g.split('_')[1])
        num_downs = {32: 5, 64: 6, 128: 7, 256: 8, 512: 9}[size]
        cfg = dict(input_nc=input_nc, output_nc=output_nc, ngf=ngf,
                   num_downs=num_downs, norm=norm, use_dropout=use_dropout)
        init = functools.partial(unet.init, input_nc=input_nc, output_nc=output_nc,
                                 num_downs=num_downs, ngf=ngf, norm=norm,
                                 use_dropout=use_dropout, init_type=init_type,
                                 init_gain=init_gain)
        apply = functools.partial(unet.apply, num_downs=num_downs, norm=norm,
                                  use_dropout=use_dropout, dtype=dtype)
        return Net('unet', cfg, init, apply)

    raise NotImplementedError(f'Generator [{net_g}] not recognized')


def define_d(input_nc, ndf=64, net_d='n_layers', n_layers_d=3, norm='batch',
             init_type='normal', init_gain=0.02, dtype=None):
    """Discriminator factory: basic (PatchGAN n=3) | n_layers | pixel."""
    if net_d == 'basic':
        n_layers_d = 3
        net_d = 'n_layers'
    if net_d == 'n_layers':
        cfg = dict(input_nc=input_nc, ndf=ndf, n_layers=n_layers_d, norm=norm)
        init = functools.partial(discriminators.nlayer_init, input_nc=input_nc,
                                 ndf=ndf, n_layers=n_layers_d, norm=norm,
                                 init_type=init_type, init_gain=init_gain)
        apply = functools.partial(discriminators.nlayer_apply, n_layers=n_layers_d,
                                  norm=norm, dtype=dtype)
        return Net('nlayer_d', cfg, init, apply)
    if net_d == 'pixel':
        cfg = dict(input_nc=input_nc, ndf=ndf, norm=norm)
        init = functools.partial(discriminators.pixel_init, input_nc=input_nc,
                                 ndf=ndf, norm=norm, init_type=init_type,
                                 init_gain=init_gain)
        apply = functools.partial(discriminators.pixel_apply, norm=norm, dtype=dtype)
        return Net('pixel_d', cfg, init, apply)
    raise NotImplementedError(f'Discriminator [{net_d}] not recognized')


# ---------------------------------------------------------------------------
# schedules & optimizers (reference networks.py:46-81)
# ---------------------------------------------------------------------------

def make_lr_schedule(opt, steps_per_epoch=1):
    """Epoch-granular schedule as an optax schedule over *steps*.

    linear: flat for n_epochs, then linear decay to 0 over n_epochs_decay
    (+1 in the denominator matches the reference lambda_rule,
    networks.py:68-72).
    """
    policy = getattr(opt, 'lr_policy', 'linear')
    n_epochs = getattr(opt, 'n_epochs', 100)
    epoch_count = getattr(opt, 'epoch_count', 1)

    import jax.numpy as jnp

    if policy == 'linear':
        n_decay = getattr(opt, 'n_epochs_decay', 100)

        def sched(step):
            epoch = step // max(steps_per_epoch, 1)
            over = jnp.maximum(0, epoch + epoch_count - n_epochs)
            return 1.0 - over / float(n_decay + 1)
        return sched
    if policy == 'step':
        decay_iters = getattr(opt, 'lr_decay_iters', 50)

        def sched(step):
            epoch = step // max(steps_per_epoch, 1)
            return 0.1 ** (epoch // decay_iters)
        return sched
    if policy == 'cosine':
        def sched(step):
            epoch = step // max(steps_per_epoch, 1)
            return 0.5 * (1 + jnp.cos(jnp.pi * epoch / n_epochs))
        return sched
    if policy == 'plateau':
        # plateau is metric-driven, not step-driven: the LR lives in the
        # optimizer state (inject_hyperparams, see make_optimizer) and the
        # train loop's PlateauController rescales it between epochs.
        return lambda step: 1.0
    raise NotImplementedError(f'lr policy [{policy}] not implemented')


def make_optimizer(opt, lr, steps_per_epoch=1):
    """Build an optax optimizer by name with the reference's LR schedule.

    For lr_policy='plateau' the learning rate is injected into the optimizer
    state (optax.inject_hyperparams) so the host-side plateau controller
    (train_loop.PlateauController; reference ReduceLROnPlateau factor=0.2
    threshold=0.01 patience=5, networks.py:74-75) can rescale it between
    epochs without recompiling the step.
    """
    name = getattr(opt, 'optimizer', 'adam').lower()
    beta1 = getattr(opt, 'beta1', 0.5)
    policy = getattr(opt, 'lr_policy', 'linear')

    def base(learning_rate):
        if name == 'adam':
            return optax.adam(learning_rate, b1=beta1, b2=0.999)
        if name == 'adamw':
            return optax.adamw(learning_rate, b1=beta1, b2=0.999)
        if name == 'sgd':
            return optax.sgd(learning_rate)
        if name == 'rmsprop':
            return optax.rmsprop(learning_rate)
        if name == 'adagrad':
            return optax.adagrad(learning_rate)
        raise NotImplementedError(f'optimizer [{name}] not implemented')

    if policy == 'plateau':
        return optax.inject_hyperparams(base)(learning_rate=lr)

    sched = make_lr_schedule(opt, steps_per_epoch)
    return base(lambda step: lr * sched(step))
