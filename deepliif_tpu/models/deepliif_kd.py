"""DeepLIIFKD: knowledge distillation onto the DeepLIIF topology.

Parity with the reference DeepLIIFKDModel
(/root/reference/deepliif/models/DeepLIIFKD_model.py:9-397): the student has
the DeepLIIF ensemble topology; a frozen teacher (loaded from a model dir)
runs inside the loss; the KD term is KLDiv(log_softmax(student.flat) ||
softmax(teacher.flat)) per output — all M modalities, the aggregated seg,
and each of the M+1 seg branches — with factor 10 (ref :313-349). The
reference's GAN criteria here are hard-coded vanilla (mods) / lsgan (seg).

TPU-native: the teacher ensemble is just another params pytree closed over
by the jitted step — no run_dask-in-forward; one XLA program computes
student forward, teacher forward, all losses, and both updates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .. import nets
from ..nets import losses, vgg
from . import register_model
from . import deepliif as dl


def kd_kl(student, teacher):
    """KLDivLoss(reduction='batchmean') on (1,1,-1)-flattened tensors with
    softmax over the flattened axis (ref :162-164, :304-318). Generalized to
    per-sample flatten + batch mean for batch > 1."""
    s = student.reshape(student.shape[0], -1).astype(jnp.float32)
    t = teacher.reshape(teacher.shape[0], -1).astype(jnp.float32)
    log_p = jax.nn.log_softmax(s, axis=-1)
    q = jax.nn.softmax(t, axis=-1)
    log_q = jax.nn.log_softmax(t, axis=-1)
    return (q * (log_q - log_p)).sum(axis=-1).mean()


def teacher_forward(teacher_params, x, teacher_def: dl.DeepLIIFDef):
    """Frozen teacher: full ensemble incl. per-branch seg outputs."""
    mods, seg = dl.generator_forward(teacher_params, x, teacher_def)
    # recompute branch outputs for per-branch KD terms
    seg_in = jnp.concatenate([x[None].astype(mods.dtype), mods], axis=0)
    net = dl._gs_net(teacher_def, teacher_def.net_gs[0])
    segs = jax.vmap(lambda p, xi: net.apply(p, xi))(teacher_params['GS'], seg_in)
    return jax.lax.stop_gradient(mods), jax.lax.stop_gradient(seg), \
        jax.lax.stop_gradient(segs)


def student_forward_with_branches(g_params, x, d: dl.DeepLIIFDef, rng):
    m = d.modalities_no
    if rng is not None:
        r1, r2 = jax.random.split(rng)
        mod_rngs = jax.random.split(r1, m)
        seg_rngs = jax.random.split(r2, m + 1)
    net = dl._g_net(d, d.net_g[0])
    if rng is not None:
        mods = jax.vmap(jax.checkpoint(
            lambda p, r: net.apply(p, x, train=True, rng=r)))(
            g_params['G'], mod_rngs)
    else:
        mods = jax.vmap(lambda p: net.apply(p, x))(g_params['G'])
    seg_in = jnp.concatenate([x[None].astype(mods.dtype), mods], axis=0)
    gs = dl._gs_net(d, d.net_gs[0])
    if rng is not None:
        segs = jax.vmap(jax.checkpoint(
            lambda p, xi, r: gs.apply(p, xi, train=True, rng=r)))(
            g_params['GS'], seg_in, seg_rngs)
    else:
        segs = jax.vmap(lambda p, xi: gs.apply(p, xi))(g_params['GS'], seg_in)
    w = jnp.asarray(d.seg_weights, segs.dtype)
    seg = jnp.tensordot(w, segs, axes=1)
    return mods, seg, segs


def g_loss_fn(g_params, d_params, batch, d: dl.DeepLIIFDef, vgg_params,
              teacher_params, teacher_def, rng, kd_factor=10.0):
    x = batch['A']
    real_mods = batch['B_mods']
    mods, seg, segs = student_forward_with_branches(g_params, x, d, rng)
    t_mods, t_seg, t_segs = teacher_forward(teacher_params, x, teacher_def)

    m = d.modalities_no
    w_g = jnp.asarray(d.loss_g_weights, jnp.float32)
    terms = {}

    pred_fake = dl._d_pred_mods(d_params['D'], x, mods, d)
    l_gan = jax.vmap(lambda p: losses.gan_loss(p, True, 'vanilla'))(pred_fake)
    l_l1 = jax.vmap(losses.smooth_l1)(mods, real_mods) * d.lambda_l1
    l_vgg = jax.vmap(lambda a, b: vgg.vgg_loss(vgg_params, a, b))(
        mods, real_mods) * d.lambda_feat
    loss = ((l_gan + l_l1 + l_vgg) * w_g[:m]).sum()
    terms.update({'G_GAN': l_gan, 'G_L1': l_l1, 'G_VGG': l_vgg})

    real_seg = batch['B_seg']
    pf_seg = dl._d_pred_seg(d_params['DS'], x, real_mods, seg, d)
    l_gan_s = losses.gan_loss(pf_seg, True, 'lsgan')
    l_l1_s = losses.smooth_l1(seg, real_seg) * d.lambda_l1
    # reference quirk: seg term weighted by loss_G_weights[m-1] (ref :352)
    loss = loss + (l_gan_s + l_l1_s) * w_g[m - 1]
    terms.update({'G_GAN_S': l_gan_s, 'G_L1_S': l_l1_s})

    # KD terms: mods, per-branch segs, aggregated seg, all x10 (ref :340-358)
    kd = jax.vmap(kd_kl)(mods, t_mods).sum()
    kd = kd + jax.vmap(kd_kl)(segs, t_segs).sum()
    kd = kd + kd_kl(seg, t_seg)
    loss = loss + kd * kd_factor
    terms['G_KD'] = kd

    out = {'mods': mods, 'seg': seg}
    return loss, (terms, out)


def def_from_opt(opt):
    """The student shares the DeepLIIF topology (ref DeepLIIFKD_model.py:9)."""
    return dl.def_from_opt(opt)


def create_train_state(key, d, opt, steps_per_epoch=1):
    return dl.create_train_state(key, d, opt, steps_per_epoch)


def load_teacher(model_dir_teacher):
    """Load the frozen teacher params + def from a model dir."""
    from ..config import get_opt
    from ..utils import checkpoints, torch_import
    opt_t = get_opt(model_dir_teacher, mode='test')
    teacher_def = dl.def_from_opt(opt_t)
    if checkpoints.has_native_checkpoint(model_dir_teacher):
        like = dl.init_params(jax.random.PRNGKey(0), teacher_def,
                              with_discriminators=False)
        params = checkpoints.load_networks(model_dir_teacher, like)
    else:
        params = torch_import.import_deepliif_dir(model_dir_teacher, opt_t)
    return params, teacher_def


def make_train_step_body(d, g_tx, d_tx, vgg_params, teacher_params,
                         teacher_def):
    def step(state, batch, rng):
        mods, seg = dl.generator_forward(state.g_params, batch['A'], d,
                                         train=True, rng=rng)
        g_out = {'mods': mods, 'seg': seg}
        (d_loss, d_terms), d_grads = jax.value_and_grad(
            dl.d_loss_fn, has_aux=True)(state.d_params, g_out, batch, d)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        (g_loss, (g_terms, g_out)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, d_params, batch, d,
                                     vgg_params, teacher_params, teacher_def,
                                     rng)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        new_state = dl.TrainState(g_params, d_params, g_opt_state, d_opt_state,
                                  state.step + 1)
        return new_state, {'loss_G': g_loss, 'loss_D': d_loss, **g_terms,
                           **d_terms}, g_out

    return step


def make_train_step(d, g_tx, d_tx, vgg_params, teacher_params, teacher_def):
    return jax.jit(make_train_step_body(d, g_tx, d_tx, vgg_params,
                                        teacher_params, teacher_def),
                   donate_argnums=(0,))


@register_model('DeepLIIFKD')
class DeepLIIFKDModel:
    def_from_opt = staticmethod(dl.def_from_opt)
    init_params = staticmethod(dl.init_params)
    generator_forward = staticmethod(dl.generator_forward)
    load_teacher = staticmethod(load_teacher)
    make_train_step = staticmethod(make_train_step)
    create_train_state = staticmethod(create_train_state)
