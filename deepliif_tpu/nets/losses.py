"""Loss functions (functional).

Parity with the reference GANLoss / SmoothL1 / gradient penalty / TV loss
(/root/reference/deepliif/models/networks.py:244-355, 746-755).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gan_loss(pred, target_is_real, gan_mode='vanilla', label_smoothing=0.0,
             real_label=1.0, fake_label=0.0, epsilon=1.0):
    """GAN objective vs a constant label map.

    vanilla: BCE-with-logits; lsgan: MSE; wgangp: +/- mean; poly_ce:
    BCE + eps*(1 - pt) (reference networks.py:294-317).
    """
    pred = pred.astype(jnp.float32)
    if gan_mode in ('vanilla', 'lsgan', 'poly_ce'):
        if target_is_real:
            target = jnp.full_like(pred, real_label * (1.0 - label_smoothing))
        else:
            target = jnp.full_like(pred, fake_label * label_smoothing)
    if gan_mode == 'lsgan':
        return ((pred - target) ** 2).mean()
    if gan_mode == 'vanilla':
        # BCEWithLogits: max(x,0) - x*t + log(1+exp(-|x|))
        return (jnp.maximum(pred, 0) - pred * target
                + jnp.log1p(jnp.exp(-jnp.abs(pred)))).mean()
    if gan_mode == 'wgangp':
        return -pred.mean() if target_is_real else pred.mean()
    if gan_mode == 'poly_ce':
        ce = (jnp.maximum(pred, 0) - pred * target
              + jnp.log1p(jnp.exp(-jnp.abs(pred)))).mean()
        pt = jnp.sum(target * jax.nn.softmax(pred, axis=-1), axis=-1)
        return ce + epsilon * (1 - pt).mean()
    raise NotImplementedError(f'gan mode {gan_mode} not implemented')


def smooth_l1(pred, target, beta=1.0):
    """torch SmoothL1Loss (mean reduction, beta=1)."""
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).mean()


def l1(pred, target):
    return jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)).mean()


def total_variation(x):
    """Reference TotalVariationLoss (networks.py:746-755), NHWC input."""
    tv = (jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :]).sum()
          + jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :]).sum())
    return tv / x.size


def gradient_penalty(d_apply, d_params, real, fake, rng, gp_type='mixed',
                     constant=1.0, lambda_gp=10.0):
    """WGAN-GP gradient penalty (reference networks.py:320-354)."""
    if lambda_gp <= 0.0:
        return 0.0
    if gp_type == 'real':
        interp = real
    elif gp_type == 'fake':
        interp = fake
    else:
        alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), real.dtype)
        interp = alpha * real + (1 - alpha) * fake

    def d_mean_sum(x):
        return d_apply(d_params, x).sum()

    grads = jax.grad(d_mean_sum)(interp)
    grads = grads.reshape(real.shape[0], -1)
    norm = jnp.sqrt(((grads + 1e-16) ** 2).sum(axis=1))
    return (((norm - constant) ** 2).mean()) * lambda_gp


def kl_div_softmax(student_logits, teacher_logits, temperature=1.0):
    """KLDiv(log_softmax(student) || softmax(teacher)) over flattened outputs,
    batchmean-style as in the reference KD loss
    (/root/reference/deepliif/models/DeepLIIFKD_model.py:313-349)."""
    s = student_logits.reshape(student_logits.shape[0], -1) / temperature
    t = teacher_logits.reshape(teacher_logits.shape[0], -1) / temperature
    log_p = jax.nn.log_softmax(s, axis=-1)
    q = jax.nn.softmax(t, axis=-1)
    log_q = jax.nn.log_softmax(t, axis=-1)
    return (q * (log_q - log_p)).sum(axis=-1).mean()
