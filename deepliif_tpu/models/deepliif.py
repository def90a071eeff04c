"""DeepLIIF flagship model, TPU-native.

The reference (/root/reference/deepliif/models/DeepLIIF_model.py:8-508) holds
nine torch nets (4 modality translators G1..G4 + 5 seg generators GS0..GS4)
plus nine discriminators as mutable attributes, runs them one by one and
fans them out over GPUs with Dask at inference. Here the whole ensemble is
ONE pure function over a parameter pytree:

  * identical-architecture nets are stacked along a leading axis and vmapped,
    so the 4 translator forwards become a single batched conv program the XLA
    scheduler can tile onto the MXU;
  * the seg aggregation (weighted sum, DeepLIIF_model.py:203) is a tensordot;
  * training is a jitted step: D update (fakes stop-gradiented,
    DeepLIIF_model.py:205-332) followed by a G update against the *updated*
    discriminators (optimize_parameters order, DeepLIIF_model.py:431-467);
  * losses: GAN(mod=vanilla, seg=lsgan) + SmoothL1*lambda_L1 + VGG*lambda_feat
    on modalities, GAN+SmoothL1 on seg (DeepLIIF_model.py:334-429). The
    reference's seg-weight indexing quirk at DeepLIIF_model.py:421 (reusing
    loss_G_weights[modalities_no-1] for the seg term) is reproducible via
    ``replicate_seg_weight_quirk``; default uses loss_G_weights[modalities_no].
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


@dataclasses.dataclass(frozen=True)
class DeepLIIFDef:
    """Static model definition (hashable; safe to close over in jit)."""
    modalities_no: int = 4
    seg_gen: bool = True
    input_nc: int = 3
    output_nc: int = 3
    input_no: int = 1
    ngf: int = 64
    ndf: int = 64
    net_g: tuple = ('resnet_9blocks',) * 4
    net_gs: tuple = ('unet_512',) * 5
    net_d: str = 'n_layers'
    n_layers_d: int = 4
    norm: str = 'batch'
    use_dropout: bool = True
    padding_type: str = 'zero'       # translation generators (cli default 'zero')
    upsample: str = 'convtranspose'
    gan_mode: str = 'vanilla'
    gan_mode_s: str = 'lsgan'
    lambda_l1: float = 100.0
    lambda_feat: float = 100.0
    seg_weights: tuple = (0.25, 0.15, 0.25, 0.1, 0.25)
    loss_g_weights: tuple = (0.2,) * 5
    loss_d_weights: tuple = (0.2,) * 5
    init_type: str = 'normal'
    init_gain: float = 0.02
    replicate_seg_weight_quirk: bool = False
    dtype: Any = None                 # compute dtype for inference (None=f32)
    allow_fused: bool = True          # permit the Pallas fused-resblock path
                                      # (works under multi-device sharding too:
                                      # the mesh inference path wraps the
                                      # forward in shard_map, which gives
                                      # pallas_call local per-device semantics)
    quant_int8: bool = False          # int8 weights+activations on interior
                                      # convs (f32 accumulation); inference
                                      # only, --precision int8
    remat: bool = True                # rematerialize per-net activations in
                                      # training (512^2 flagship bwd does not
                                      # fit 16GB HBM without it)

    @property
    def uniform_g(self):
        return len(set(self.net_g)) == 1

    @property
    def uniform_gs(self):
        return len(set(self.net_gs)) == 1


def def_from_opt(opt) -> DeepLIIFDef:
    m = opt.modalities_no
    net_g = getattr(opt, 'netG', getattr(opt, 'net_g', 'resnet_9blocks'))
    if isinstance(net_g, str):
        net_g = (net_g,) * m
    net_gs = getattr(opt, 'net_gs', 'unet_512')
    if isinstance(net_gs, str):
        net_gs = (net_gs,) * (m + 1)
    precision = getattr(opt, 'precision', 'float32')
    # int8 runs the surrounding ops (norms, act, stitch) in bf16 and the
    # interior convs on the int8 MXU path (layers.quantize_conv_tree_int8)
    dtype = {'float32': None, 'bfloat16': jnp.bfloat16,
             'int8': jnp.bfloat16}.get(precision, None)
    return DeepLIIFDef(
        modalities_no=m,
        seg_gen=getattr(opt, 'seg_gen', True),
        input_nc=getattr(opt, 'input_nc', 3),
        output_nc=getattr(opt, 'output_nc', 3),
        input_no=getattr(opt, 'input_no', 1),
        ngf=getattr(opt, 'ngf', 64),
        ndf=getattr(opt, 'ndf', 64),
        net_g=tuple(net_g),
        net_gs=tuple(net_gs),
        net_d=getattr(opt, 'netD', getattr(opt, 'net_d', 'n_layers')),
        n_layers_d=getattr(opt, 'n_layers_D', 4),
        norm=getattr(opt, 'norm', 'batch'),
        use_dropout=not getattr(opt, 'no_dropout', False),
        padding_type=getattr(opt, 'padding', 'zero'),
        upsample=getattr(opt, 'upsample', 'convtranspose'),
        gan_mode=getattr(opt, 'gan_mode', 'vanilla'),
        gan_mode_s=getattr(opt, 'gan_mode_s', 'lsgan'),
        lambda_l1=float(getattr(opt, 'lambda_L1', 100.0)),
        lambda_feat=float(getattr(opt, 'lambda_feat', 100.0)),
        seg_weights=tuple(getattr(opt, 'seg_weights', (0.25, 0.15, 0.25, 0.1, 0.25))),
        loss_g_weights=tuple(getattr(opt, 'loss_G_weights', (0.2,) * (m + 1))),
        loss_d_weights=tuple(getattr(opt, 'loss_D_weights', (0.2,) * (m + 1))),
        init_type=getattr(opt, 'init_type', 'normal'),
        init_gain=getattr(opt, 'init_gain', 0.02),
        dtype=dtype,
        quant_int8=(precision == 'int8'),
    )


# ---------------------------------------------------------------------------
# net constructors
# ---------------------------------------------------------------------------

def _g_net(d: DeepLIIFDef, arch):
    return nets.define_g(d.input_nc * d.input_no, d.output_nc, d.ngf, arch,
                         d.norm, d.use_dropout, d.init_type, d.init_gain,
                         padding_type=d.padding_type, upsample=d.upsample,
                         dtype=d.dtype)


def _gs_net(d: DeepLIIFDef, arch):
    # seg generators use define_G defaults: reflect padding, convtranspose
    # (reference DeepLIIF_model.py:93-99)
    return nets.define_g(d.input_nc * d.input_no, d.output_nc, d.ngf, arch,
                         d.norm, d.use_dropout, d.init_type, d.init_gain,
                         padding_type='reflect', upsample='convtranspose',
                         dtype=d.dtype)


def _d_net(d: DeepLIIFDef):
    return nets.define_d(d.input_nc * d.input_no + d.output_nc, d.ndf, d.net_d,
                         d.n_layers_d, d.norm, d.init_type, d.init_gain,
                         dtype=d.dtype)


def init_params(key, d: DeepLIIFDef, with_discriminators=True):
    """Build the full parameter pytree.

    Stacked along a leading net axis when architectures are uniform:
      G:  (M, ...)   translators
      GS: (M+1, ...) seg generators (index 0 consumes the input image)
      D:  (M, ...)   modality discriminators
      DS: (M+1, ...) seg discriminators
    """
    m = d.modalities_no
    keys = L.split_keys(key, 4)
    p = {}
    g_keys = L.split_keys(keys[0], m)
    if d.uniform_g:
        net = _g_net(d, d.net_g[0])
        p['G'] = L.tree_stack([net.init(k) for k in g_keys])
    else:
        p['G'] = [_g_net(d, a).init(k) for a, k in zip(d.net_g, g_keys)]
    if d.seg_gen:
        gs_keys = L.split_keys(keys[1], m + 1)
        if d.uniform_gs:
            net = _gs_net(d, d.net_gs[0])
            p['GS'] = L.tree_stack([net.init(k) for k in gs_keys])
        else:
            p['GS'] = [_gs_net(d, a).init(k) for a, k in zip(d.net_gs, gs_keys)]
    if with_discriminators:
        dnet = _d_net(d)
        p['D'] = L.tree_stack([dnet.init(k) for k in L.split_keys(keys[2], m)])
        if d.seg_gen:
            p['DS'] = L.tree_stack([dnet.init(k) for k in L.split_keys(keys[3], m + 1)])
    if d.norm == 'spectral':
        p = L.add_spectral_u(p, jax.random.fold_in(key, 7))
    return p


def _maybe_spectral(params, d: 'DeepLIIFDef'):
    """Apply spectral normalization to conv kernels when norm='spectral'."""
    if d.norm != 'spectral':
        return params
    return L.spectral_normalize_tree(params)[0]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _translators_fused(x, d: DeepLIIFDef, params_g=None):
    """True when the fused Pallas resblock path would engage for the
    translators: resnet arch + inference shapes + TPU (or DEEPLIIF_FUSED=1).
    The ensemble is then UNROLLED over nets instead of vmapped — Mosaic
    cannot lower a vmapped ANY-space pallas_call, and XLA serializes the
    vmapped members anyway.

    int8 mode: engages when every resblock conv carries quantization
    params the chain can run — calibrated static scales ('a_s'), or plain
    w_q under the default per-chunk dynamic mode (DEEPLIIF_INT8_DYN; see
    ops.fused_resblock.resblock_chain_int8). Otherwise int8 keeps the
    unfused XLA path unchanged."""
    from ..nets import resnet
    ok = (d.allow_fused
          and d.net_g[0].startswith('resnet_')
          and resnet.fused_applicable(x.shape[1], x.shape[2], d.ngf,
                                      d.norm, d.padding_type,
                                      dtype=x.dtype))
    if not ok:
        return False
    if d.quant_int8:
        n_blocks = int(d.net_g[0].split('_')[1].replace('blocks', ''))
        # the SAME gate resnet.apply uses (incl. the DEEPLIIF_FUSED_INT8
        # kill switch): int8 mode must either take the fused int8 chain
        # or stay on the unfused XLA int8 path — never the float kernel
        return resnet.int8_chain_ready(params_g, n_blocks)
    return True


def _run_translators(params_g, x, d: DeepLIIFDef, net):
    """Inference translator ensemble: fused-unrolled or vmapped."""
    if _translators_fused(x, d, params_g):
        m = d.modalities_no
        outs = [net.apply(jax.tree_util.tree_map(lambda a: a[i], params_g),
                          x, allow_fused=True) for i in range(m)]
        return jnp.stack(outs)
    return jax.vmap(lambda p: net.apply(p, x))(params_g)


def generator_forward(params, x, d: DeepLIIFDef, *, train=False, rng=None,
                      seg_weights=None):
    """Full ensemble forward: x (B,H,W,C) -> (mods (M,B,H,W,C), seg (B,H,W,C)).

    The reference runs this as 9 sequential/Dask-delayed net calls
    (models/__init__.py:258-388); here the translator group and the seg group
    are each one vmapped call.
    """
    m = d.modalities_no
    w = jnp.asarray(d.seg_weights if seg_weights is None else seg_weights,
                    jnp.float32)
    params = _maybe_spectral(params, d)

    if train and rng is not None:
        g_rngs = jax.random.split(rng, 2)
        mod_rngs = jax.random.split(g_rngs[0], m)
        seg_rngs = jax.random.split(g_rngs[1], m + 1)
    else:
        mod_rngs = seg_rngs = None

    if d.uniform_g:
        net = _g_net(d, d.net_g[0])
        if mod_rngs is not None:
            g_apply = lambda p, r: net.apply(p, x, train=True, rng=r)
            if d.remat:
                # store only net-boundary activations; backward recomputes
                # inside each net (the 512^2 flagship backward OOMs otherwise)
                g_apply = jax.checkpoint(g_apply)
            mods = jax.vmap(g_apply)(params['G'], mod_rngs)
        else:
            mods = _run_translators(params['G'], x, d, net)
    else:
        outs = []
        for i, arch in enumerate(d.net_g):
            net = _g_net(d, arch)
            r = mod_rngs[i] if mod_rngs is not None else None
            outs.append(net.apply(params['G'][i], x, train=train, rng=r))
        mods = jnp.stack(outs)

    if not d.seg_gen:
        return mods, None

    seg_in = jnp.concatenate([x[None].astype(mods.dtype), mods], axis=0)  # (M+1,B,H,W,C)
    if d.uniform_gs:
        net = _gs_net(d, d.net_gs[0])
        if seg_rngs is not None:
            gs_apply = lambda p, xi, r: net.apply(p, xi, train=True, rng=r)
            if d.remat:
                gs_apply = jax.checkpoint(gs_apply)
            segs = jax.vmap(gs_apply)(params['GS'], seg_in, seg_rngs)
        else:
            segs = jax.vmap(lambda p, xi: net.apply(p, xi))(params['GS'], seg_in)
    else:
        outs = []
        for i, arch in enumerate(d.net_gs):
            net = _gs_net(d, arch)
            r = seg_rngs[i] if seg_rngs is not None else None
            outs.append(net.apply(params['GS'][i], seg_in[i], train=train, rng=r))
        segs = jnp.stack(outs)

    seg = jnp.tensordot(w.astype(segs.dtype), segs, axes=1)  # (B,H,W,C)
    return mods, seg


def inference_forward(params, x, d: DeepLIIFDef, seg_weights=None,
                      return_intermediate=False):
    """Inference entry: returns dict {'mods': (M,B,H,W,C), 'seg': (B,H,W,C)}
    (+ 'segs': (M+1,B,H,W,C) per-branch outputs when requested)."""
    if return_intermediate and d.seg_gen and d.uniform_g and d.uniform_gs:
        mods, seg, segs = forward_with_branches(params, x, d,
                                                seg_weights=seg_weights)
        return {'mods': mods, 'seg': seg, 'segs': segs}
    mods, seg = generator_forward(params, x, d, train=False,
                                  seg_weights=seg_weights)
    out = {'mods': mods}
    if seg is not None:
        out['seg'] = seg
    return out


def calibrate_act_scales(params, x, d: DeepLIIFDef, min_ch=16, out=None,
                         per_channel=True, pct=100.0):
    """Per-conv activation range over one normalized input batch, for
    static int8 quantization (layers.quantize_conv_tree_int8 act_scales=).
    ``per_channel``/``pct`` select the recorded statistic (see
    layers.act_calibration): per-input-channel max-abs by default, or a
    percentile-clipped range.

    Replays the inference dataflow EAGERLY one net at a time — the
    calibration tap needs concrete values, and vmap/jit would trace — so
    call it outside jit with a small batch. Returns {'G/...': range,
    'GS/...': ...} keyed exactly like the quantization walk; pass the same
    ``out`` dict across batches to max-merge."""
    from ..nets import layers as L

    p = _maybe_spectral(params, d)
    if d.dtype is not None:
        x = x.astype(d.dtype)
    scales = {} if out is None else out
    mods = []
    for i, arch in enumerate(d.net_g):
        net = _g_net(d, arch)
        if d.uniform_g:
            p_i = jax.tree_util.tree_map(lambda a: a[i], p['G'])
            prefix = ('G',)
        else:
            p_i, prefix = p['G'][i], ('G', str(i))
        with L.act_calibration(p_i, prefix, scales, min_ch,
                               per_channel=per_channel, pct=pct):
            mods.append(net.apply(p_i, x))
    if d.seg_gen:
        mods_s = jnp.stack(mods)
        seg_in = jnp.concatenate([x[None].astype(mods_s.dtype), mods_s],
                                 axis=0)
        for i, arch in enumerate(d.net_gs):
            net = _gs_net(d, arch)
            if d.uniform_gs:
                p_i = jax.tree_util.tree_map(lambda a: a[i], p['GS'])
                prefix = ('GS',)
            else:
                p_i, prefix = p['GS'][i], ('GS', str(i))
            with L.act_calibration(p_i, prefix, scales, min_ch,
                                   per_channel=per_channel, pct=pct):
                net.apply(p_i, seg_in[i])
    return scales


def fused_forward(params, x, d: DeepLIIFDef, seg_weights=None):
    """Grouped-convolution ensemble forward (inference): the N translators
    run as one feature-grouped program with (B,H,W,N*C) activations — full
    TPU lane utilization vs the vmapped (N,B,H,W,C) layout — and the seg
    stage consumes concat(x, translator output) with ZERO data movement.
    Numerically identical to generator_forward (parity-tested).
    Requires uniform resnet translators + uniform unet seg generators."""
    from ..labs import grouped

    m = d.modalities_no
    if not (d.uniform_g and d.net_g[0].startswith('resnet_')
            and (not d.seg_gen or (d.uniform_gs and d.net_gs[0].startswith('unet_')
                                   and d.net_gs[0] != 'unet_512_attention'))):
        return generator_forward(params, x, d, seg_weights=seg_weights)

    params = _maybe_spectral(params, d)
    if d.dtype is not None:
        x = x.astype(d.dtype)
    n_blocks = int(d.net_g[0].split('_')[1].replace('blocks', ''))
    xg = jnp.tile(x, (1, 1, 1, m))  # (B,H,W,M*3)
    mods_g = grouped.grouped_resnet_apply(
        params['G'], xg, m, n_blocks=n_blocks, norm=d.norm,
        padding_type=d.padding_type, upsample=d.upsample)  # (B,H,W,M*3)

    if not d.seg_gen:
        B, H, W, _ = mods_g.shape
        mods = jnp.moveaxis(mods_g.reshape(B, H, W, m, 3), 3, 0)
        return mods, None

    size = int(d.net_gs[0].split('_')[1])
    num_downs = {32: 5, 64: 6, 128: 7, 256: 8, 512: 9}[size]
    seg_in = jnp.concatenate([x.astype(mods_g.dtype), mods_g], axis=-1)
    segs_g = grouped.grouped_unet_apply(params['GS'], seg_in, m + 1,
                                        num_downs=num_downs, norm=d.norm)
    B, H, W, _ = segs_g.shape
    segs = segs_g.reshape(B, H, W, m + 1, 3)
    w = jnp.asarray(d.seg_weights if seg_weights is None else seg_weights,
                    segs.dtype)
    seg = jnp.einsum('bhwnc,n->bhwc', segs, w)
    mods = jnp.moveaxis(mods_g.reshape(B, H, W, m, 3), 3, 0)
    return mods, seg


def seg_only_forward(params, x, d: DeepLIIFDef, seg_weights=None,
                     marker_index=None):
    """Segmentation-only forward that SKIPS zero-weight branches (reference
    run_dask seg_only pruning, models/__init__.py:319-333): only translators
    whose seg branch has nonzero weight (plus the marker modality, if
    requested) are evaluated. Returns (seg, marker_mod_or_None).

    seg weights are static here, so XLA compiles the reduced graph —
    with the legacy [0.5,0,0,0,0.5] weights this is 1 translator + 2 seg
    branches instead of 4 + 5.
    """
    params = _maybe_spectral(params, d)
    w = tuple(d.seg_weights if seg_weights is None else seg_weights)
    m = d.modalities_no
    needed_mods = [i for i in range(m) if w[i + 1] != 0]
    run_mods = sorted(set(needed_mods) | ({marker_index}
                                          if marker_index is not None else set()))

    net = _g_net(d, d.net_g[0])
    mods = {}
    if run_mods:
        if _translators_fused(x, d, params['G']):
            mods = {i: net.apply(jax.tree_util.tree_map(lambda a: a[i],
                                                        params['G']),
                                 x, allow_fused=True) for i in run_mods}
        else:
            sub = jax.tree_util.tree_map(lambda a: a[jnp.asarray(run_mods)],
                                         params['G'])
            outs = jax.vmap(lambda p: net.apply(p, x))(sub)
            mods = {i: outs[j] for j, i in enumerate(run_mods)}

    gs = _gs_net(d, d.net_gs[0])
    seg_terms = []
    gs_indices = [0] + [i + 1 for i in needed_mods] if w[0] != 0 else \
        [i + 1 for i in needed_mods]
    if gs_indices:
        inputs = jnp.stack([x.astype(next(iter(mods.values())).dtype
                                     if mods else x.dtype)
                            if gi == 0 else mods[gi - 1]
                            for gi in gs_indices])
        sub_gs = jax.tree_util.tree_map(lambda a: a[jnp.asarray(gs_indices)],
                                        params['GS'])
        segs = jax.vmap(lambda p, xi: gs.apply(p, xi))(sub_gs, inputs)
        ws = jnp.asarray([w[gi] for gi in gs_indices], segs.dtype)
        seg = jnp.tensordot(ws, segs, axes=1)
    else:
        seg = jnp.zeros_like(x)
    marker = mods.get(marker_index) if marker_index is not None else None
    return seg, marker


def forward_with_branches(params, x, d: DeepLIIFDef, seg_weights=None):
    """Like generator_forward but also returns the per-branch seg outputs
    (the reference's return_seg_intermediate / KD teacher path)."""
    params = _maybe_spectral(params, d)
    net = _g_net(d, d.net_g[0])
    mods = _run_translators(params['G'], x, d, net)
    seg_in = jnp.concatenate([x[None].astype(mods.dtype), mods], axis=0)
    gs = _gs_net(d, d.net_gs[0])
    segs = jax.vmap(lambda p, xi: gs.apply(p, xi))(params['GS'], seg_in)
    w = jnp.asarray(d.seg_weights if seg_weights is None else seg_weights,
                    segs.dtype)
    seg = jnp.tensordot(w, segs, axes=1)
    return mods, seg, segs


# ---------------------------------------------------------------------------
# losses (parity with DeepLIIF_model.backward_D / backward_G)
# ---------------------------------------------------------------------------

def _d_pred_mods(d_params, x, imgs, d: DeepLIIFDef):
    """Vmapped modality discriminators on concat(x, img_i)."""
    d_params = _maybe_spectral({'D': d_params}, d)['D']
    dnet = _d_net(d)
    cond = jnp.concatenate([
        jnp.broadcast_to(x[None], (d.modalities_no,) + x.shape), imgs], axis=-1)
    apply = lambda p, c: dnet.apply(p, c)
    if d.remat:
        apply = jax.checkpoint(apply)
    return jax.vmap(apply)(d_params, cond)


def _d_pred_seg(ds_params, x, real_mods, seg, d: DeepLIIFDef):
    """Seg discriminators: D_0 conditioned on x, D_i on real modality i; the
    prediction used in the loss is the seg-weighted sum of the per-branch
    patch maps (DeepLIIF_model.py:249-262)."""
    ds_params = _maybe_spectral({'DS': ds_params}, d)['DS']
    dnet = _d_net(d)
    conds = jnp.concatenate([x[None], real_mods], axis=0)  # (M+1,B,H,W,C)
    seg_b = jnp.broadcast_to(seg[None], conds.shape)
    inp = jnp.concatenate([conds, seg_b], axis=-1)
    apply = lambda p, c: dnet.apply(p, c)
    if d.remat:
        apply = jax.checkpoint(apply)
    preds = jax.vmap(apply)(ds_params, inp)
    w = jnp.asarray(d.seg_weights, preds.dtype)
    return jnp.tensordot(w, preds, axes=1)


def d_loss_fn(d_params, g_out, batch, d: DeepLIIFDef):
    """Discriminator loss on stop-gradiented fakes."""
    x = batch['A']
    real_mods = batch['B_mods']           # (M,B,H,W,C)
    fake_mods = jax.lax.stop_gradient(g_out['mods'])
    loss_terms = {}
    w_d = jnp.asarray(d.loss_d_weights, jnp.float32)

    pred_fake = _d_pred_mods(d_params['D'], x, fake_mods, d)
    pred_real = _d_pred_mods(d_params['D'], x, real_mods, d)
    lf = jax.vmap(lambda p: losses.gan_loss(p, False, d.gan_mode))(pred_fake)
    lr = jax.vmap(lambda p: losses.gan_loss(p, True, d.gan_mode))(pred_real)
    loss = ((lf + lr) * 0.5 * w_d[:d.modalities_no]).sum()
    loss_terms['D_fake'] = lf
    loss_terms['D_real'] = lr

    if d.seg_gen:
        real_seg = batch['B_seg']
        fake_seg = jax.lax.stop_gradient(g_out['seg'])
        pf = _d_pred_seg(d_params['DS'], x, real_mods, fake_seg, d)
        pr = _d_pred_seg(d_params['DS'], x, real_mods, real_seg, d)
        lfs = losses.gan_loss(pf, False, d.gan_mode_s)
        lrs = losses.gan_loss(pr, True, d.gan_mode_s)
        loss = loss + (lfs + lrs) * 0.5 * w_d[d.modalities_no]
        loss_terms['D_fake_S'] = lfs
        loss_terms['D_real_S'] = lrs
    return loss, loss_terms


def g_loss_fn(g_params, d_params, batch, d: DeepLIIFDef, vgg_params, rng):
    """Generator loss; recomputes the forward (same dropout rng == the
    reference's single forward shared between D and G backward passes)."""
    x = batch['A']
    real_mods = batch['B_mods']
    mods, seg = generator_forward(g_params, x, d, train=True, rng=rng)
    w_g = jnp.asarray(d.loss_g_weights, jnp.float32)
    m = d.modalities_no
    terms = {}

    pred_fake = _d_pred_mods(d_params['D'], x, mods, d)
    l_gan = jax.vmap(lambda p: losses.gan_loss(p, True, d.gan_mode))(pred_fake)
    l_l1 = jax.vmap(losses.smooth_l1)(mods, real_mods) * d.lambda_l1
    vgg_fn = lambda a, b: vgg.vgg_loss(vgg_params, a, b)
    if d.remat:
        vgg_fn = jax.checkpoint(vgg_fn)
    l_vgg = jax.vmap(vgg_fn)(mods, real_mods) * d.lambda_feat
    loss = ((l_gan + l_l1 + l_vgg) * w_g[:m]).sum()
    terms['G_GAN'] = l_gan
    terms['G_L1'] = l_l1
    terms['G_VGG'] = l_vgg

    if d.seg_gen:
        real_seg = batch['B_seg']
        pf_seg = _d_pred_seg(d_params['DS'], x, real_mods, seg, d)
        l_gan_s = losses.gan_loss(pf_seg, True, d.gan_mode_s)
        l_l1_s = losses.smooth_l1(seg, real_seg) * d.lambda_l1
        w_seg = w_g[m - 1] if d.replicate_seg_weight_quirk else w_g[m]
        loss = loss + (l_gan_s + l_l1_s) * w_seg
        terms['G_GAN_S'] = l_gan_s
        terms['G_L1_S'] = l_l1_s

    out = {'mods': mods}
    if seg is not None:
        out['seg'] = seg
    return loss, (terms, out)


# ---------------------------------------------------------------------------
# train state / step
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return ((self.g_params, self.d_params, self.g_opt_state,
                 self.d_opt_state, self.step), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def create_train_state(key, d: DeepLIIFDef, opt, steps_per_epoch=1):
    params = init_params(key, d, with_discriminators=True)
    g_params = {k: params[k] for k in ('G', 'GS') if k in params}
    d_params = {k: params[k] for k in ('D', 'DS') if k in params}
    g_tx = nets.make_optimizer(opt, getattr(opt, 'lr_g', 2e-4), steps_per_epoch)
    d_tx = nets.make_optimizer(opt, getattr(opt, 'lr_d', 2e-4), steps_per_epoch)
    return TrainState(
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        step=jnp.zeros((), jnp.int32),
    ), g_tx, d_tx


def make_train_step_body(d: DeepLIIFDef, g_tx, d_tx, vgg_params):
    """Un-jitted alternating G/D update (jit it yourself with shardings, or
    use make_train_step).

    Order matches reference optimize_parameters (DeepLIIF_model.py:431-467):
    forward -> D grads on detached fakes -> D update -> G grads against the
    UPDATED discriminators -> G update.
    """

    def step(state: TrainState, batch, rng):
        fwd_rng = rng

        mods, seg = generator_forward(state.g_params, batch['A'], d,
                                      train=True, rng=fwd_rng)
        g_out = {'mods': mods}
        if seg is not None:
            g_out['seg'] = seg

        (d_loss, d_terms), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, g_out, batch, d)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        (g_loss, (g_terms, g_out)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, d_params, batch, d,
                                     vgg_params, fwd_rng)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        if d.norm == 'spectral':
            # persist the power-iteration vectors (torch keeps u as a
            # buffer updated each forward; we refresh it once per step)
            _, g_params = L.spectral_normalize_tree(g_params)
            _, d_params = L.spectral_normalize_tree(d_params)

        new_state = TrainState(g_params, d_params, g_opt_state, d_opt_state,
                               state.step + 1)
        metrics = {'loss_G': g_loss, 'loss_D': d_loss, **g_terms, **d_terms}
        return new_state, metrics, g_out

    return step


def make_train_step(d: DeepLIIFDef, g_tx, d_tx, vgg_params):
    """Jitted single-host train step (see make_train_step_body)."""
    return jax.jit(make_train_step_body(d, g_tx, d_tx, vgg_params),
                   donate_argnums=(0,))


def make_eval_losses(d: DeepLIIFDef, vgg_params):
    """Validation losses without updates (reference calculate_losses,
    DeepLIIF_model.py:469-507)."""

    def eval_losses(state: TrainState, batch, rng):
        mods, seg = generator_forward(state.g_params, batch['A'], d,
                                      train=True, rng=rng)
        g_out = {'mods': mods}
        if seg is not None:
            g_out['seg'] = seg
        d_loss, d_terms = d_loss_fn(state.d_params, g_out, batch, d)
        g_loss, (g_terms, _) = g_loss_fn(state.g_params, state.d_params, batch,
                                         d, vgg_params, rng)
        return {'loss_G': g_loss, 'loss_D': d_loss, **g_terms, **d_terms}

    return jax.jit(eval_losses)
