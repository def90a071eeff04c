"""ResNet generator (c7s1-64, 2x down, n residual blocks, 2x up, c7s1-out, tanh).

Architecture parity with the reference ResnetGenerator
(/root/reference/deepliif/models/networks.py:357-513):
  * head/tail use 7x7 convs after 3px pad (reflect or zero per padding_type);
  * downsampling convs are 3x3 stride 2 pad 1;
  * upsampling is ConvTranspose2d(3,2,1,output_padding=1) by default, with
    resize_conv (nearest x2 + reflect pad + 3x3 conv) and pixel_shuffle
    variants;
  * residual blocks: pad1-conv3-norm-relu-[dropout]-pad1-conv3-norm + skip;
  * conv bias present iff norm has no affine params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L


def init(key, input_nc, output_nc, ngf=64, n_blocks=9, norm='batch',
         use_dropout=True, padding_type='reflect', upsample='convtranspose',
         init_type='normal', init_gain=0.02):
    use_bias = L.norm_use_bias(norm)
    has_norm = L.norm_has_params(norm)
    # head(2) + 2 down stages(4) + 4 per resblock + 2 up stages(4) +
    # tail(1), rounded up — a fixed pool of 64 capped the net at 13 blocks
    keys = iter(L.split_keys(key, 16 + 4 * n_blocks))

    def norm_p(c):
        return L.init_norm(next(keys), c, init_type, init_gain) if has_norm else {}

    p = {}
    p['head_conv'] = L.init_conv(next(keys), 7, 7, input_nc, ngf, use_bias, init_type, init_gain)
    p['head_norm'] = norm_p(ngf)
    for i in range(2):
        mult = 2 ** i
        p[f'down{i}_conv'] = L.init_conv(next(keys), 3, 3, ngf * mult, ngf * mult * 2,
                                         use_bias, init_type, init_gain)
        p[f'down{i}_norm'] = norm_p(ngf * mult * 2)
    dim = ngf * 4
    for i in range(n_blocks):
        p[f'res{i}_conv1'] = L.init_conv(next(keys), 3, 3, dim, dim, use_bias, init_type, init_gain)
        p[f'res{i}_norm1'] = norm_p(dim)
        p[f'res{i}_conv2'] = L.init_conv(next(keys), 3, 3, dim, dim, use_bias, init_type, init_gain)
        p[f'res{i}_norm2'] = norm_p(dim)
    for i in range(2):
        mult = 2 ** (2 - i)
        cin, cout = ngf * mult, ngf * mult // 2
        if upsample == 'convtranspose':
            p[f'up{i}_conv'] = L.init_conv(next(keys), 3, 3, cin, cout, use_bias, init_type, init_gain)
        elif upsample == 'resize_conv':
            # reference resize_conv branch uses default-bias Conv2d (networks.py:414-419)
            p[f'up{i}_conv'] = L.init_conv(next(keys), 3, 3, cin, cout, True, init_type, init_gain)
        elif upsample == 'pixel_shuffle':
            p[f'up{i}_conv'] = L.init_conv(next(keys), 3, 3, cin, cin * 2, True, init_type, init_gain)
        else:
            raise NotImplementedError(f'upsample [{upsample}] not implemented')
        p[f'up{i}_norm'] = norm_p(cout)
    p['tail_conv'] = L.init_conv(next(keys), 7, 7, ngf, output_nc, True, init_type, init_gain)
    return p


def _fused_ok(x, norm, padding_type, train, use_dropout):
    """Gate for the fused Pallas resblock path: inference only, affine
    batch-stat norm (no conv bias), reflect/zero padding, TPU backend, and
    shapes that tile onto the hardware (see ops.fused_resblock)."""
    import os
    flag = os.environ.get('DEEPLIIF_FUSED', 'auto')
    if flag == '0':
        return False
    if train or norm != 'batch' or padding_type not in ('reflect', 'zero'):
        return False
    if x.ndim != 4:
        return False
    _, h, w, c = x.shape
    if c % 128 != 0 or w % 16 != 0 or h % 16 != 0:
        return False
    if flag == '1':
        return True
    # bf16 runs chunk 16 (~14.7 MB scoped VMEM, under Mosaic's 16 MB
    # limit); f32 auto-clamps to chunk 8 in conv3x3_stats — chunk 16
    # (~29.5 MB) fails to compile but chunk 8 fits and beats the XLA path
    # (40.4 vs 35.9 tiles/s b16; experiments/bench_f32_fused.py, v5e r3)
    if getattr(x, 'dtype', None) not in (jnp.bfloat16, jnp.float32):
        return False
    return jax.default_backend() == 'tpu'


def _int8_dyn_enabled():
    """Per-chunk dynamic activation scales in the fused int8 kernel
    (DEEPLIIF_INT8_DYN, default on) — calibration-free and finer-grained
    than any static scale (ops.fused_resblock conv3x3_stats_int8)."""
    import os
    return os.environ.get('DEEPLIIF_INT8_DYN', '1') != '0'


def int8_chain_mode(params, n_blocks):
    """'static' / 'dynamic' / None — how (whether) the fused int8 chain
    can run over these resblock params. 'static' needs every conv to
    carry calibrated 'a_s' (whose activation scales are folded into w_s);
    'dynamic' needs plain w_q (unfolded) on every conv plus the
    DEEPLIIF_INT8_DYN default. This is the single gate shared by apply()
    and the model-level unroll decision
    (models.deepliif._translators_fused) so the kill switches cannot
    leave the two halves disagreeing (a divergence that would silently
    run the resblocks on the float kernel)."""
    import os
    if os.environ.get('DEEPLIIF_FUSED_INT8', '1') == '0':
        return None
    if not isinstance(params, dict):
        return None
    n_as = 0
    for i in range(n_blocks):
        for j in (1, 2):
            pp = params.get(f'res{i}_conv{j}')
            if not isinstance(pp, dict) or 'w_q' not in pp:
                return None
            n_as += 'a_s' in pp
    if n_as == 2 * n_blocks:
        return 'static'
    if n_as == 0 and _int8_dyn_enabled():
        return 'dynamic'
    return None


def int8_chain_ready(params, n_blocks):
    """Back-compat boolean form of int8_chain_mode."""
    return int8_chain_mode(params, n_blocks) is not None


def fused_applicable(h, w, ngf, norm, padding_type, train=False,
                     dtype=None):
    """Would the fused resblock path engage for an (h, w) input of compute
    ``dtype``? Callers use this to UNROLL over ensemble members instead of
    vmapping (Mosaic cannot lower a vmapped ANY-space pallas_call)."""
    probe = jax.ShapeDtypeStruct((1, h // 4, w // 4, ngf * 4),
                                 dtype or jnp.float32)
    return _fused_ok(probe, norm, padding_type, train, True)


def _apply_fused(p, x, n_blocks, norm, padding_type, pad_head):
    """Fully-fused inference path: every stage after the head conv runs as a
    Pallas kernel that applies the previous stage's norm affine + ReLU on
    the fly and emits the stats for the next one — norm passes never touch
    HBM separately (labs.fused_stages + ops.fused_resblock)."""
    from ..ops import fused_resblock as FR
    from ..labs import fused_stages as FS

    interpret = jax.default_backend() != 'tpu'
    h0, w0 = x.shape[1], x.shape[2]

    def wcast(name):
        return p[name]['w'].astype(x.dtype)

    x = L.pad2d(x, 3, pad_head)
    x = L.conv2d(x, p['head_conv'], 1, 0)
    st = jnp.stack([x.astype(jnp.float32).sum(axis=(1, 2)),
                    (x.astype(jnp.float32) ** 2).sum(axis=(1, 2))], axis=1)
    sc, bi = FR.finalize_norm(st, p['head_norm'], h0, w0)

    x, st = FS.conv3x3_s2_stats(x, wcast('down0_conv'), in_scale=sc,
                                in_bias=bi, in_relu=True, interpret=interpret)
    sc, bi = FR.finalize_norm(st, p['down0_norm'], h0 // 2, w0 // 2)
    x, st = FS.conv3x3_s2_stats(x, wcast('down1_conv'), in_scale=sc,
                                in_bias=bi, in_relu=True, interpret=interpret)
    sc, bi = FR.finalize_norm(st, p['down1_norm'], h0 // 4, w0 // 4)
    x = jnp.maximum(x * sc[:, None, None].astype(x.dtype)
                    + bi[:, None, None].astype(x.dtype), 0)

    blocks = [{'w1': p[f'res{i}_conv1']['w'].astype(x.dtype),
               'norm1': p[f'res{i}_norm1'],
               'w2': p[f'res{i}_conv2']['w'].astype(x.dtype),
               'norm2': p[f'res{i}_norm2']}
              for i in range(n_blocks)]
    x = FR.resblock_chain(x, blocks, padding=padding_type,
                          interpret=interpret)

    x, st = FS.convtranspose3_s2_stats(x, wcast('up0_conv'),
                                       interpret=interpret)
    sc, bi = FR.finalize_norm(st, p['up0_norm'], h0 // 2, w0 // 2)
    x, st = FS.convtranspose3_s2_stats(x, wcast('up1_conv'), in_scale=sc,
                                       in_bias=bi, in_relu=True,
                                       interpret=interpret)
    sc, bi = FR.finalize_norm(st, p['up1_norm'], h0, w0)
    # tail runs in XLA: the Pallas tail kernel (tail_s2d_fused) measured
    # SLOWER than the XLA space-to-depth lowering on v5e (25 vs 16 ms at
    # batch 32 — per-grid-step overhead at 512 steps; larger chunks OOM
    # VMEM), so only the norm application is saved here.
    x = jnp.maximum(x * sc[:, None, None].astype(x.dtype)
                    + bi[:, None, None].astype(x.dtype), 0)
    x = L.pad2d(x, 3, pad_head)
    cout = p['tail_conv']['w'].shape[-1]
    if L.s2d_applicable(x.shape[1], x.shape[2], cout):
        x = L.conv2d_s2d(x, p['tail_conv'])
    else:
        x = L.conv2d(x, p['tail_conv'], 1, 0)
    return jnp.tanh(x)


def apply(p, x, *, n_blocks=9, norm='batch', use_dropout=True,
          padding_type='reflect', upsample='convtranspose',
          train=False, rng=None, dtype=None, allow_fused=False):
    if dtype is not None:
        x = x.astype(dtype)
    pad_head = padding_type if padding_type == 'reflect' else 'zero'

    # Fully-fused Pallas stage chain: OFF by default — despite winning in
    # per-stage isolation (experiments/profile_fused_stages.json), the
    # ensemble-level result LOST to the XLA path + fused resblocks + s2d
    # tails (53.8 vs 59.3 tiles/s at batch 48 on v5e): pallas_call operands
    # get relayout copies at each boundary and XLA loses cross-stage
    # fusion/overlap freedom. Kept behind DEEPLIIF_FUSE_STAGES=1 as a
    # measured experiment (kernels are parity-tested).
    import os
    if (os.environ.get('DEEPLIIF_FUSE_STAGES') == '1'
            and allow_fused and not train and upsample == 'convtranspose'
            and x.ndim == 4
            # bf16 only: the labs stage kernels run a fixed chunk 16 with
            # no f32 VMEM clamp (unlike ops.fused_resblock._resolve_chunk),
            # so f32 through this opt-in path would hit the same Mosaic
            # compile failure the f32 resblock kernel had at chunk 16
            and x.dtype == jnp.bfloat16
            and _fused_ok(jax.ShapeDtypeStruct(
                (x.shape[0], x.shape[1] // 4, x.shape[2] // 4,
                 p['down1_conv']['w'].shape[-1]), x.dtype),
                norm, padding_type, train, use_dropout)
            and x.shape[1] % 16 == 0 and x.shape[2] % 16 == 0):
        return _apply_fused(p, x, n_blocks, norm, padding_type, pad_head)

    x = L.pad2d(x, 3, pad_head)
    x = L.conv2d(x, p['head_conv'], 1, 0)
    x = L.apply_norm(x, p['head_norm'], norm, train)
    x = L.relu(x)

    for i in range(2):
        x = L.conv2d(x, p[f'down{i}_conv'], 2, 1)
        x = L.apply_norm(x, p[f'down{i}_norm'], norm, train)
        x = L.relu(x)

    if allow_fused and _fused_ok(x, norm, padding_type, train, use_dropout):
        from ..ops import fused_resblock as FR
        # off-TPU (DEEPLIIF_FUSED=1 in tests) runs the kernel interpreted
        interp = jax.default_backend() != 'tpu'
        mode = int8_chain_mode(p, n_blocks)
        if mode is not None:
            # quantized resblocks run the int8 MXU kernel: quantize/
            # dequant stay in VMEM, so this is the fused quantized-conv
            # path the XLA int8 mode cannot express (docs/Performance.md
            # 'int8 quantized inference'). 'dynamic' scales per chunk in
            # VMEM (no calibration); 'static' uses calibrated a_s.
            blocks = [{'w1q': p[f'res{i}_conv1']['w_q'],
                       'w1s': p[f'res{i}_conv1']['w_s'],
                       'a1': p[f'res{i}_conv1'].get('a_s', 1.0),
                       'norm1': p[f'res{i}_norm1'],
                       'w2q': p[f'res{i}_conv2']['w_q'],
                       'w2s': p[f'res{i}_conv2']['w_s'],
                       'a2': p[f'res{i}_conv2'].get('a_s', 1.0),
                       'norm2': p[f'res{i}_norm2']}
                      for i in range(n_blocks)]
            x = FR.resblock_chain_int8(x, blocks, padding=padding_type,
                                       interpret=interp,
                                       dynamic=mode == 'dynamic')
        else:
            blocks = [{'w1': p[f'res{i}_conv1']['w'].astype(x.dtype),
                       'norm1': p[f'res{i}_norm1'],
                       'w2': p[f'res{i}_conv2']['w'].astype(x.dtype),
                       'norm2': p[f'res{i}_norm2']}
                      for i in range(n_blocks)]
            x = FR.resblock_chain(x, blocks, padding=padding_type,
                                  interpret=interp)
    else:
        rngs = jax.random.split(rng, n_blocks) if (train and use_dropout and rng is not None) else [None] * n_blocks
        res_pad = 0 if padding_type in ('reflect', 'replicate') else 1
        for i in range(n_blocks):
            h = x
            if res_pad == 0:
                h = L.pad2d(h, 1, padding_type)
            h = L.conv2d(h, p[f'res{i}_conv1'], 1, res_pad)
            h = L.apply_norm(h, p[f'res{i}_norm1'], norm, train)
            h = L.relu(h)
            if use_dropout:
                h = L.dropout(h, rngs[i], 0.5, train)
            if res_pad == 0:
                h = L.pad2d(h, 1, padding_type)
            h = L.conv2d(h, p[f'res{i}_conv2'], 1, res_pad)
            h = L.apply_norm(h, p[f'res{i}_norm2'], norm, train)
            x = x + h

    for i in range(2):
        if upsample == 'convtranspose':
            x = L.conv_transpose2d(x, p[f'up{i}_conv'], 2, 1, 1)
        elif upsample == 'resize_conv':
            x = L.upsample_nearest(x, 2)
            x = L.pad2d(x, 1, 'reflect')
            x = L.conv2d(x, p[f'up{i}_conv'], 1, 0)
        elif upsample == 'pixel_shuffle':
            x = L.conv2d(x, p[f'up{i}_conv'], 1, 1)
            x = L.pixel_shuffle(x, 2)
            x = L.relu(x)
        x = L.apply_norm(x, p[f'up{i}_norm'], norm, train)
        x = L.relu(x)

    x = L.pad2d(x, 3, pad_head)
    cout = p['tail_conv']['w'].shape[-1]
    if not train and L.s2d_applicable(x.shape[1], x.shape[2], cout):
        # N=cout can't fill the MXU lanes; pack 8x8 output blocks into
        # channels (see layers.conv2d_s2d) — ~10x faster tail on v5e.
        x = L.conv2d_s2d(x, p['tail_conv'])
    else:
        x = L.conv2d(x, p['tail_conv'], 1, 0)
    return jnp.tanh(x)
