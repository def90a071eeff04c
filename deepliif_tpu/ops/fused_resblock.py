"""Fused Pallas kernel for the ResNet-trunk hot loop (inference).

The reference resblock is pad -> conv3x3 -> norm -> ReLU -> pad -> conv3x3
-> norm -> +skip (reference networks.py:456-513). At inference our norm is
per-sample batch-stat norm (see nets.layers.batch_stat_norm), which XLA
lowers as conv / full-tensor stats reduce / full-tensor normalize — three
HBM round trips over a (B,128,128,256) activation per conv. The resblocks
are ~88% of the translator FLOPs and dominate ensemble HBM traffic
(experiments/profile_ensemble.json).

This kernel fuses, in one VMEM pass per row-chunk:

    u   = relu(x * in_scale + in_bias)        # previous norm, optional
    y   = conv3x3(u, w)                       # 9 shifted MXU matmuls
    st += (sum(y), sum(y^2)) per channel      # stats for the NEXT norm

so each intermediate activation is written once and read once. The norm
finalize (mean/var -> scale/bias per (n, c)) is a tiny XLA op between
kernel calls, and the residual add + final norm application is one fused
XLA elementwise pass.

Grid: (S, H/CH) — samples x row chunks; row chunks are DMA'd from HBM with
a 1-row halo on each side (reflect or zero filled at image borders, torch
padding semantics), the column halo is built in VMEM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scale_ref, bias_ref, x_ref, w_ref, y_ref, st_ref, blk, sem,
            *, ch, h, w, c, padding, in_relu, has_affine, out_dtype,
            n_samples):
    s = pl.program_id(0)
    r = pl.program_id(1)
    r0 = r * ch
    n_r = pl.num_programs(1)
    t = s * n_r + r
    total = n_samples * n_r
    slot = jax.lax.rem(t, 2)
    nslot = jax.lax.rem(t + 1, 2)

    def dmas(slot_i, s_i, r0_i):
        """The 3 HBM->VMEM copies for chunk (s_i, r0_i) into buffer slot_i:
        body rows + 1-row halos (clamped/reflected sources; zero padding is
        applied after the affine, in-register)."""
        top_src = jnp.where(r0_i == 0, 1 if padding == 'reflect' else 0,
                            r0_i - 1)
        bot_src = jnp.where(r0_i + ch >= h,
                            h - 2 if padding == 'reflect' else h - 1,
                            r0_i + ch)
        return (
            pltpu.make_async_copy(x_ref.at[s_i, pl.ds(r0_i, ch)],
                                  blk.at[slot_i, pl.ds(1, ch)],
                                  sem.at[slot_i, 0]),
            pltpu.make_async_copy(x_ref.at[s_i, pl.ds(top_src, 1)],
                                  blk.at[slot_i, pl.ds(0, 1)],
                                  sem.at[slot_i, 1]),
            pltpu.make_async_copy(x_ref.at[s_i, pl.ds(bot_src, 1)],
                                  blk.at[slot_i, pl.ds(ch + 1, 1)],
                                  sem.at[slot_i, 2]),
        )

    # double-buffered pipeline: this step's chunk was prefetched by the
    # previous step; kick off the next chunk's DMA before computing
    @pl.when(t == 0)
    def _():
        for d in dmas(slot, s, r0):
            d.start()

    r_next = jnp.where(r + 1 < n_r, r + 1, 0)
    s_next = jnp.where(r + 1 < n_r, s, s + 1)

    @pl.when(t + 1 < total)
    def _():
        for d in dmas(nslot, s_next, r_next * ch):
            d.start()

    for d in dmas(slot, s, r0):
        d.wait()

    u = blk[slot]
    if has_affine:
        sc = scale_ref[s].astype(u.dtype)   # (C,) row of the full (S,C) block
        bi = bias_ref[s].astype(u.dtype)
        u = u * sc + bi
    if in_relu:
        u = jnp.maximum(u, 0)

    if padding == 'zero':
        # zero padding applies to the TRANSFORMED input (torch pads after
        # norm/relu), so zero the border halo rows after the affine
        row = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        border = ((r0 == 0) & (row == 0)) | ((r0 + ch >= h) & (row == ch + 1))
        u = jnp.where(border, jnp.zeros_like(u), u)

    # ---- column halo variants (reflect/zero at image borders)
    if padding == 'reflect':
        left = jnp.concatenate([u[:, 1:2], u[:, :-1]], axis=1)
        right = jnp.concatenate([u[:, 1:], u[:, w - 2:w - 1]], axis=1)
    else:
        zcol = jnp.zeros_like(u[:, :1])
        left = jnp.concatenate([zcol, u[:, :-1]], axis=1)
        right = jnp.concatenate([u[:, 1:], zcol], axis=1)

    # ---- 9 shifted matmuls on the MXU, f32 accumulation
    acc = jnp.zeros((ch, w, c), jnp.float32)
    dn = (((2,), (0,)), ((), ()))
    for dy in range(3):
        for dx, src in ((0, left), (1, u), (2, right)):
            lhs = src[dy:dy + ch]
            acc = acc + jax.lax.dot_general(
                lhs, w_ref[dy, dx], dimension_numbers=dn,
                preferred_element_type=jnp.float32)

    y_ref[0] = acc.astype(out_dtype)

    # ---- per-channel stats accumulated across row chunks of this sample
    ssum = jnp.sum(acc, axis=(0, 1))
    ssq = jnp.sum(acc * acc, axis=(0, 1))
    st = jnp.stack([ssum, ssq])

    @pl.when(r == 0)
    def _():
        st_ref[0] = st

    @pl.when(r > 0)
    def _():
        st_ref[0] += st


def _resolve_chunk(chunk_rows, dtype):
    """Row-chunk height with the per-dtype VMEM clamp. The default 16
    puts the kernel's scoped-VMEM stack at ~14.7 MB bf16 against Mosaic's
    16 MB limit; 8 halves the out/scratch share (~11 MB) for a measured
    1.2% throughput cost (70.9 vs 71.7 tiles/s b128). At f32 the
    chunk-16 stack (~29.5 MB) fails to compile, but chunk 8 fits AND
    beats the XLA resblock path (40.4 vs 35.9 tiles/s b16,
    experiments/bench_f32_fused.py) — so f32 ALWAYS clamps to 8, even
    under the DEEPLIIF_FUSED_CHUNK override (which a user may set for
    bf16 tuning; letting it break every f32 graph in the same process
    with a Mosaic compile error would be per-dtype-unsafe)."""
    env_ch = os.environ.get('DEEPLIIF_FUSED_CHUNK')
    if env_ch:
        chunk_rows = int(env_ch)
    if dtype == jnp.float32:
        chunk_rows = min(chunk_rows, 8)
    return chunk_rows


def conv3x3_stats(x, w, *, padding='reflect', in_scale=None, in_bias=None,
                  in_relu=False, chunk_rows=16, interpret=False):
    """Fused (affine -> relu ->) conv3x3 (stride 1, 'same' via reflect/zero
    pad) + per-(sample, channel) output statistics.

    x: (S, H, W, C); w: (3, 3, C, C); in_scale/in_bias: (S, C) or None.
    Returns (y (S,H,W,C) in x.dtype, stats (S,2,C) f32 [sum, sum-of-squares]).
    """
    s_n, h, w_n, c = x.shape
    chunk_rows = _resolve_chunk(chunk_rows, x.dtype)
    ch = min(chunk_rows, h)
    assert h % ch == 0, (h, ch)
    assert padding in ('reflect', 'zero')
    has_affine = in_scale is not None
    if not has_affine:
        in_scale = jnp.zeros((s_n, c), jnp.float32)
        in_bias = jnp.zeros((s_n, c), jnp.float32)

    kern = functools.partial(
        _kernel, ch=ch, h=h, w=w_n, c=c, padding=padding, in_relu=in_relu,
        has_affine=has_affine, out_dtype=x.dtype, n_samples=s_n)

    y, st = pl.pallas_call(
        kern,
        grid=(s_n, h // ch),
        in_specs=[
            # full (S,C) resident in VMEM (tiny); Mosaic requires the last
            # two block dims be 8/128-divisible or whole-array
            pl.BlockSpec((s_n, c), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),      # in_scale
            pl.BlockSpec((s_n, c), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),      # in_bias
            # x pinned to HBM (the DMA pipeline assumes it; pl.ANY lets the
            # compiler second-guess). Interpret mode has no Mosaic memory
            # spaces, so keep ANY there. NOTE: the kernel's scoped-VMEM
            # stack is ~14.7 MB at bf16 chunk 16 (out+scratch+weights,
            # pipelined x2) against the 16 MB limit; f32 doubles per-row
            # cost, so _resolve_chunk auto-clamps f32 to chunk 8 (~11 MB),
            # which fits and beats the XLA path (measured, round 3).
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec((3, 3, c, c), lambda s, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),      # weights resident
        ],
        out_specs=(
            pl.BlockSpec((1, ch, w_n, c), lambda s, r: (s, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda s, r: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s_n, h, w_n, c), x.dtype),
            jax.ShapeDtypeStruct((s_n, 2, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ch + 2, w_n, c), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(in_scale, in_bias, x, w)
    return y, st


def _kernel_int8(scale_ref, bias_ref, inva_ref, x_ref, deq_ref, w_ref,
                 y_ref, st_ref, blk, sem, *, ch, h, w, c, padding, in_relu,
                 has_affine, out_dtype, n_samples, dynamic):
    """int8 variant of _kernel: the transformed input is quantized in
    VMEM, the 9 shifted matmuls run int8 x int8 -> int32 on the MXU (2x
    the bf16 rate), and the dequant happens in the epilogue before the
    stats — no int8/int32 intermediate ever reaches HBM, which is exactly
    what the XLA `--precision int8` path cannot avoid
    (docs/Performance.md 'int8 quantized inference').

    ``dynamic=False``: static (calibrated) activation scale from inva_ref.
    ``dynamic=True``: the scale is the chunk's own max-abs, computed in
    VMEM right before quantizing — each (sample, row-chunk) gets the
    finest lattice its actual values permit, with zero extra HBM traffic
    and no calibration set. This is the round-5 fidelity lever: a static
    scale must cover the worst outlier of the whole calibration
    distribution, a per-chunk scale only its own 16 rows."""
    s = pl.program_id(0)
    r = pl.program_id(1)
    r0 = r * ch
    n_r = pl.num_programs(1)
    t = s * n_r + r
    total = n_samples * n_r
    slot = jax.lax.rem(t, 2)
    nslot = jax.lax.rem(t + 1, 2)

    def dmas(slot_i, s_i, r0_i):
        top_src = jnp.where(r0_i == 0, 1 if padding == 'reflect' else 0,
                            r0_i - 1)
        bot_src = jnp.where(r0_i + ch >= h,
                            h - 2 if padding == 'reflect' else h - 1,
                            r0_i + ch)
        return (
            pltpu.make_async_copy(x_ref.at[s_i, pl.ds(r0_i, ch)],
                                  blk.at[slot_i, pl.ds(1, ch)],
                                  sem.at[slot_i, 0]),
            pltpu.make_async_copy(x_ref.at[s_i, pl.ds(top_src, 1)],
                                  blk.at[slot_i, pl.ds(0, 1)],
                                  sem.at[slot_i, 1]),
            pltpu.make_async_copy(x_ref.at[s_i, pl.ds(bot_src, 1)],
                                  blk.at[slot_i, pl.ds(ch + 1, 1)],
                                  sem.at[slot_i, 2]),
        )

    @pl.when(t == 0)
    def _():
        for d in dmas(slot, s, r0):
            d.start()

    r_next = jnp.where(r + 1 < n_r, r + 1, 0)
    s_next = jnp.where(r + 1 < n_r, s, s + 1)

    @pl.when(t + 1 < total)
    def _():
        for d in dmas(nslot, s_next, r_next * ch):
            d.start()

    for d in dmas(slot, s, r0):
        d.wait()

    u = blk[slot]
    if has_affine:
        sc = scale_ref[s].astype(u.dtype)
        bi = bias_ref[s].astype(u.dtype)
        u = u * sc + bi
    if in_relu:
        u = jnp.maximum(u, 0)

    if padding == 'zero':
        row = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        border = ((r0 == 0) & (row == 0)) | ((r0 + ch >= h) & (row == ch + 1))
        u = jnp.where(border, jnp.zeros_like(u), u)

    # ---- quantization, same lattice as layers.conv2d's 'a_s' path:
    # the scale multiply runs in u's dtype so the fused and XLA int8 paths
    # round through identical bf16 values; the roundeven itself runs in f32
    # (Mosaic has no bf16 roundeven lowering) — every bf16 value is f32-exact
    # and the rounded integers are <=127, so the integers are identical.
    if dynamic:
        # per-chunk dynamic scale: max |u| over this VMEM block (halo rows
        # included — they feed the same contraction)
        m = jnp.maximum(jnp.max(jnp.abs(u.astype(jnp.float32))), 1e-12)
        inva = (127.0 / m).astype(u.dtype)
        v = (u * inva).astype(jnp.float32)
    else:
        # inva is a (C,) vector: per-input-channel 1/a_s (per-tensor
        # scales arrive pre-broadcast), multiplied along the lane dim
        inva = inva_ref[0]
        v = (u * inva.astype(u.dtype)).astype(jnp.float32)
    q = jnp.clip(jnp.round(v), -127, 127).astype(jnp.int8)

    if padding == 'reflect':
        left = jnp.concatenate([q[:, 1:2], q[:, :-1]], axis=1)
        right = jnp.concatenate([q[:, 1:], q[:, w - 2:w - 1]], axis=1)
    else:
        zcol = jnp.zeros_like(q[:, :1])
        left = jnp.concatenate([zcol, q[:, :-1]], axis=1)
        right = jnp.concatenate([q[:, 1:], zcol], axis=1)

    # ---- 9 shifted matmuls on the int8 MXU, exact int32 accumulation
    acc = jnp.zeros((ch, w, c), jnp.int32)
    dn = (((2,), (0,)), ((), ()))
    for dy in range(3):
        for dx, src in ((0, left), (1, q), (2, right)):
            lhs = src[dy:dy + ch]
            acc = acc + jax.lax.dot_general(
                lhs, w_ref[dy, dx], dimension_numbers=dn,
                preferred_element_type=jnp.int32)

    deq = deq_ref[0]
    if dynamic:
        deq = deq * (m / 127.0)
    yf = acc.astype(jnp.float32) * deq
    y_ref[0] = yf.astype(out_dtype)

    ssum = jnp.sum(yf, axis=(0, 1))
    ssq = jnp.sum(yf * yf, axis=(0, 1))
    st = jnp.stack([ssum, ssq])

    @pl.when(r == 0)
    def _():
        st_ref[0] = st

    @pl.when(r > 0)
    def _():
        st_ref[0] += st


def conv3x3_stats_int8(x, w_q, deq, inv_a, *, padding='reflect',
                       in_scale=None, in_bias=None, in_relu=False,
                       chunk_rows=16, interpret=False, dynamic=False):
    """Fused (affine -> relu ->) static-quantize -> int8 conv3x3 -> dequant
    + per-(sample, channel) output statistics.

    x: (S, H, W, C) float; w_q: (3, 3, C, C) int8; deq: (C,) f32 per-output
    -channel dequant scale; inv_a: scalar f32 or (C,) f32 per-input-channel
    activation quantize scale (1 / a_s). Returns (y (S,H,W,C) in x.dtype,
    stats (S,2,C) f32) where y = conv3x3(clip(round(u * inv_a)), w_q) * deq
    over the transformed input u — the same contraction the XLA int8 conv
    path performs, with nothing wider than x.dtype touching HBM. With
    activation scales folded into the weights (layers.quantize_conv_tree_
    int8), deq is just w_s.

    ``dynamic=True``: ignore inv_a; each (sample, row-chunk) quantizes by
    its own in-VMEM max-abs and dequantizes by (chunk_max/127) * deq, so
    ``deq`` must be the weight-only per-output-channel scale and w_q must
    be quantized from the UNFOLDED weights (plain quantize_conv_int8).
    """
    s_n, h, w_n, c = x.shape
    # same per-dtype clamp as conv3x3_stats: the scratch/out buffers are in
    # x.dtype, so f32 activations double the VMEM stack here too
    chunk_rows = _resolve_chunk(chunk_rows, x.dtype)
    ch = min(chunk_rows, h)
    assert h % ch == 0, (h, ch)
    assert padding in ('reflect', 'zero')
    assert w_q.dtype == jnp.int8, w_q.dtype
    has_affine = in_scale is not None
    if not has_affine:
        in_scale = jnp.zeros((s_n, c), jnp.float32)
        in_bias = jnp.zeros((s_n, c), jnp.float32)
    inv_a = jnp.asarray(inv_a, jnp.float32)
    inv_a = jnp.broadcast_to(inv_a.reshape(-1), (c,)).reshape(1, c)
    deq = jnp.asarray(deq, jnp.float32).reshape(1, c)

    kern = functools.partial(
        _kernel_int8, ch=ch, h=h, w=w_n, c=c, padding=padding,
        in_relu=in_relu, has_affine=has_affine, out_dtype=x.dtype,
        n_samples=s_n, dynamic=dynamic)

    y, st = pl.pallas_call(
        kern,
        grid=(s_n, h // ch),
        in_specs=[
            pl.BlockSpec((s_n, c), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),      # in_scale
            pl.BlockSpec((s_n, c), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),      # in_bias
            pl.BlockSpec((1, c), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),      # 1/a_s per channel
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec((1, c), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),      # dequant scale
            pl.BlockSpec((3, 3, c, c), lambda s, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),      # int8 weights
        ],
        out_specs=(
            pl.BlockSpec((1, ch, w_n, c), lambda s, r: (s, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda s, r: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s_n, h, w_n, c), x.dtype),
            jax.ShapeDtypeStruct((s_n, 2, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ch + 2, w_n, c), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(in_scale, in_bias, inv_a, x, deq, w_q)
    return y, st


def resblock_chain_int8(x, blocks, *, padding='reflect', eps=1e-5,
                        interpret=False, chunk_rows=16, dynamic=False):
    """resblock_chain on the int8 MXU path.

    blocks: list of dicts {'w1q','w1s','a1','norm1','w2q','w2s','a2',
    'norm2'} where w*q are HWIO (3,3,C,C) int8 kernels, w*s (C,) f32
    per-output-channel dequant scales, norm* {'scale','bias'} affine
    params. Same dataflow as resblock_chain; each conv quantizes its
    transformed input in VMEM and dequantizes in the epilogue.

    ``dynamic=False`` (static/calibrated): w*s is the COMPLETE dequant
    (activation scale folded in by layers.quantize_conv_tree_int8), a*
    the calibrated activation quantize scales ('a_s': scalar per-tensor
    or (C,) per-input-channel).
    ``dynamic=True``: w*q/w*s are plain unfolded quantize_conv_int8
    outputs, a* ignored/absent — each (sample, row-chunk) quantizes by
    its own in-VMEM max-abs (see conv3x3_stats_int8)."""
    s_n, h, w_n, _ = x.shape
    for b in blocks:
        if dynamic:
            a1 = a2 = 1.0
        else:
            a1 = jnp.asarray(b['a1'], jnp.float32)
            a2 = jnp.asarray(b['a2'], jnp.float32)
        h1, st1 = conv3x3_stats_int8(
            x, b['w1q'], b['w1s'], 1.0 / a1, padding=padding,
            interpret=interpret, chunk_rows=chunk_rows, dynamic=dynamic)
        sc1, bi1 = finalize_norm(st1, b['norm1'], h, w_n, eps)
        h2, st2 = conv3x3_stats_int8(
            h1, b['w2q'], b['w2s'], 1.0 / a2, padding=padding,
            in_scale=sc1, in_bias=bi1, in_relu=True,
            interpret=interpret, chunk_rows=chunk_rows, dynamic=dynamic)
        sc2, bi2 = finalize_norm(st2, b['norm2'], h, w_n, eps)
        x = x + (h2 * sc2[:, None, None].astype(h2.dtype)
                 + bi2[:, None, None].astype(h2.dtype))
    return x


def finalize_norm(st, norm_p, h, w, eps=1e-5):
    """stats (S,2,C) -> per-(sample, channel) (scale, bias) applying the
    affine batch-stat norm (biased variance, reference BatchNorm2d with
    batch statistics)."""
    n = float(h * w)
    mean = st[:, 0] / n
    var = st[:, 1] / n - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    scale = inv * norm_p['scale'][None]
    bias = norm_p['bias'][None] - mean * scale
    return scale, bias


def resblock_chain(x, blocks, *, padding='reflect', eps=1e-5,
                   interpret=False, chunk_rows=16):
    """Run a chain of inference resblocks with the fused kernel.

    blocks: list of dicts {'w1', 'norm1', 'w2', 'norm2'} where w* are HWIO
    (3,3,C,C) kernels and norm* are {'scale','bias'} affine params.
    Semantics identical (mod f32-accumulation rounding) to the unfused
    nets.resnet loop with norm='batch', per-sample stats, no conv bias,
    dropout inactive.
    """
    s_n, h, w_n, _ = x.shape
    for b in blocks:
        h1, st1 = conv3x3_stats(x, b['w1'], padding=padding,
                                interpret=interpret, chunk_rows=chunk_rows)
        sc1, bi1 = finalize_norm(st1, b['norm1'], h, w_n, eps)
        h2, st2 = conv3x3_stats(h1, b['w2'], padding=padding,
                                in_scale=sc1, in_bias=bi1, in_relu=True,
                                interpret=interpret, chunk_rows=chunk_rows)
        sc2, bi2 = finalize_norm(st2, b['norm2'], h, w_n, eps)
        x = x + (h2 * sc2[:, None, None].astype(h2.dtype)
                 + bi2[:, None, None].astype(h2.dtype))
    return x
