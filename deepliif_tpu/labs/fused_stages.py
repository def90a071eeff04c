"""Fused Pallas kernels for the non-resblock translator stages (inference).

Complements ops.fused_resblock (the stride-1 trunk kernel). Measured on v5e
at batch 32 (experiments/profile_stage_parts.json), the XLA lowerings of the
remaining ResnetGenerator stages leave 2-4x on the table:

  * down convs (3x3 stride 2): 12.4 ms vs ~4 ms floor — XLA's strided conv
    lowering; here stride-2 row access is free (major-dim reshape views) and
    stride-2 column access packs (W, C) -> (W/2, 2C) contiguously, so the
    conv is 9 dense MXU matmuls with no data movement.
  * up convs (ConvTranspose2d(3, 2, 1, output_padding=1)): phase-decomposed
    into 4 dense sub-convs (1/2/2/4 taps) writing interleaved rows/cols
    through free reshape views of the output block — the HBM-shuffle cost
    that made phase decomposition lose at the XLA level (see
    layers.conv_transpose2d) does not exist inside VMEM.
  * each kernel optionally applies the previous stage's per-(sample,channel)
    norm affine + ReLU to its input and emits per-channel (sum, sum^2) of
    its output, so norm passes ride along instead of costing extra HBM
    round trips (same scheme as fused_resblock).

Weights layout HWIO; activations NHWC; f32 matmul accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _affine_relu(u, scale_ref, bias_ref, s, in_relu, has_affine):
    if has_affine:
        u = u * scale_ref[s].astype(u.dtype) + bias_ref[s].astype(u.dtype)
    if in_relu:
        u = jnp.maximum(u, 0)
    return u


def _emit_stats(st_ref, acc, r):
    ssum = jnp.sum(acc, axis=(0, 1))
    ssq = jnp.sum(acc * acc, axis=(0, 1))
    st = jnp.stack([ssum, ssq])

    @pl.when(r == 0)
    def _():
        st_ref[0] = st

    @pl.when(r > 0)
    def _():
        st_ref[0] += st


# ---------------------------------------------------------------------------
# stride-2 3x3 conv (torch Conv2d(cin, cout, 3, stride=2, padding=1))
# ---------------------------------------------------------------------------

def _down_kernel(scale_ref, bias_ref, x_ref, wb_ref, wl_ref, y_ref, st_ref,
                 blk, sem, *, ch, h, wp, cin, cout, in_relu, has_affine,
                 out_dtype, n_samples):
    """Input arrives column-packed: (S, H, W/2, 2*cin) where channel
    (ph, c) = column 2q+ph. Output chunk = ch rows of the (h/2, w/2) output;
    input slab = 2*ch+1 rows (1-row top halo, torch zero padding=1).

    Column taps are folded into two zero-padded weight matrices (K = 2*cin,
    full MXU contraction lanes) instead of sliced out of the packed lanes —
    Mosaic cannot cheaply split a 2*cin lane group:
      body tap  packed[q]   x Wb[dy]  covers in-cols 2q (w[dy,1]), 2q+1 (w[dy,2])
      left tap  packed[q-1] x Wl[dy]  covers in-col 2q-1 (w[dy,0]; ph0 rows 0)
    """
    s = pl.program_id(0)
    r = pl.program_id(1)
    n_r = pl.num_programs(1)
    t = s * n_r + r
    total = n_samples * n_r
    slot = jax.lax.rem(t, 2)
    nslot = jax.lax.rem(t + 1, 2)

    def dmas(slot_i, s_i, r_i):
        i0 = 2 * r_i * ch
        top_src = jnp.maximum(i0 - 1, 0)
        return (
            pltpu.make_async_copy(x_ref.at[s_i, pl.ds(i0, 2 * ch)],
                                  blk.at[slot_i, pl.ds(1, 2 * ch)],
                                  sem.at[slot_i, 0]),
            pltpu.make_async_copy(x_ref.at[s_i, pl.ds(top_src, 1)],
                                  blk.at[slot_i, pl.ds(0, 1)],
                                  sem.at[slot_i, 1]),
        )

    @pl.when(t == 0)
    def _():
        for d in dmas(slot, s, r):
            d.start()

    r_next = jnp.where(r + 1 < n_r, r + 1, 0)
    s_next = jnp.where(r + 1 < n_r, s, s + 1)

    @pl.when(t + 1 < total)
    def _():
        for d in dmas(nslot, s_next, r_next):
            d.start()

    for d in dmas(slot, s, r):
        d.wait()

    u = blk[slot]
    u = _affine_relu(u, scale_ref, bias_ref, s, in_relu, has_affine)

    # zero the top halo row at the image border (torch zero padding; the
    # affine must not leak into the pad). No bottom pad row is ever tapped.
    r0 = r * ch
    row = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    u = jnp.where((r0 == 0) & (row == 0), jnp.zeros_like(u), u)

    # stride-2 row views (free: major-dim reshapes). Slab row j = input row
    # 2*(r0+o)-1+j', so out row o taps slab rows 2o, 2o+1, 2o+2.
    v1 = u[0:2 * ch].reshape(ch, 2, wp, 2 * cin)
    v2 = u[1:2 * ch + 1].reshape(ch, 2, wp, 2 * cin)
    rows = (v1[:, 0], v1[:, 1], v2[:, 1])        # taps dy = 0, 1, 2

    acc = jnp.zeros((ch, wp, cout), jnp.float32)
    dn = (((2,), (0,)), ((), ()))
    for dy in range(3):
        body = rows[dy]
        zcol = jnp.zeros_like(body[:, :1])
        left = jnp.concatenate([zcol, body[:, :-1]], axis=1)
        acc = acc + jax.lax.dot_general(
            body, wb_ref[dy], dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            left, wl_ref[dy], dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    y_ref[0] = acc.astype(out_dtype)
    _emit_stats(st_ref, acc, r)


def conv3x3_s2_stats(x, w, *, in_scale=None, in_bias=None, in_relu=False,
                     chunk_rows=16, interpret=False):
    """Fused (affine -> relu ->) 3x3 stride-2 zero-pad-1 conv + output stats.

    x: (S, H, W, Cin); w: (3, 3, Cin, Cout). Returns (y (S, H/2, W/2, Cout),
    stats (S, 2, Cout) f32). Matches nets.layers.conv2d(x, {'w': w}, 2, 1)
    without bias (norm='batch' convs carry no bias).
    """
    s_n, h, w_n, cin = x.shape
    cout = w.shape[-1]
    assert h % 2 == 0 and w_n % 2 == 0
    ho, wo = h // 2, w_n // 2
    ch = min(chunk_rows, ho)
    assert ho % ch == 0, (ho, ch)

    # pack columns into channels (linear-layout bitcast at the pallas
    # boundary) and fold the column taps into zero-padded weights
    x2 = x.reshape(s_n, h, wo, 2 * cin)
    w = w.astype(x.dtype)
    zero = jnp.zeros_like(w[:, 0])                       # (3, cin, cout)
    wb = jnp.concatenate([w[:, 1], w[:, 2]], axis=1)     # (3, 2cin, cout)
    wl = jnp.concatenate([zero, w[:, 0]], axis=1)

    kern = functools.partial(
        _down_kernel, ch=ch, h=h, wp=wo, cin=cin, cout=cout,
        in_relu=in_relu, has_affine=in_scale is not None, out_dtype=x.dtype,
        n_samples=s_n)
    if in_scale is None:
        in_scale = jnp.zeros((s_n, cin), jnp.float32)
        in_bias = jnp.zeros((s_n, cin), jnp.float32)
    # per-channel affine on the packed layout: tile to (S, 2cin)
    sc2 = jnp.concatenate([in_scale, in_scale], axis=1)
    bi2 = jnp.concatenate([in_bias, in_bias], axis=1)

    y, st = pl.pallas_call(
        kern,
        grid=(s_n, ho // ch),
        in_specs=[
            pl.BlockSpec((s_n, 2 * cin), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_n, 2 * cin), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 2 * cin, cout), lambda s, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2 * cin, cout), lambda s, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ch, wo, cout), lambda s, r: (s, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, cout), lambda s, r: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s_n, ho, wo, cout), x.dtype),
            jax.ShapeDtypeStruct((s_n, 2, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * ch + 1, wo, 2 * cin), x.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(sc2, bi2, x2, wb, wl)
    return y, st


# ---------------------------------------------------------------------------
# transposed conv (torch ConvTranspose2d(cin, cout, 3, stride=2, padding=1,
# output_padding=1)) — the resnet up stages
# ---------------------------------------------------------------------------

def _up_kernel(scale_ref, bias_ref, x_ref, wa_ref, wc_ref, y_ref, st_ref,
               blk, sem, *, ch, h, w, cin, cout, in_relu, has_affine,
               out_dtype, n_samples):
    """ch input rows -> 2*ch output rows per grid step, output column-packed
    (w, 2*cout) with lane (rx, co) = out col 2q+rx. Per-axis phases (kernel
    stored in forward-conv HWIO layout, see layers.conv_transpose2d):
      out[2m]   = w[1] x[m]
      out[2m+1] = w[0] x[m] + w[2] x[m+1]
    Column phases are folded into weights of width 2*cout:
      A(ky)[c,(rx,co)] = rx==0 ? w[ky,1,c,co] : w[ky,0,c,co]   (tap x[.,q])
      C(ky)[c,(rx,co)] = rx==0 ? 0            : w[ky,2,c,co]   (tap x[.,q+1])
    Input slab = ch rows + 1 BOTTOM halo row (zero at the image edge)."""
    s = pl.program_id(0)
    r = pl.program_id(1)
    n_r = pl.num_programs(1)
    t = s * n_r + r
    total = n_samples * n_r
    slot = jax.lax.rem(t, 2)
    nslot = jax.lax.rem(t + 1, 2)

    def dmas(slot_i, s_i, r_i):
        i0 = r_i * ch
        bot_src = jnp.minimum(i0 + ch, h - 1)
        return (
            pltpu.make_async_copy(x_ref.at[s_i, pl.ds(i0, ch)],
                                  blk.at[slot_i, pl.ds(0, ch)],
                                  sem.at[slot_i, 0]),
            pltpu.make_async_copy(x_ref.at[s_i, pl.ds(bot_src, 1)],
                                  blk.at[slot_i, pl.ds(ch, 1)],
                                  sem.at[slot_i, 1]),
        )

    @pl.when(t == 0)
    def _():
        for d in dmas(slot, s, r):
            d.start()

    r_next = jnp.where(r + 1 < n_r, r + 1, 0)
    s_next = jnp.where(r + 1 < n_r, s, s + 1)

    @pl.when(t + 1 < total)
    def _():
        for d in dmas(nslot, s_next, r_next):
            d.start()

    for d in dmas(slot, s, r):
        d.wait()

    u = blk[slot]
    u = _affine_relu(u, scale_ref, bias_ref, s, in_relu, has_affine)

    # zero the bottom halo row at the image edge (x[h] contributes zero)
    r0 = r * ch
    row = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    u = jnp.where((r0 + ch >= h) & (row == ch), jnp.zeros_like(u), u)

    body = u[0:ch]
    below = u[1:ch + 1]
    zcol = jnp.zeros_like(body[:, :1])
    bodyR = jnp.concatenate([body[:, 1:], zcol], axis=1)    # x[m, q+1]
    belowR = jnp.concatenate([below[:, 1:], zcol], axis=1)  # x[m+1, q+1]

    dn = (((2,), (0,)), ((), ()))

    def mm(src, wref, ky):
        return jax.lax.dot_general(src, wref[ky], dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    out0 = mm(body, wa_ref, 1) + mm(bodyR, wc_ref, 1)
    out1 = (mm(body, wa_ref, 0) + mm(bodyR, wc_ref, 0)
            + mm(below, wa_ref, 2) + mm(belowR, wc_ref, 2))

    # interleave row phases (major-dim stack, free) -> (2ch, w, 2cout)
    acc = jnp.stack([out0, out1], axis=1).reshape(2 * ch, w, 2 * cout)

    y_ref[0] = acc.astype(out_dtype)
    _emit_stats(st_ref, acc, r)


def convtranspose3_s2_stats(x, w, *, in_scale=None, in_bias=None,
                            in_relu=False, chunk_rows=16, interpret=False):
    """Fused (affine -> relu ->) ConvTranspose2d(3, 2, 1, output_padding=1)
    + output stats.

    x: (S, H, W, Cin); w: (3, 3, Cin, Cout) in the forward-conv HWIO layout
    used by layers.conv_transpose2d. Returns (y (S, 2H, 2W, Cout),
    stats (S, 2, Cout) f32). Matches layers.conv_transpose2d(x, {'w': w},
    2, 1, 1) without bias.
    """
    s_n, h, w_n, cin = x.shape
    cout = w.shape[-1]
    ch = min(chunk_rows, h)
    assert h % ch == 0, (h, ch)

    w = w.astype(x.dtype)
    zero = jnp.zeros_like(w[:, 0])                       # (3, cin, cout)
    wa = jnp.concatenate([w[:, 1], w[:, 0]], axis=2)     # (3, cin, 2cout)
    wc = jnp.concatenate([zero, w[:, 2]], axis=2)

    kern = functools.partial(
        _up_kernel, ch=ch, h=h, w=w_n, cin=cin, cout=cout,
        in_relu=in_relu, has_affine=in_scale is not None, out_dtype=x.dtype,
        n_samples=s_n)
    if in_scale is None:
        in_scale = jnp.zeros((s_n, cin), jnp.float32)
        in_bias = jnp.zeros((s_n, cin), jnp.float32)

    y, st = pl.pallas_call(
        kern,
        grid=(s_n, h // ch),
        in_specs=[
            pl.BlockSpec((s_n, cin), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_n, cin), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, cin, 2 * cout), lambda s, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cin, 2 * cout), lambda s, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 2 * ch, w_n, 2 * cout), lambda s, r: (s, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2 * cout), lambda s, r: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s_n, 2 * h, w_n, 2 * cout), x.dtype),
            jax.ShapeDtypeStruct((s_n, 2, 2 * cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ch + 1, w_n, cin), x.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(in_scale, in_bias, x, wa, wc)
    # unpack columns (linear-layout bitcast) and merge the per-column-phase
    # stats back to per-channel
    y = y.reshape(s_n, 2 * h, 2 * w_n, cout)
    st = st[:, :, :cout] + st[:, :, cout:]
    return y, st


# ---------------------------------------------------------------------------
# tail: (affine -> relu ->) pad-3 -> 7x7 conv -> block-layout output
# (the resnet c7s1-cout tail, space-to-depth form of layers.conv2d_s2d)
# ---------------------------------------------------------------------------

def make_tail_weights(w, block=8):
    """w (7,7,cin,cout) -> (w2a (14, 8*cin, block^2*cout),
    w2b (14, 6*cin, block^2*cout)): the s2d-expanded kernel
    W2[a+i, b+j, c, (a*8+b)*cout+co] = w[i,j,c,co], split into column groups
    kx in [0,8) and [8,14) so each output block row is 2 matmuls per ky over
    the packed (8-col, cin) input view."""
    k = w.shape[0]
    cin, cout = w.shape[2], w.shape[3]
    bk = block + k - 1
    rows = []
    for a in range(block):
        cols = []
        for b in range(block):
            cols.append(jnp.pad(w, ((a, block - 1 - a), (b, block - 1 - b),
                                    (0, 0), (0, 0))))
        rows.append(jnp.stack(cols))
    w2 = jnp.transpose(jnp.stack(rows), (2, 3, 4, 0, 1, 5))
    w2 = w2.reshape(bk, bk, cin, block * block * cout)
    nout = block * block * cout
    w2a = w2[:, 0:block].reshape(bk, block * cin, nout)
    w2b = w2[:, block:bk].reshape(bk, (bk - block) * cin, nout)
    return w2a, w2b


def _tail_kernel(scale_ref, bias_ref, x_ref, wb_ref, wr_ref, y_ref, blk,
                 sem, *, ni, h, w, cin, nout, padding, has_affine, in_relu,
                 out_dtype, n_samples, gw):
    """ni block rows (8*ni output rows) per step over an input that arrives
    column-padded-and-packed from XLA as (S, H, gw, 8*cin): padded cols
    [0:3) reflect/zero, [3:w+3) real, [w+3:w+6) reflect/zero, [w+6:w+8)
    zero. The 3-col pad realigns every 14-tap window to 8-col group
    boundaries, so each output block row is exactly 2 matmuls per kernel
    row ky:
      body  groups[J]    x WB[ky]  (kx 0..7)
      right groups[J+1]  x WR[ky]  (kx 8..13; positions 6,7 zero)
    Row halos (3 each side) are reflect-mapped DMAs; 'zero' padding zeroes
    the halo rows and pad columns in-register after the affine."""
    s = pl.program_id(0)
    r = pl.program_id(1)
    n_r = pl.num_programs(1)
    t = s * n_r + r
    total = n_samples * n_r
    slot = jax.lax.rem(t, 2)
    nslot = jax.lax.rem(t + 1, 2)
    rows_slab = 8 * ni + 6

    def dmas(slot_i, s_i, r_i):
        i0 = 8 * r_i * ni
        ops = [pltpu.make_async_copy(
            x_ref.at[s_i, pl.ds(i0, 8 * ni)],
            blk.at[slot_i, pl.ds(3, 8 * ni)],
            sem.at[slot_i, 0])]
        for j in range(3):
            src = i0 - 3 + j
            src = jnp.where(src < 0, -src, src)
            ops.append(pltpu.make_async_copy(
                x_ref.at[s_i, pl.ds(src, 1)],
                blk.at[slot_i, pl.ds(j, 1)],
                sem.at[slot_i, 1 + j]))
        for j in range(3):
            src = i0 + 8 * ni + j
            src = jnp.where(src > h - 1, 2 * (h - 1) - src, src)
            ops.append(pltpu.make_async_copy(
                x_ref.at[s_i, pl.ds(src, 1)],
                blk.at[slot_i, pl.ds(8 * ni + 3 + j, 1)],
                sem.at[slot_i, 4 + j]))
        return ops

    @pl.when(t == 0)
    def _():
        for d in dmas(slot, s, r):
            d.start()

    r_next = jnp.where(r + 1 < n_r, r + 1, 0)
    s_next = jnp.where(r + 1 < n_r, s, s + 1)

    @pl.when(t + 1 < total)
    def _():
        for d in dmas(nslot, s_next, r_next):
            d.start()

    for d in dmas(slot, s, r):
        d.wait()

    u = blk[slot]
    if has_affine or in_relu:
        # scale/bias pre-tiled to one 8-col group (8*cin lanes)
        u = _affine_relu(u, scale_ref, bias_ref, s, in_relu, has_affine)

    r0 = 8 * r * ni
    if padding == 'zero':
        # zero the halo rows at image borders and the pad columns
        row = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        border = (((r0 == 0) & (row < 3))
                  | ((r0 + 8 * ni >= h) & (row >= rows_slab - 3)))
        g = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, u.shape, 2)
        pc = 8 * g + lane // cin
        u = jnp.where(border | (pc < 3) | (pc >= w + 3),
                      jnp.zeros_like(u), u)

    nb = w // 8
    # pad rows to a multiple of 8 past ky_max so u2[ky:ky+8*ni] is always in
    # range (the [:, 0] selection never reads the pad rows)
    u2 = jnp.concatenate(
        [u, jnp.zeros((8 * ni + 16 - rows_slab,) + u.shape[1:], u.dtype)],
        axis=0)
    acc = jnp.zeros((ni * nb, nout), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    for ky in range(14):
        v = u2[ky:ky + 8 * ni].reshape(ni, 8, gw, 8 * cin)[:, 0]
        la = v[:, 0:nb].reshape(ni * nb, 8 * cin)
        lb = v[:, 1:nb + 1].reshape(ni * nb, 8 * cin)
        acc = acc + jax.lax.dot_general(la, wb_ref[ky], dimension_numbers=dn,
                                        preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(lb, wr_ref[ky], dimension_numbers=dn,
                                        preferred_element_type=jnp.float32)

    y_ref[0] = acc.reshape(ni, nb, nout).astype(out_dtype)


def tail_s2d_block(x, w, *, in_scale=None, in_bias=None, in_relu=False,
                   padding='reflect', block_rows=4, interpret=False):
    """Fused (affine -> relu ->) 3px-pad 7x7 conv in 8x8-block layout.

    x: (S, H, W, cin); w: (7, 7, cin, cout). Returns (S, H/8, W/8, 64*cout)
    — the space-to-depth block layout of the conv output, NO bias/tanh
    (callers apply bias + tanh + depth-to-space on the 64x-smaller tensor).
    Column pad+pack happens in XLA (one relayout pass of the input); only
    ROW padding is resolved inside the kernel, so all VMEM slices stay
    group-aligned (Mosaic rejects sub-128-lane memref offsets).
    """
    s_n, h, w_n, cin = x.shape
    cout = w.shape[-1]
    nout = 64 * cout
    assert h % 8 == 0 and w_n % 8 == 0
    nbr = h // 8
    ni = min(block_rows, nbr)
    assert nbr % ni == 0
    # group count padded to a multiple of 8: the (S, H, gw, 8cin) HBM ref is
    # sublane-tiled on gw, and Mosaic cannot slice a non-8-multiple extent.
    # Groups past (w+8)/8 are zero and never touched by any matmul slice.
    gw = -(-((w_n + 8) // 8) // 8) * 8

    # expanded s2d kernel split into the two window-aligned column groups:
    # window for block J = padded cols [8J, 8J+14) = group J (kx 0..7) +
    # group J+1 (kx 8..13 at positions 0..5, 6..7 zero)
    wa, wb = make_tail_weights(w.astype(x.dtype))       # (14, 8cin|6cin, nout)
    wr = jnp.concatenate(
        [wb, jnp.zeros((14, 2 * cin, nout), wb.dtype)], axis=1)

    # XLA-side column pad (+2 dead zero cols to a whole group) and pack
    tail_zeros = 8 * gw - w_n - 3   # right-side cols incl. 3 reflect/zero pads
    if padding == 'reflect':
        x = jnp.concatenate([x[:, :, 3:0:-1], x, x[:, :, w_n - 2:w_n - 5:-1],
                             jnp.zeros((s_n, h, tail_zeros - 3, cin),
                                       x.dtype)], axis=2)
    else:
        x = jnp.concatenate([jnp.zeros_like(x[:, :, :3]), x,
                             jnp.zeros((s_n, h, tail_zeros, cin), x.dtype)],
                            axis=2)
    x3 = x.reshape(s_n, h, gw, 8 * cin)

    kern = functools.partial(
        _tail_kernel, ni=ni, h=h, w=w_n, cin=cin, nout=nout, padding=padding,
        has_affine=in_scale is not None, in_relu=in_relu, out_dtype=x.dtype,
        n_samples=s_n, gw=gw)
    if in_scale is None:
        sc8 = jnp.zeros((s_n, 8 * cin), jnp.float32)
        bi8 = jnp.zeros((s_n, 8 * cin), jnp.float32)
    else:
        sc8 = jnp.tile(in_scale, (1, 8))
        bi8 = jnp.tile(in_bias, (1, 8))

    y = pl.pallas_call(
        kern,
        grid=(s_n, nbr // ni),
        in_specs=[
            pl.BlockSpec((s_n, 8 * cin), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_n, 8 * cin), lambda s, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((14, 8 * cin, nout), lambda s, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((14, 8 * cin, nout), lambda s, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ni, w_n // 8, nout),
                               lambda s, r: (s, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_n, nbr, w_n // 8, nout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 8 * ni + 6, gw, 8 * cin), x.dtype),
            pltpu.SemaphoreType.DMA((2, 7)),
        ],
        interpret=interpret,
    )(sc8, bi8, x3, wa, wr)
    return y


def tail_s2d_fused(x, p, *, in_scale=None, in_bias=None, in_relu=False,
                   padding='reflect', interpret=False):
    """Full fused tail: (affine -> relu ->) pad3 -> conv7x7 -> +bias -> tanh,
    returning the (S, H, W, cout) image. Matches
    tanh(layers.conv2d(layers.pad2d(norm_relu(x), 3, padding), p, 1, 0))."""
    cout = p['w'].shape[-1]
    y = tail_s2d_block(x, p['w'], in_scale=in_scale, in_bias=in_bias,
                       in_relu=in_relu, padding=padding, interpret=interpret)
    s_n, hb, wb, _ = y.shape
    y = y.reshape(s_n, hb, wb, 8, 8, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(s_n, hb * 8, wb * 8, cout)
    if 'b' in p:
        y = y + p['b'].astype(y.dtype)
    return jnp.tanh(y)
