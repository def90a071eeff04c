"""Functional NHWC layer primitives for the TPU network zoo.

Parameters are plain nested dicts of jnp arrays (a pytree), so whole networks
can be stacked along a leading axis and vmapped — that is how the DeepLIIF
9-net ensemble becomes a single batched XLA program.

Semantics intentionally match the reference's torch layers
(/root/reference/deepliif/models/networks.py):
  * ``batch`` norm == BatchNorm2d with track_running_stats disabled, i.e.
    statistics always computed from the current batch (the reference disables
    running stats at inference, util/__init__.py:743-771, and train mode uses
    batch stats anyway) — so one stat-based implementation serves both.
  * ``instance`` norm == InstanceNorm2d(affine=False), eps 1e-5.
  * conv_transpose matches torch ConvTranspose2d(stride, padding,
    output_padding) exactly via an input-dilated convolution.

Layout: activations NHWC, conv kernels HWIO. Torch state dicts (OIHW, and
IOHW for ConvTranspose2d) are converted by deepliif_tpu.utils.torch_import.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

_DN = ('NHWC', 'HWIO', 'NHWC')


# ---------------------------------------------------------------------------
# initializers (reference networks.py:84-115)
# ---------------------------------------------------------------------------

def _fan_in_out(shape):
    # HWIO kernel
    rf = shape[0] * shape[1]
    return shape[2] * rf, shape[3] * rf


def init_kernel(key, shape, init_type='normal', init_gain=0.02):
    """Initialize a conv kernel of HWIO ``shape``."""
    if init_type == 'normal':
        return init_gain * jax.random.normal(key, shape, jnp.float32)
    if init_type == 'xavier':
        fan_in, fan_out = _fan_in_out(shape)
        std = init_gain * math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, jnp.float32)
    if init_type == 'kaiming':
        fan_in, _ = _fan_in_out(shape)
        std = math.sqrt(2.0 / fan_in)
        return std * jax.random.normal(key, shape, jnp.float32)
    if init_type == 'orthogonal':
        flat = (int(jnp.prod(jnp.array(shape[:-1]))), shape[-1])
        a = jax.random.normal(key, flat, jnp.float32)
        q, r = jnp.linalg.qr(a if flat[0] >= flat[1] else a.T)
        q = q * jnp.sign(jnp.diagonal(r))
        if flat[0] < flat[1]:
            q = q.T
        return (init_gain * q).reshape(shape)
    raise NotImplementedError(f'init [{init_type}] not implemented')


def init_conv(key, kh, kw, cin, cout, bias=True, init_type='normal', init_gain=0.02):
    p = {'w': init_kernel(key, (kh, kw, cin, cout), init_type, init_gain)}
    if bias:
        p['b'] = jnp.zeros((cout,), jnp.float32)
    return p


def init_norm(key, c, init_type='normal', init_gain=0.02):
    """Affine norm params: scale ~ N(1, gain), bias 0 (reference networks.py:110-112)."""
    return {'scale': 1.0 + init_gain * jax.random.normal(key, (c,), jnp.float32),
            'bias': jnp.zeros((c,), jnp.float32)}


# ---------------------------------------------------------------------------
# conv / conv-transpose
# ---------------------------------------------------------------------------

def _quant_act(x, p):
    """Activation quantization for a quantized conv param dict: static
    (calibrated 'a_s' — scalar per-tensor, or (C,) per-input-channel) or
    dynamic per-sample. ONE definition shared by conv2d and
    conv_transpose2d so the two int8 paths cannot diverge.

    Returns (q, deq_extra): with static scales the activation scale is
    already FOLDED into 'w_s' at quantize time (quantize_conv_tree_int8),
    so deq_extra is None and the caller dequantizes by w_s alone; dynamic
    returns the per-sample scale to multiply in."""
    if 'a_s' in p:
        s = p['a_s']
        q = jnp.clip(jnp.round(x * (1.0 / s).astype(x.dtype)),
                     -127, 127).astype(jnp.int8)
        return q, None
    return _quant_act_int8(x)


def conv2d(x, p, stride=1, padding=0):
    """2D conv; ``padding`` int means symmetric zero pad (torch semantics).

    When the param dict carries an int8-quantized kernel ('w_q' + per-output
    -channel scale 'w_s', see quantize_conv_tree_int8), the conv runs on the
    int8 MXU path: activations are dynamically quantized per sample, the
    int8 x int8 -> int32 conv accumulates exactly, and the output is
    rescaled in f32. Per-SAMPLE activation scales keep outputs independent
    of batch composition (the engine's batch-size-invariance contract)."""
    pad = [(padding, padding)] * 2 if isinstance(padding, int) else padding
    if _ACT_CALIB is not None:
        _ACT_CALIB.record(p, x)
    if 'w_q' in p and _int8_ok(x, static='a_s' in p):
        # static (calibrated) scale: a pure elementwise quantize XLA fuses
        # into the producer — no max-abs reduction, so the activation
        # never materializes above int8; else dynamic per-sample
        q, s = _quant_act(x, p)
        y = jax.lax.conv_general_dilated(
            q, p['w_q'], (stride, stride), pad, dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        deq = p['w_s'] if s is None else s * p['w_s']
        out = (y.astype(jnp.float32) * deq).astype(x.dtype)
        if 'b' in p:
            out = out + p['b'].astype(x.dtype)
        return out
    w = p['w'].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=_DN)
    if 'b' in p:
        out = out + p['b'].astype(x.dtype)
    return out


# The per-sample max-abs reduction in _quant_act_int8 forces the quantized
# conv's input to fully materialize (two passes: scale, then quantize) —
# at 512^2 grouped-ensemble resolution that is an 8-16 GB HBM temp which
# XLA otherwise avoids by streaming the fused producer. Interior levels
# (<= 256^2) hold ~90% of the ensemble FLOPs with temps <= ~2 GB, so int8
# only engages there; outer levels stay on the float path.
_INT8_MAX_SPATIAL = 256 * 256

# Static (calibrated) scales have no materialization hazard, so by default
# every quantized conv may take the int8 path regardless of spatial size.
_INT8_STATIC_MAX_SPATIAL = 1 << 62


def _int8_ok(x, static=False):
    if x.ndim != 4:
        return False
    limit = _INT8_STATIC_MAX_SPATIAL if static else _INT8_MAX_SPATIAL
    return x.shape[1] * x.shape[2] <= limit


def _int8_spatial_ok(x):
    return _int8_ok(x)


def _quant_act_int8(x):
    """Symmetric per-sample dynamic int8 quantization of activations.
    Returns (q int8, scale f32 broadcastable over the sample).

    The divide/round runs in x's own dtype (bf16 represents all ints < 256
    exactly, so the rounded lattice is exact; only the pre-round ratio
    carries bf16 precision, bounded by half a quantization step) — an f32
    upcast here materializes a full-activation f32 temp that pushed the
    batch-128 flagship compile out of HBM."""
    ax = tuple(range(1, x.ndim))
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=ax, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x / s.astype(x.dtype)), -127, 127).astype(jnp.int8)
    return q, s


def quantize_conv_int8(p):
    """Per-output-channel symmetric int8 quantization of one conv param
    dict; keeps the f32 'w' (fallback paths like the s2d tails use it)."""
    w = p['w']
    red = tuple(range(w.ndim - 4, w.ndim - 1))  # (kh,kw,ci); keeps a leading
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=red)  # net-stack axis
    s = jnp.maximum(s / 127.0, 1e-12)
    sb = jnp.expand_dims(s, red)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / sb), -127, 127).astype(jnp.int8)
    out = dict(p)
    out['w_q'] = q
    out['w_s'] = s
    return out


_ACT_CALIB = None  # active act_calibration context (see below)


def _quantizable_conv_paths(tree, prefix=(), min_ch=16):
    """{id(conv param dict): 'a/b/c' path} over the convs the int8 tree
    walk would quantize — the shared path vocabulary of calibration and
    quantization."""
    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            if 'w' in node and hasattr(node['w'], 'ndim') \
                    and node['w'].ndim in (4, 5):
                cin, cout = node['w'].shape[-2], node['w'].shape[-1]
                if cin >= min_ch and cout >= min_ch:
                    out[id(node)] = '/'.join(path)
                return
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + (str(i),))

    walk(tree, tuple(prefix))
    return out


class act_calibration:
    """Context manager recording per-conv INPUT ranges during an EAGER
    forward (conv2d/conv_transpose2d call ``record`` on entry).

    ``tree`` is the (per-net, unstacked) param subtree the forward will
    consume; recorded keys are its conv paths prefixed with ``prefix`` so
    they line up with quantize_conv_tree_int8's walk over the full stacked
    params. Results max-merge into ``out`` — run several batches/nets
    under the same ``out`` to calibrate over all of them.

    ``per_channel=True`` (default) records a per-input-channel max-abs
    vector (C,); quantize_conv_tree_int8 folds it into the weights so the
    int8 lattice resolves each channel's own range instead of the whole
    tensor's worst outlier. ``pct`` < 100 clips the recorded range to that
    percentile of |x| per channel (per batch, max-merged across batches) —
    outliers beyond it saturate to +-127 instead of dilating the lattice."""

    def __init__(self, tree, prefix, out, min_ch=16, per_channel=True,
                 pct=100.0):
        self._paths = _quantizable_conv_paths(tree, prefix, min_ch)
        self.out = out
        self.per_channel = per_channel
        self.pct = float(pct)

    def __enter__(self):
        global _ACT_CALIB
        self._prev = _ACT_CALIB
        _ACT_CALIB = self
        return self

    def __exit__(self, *exc):
        global _ACT_CALIB
        _ACT_CALIB = self._prev
        return False

    def record(self, p, x):
        path = self._paths.get(id(p))
        if path is None:
            return
        if isinstance(x, jax.core.Tracer):
            raise RuntimeError(
                'activation calibration must run eagerly (no jit/vmap '
                'around the calibrated forward)')
        a = jnp.abs(x.astype(jnp.float32))
        if not self.per_channel:
            m = float(jnp.max(a))
            prev = self.out.get(path, 0.0)
            self.out[path] = max(float(np.asarray(prev).max()
                                       if not np.isscalar(prev) else prev), m)
            return
        flat = a.reshape(-1, a.shape[-1])
        if self.pct >= 100.0:
            m = jnp.max(flat, axis=0)
        else:
            m = jnp.percentile(flat, self.pct, axis=0)
        m = np.asarray(m, np.float32)
        prev = self.out.get(path)
        self.out[path] = m if prev is None else np.maximum(
            np.asarray(prev, np.float32), m)


def int8_scope_predicate(scope=None):
    """Map a quantization-scope name to a path predicate for
    quantize_conv_tree_int8. ``scope`` None reads DEEPLIIF_INT8_SCOPE:

    - 'all' (default): every conv the min_ch gate admits.
    - 'resblocks': only the ResNet-trunk resblock convs — the ones the
      fused int8 Pallas kernel runs entirely in VMEM
      (ops.fused_resblock.resblock_chain_int8). Every other conv stays on
      the float path, so the program carries no XLA int8/int32 HBM temps
      and compiles at the bf16 batch ceiling (batch 128 vs the 32 the
      all-conv scope tops out at, docs/Performance.md)."""
    import re
    if scope is None:
        scope = os.environ.get('DEEPLIIF_INT8_SCOPE', 'all')
    if scope == 'all':
        return None
    if scope == 'resblocks':
        return lambda path: re.search(r'(^|/)res\d+_conv', path) is not None
    raise ValueError(f'unknown int8 scope [{scope}] '
                     f"(expected 'all' or 'resblocks')")


def quantize_conv_tree_int8(params, min_ch=16, act_scales=None, scope=None):
    """Walk a param pytree and int8-quantize every conv whose in/out channel
    counts are both >= min_ch (head convs fed by 3-channel images and
    3-channel tail convs stay in the float path: negligible compute, highest
    fidelity sensitivity). Works on stacked (vmapped-ensemble) kernels —
    scales are per (net, out_channel).

    ``act_scales`` switches activation quantization from dynamic per-sample
    (a max-abs reduction that forces the activation to materialize) to
    static calibrated scales (a pure elementwise quantize XLA fuses into
    the producer): one float applied everywhere, or a
    {'/'.join(path): max_abs} dict from calibrate_act_scales where each
    value is a scalar (per-tensor) or a (cin,) vector (per-input-channel,
    act_calibration per_channel=True) — convs with no entry keep dynamic
    quantization. Static scales are FOLDED into the weight before weight
    quantization (w_eff[..,ci,o] = w[..,ci,o] * a_ci), so 'w_s' becomes
    the complete per-output-channel dequant factor and 'a_s' (scalar or
    (cin,)) is used only to quantize the activation. Per-channel folding
    lets the int8 lattice resolve each input channel's own range — the
    round-5 fidelity lever for the flagship int8 config.

    ``scope`` optionally restricts which convs quantize: a predicate over
    the joined path (see int8_scope_predicate)."""
    if not callable(scope):
        scope = int8_scope_predicate(scope)

    def walk(node, path):
        if isinstance(node, dict):
            if 'w' in node and hasattr(node['w'], 'ndim') and node['w'].ndim in (4, 5):
                cin, cout = node['w'].shape[-2], node['w'].shape[-1]
                if scope is not None and not scope('/'.join(path)):
                    return node
                if cin >= min_ch and cout >= min_ch:
                    scale = (act_scales if isinstance(act_scales, (int, float))
                             else (act_scales or {}).get('/'.join(path)))
                    if scale is None:
                        return quantize_conv_int8(node)
                    a = np.maximum(np.asarray(scale, np.float32).reshape(-1),
                                   1e-12) / 127.0
                    if a.size not in (1, cin):
                        raise ValueError(
                            f'act scale for {"/".join(path)} has {a.size} '
                            f'entries, conv has cin={cin}')
                    w_eff = node['w'] * jnp.asarray(a)[:, None]
                    out = quantize_conv_int8({**node, 'w': w_eff})
                    out['w'] = node['w']   # float fallback keeps original
                    a_s = jnp.asarray(a[0] if a.size == 1 else a, jnp.float32)
                    if node['w'].ndim == 5:
                        # stacked (vmapped-ensemble) kernels need the
                        # net-stack axis on every leaf vmap maps over
                        n = node['w'].shape[0]
                        a_s = (jnp.full((n,), a_s) if a_s.ndim == 0
                               else jnp.tile(a_s[None], (n, 1)))
                    out['a_s'] = a_s
                    return out
                return node
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + (str(i),))
                              for i, v in enumerate(node))
        return node
    return walk(params, ())


def conv2d_s2d(x_padded, p, k=7, block=8):
    """Space-to-depth reformulation of a small-output-channel conv.

    A k x k VALID conv producing ``cout`` channels cannot fill the MXU lane
    dimension when cout is tiny (the reference tail c7s1-3 runs at ~1.9 TF/s
    on v5e because only 3 of 128 lanes carry data). Grouping output pixels
    into ``block`` x ``block`` tiles turns it into an equivalent
    (block+k-1)-kernel, stride-``block`` conv with block^2*cout output
    channels — block=8, cout=3 gives N=192 — followed by a depth-to-space on
    the (already tiny) output. 4x more MACs (the expanded kernel is 75%
    zeros) but ~16x better lane utilization.

    ``x_padded`` must already carry the k//2-style padding so the conv is
    VALID; (H_padded - (block+k-1)) must be divisible by ``block``.
    Numerically the same contraction set per output pixel as conv2d.
    """
    w = p['w'].astype(x_padded.dtype)
    kh, kw, cin, cout = w.shape
    assert kh == k and kw == k
    bk = block + k - 1
    # W2[a+i, b+j, :, (a*block+b)*cout+co] = w[i, j, :, co]
    # (Measured alternatives on v5e, batch 32: direct conv ~50 ms, this
    # stride-`block` form ~20 ms, explicit input s2d + 2x2 block conv ~57 ms
    # — the HBM transpose costs more than it saves. See
    # experiments/bench_s2d_variants.py.)
    rows = []
    for a in range(block):
        cols = []
        for b in range(block):
            cols.append(jnp.pad(w, ((a, block - 1 - a), (b, block - 1 - b),
                                    (0, 0), (0, 0))))
        rows.append(jnp.stack(cols))
    w2 = jnp.stack(rows)                                # (blk, blk, bk, bk, cin, cout)
    w2 = jnp.transpose(w2, (2, 3, 4, 0, 1, 5))          # (bk, bk, cin, blk, blk, cout)
    w2 = w2.reshape(bk, bk, cin, block * block * cout)
    y = jax.lax.conv_general_dilated(
        x_padded, w2, (block, block), 'VALID', dimension_numbers=_DN)
    n, hb, wb, _ = y.shape
    y = y.reshape(n, hb, wb, block, block, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    y = y.reshape(n, hb * block, wb * block, cout)
    if 'b' in p:
        y = y + p['b'].astype(y.dtype)
    return y


def s2d_applicable(h_padded, w_padded, cout, k=7, block=8):
    """Gate for conv2d_s2d: shapes tile exactly and the packed lane count
    beats the direct form. Engaged on TPU by default; DEEPLIIF_S2D=0/1
    forces off/on (tests force 1 to exercise the path on CPU)."""
    import os
    flag = os.environ.get('DEEPLIIF_S2D', 'auto')
    if flag == '0':
        return False
    bk = block + k - 1
    ok = (cout <= 8
          and (h_padded - bk) % block == 0 and (w_padded - bk) % block == 0
          and h_padded - bk >= 0 and w_padded - bk >= 0)
    if not ok:
        return False
    if flag == '1':
        return True
    return jax.default_backend() == 'tpu'


def conv_transpose2d_s2d(x, p, block=4):
    """Space-to-depth form of ConvTranspose2d(k=4, stride=2, padding=1,
    output_padding=0) for tiny output-channel counts (the U-Net outermost
    up-conv produces 3 channels -> N=3 starves the MXU lanes exactly like
    the resnet tail; see conv2d_s2d). Groups each 4x4 output block into
    channels: an equivalent 4x4 stride-2 conv with 16*cout outputs over the
    1-padded input, then depth-to-space. 4x the MACs, 16x the lane fill.

    Derivation (per axis, from the dilated form in conv_transpose2d /
    labs.phases): out[2m] = w0 x[m-1] + w2 x[m];
    out[2m+1] = w1 x[m] + w3 x[m+1]. For the output block starting at 4I the
    input window starts at 2I-1 (4 taps)."""
    w = p['w'].astype(x.dtype)
    k, _, cin, cout = w.shape
    assert k == 4 and block == 4
    # per output-offset a: list of (input offset d in window, kernel tap t)
    taps = {0: ((0, 0), (1, 2)), 1: ((1, 1), (2, 3)),
            2: ((1, 0), (2, 2)), 3: ((2, 1), (3, 3))}
    w4 = jnp.zeros((4, 4, cin, 4, 4, cout), w.dtype)
    for a, rows in taps.items():
        for b, cols in taps.items():
            for dy, ty in rows:
                for dx, tx in cols:
                    w4 = w4.at[dy, dx, :, a, b, :].add(w[ty, tx])
    w2 = w4.reshape(4, 4, cin, 16 * cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(xp, w2, (2, 2), 'VALID',
                                     dimension_numbers=_DN)
    n, hb, wb, _ = y.shape
    y = y.reshape(n, hb, wb, 4, 4, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, hb * 4, wb * 4, cout)
    if 'b' in p:
        y = y + p['b'].astype(y.dtype)
    return y


def ct_s2d_applicable(h, w, kshape):
    """Gate for conv_transpose2d_s2d (same DEEPLIIF_S2D env control as
    s2d_applicable)."""
    import os
    flag = os.environ.get('DEEPLIIF_S2D', 'auto')
    if flag == '0':
        return False
    kh, kw, _, cout = kshape
    ok = kh == 4 and kw == 4 and cout <= 8 and h % 2 == 0 and w % 2 == 0
    if not ok:
        return False
    if flag == '1':
        return True
    return jax.default_backend() == 'tpu'


def conv_transpose2d(x, p, stride=2, padding=1, output_padding=1):
    """torch ConvTranspose2d equivalent.

    The kernel is stored in forward-conv HWIO layout (spatially flipped,
    in/out transposed relative to the torch IOHW parameter); the op is then
    an input-dilated convolution:
      out = (in-1)*stride - 2*padding + k + output_padding

    Measured note (v5e, round 2): a sub-pixel phase decomposition (4 dense
    phase convs + interleave, 4x fewer MACs than the zero-padded dilated
    form) is numerically exact but 19% SLOWER end-to-end — the phase
    interleave is a full-tensor HBM shuffle, and XLA:TPU already lowers
    lhs_dilation convs efficiently on the MXU. Kept available as
    labs.phases.conv_transpose2d_phases; the dilated form is the default.
    """
    k = p['w'].shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    if _ACT_CALIB is not None:
        _ACT_CALIB.record(p, x)
    if 'w_q' in p and _int8_ok(x, static='a_s' in p):
        q, s = _quant_act(x, p)
        y = jax.lax.conv_general_dilated(
            q, p['w_q'], (1, 1), [(lo, hi), (lo, hi)],
            lhs_dilation=(stride, stride), dimension_numbers=_DN,
            preferred_element_type=jnp.int32)
        deq = p['w_s'] if s is None else s * p['w_s']
        out = (y.astype(jnp.float32) * deq).astype(x.dtype)
        if 'b' in p:
            out = out + p['b'].astype(x.dtype)
        return out
    w = p['w'].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(lo, hi), (lo, hi)], lhs_dilation=(stride, stride),
        dimension_numbers=_DN)
    if 'b' in p:
        out = out + p['b'].astype(x.dtype)
    return out


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

def batch_stat_norm(x, p, eps=1e-5, per_sample=False):
    """BatchNorm2d with per-batch statistics (biased variance), affine.

    ``per_sample=True`` computes statistics per sample (axes H,W only) —
    this is the REFERENCE INFERENCE semantics: the reference disables
    running stats and feeds every tile as a batch of one
    (util/__init__.py:743-771 + per-tile run_dask), so its "batch" stats
    are per-tile. Batched tile inference must not couple tiles through the
    norm (outputs would depend on bucketing). Training keeps the
    batch-coupled torch semantics (per_sample=False).

    Statistics are computed in float32 (small per-channel reductions); the
    normalization arithmetic stays in the activation dtype so bf16 runs keep
    bf16 temps — upcasting the full activation tensor to f32 doubled HBM
    footprint and OOM'd large tile batches.
    """
    axes = (1, 2) if per_sample else (0, 1, 2)
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=axes, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=axes, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    scale = (inv * p['scale']).astype(x.dtype)
    bias = (p['bias'] - mean * inv * p['scale']).astype(x.dtype)
    return x * scale + bias


def instance_norm(x, p=None, eps=1e-5):
    """InstanceNorm2d(affine=False): per-sample, per-channel spatial stats."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(1, 2), keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    if p is not None and 'scale' in p:
        scale = (inv * p['scale']).astype(x.dtype)
        bias = (p['bias'] - mean * inv * p['scale']).astype(x.dtype)
    else:
        scale = inv.astype(x.dtype)
        bias = (-mean * inv).astype(x.dtype)
    return x * scale + bias


def apply_norm(x, p, norm_type, train=True):
    """``train=False`` switches 'batch' norm to per-sample statistics (the
    reference's effective inference semantics — see batch_stat_norm)."""
    if norm_type == 'batch':
        return batch_stat_norm(x, p, per_sample=not train)
    if norm_type == 'instance':
        return instance_norm(x)
    if norm_type in ('none', 'spectral'):
        return x
    raise NotImplementedError(f'norm [{norm_type}] not implemented')


def norm_has_params(norm_type):
    return norm_type == 'batch'


def norm_use_bias(norm_type):
    """Convs carry bias iff the norm layer is INSTANCE norm — the exact
    reference rule (networks.py: use_bias = norm_layer ==
    nn.InstanceNorm2d), so batch/none/spectral nets have NO conv bias."""
    return norm_type == 'instance'


# ---------------------------------------------------------------------------
# padding / activations / misc
# ---------------------------------------------------------------------------

def pad2d(x, n, mode='zero'):
    cfg = [(0, 0), (n, n), (n, n), (0, 0)]
    if mode == 'zero':
        return jnp.pad(x, cfg)
    if mode == 'reflect':
        return jnp.pad(x, cfg, mode='reflect')
    if mode == 'replicate':
        return jnp.pad(x, cfg, mode='edge')
    raise NotImplementedError(f'padding [{mode}] not implemented')


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def dropout(x, rng, rate=0.5, train=False):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def upsample_nearest(x, factor=2):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def pixel_shuffle(x, factor=2):
    n, h, w, c = x.shape
    r = factor
    # torch PixelShuffle on NCHW: c_out = c/r^2, interleave; NHWC equivalent
    x = x.reshape(n, h, w, c // (r * r), r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(n, h * r, w * r, c // (r * r))


# ---------------------------------------------------------------------------
# spectral norm (reference networks.py:757-765): one power-iteration step
# using a stored left-singular vector estimate. `update_spectral_vectors`
# refreshes the estimates between training steps.
# ---------------------------------------------------------------------------

def add_spectral_u(params, key):
    """Add power-iteration vectors 'u' next to every conv kernel 'w' in a
    (possibly stacked) param tree."""
    leaves = []

    def walk(node, path):
        if isinstance(node, dict):
            if 'w' in node and hasattr(node['w'], 'ndim') and node['w'].ndim >= 4:
                leaves.append((node, node['w'].shape))
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + (i,))

    walk(params, ())
    keys = split_keys(key, max(1, len(leaves)))
    for (node, shape), k in zip(leaves, keys):
        if len(shape) == 5:  # stacked (N,kh,kw,i,o)
            n = shape[0]
            m = shape[1] * shape[2] * shape[3]
            node['u'] = jax.random.normal(k, (n, m), jnp.float32)
        else:
            m = shape[0] * shape[1] * shape[2]
            node['u'] = jax.random.normal(k, (m,), jnp.float32)
    return params


def _sn_single(w, u, n_iter):
    mat = w.reshape(-1, w.shape[-1]).astype(jnp.float32)
    v = None
    for _ in range(n_iter):
        v = mat.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = mat @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (mat @ v)
    return (w / sigma.astype(w.dtype)), u


def spectral_normalize_tree(params, n_iter=3):
    """Spectral-normalize every conv kernel that has a 'u' vector (torch
    parametrizations.spectral_norm equivalent; reference networks.py:757-765
    when norm='spectral'). Power iteration runs from the stored u with
    stop-gradient, so gradients flow only through W. Returns (normalized
    params, params with refreshed u)."""

    def norm_node(node):
        if isinstance(node, dict):
            out = {}
            fresh = {}
            if 'w' in node and 'u' in node:
                w, u = node['w'], node['u']
                if w.ndim == 5:
                    wn, un = jax.vmap(lambda wi, ui: _sn_single(wi, ui, n_iter))(w, u)
                else:
                    wn, un = _sn_single(w, u, n_iter)
                out['w'] = wn
                fresh['u'] = un
                for k, v in node.items():
                    if k not in ('w', 'u'):
                        out[k] = v
                return out, {**node, **fresh, 'w': node['w']}
            normed, refreshed = {}, {}
            for k, v in node.items():
                nv, rv = norm_node(v)
                normed[k] = nv
                refreshed[k] = rv
            return normed, refreshed
        if isinstance(node, (list, tuple)):
            pairs = [norm_node(v) for v in node]
            return type(node)(p[0] for p in pairs), type(node)(p[1] for p in pairs)
        return node, node

    return norm_node(params)


def tree_stack(trees):
    """Stack a list of identical pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def tree_unstack(tree, n):
    return [jax.tree_util.tree_map(lambda x: x[i], tree) for i in range(n)]


def split_keys(key, n):
    return list(jax.random.split(key, n))
