"""Model registry and the batched TPU inference engine.

Replaces the reference inference stack (/root/reference/deepliif/models/
__init__.py:117-954) — Dask-delayed per-net forwards chunked over GPUs —
with one jitted batched ensemble program:

  init_nets  -> InferenceSession (cached per model dir): options + params
                (imported from torch .pth/.pt or native .npz) + jitted
                bucketed-batch forward
  run_batch  -> (N, ts, ts, 3) uint8 tiles -> dict of uint8 outputs; empty
                tiles (gray variance < 9, reference models/__init__.py:
                391-396) are skipped on host and filled with the model's
                background colors
  inference / infer_modalities / postprocess -> same API surface and output
                key names as the reference
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..config import get_opt
from ..utils import image_variance_gray
from ..utils.tiler import InferenceTiler
from . import deepliif as dl

MODEL_REGISTRY = {}


def register_model(name):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls
    return deco


def find_model_using_name(name):
    # populated lazily to avoid import cycles
    from . import deepliif_ext, sdg, cyclegan, deepliif_kd  # noqa: F401
    MODEL_REGISTRY.setdefault('DeepLIIF', dl)
    if name not in MODEL_REGISTRY:
        raise KeyError(f'model [{name}] not registered')
    return MODEL_REGISTRY[name]


def _bucket(n, max_batch=16, multiple=1):
    """Pad batch count to a power-of-two bucket (clamped to max_batch, which
    may be any positive int) to bound recompiles. ``multiple`` (the device
    count under mesh sharding) is the minimum bucket so every bucket divides
    evenly across the mesh; it wins over max_batch if they conflict."""
    b = max(1, multiple)
    while b < n and b < max_batch:
        b *= 2
    return max(multiple, min(b, max_batch))


class InferenceSession:
    """Loaded model (any family) ready for batched tile inference.

    Output key names per family mirror the reference net ids:
      DeepLIIF/KD: G1..Gm + GS (+ GS0..GSm intermediates)
      DeepLIIFExt: G_1..G_m + GS_1..GS_m
      SDG:         G_1..G_m
      CycleGAN:    GA_1..GA_m (or GB_* with BtoA)
    """

    def __init__(self, model_dir, opt=None, phase='test', max_batch=None,
                 epoch='latest', n_devices=None, precision=None):
        self.model_dir = model_dir
        self.opt = opt if opt is not None else get_opt(model_dir, mode=phase)
        if precision is not None and precision != getattr(self.opt, 'precision',
                                                          'float32'):
            import copy
            self.opt = copy.copy(self.opt)   # get_opt is lru_cached — don't
            self.opt.precision = precision   # mutate the shared instance
        self.epoch = str(epoch)
        self.model = getattr(self.opt, 'model', 'DeepLIIF')
        if self.model in ('DeepLIIF', 'DeepLIIFKD'):
            self.family = 'deepliif'
            self.d = dl.def_from_opt(self.opt)
        elif self.model == 'DeepLIIFExt':
            from . import deepliif_ext as ext
            self.family = 'ext'
            self.d = ext.def_from_opt(self.opt)
        elif self.model == 'SDG':
            from . import sdg as sdg_m
            self.family = 'sdg'
            self.d = sdg_m.def_from_opt(self.opt)
        elif self.model == 'CycleGAN':
            from . import cyclegan as cg
            self.family = 'cyclegan'
            self.d = cg.def_from_opt(self.opt)
        else:
            raise NotImplementedError(f'unknown model family {self.model}')
        # Multi-chip: when more than one device is visible (a real v5e-8 or
        # the 8-virtual-device CPU test mesh), batch tiles across chips with
        # params replicated and the tile batch sharded along a 'data' axis —
        # the product-path replacement for the reference's Dask net-group
        # placement (/root/reference/deepliif/models/__init__.py:172-219).
        # Override with n_devices= or DEEPLIIF_INFER_DEVICES=N (N=1 forces
        # the single-device path).
        from .. import parallel
        if n_devices is None:
            env = os.environ.get('DEEPLIIF_INFER_DEVICES')
            n_devices = int(env) if env else len(jax.devices())
        self.n_devices = max(1, min(int(n_devices), len(jax.devices())))
        self.mesh = (parallel.get_mesh(self.n_devices)
                     if self.n_devices > 1 else None)
        if max_batch is None:
            # measured optimum on v5e (round 2): throughput keeps rising
            # to the largest compilable batch (71.7 tiles/s at 128 vs 59.3
            # at 48; 192 exceeds HBM at compile). Per chip; scaled by the
            # mesh size. Small inputs still use small power-of-two buckets
            # (_bucket), so latency is unaffected.
            per_chip = 128 if self.d.dtype is not None else 16
            if getattr(self.d, 'quant_int8', False):
                from ..nets import layers as _L
                if _L.int8_scope_predicate() is None:
                    # scope 'all': convs outside the fused resblock chain
                    # run the XLA int8 path, whose int8/int32 HBM temps
                    # fail to compile at per-chip batch >= 48 on v5e
                    # (docs/Performance.md 'int8 quantized inference') —
                    # clamp so mesh and single-chip sessions both fit
                    per_chip = min(per_chip, 32)
            max_batch = per_chip * self.n_devices
        self.max_batch = max_batch
        self.params = self._load_params(model_dir)
        self.act_scales = None
        if getattr(self.d, 'quant_int8', False):
            # pre-quantize interior conv kernels once (per-output-channel
            # int8 + scale); conv2d/conv_transpose2d auto-detect 'w_q'.
            # With calibrated activation scales (act_scales.json, written
            # by calibrate_int8) quantization is STATIC — a pure
            # elementwise op XLA fuses into the producer — instead of the
            # dynamic per-sample max-abs that forces materialization.
            from ..nets import layers as _L
            self.act_scales = self._load_act_scales(model_dir)
            self.params = _L.quantize_conv_tree_int8(
                self.params, act_scales=self.act_scales)
        if self.mesh is not None:
            self.params = parallel.replicate(self.mesh, self.params)
        self._jitted = {}

    @staticmethod
    def _load_act_scales(model_dir):
        path = os.path.join(model_dir, 'act_scales.json')
        if not os.path.exists(path):
            return None
        import json
        with open(path) as f:
            doc = json.load(f)
        return {k: (v if isinstance(v, list) else float(v))
                for k, v in doc.get('scales', doc).items()}

    def calibrate_int8(self, tiles_u8, save=True, max_tiles=32, batch=4,
                       pct=None, per_channel=True):
        """Calibrate static int8 activation scales on sample tiles
        ((N, s, s, 3) uint8), re-quantize the params with them, and
        persist ``act_scales.json`` next to the checkpoint so later
        sessions skip calibration. DeepLIIF family only (the int8
        flagship); runs the ensemble eagerly in batches of ``batch`` over
        up to ``max_tiles`` tiles, max-merging per-input-channel ranges
        (optionally percentile-clipped via ``pct`` /
        DEEPLIIF_INT8_CALIB_PCT)."""
        if not getattr(self.d, 'quant_int8', False):
            raise ValueError('calibrate_int8 requires --precision int8')
        if self.family != 'deepliif':
            raise NotImplementedError(
                'int8 calibration is implemented for the DeepLIIF family')
        from .. import parallel
        from ..nets import layers as _L
        if pct is None:
            pct = float(os.environ.get('DEEPLIIF_INT8_CALIB_PCT', '100'))
        tiles = np.asarray(tiles_u8)[:max_tiles]
        raw = self._load_params(self.model_dir)
        scales = {}
        for i in range(0, len(tiles), batch):
            x = jnp.asarray(tiles[i:i + batch], jnp.float32) / 127.5 - 1.0
            dl.calibrate_act_scales(raw, x, self.d, out=scales, pct=pct,
                                    per_channel=per_channel)
        self.act_scales = {k: (v.tolist() if hasattr(v, 'tolist') else v)
                           for k, v in scales.items()}
        self.params = _L.quantize_conv_tree_int8(
            raw, act_scales=self.act_scales)
        if self.mesh is not None:
            self.params = parallel.replicate(self.mesh, self.params)
        if save:
            import json
            try:
                with open(os.path.join(self.model_dir,
                                       'act_scales.json'), 'w') as f:
                    json.dump({'scales': self.act_scales, 'pct': pct,
                               'n_tiles': int(len(tiles))}, f, indent=1)
            except OSError:
                pass  # read-only model dir: calibration stays in-session
        return self.act_scales

    def _dynamic_int8_active(self, th, tw):
        """True when every int8-quantized conv will run the fused
        per-chunk-dynamic Pallas kernel at this tile size — i.e. scope is
        'resblocks' (only resblock convs quantize), the params carry no
        static scales, and the fused translator path engages — so static
        calibration would be dead weight."""
        if self.family != 'deepliif' or not getattr(self.d, 'quant_int8',
                                                    False):
            return False
        if os.environ.get('DEEPLIIF_INT8_SCOPE', 'all') != 'resblocks':
            return False
        if not getattr(self.d, 'uniform_g', True):
            return False
        dtype = self.d.dtype if self.d.dtype is not None else jnp.float32
        probe = jax.ShapeDtypeStruct((1, th, tw, 3), dtype)
        try:
            return (dl._translators_fused(probe, self.d, self.params['G'])
                    and self.act_scales is None)
        except Exception:
            return False

    def _init_like(self):
        if self.family == 'deepliif':
            return lambda k: dl.init_params(k, self.d, with_discriminators=False)
        if self.family == 'ext':
            from . import deepliif_ext as ext
            return lambda k: ext.init_params(k, self.d, with_discriminators=False)
        if self.family == 'sdg':
            from . import sdg as sdg_m
            return lambda k: sdg_m.init_params(k, self.d, with_discriminators=False)
        from . import cyclegan as cg
        return lambda k: cg.init_params(k, self.d, with_discriminators=False)

    def _load_params(self, model_dir):
        from ..utils import checkpoints, torch_import
        ep = self.epoch
        if checkpoints.has_native_checkpoint(model_dir, ep):
            # structure-only init: eval_shape skips all computation
            like = jax.eval_shape(self._init_like(), jax.random.PRNGKey(0))
            if self.family == 'cyclegan':
                # a test dir may ship only one direction
                like = {k: v for k, v in like.items()
                        if os.path.exists(os.path.join(model_dir,
                                                       f'{ep}_net_{k}.npz'))}
            return checkpoints.load_networks(model_dir, like, ep)
        # torch-era model dir
        if self.family == 'deepliif':
            return torch_import.import_deepliif_dir(model_dir, self.opt, ep)
        if self.family == 'ext':
            return torch_import.import_ext_dir(model_dir, self.opt, ep)
        if self.family == 'sdg':
            return torch_import.import_sdg_dir(model_dir, self.opt, ep)
        return torch_import.import_cyclegan_dir(model_dir, self.opt, ep)

    def _marker_index(self):
        names = getattr(self.opt, 'modalities_names', []) or []
        input_no = getattr(self.opt, 'input_no', 1)
        for i, nm in enumerate(names[input_no:]):
            if 'Marker' in nm:
                return i
        return None

    def _forward(self, seg_weights, intermediate=False, seg_only=False,
                 mod_only=False):
        key = (tuple(seg_weights) if seg_weights is not None else None,
               intermediate, seg_only, mod_only)
        if key not in self._jitted:
            import dataclasses
            d = self.d
            # the mesh path runs through shard_map (parallel.
            # make_sharded_forward), under which pallas_call has local
            # per-device semantics — the fused bf16/int8 kernels stay
            # engaged per chip, same as single-device
            if mod_only and self.family == 'deepliif' and d.seg_gen:
                # prune the 5 seg branches entirely (reference mod_only skips
                # stage 2, models/__init__.py:330-334)
                d = dataclasses.replace(d, seg_gen=False)
            family = self.family

            def _norm(x):
                x = x.astype(jnp.float32) / 127.5 - 1.0
                return x.astype(d.dtype) if d.dtype is not None else x

            # seg_only_forward indexes a STACKED (uniform-arch) param tree
            # along the net axis — a heterogeneous net_g/net_gs model dir
            # stores per-net lists, which that indexing would silently
            # slice inside each weight tensor (garbage output, no error);
            # such dirs take the full forward instead
            uniform = getattr(d, 'uniform_g', True) \
                and getattr(d, 'uniform_gs', True)
            if family == 'deepliif' and seg_only and uniform:
                marker_index = self._marker_index()

                def fn(params, x):
                    seg, marker = dl.seg_only_forward(
                        params, _norm(x), d, seg_weights=seg_weights,
                        marker_index=marker_index)
                    out = {'seg': _quantize_u8(seg)}
                    if marker is not None:
                        out['marker'] = _quantize_u8(marker)
                    return out
            elif family == 'deepliif':
                def fn(params, x):
                    res = dl.inference_forward(params, _norm(x), d,
                                               seg_weights=seg_weights,
                                               return_intermediate=intermediate)
                    # quantize on device: tanh range -> uint8 (reference
                    # tensor2im semantics: (y+1)/2*255 truncating). Moves 4x
                    # less data device->host than f32 outputs.
                    return {k: _quantize_u8(v) for k, v in res.items()}
            elif family == 'ext':
                from . import deepliif_ext as ext

                def fn(params, x):
                    mods, segs = ext.generator_forward(params, _norm(x), d)
                    out = {'mods': _quantize_u8(mods)}
                    if segs is not None:
                        out['segs'] = _quantize_u8(segs)
                    return out
            elif family == 'sdg':
                from . import sdg as sdg_m

                def fn(params, x):
                    mods, _ = sdg_m.generator_forward(params, _norm(x), d)
                    return {'mods': _quantize_u8(mods)}
            else:  # cyclegan
                from . import cyclegan as cg
                bto_a = getattr(self.opt, 'BtoA', False)

                def fn(params, x):
                    mods = cg.inference_forward(params, _norm(x), d, bto_a)
                    return {'mods': _quantize_u8(mods)}

            if self.mesh is not None:
                from .. import parallel
                self._jitted[key] = parallel.make_sharded_forward(fn, self.mesh)
            else:
                self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def _mod_keys(self):
        m = self.d.modalities_no
        if self.family == 'deepliif':
            return [f'G{i+1}' for i in range(m)]
        if self.family == 'cyclegan':
            prefix = 'GB' if getattr(self.opt, 'BtoA', False) else 'GA'
            return [f'{prefix}_{i+1}' for i in range(m)]
        return [f'G_{i+1}' for i in range(m)]

    def run_tiles(self, tiles_u8, seg_weights=None, seg_only=False,
                  mod_only=False, return_intermediate=False,
                  device_keys=()):
        """tiles_u8: (N, s, s, 3) uint8 -> dict of (N, s, s, 3) uint8 outputs
        keyed by net id (G1..Gm, GS, and GS0..GSm when intermediates wanted).

        Empty tiles are detected host-side and filled with background colors
        (reference run_wrapper, models/__init__.py:399-461).

        ``device_keys``: output keys to KEEP ON DEVICE — they are excluded
        from the host dict and returned in a second dict of jnp uint8
        arrays (N, s, s, 3), for fused pipelines (device stitch +
        quantification) that never fetch the tiles. When non-empty the
        return value is ``(host_out, device_out)``.
        """
        from ..utils import luma_u8
        n = tiles_u8.shape[0]
        m = self.d.modalities_no
        # empty-tile detection: luma variance excluding pure 0/255 pixels
        # (reference image_variance_gray, util/__init__.py:479-487)
        gray = luma_u8(tiles_u8).astype(np.float32)
        valid = (gray != 0) & (gray != 255)
        cnt = valid.sum(axis=(1, 2))
        s = np.where(valid, gray, 0).sum(axis=(1, 2))
        s2 = np.where(valid, gray * gray, 0).sum(axis=(1, 2))
        with np.errstate(divide='ignore', invalid='ignore'):
            mean = s / cnt
            variance = np.where(cnt > 0, s2 / cnt - mean * mean, 0.0)
        nonempty = np.where(variance >= 9.0)[0]

        out = {}
        th, tw = tiles_u8.shape[1:3]
        mod_keys = self._mod_keys()
        seg_gen = getattr(self.d, 'seg_gen', False)
        bg = getattr(self.opt, 'background_colors',
                     [(10, 10, 10)] * m) or [(10, 10, 10)] * m
        for i, mk in enumerate(mod_keys):
            color = tuple(bg[i]) if i < len(bg) else (10, 10, 10)
            out[mk] = np.tile(
                np.asarray(color, np.uint8)[None, None, None, :],
                (n, th, tw, 1))
        if seg_gen and not mod_only:
            if self.family == 'deepliif':
                out['GS'] = np.zeros((n, th, tw, 3), np.uint8)
                if return_intermediate:
                    for i in range(m + 1):
                        out[f'GS{i}'] = np.zeros((n, th, tw, 3), np.uint8)
            elif self.family == 'ext':
                for i in range(m):
                    out[f'GS_{i+1}'] = np.zeros((n, th, tw, 3), np.uint8)

        assert all(k == 'GS' for k in device_keys), device_keys

        if len(nonempty) == 0:
            if device_keys:
                return out, {k: jnp.asarray(out.pop(k)) for k in device_keys}
            return out

        if (getattr(self.d, 'quant_int8', False) and self.act_scales is None
                and self.family == 'deepliif'
                and os.environ.get('DEEPLIIF_INT8_CALIBRATE', '1') != '0'
                and not self._dynamic_int8_active(th, tw)):
            # first real tiles seen by an uncalibrated int8 session: derive
            # static per-channel activation scales from up to 32 of them
            # (eager ensemble passes in small batches), persisted to the
            # model dir for every later session. Skipped entirely when the
            # fused per-chunk-dynamic kernel serves every quantized conv
            # (scope=resblocks default) — it needs no calibration and is
            # finer-grained than any static scale.
            self.calibrate_int8(tiles_u8[nonempty[:32]])

        x_all = tiles_u8[nonempty]  # normalization happens on device
        use_seg_only = (self.family == 'deepliif' and seg_only and seg_gen
                        and not mod_only and not return_intermediate
                        and self.d.uniform_g and self.d.uniform_gs)
        fwd = self._forward(tuple(seg_weights) if seg_weights is not None else None,
                            return_intermediate and self.d.seg_gen and not mod_only,
                            seg_only=use_seg_only, mod_only=mod_only)
        marker_idx = self._marker_index() if use_seg_only else None

        dev_parts = {k: [] for k in device_keys}

        def _drain(idx, valid, res):
            # device->host fetch of one bucket's outputs
            if 'mods' in res:
                mods = np.asarray(res['mods'])  # (M, b, s, s, 3) uint8
                for i, mk in enumerate(mod_keys):
                    out[mk][idx] = mods[i][:valid]
            elif 'marker' in res and marker_idx is not None:
                out[mod_keys[marker_idx]][idx] = np.asarray(res['marker'])[:valid]
            if 'seg' in res and not mod_only:
                if 'GS' in dev_parts:
                    dev_parts['GS'].append((idx, res['seg'][:valid]))
                else:
                    out['GS'][idx] = np.asarray(res['seg'])[:valid]
            if 'segs' in res and not mod_only:
                segs = np.asarray(res['segs'])
                for i in range(segs.shape[0]):
                    k = f'GS{i}' if self.family == 'deepliif' else f'GS_{i+1}'
                    out[k][idx] = segs[i][:valid]

        # two-deep pipeline: dispatch bucket i+1 (async) before fetching
        # bucket i, so the host upload/download overlaps device compute
        from collections import deque
        if self.mesh is not None:
            from .. import parallel
            in_sharding = parallel.batch_sharded(self.mesh)
        pending = deque()
        pos = 0
        while pos < len(nonempty):
            b = _bucket(len(nonempty) - pos, self.max_batch, self.n_devices)
            chunk = x_all[pos:pos + b]
            pad = b - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                        chunk.dtype)])
            if self.mesh is not None:
                x_dev = jax.device_put(chunk, in_sharding)
            else:
                x_dev = jnp.asarray(chunk)
            res = fwd(self.params, x_dev)  # async dispatch
            # start the device->host copies now: they queue behind the
            # compute and stream while the host prepares/dispatches the next
            # bucket (device->host bandwidth is the ROI bottleneck on
            # tunneled test rigs, ~20 MB/s; see docs/Performance.md).
            # Device-kept keys are never copied.
            for rk, v in res.items():
                if rk == 'seg' and 'GS' in dev_parts:
                    continue
                try:
                    v.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
            valid = b - pad
            pending.append((nonempty[pos:pos + valid], valid, res))
            if len(pending) >= 2:
                _drain(*pending.popleft())
            pos += valid
        while pending:
            _drain(*pending.popleft())

        if device_keys:
            dev_out = {}
            for k in device_keys:
                # background-filled base (zeros for seg keys) + the computed
                # tiles scattered at their indices — all on device
                full = jnp.asarray(out.pop(k))
                for idx, arr in dev_parts[k]:
                    full = full.at[jnp.asarray(idx)].set(arr)
                dev_out[k] = full
            return out, dev_out
        return out


def _quantize_u8(y):
    return ((y.astype(jnp.float32) + 1.0) * 127.5).astype(jnp.uint8)


def init_nets(model_dir, phase='test', epoch='latest', max_batch=None,
              n_devices=None, precision=None):
    """Cached session construction (reference init_nets, models/__init__.py:
    158-219; net grouping / GPU placement is obsolete — one program that is
    batch-sharded over all visible chips). ``precision`` overrides the model
    dir's configured compute precision (float32 | bfloat16 | int8).

    The cache key is normalized (all-positional through the inner cached
    call), so init_nets(md) and init_nets(md, epoch='latest') share one
    session instead of loading the params twice."""
    return _init_nets_cached(model_dir, phase, str(epoch), max_batch,
                             n_devices, precision)


@functools.lru_cache(maxsize=8)
def _init_nets_cached(model_dir, phase, epoch, max_batch, n_devices,
                      precision):
    return InferenceSession(model_dir, phase=phase, epoch=epoch,
                            max_batch=max_batch, n_devices=n_devices,
                            precision=precision)


def find_marker_key(d):
    for k in d:
        if k is not None and 'Marker' in k:
            return k
    return None


def is_empty(tile):
    thresh = 9
    if isinstance(tile, (list, tuple)):
        return all(image_variance_gray(t) < thresh for t in tile)
    return image_variance_gray(tile) < thresh


def inference(img, tile_size, overlap_size, model_path, use_torchserve=False,
              eager_mode=False, color_dapi=False, color_marker=False, opt=None,
              return_seg_intermediate=False, seg_only=False, mod_only=False,
              seg_weights=None, opt_args=None, session=None, max_batch=None,
              _device_seg=False, precision=None):
    """Tiled ensemble inference on a PIL image; returns {name: PIL.Image}.

    Output key naming matches the reference inference()
    (models/__init__.py:502-565): 'mod{i}-{Name}' per modality plus 'Seg'.
    """
    from PIL import Image

    if session is None:
        session = init_nets(model_path,
                            epoch=str(getattr(opt, 'epoch', 'latest') if opt
                                      is not None else 'latest'),
                            max_batch=max_batch, precision=precision)
    opt = session.opt if opt is None else opt
    if opt_args:
        for k, v in opt_args.items():
            setattr(opt, k, v)

    if getattr(opt, 'seg_gen', True) is False:
        seg_only = False
        return_seg_intermediate = False

    if getattr(opt, 'input_no', 1) > 1 or opt.model == 'SDG':
        w, h = img.width // opt.input_no, img.height
        orig = [np.asarray(img.crop((w * i, 0, w * (i + 1), h)))
                for i in range(opt.input_no)]
    else:
        orig = np.asarray(img.convert('RGB'))

    scale_size = getattr(opt, 'scale_size', tile_size)
    tiler = InferenceTiler(orig, tile_size, overlap_size)
    tiles = tiler.tiles()

    def _resize(batch):
        if batch.shape[1] == scale_size:
            return batch
        return np.stack([
            np.asarray(Image.fromarray(t).resize((scale_size, scale_size),
                                                 Image.BICUBIC))
            for t in batch])

    if isinstance(tiles, list):
        # multi-input (SDG): channel-concat the input modalities per tile
        net_in = np.concatenate([_resize(t) for t in tiles], axis=-1)
    else:
        net_in = _resize(tiles)

    # fused device path: keep the seg tiles on device, stitch them there
    # with the ownership-map gather (exact stitch_batch semantics, see
    # utils/tiler.py), and hand the canvas straight to the device
    # quantifier — the seg never round-trips through the host between
    # stages (BASELINE north star). The 'Seg' output image is one fetch of
    # the stitched canvas instead of a fetch per tile.
    use_device_seg = (
        _device_seg and session.family == 'deepliif'
        and getattr(opt, 'seg_gen', True) and not mod_only
        and not return_seg_intermediate
        and tiler.pad_size == 0 and scale_size == tile_size
        and not isinstance(tiles, list))
    seg_canvas = None
    if use_device_seg:
        results_net, dev = session.run_tiles(
            net_in, seg_weights=seg_weights, seg_only=seg_only,
            mod_only=mod_only, return_intermediate=False,
            device_keys=('GS',))
        tile_idx, ty, tx = tiler.ownership_maps()
        seg_canvas = dev['GS'][jnp.asarray(tile_idx),
                               jnp.asarray(ty)[:, None],
                               jnp.asarray(tx)[None, :]]
        seg_canvas = seg_canvas[:tiler.orig_height, :tiler.orig_width]
        results_net = dict(results_net)
    else:
        results_net = session.run_tiles(
            net_in, seg_weights=seg_weights, seg_only=seg_only,
            mod_only=mod_only,
            return_intermediate=return_seg_intermediate)

    for key, batch in results_net.items():
        if batch.shape[1] != tile_size:
            batch = np.stack([
                np.asarray(Image.fromarray(t).resize((tile_size, tile_size),
                                                     Image.BICUBIC))
                for t in batch])
        tiler.stitch_batch(key, batch)
    results = {k: Image.fromarray(v) for k, v in tiler.results().items()}
    if seg_canvas is not None:
        # one fetch of the device-stitched canvas (identical bytes to the
        # host stitch; the device array also feeds the quantifier directly)
        results['GS'] = Image.fromarray(np.asarray(seg_canvas))

    # ---- output naming (parity with reference models/__init__.py:502-565)
    m = opt.modalities_no
    if opt.model == 'DeepLIIFExt':
        images = {f'mod{i}': results[f'G_{i}'] for i in range(1, m + 1)}
        if getattr(opt, 'seg_gen', True) and not mod_only:
            images.update({f'Seg{i}': results[f'GS_{i}']
                           for i in range(1, m + 1) if f'GS_{i}' in results})
        return (images, None) if _device_seg else images
    if opt.model == 'SDG':
        images = {f'mod{i}': results[f'G_{i}'] for i in range(1, m + 1)}
        return (images, None) if _device_seg else images
    if opt.model == 'CycleGAN':
        # default net-name keys (reference behavior)
        return (results, None) if _device_seg else results

    input_no = getattr(opt, 'input_no', 1)
    modality_names = getattr(opt, 'modalities_names',
                             [f'mod{i}' for i in range(m + 1)])
    l_modname = [f'mod{i+1}' for i in range(m)]
    if l_modname != list(modality_names[input_no:]):
        l_modname = [f'mod{i+1}-{nm}' for i, nm in
                     enumerate(modality_names[input_no:])]
    d_modname2id = {nm: f'G{i+1}' for i, nm in enumerate(l_modname)}
    if not mod_only and getattr(opt, 'seg_gen', True):
        d_modname2id['Seg'] = 'GS'

    if seg_only:
        images = {'Seg': results['GS']}
        marker_key = find_marker_key(d_modname2id)
        if marker_key is not None and d_modname2id[marker_key] in results:
            images[marker_key] = results[d_modname2id[marker_key]]
    else:
        images = {nm: results[mid] for nm, mid in d_modname2id.items()
                  if mid in results}

    if return_seg_intermediate and not seg_only and getattr(opt, 'seg_gen', True):
        # per-branch seg outputs named '{modality}_s' (reference
        # models/__init__.py:545-556)
        l_seg = [f'mod{i}' for i in range(m + 1)]
        if l_seg != list(modality_names):
            l_seg = [f'mod{i}-{nm}' for i, nm in enumerate(modality_names)]
        for i, nm in enumerate(l_seg):
            if f'GS{i}' in results:
                images[f'{nm}_s'] = results[f'GS{i}']
    return (images, seg_canvas) if _device_seg else images


@functools.lru_cache(maxsize=1)
def _d2h_bandwidth_mbps():
    """One-shot device->host fetch bandwidth probe (MB/s). The device
    quantifier's e2e viability hinges on this: it returns two extra uint8
    canvases (overlay + refined) that the host path computes locally, so
    on slow-transfer rigs (the tunneled axon dev setup runs ~10-25 MB/s)
    the host path wins e2e while PCIe-class hosts (~GB/s) favor the device
    path for large canvases."""
    import time
    try:
        x = jnp.zeros((4 * 1024 * 1024,), jnp.uint8) + 1
        np.asarray(x)  # warm
        t0 = time.perf_counter()
        np.asarray(x + 1)
        dt = time.perf_counter() - t0
        return 4.0 / max(dt, 1e-6)
    except Exception:  # noqa: BLE001
        return 0.0


# WSI-scale hardware measurement (round 4, experiments/bench_wsi_devquant.py
# on one v5e chip; docs/Performance.md 'WSI-scale quantification'): the
# device quantifier's compute beats the host numpy path 7-35x at every
# canvas from 2.0 MPx (0.48 s vs 5.2 s) to 67.1 MPx (20.8 s vs 221.7 s),
# counts exactly equal — but at 163.8 MPx single-device the labeling
# program's int32 temporaries exceed the 16 GB HBM and CRASH the TPU
# worker. Per-device cap set at 80 MPx (measured-good 67 MPx + margin);
# mesh-sharded labeling divides the canvas across devices so the cap
# scales with the mesh size.
_DEVICE_QUANT_MAX_PX_PER_DEVICE = 80_000_000


def _device_quant_fits(h, w, n_devices=None):
    if n_devices is None:
        # the cap only scales with devices when mesh-sharded labeling will
        # actually engage for THIS canvas (it is size-gated and can be
        # disabled with DEEPLIIF_QUANT_MESH=0) — otherwise a single device
        # must hold the whole labeling program and the per-device cap binds
        from ..ops.labeling import _auto_quant_mesh
        mesh = _auto_quant_mesh((h, w))
        n_devices = mesh.devices.size if mesh is not None else 1
    return h * w <= _DEVICE_QUANT_MAX_PX_PER_DEVICE * n_devices


def _resolve_device_quant(device_quant, seg_device):
    """The 'auto' crossover rule (round-3 VERDICT item 3, constants
    re-measured at WSI scale round 4): use the device quantifier only when
    (a) the seg canvas is already device-resident (fused stitch path — no
    upload), (b) the canvas is large enough that the jitted labeling beats
    the host quantifier (>=1.5 MPx; measured 10x faster at 2.0 MPx),
    (c) device->host bandwidth is PCIe-class so fetching the two result
    canvases is not the new bottleneck, and (d) the canvas fits the
    per-device HBM labeling budget (80 MPx/device — beyond it the worker
    crashes, not just slows). Explicit True/False always wins — 'auto'
    never walks into the crash regime, but a user who knows their rig can
    still force the device path."""
    if device_quant == 'auto':
        if seg_device is None:
            return False
        h, w = int(seg_device.shape[0]), int(seg_device.shape[1])
        return (h * w >= 1_500_000 and _d2h_bandwidth_mbps() >= 200.0
                and _device_quant_fits(h, w))
    return bool(device_quant)


def postprocess(orig, images, tile_size, model, seg_thresh=120,
                size_thresh='default', marker_thresh=None,
                size_thresh_upper=None, device_quant=False,
                seg_device=None):
    """Quantification: overlay/refined masks + IHC scoring dict.

    Resolution from tile size (reference models/__init__.py:582-610):
    >384 -> 40x, >192 -> 20x, else 10x (thresholds x2 for Ext/SDG).

    device_quant=True runs the whole quantification (flood, CC labeling,
    KDE thresholds, classification, overlays) as one jitted XLA program
    (ops.labeling.compute_final_results_device) instead of the host path;
    'auto' applies the measured crossover rule (_resolve_device_quant).
    """
    from PIL import Image
    from .. import postprocessing as pp

    device_quant = _resolve_device_quant(device_quant, seg_device)

    if model in ('DeepLIIF', 'DeepLIIFKD'):
        resolution = '40x' if tile_size > 384 else ('20x' if tile_size > 192 else '10x')
        marker = images.get(find_marker_key(images))
        args = (
            np.asarray(orig.convert('RGB') if hasattr(orig, 'convert') else orig),
            np.asarray(images['Seg']),
            # reference grayscale convention: per-pixel MAX over RGB
            # channels (to_array(marker, True), ref models/__init__.py:874)
            # — PIL luma 'L' underestimates non-gray pixels and shifts the
            # marker threshold/counts
            pp.to_array(marker, True) if marker is not None else None,
            resolution, size_thresh, marker_thresh, size_thresh_upper, seg_thresh)
        if device_quant:
            from ..ops.labeling import compute_final_results_device
            # seg_device: the device-stitched canvas from the fused
            # inference path — the seg never round-tripped to host
            seg_arg = seg_device if seg_device is not None else args[1]
            overlay, refined, scoring = compute_final_results_device(
                args[0], seg_arg, args[2], resolution,
                size_thresh=size_thresh, marker_thresh=marker_thresh,
                size_thresh_upper=size_thresh_upper, seg_thresh=seg_thresh)
        else:
            overlay, refined, scoring = pp.compute_final_results(*args)
        return ({'SegOverlaid': Image.fromarray(overlay),
                 'SegRefined': Image.fromarray(refined)}, scoring)

    if model in ('DeepLIIFExt', 'SDG'):
        resolution = '40x' if tile_size > 768 else ('20x' if tile_size > 384 else '10x')
        processed, scoring = {}, {}
        for name, im in list(images.items()):
            if 'Seg' in name:
                overlay, refined, score = pp.compute_final_results(
                    np.asarray(orig.convert('RGB') if hasattr(orig, 'convert') else orig),
                    np.asarray(im), None, resolution,
                    size_thresh, marker_thresh, size_thresh_upper, seg_thresh)
                processed[name + '_Overlaid'] = Image.fromarray(overlay)
                processed[name + '_Refined'] = Image.fromarray(refined)
                scoring[name] = score
        return processed, scoring

    raise NotImplementedError(f'postprocess() not implemented for {model}')


def infer_modalities(img, tile_size, model_dir, eager_mode=False,
                     color_dapi=False, color_marker=False, opt=None,
                     return_seg_intermediate=False, seg_only=False,
                     mod_only=False, seg_weights=None, max_batch=None,
                     device_quant=False, precision=None):
    """Full tile-to-scoring pipeline (reference models/__init__.py:613-660).

    ``color_dapi`` / ``color_marker`` are accepted-and-inert, matching the
    reference at v1.2.6 exactly: its colorization block is commented out
    (reference models/__init__.py:555-564), so the flags thread through
    the whole stack and change nothing there either."""
    session = init_nets(model_dir,
                        epoch=str(getattr(opt, 'epoch', 'latest') if opt
                                  is not None else 'latest'),
                        max_batch=max_batch, precision=precision)
    opt = session.opt if opt is None else opt

    images = inference(
        img, tile_size=tile_size, overlap_size=tile_size // 16,
        model_path=model_dir, opt=opt,
        return_seg_intermediate=return_seg_intermediate,
        seg_only=seg_only, mod_only=mod_only, seg_weights=seg_weights,
        session=session, _device_seg=device_quant)
    seg_device = None
    if device_quant:
        images, seg_device = images

    if getattr(opt, 'seg_gen', True):
        if not mod_only:
            post_images, scoring = postprocess(img, images, tile_size,
                                               opt.model,
                                               device_quant=device_quant,
                                               seg_device=seg_device)
            images = {**images, **post_images}
            if seg_only:
                for name in [k for k in images if 'Seg' not in k]:
                    del images[name]
            return images, scoring
        return images, None
    return images, None
