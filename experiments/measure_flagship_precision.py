"""Round-4 measurement: flagship-shape (ngf=64, 9-block, 512^2) reduced-
precision drift vs f32, to calibrate the in-suite gates (VERDICT r3 item 3).
Uses the SAME fixture as tests/test_flagship_import_parity.py (torch-layout
random weights, seed 0, imported through InferenceSession) so the measured
values are the ones the gates see.

  python experiments/measure_flagship_precision.py
"""
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=1')

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

from tests.test_flagship_import_parity import build_flagship_dir, REAL_TILE  # noqa: E402
from deepliif_tpu.models import InferenceSession  # noqa: E402
from deepliif_tpu import stats  # noqa: E402
from deepliif_tpu import postprocessing as pp  # noqa: E402


def scoring_of(tile_u8, out):
    seg = Image.fromarray(np.asarray(out['GS'][0]))
    marker = pp.to_array(Image.fromarray(np.asarray(out['G4'][0])), True)
    _, _, sc = pp.compute_final_results(
        Image.fromarray(tile_u8), seg, marker, '40x',
        'default', None, None, 120)
    return sc


def drift(out, f32):
    rows = {}
    for k in sorted(f32):
        s = stats.ssim(np.asarray(out[k][0]), np.asarray(f32[k][0]),
                       data_range=255)
        d = np.abs(out[k].astype(np.int16) - f32[k].astype(np.int16))
        rows[k] = {'ssim': round(float(s), 5), 'max': int(d.max()),
                   'mean': round(float(d.mean()), 4)}
        print(f'  {k}: ssim={s:.5f} max={d.max()} mean={d.mean():.4f}')
    return rows


def main():
    md = tempfile.mkdtemp(prefix='flagship_prec_')
    t0 = time.time()
    build_flagship_dir(md)
    print(f'fixture build {time.time()-t0:.1f}s')

    tile = np.asarray(Image.open(REAL_TILE).convert('RGB'))
    results = {}

    t0 = time.time()
    f32 = InferenceSession(md, n_devices=1).run_tiles(tile[None])
    print(f'f32 run {time.time()-t0:.1f}s')
    sc32 = scoring_of(tile, f32)
    results['f32_scoring'] = sc32
    print('f32 scoring', sc32)

    t0 = time.time()
    b16 = InferenceSession(md, n_devices=1,
                           precision='bfloat16').run_tiles(tile[None])
    print(f'bf16 run {time.time()-t0:.1f}s')
    results['bf16'] = drift(b16, f32)
    results['bf16_scoring'] = scoring_of(tile, b16)
    results['bf16_scoring_equal'] = results['bf16_scoring'] == sc32
    print('bf16 scoring', results['bf16_scoring'])

    # int8, scope resblocks, fused kernels (interpret on CPU): measure the
    # round-5 calibration variants against f32 (VERDICT r4 next #1)
    os.environ['DEEPLIIF_INT8_SCOPE'] = 'resblocks'
    os.environ['DEEPLIIF_FUSED'] = '1'

    # (name, dyn, calib kwargs or None for dynamic/no calibration)
    variants = [
        ('int8', '1', None),                                  # per-chunk dynamic (default)
        ('int8_static_pc', '0', dict(per_channel=True)),      # per-channel max
        ('int8_static_pc_p999', '0', dict(per_channel=True, pct=99.9)),
        ('int8_static_pt', '0', dict(per_channel=False)),     # r4 per-tensor max
    ]
    for name, dyn, calib in variants:
        os.environ['DEEPLIIF_INT8_DYN'] = dyn
        os.environ['DEEPLIIF_INT8_CALIBRATE'] = '0'  # explicit calibration only
        md8 = md + '_' + name
        if not os.path.isdir(md8):
            shutil.copytree(md, md8)
        t0 = time.time()
        s8 = InferenceSession(md8, n_devices=1, precision='int8')
        if calib is not None:
            s8.calibrate_int8(tile[None], save=False, **calib)
        out8 = s8.run_tiles(tile[None])
        print(f'{name} run {time.time()-t0:.1f}s (dyn={dyn}, calib={calib})')
        results[name] = drift(out8, f32)
        results[f'{name}_scoring'] = scoring_of(tile, out8)
        results[f'{name}_scoring_equal'] = results[f'{name}_scoring'] == sc32
        print(f'{name} scoring', results[f'{name}_scoring'])
    for v in ('DEEPLIIF_INT8_DYN', 'DEEPLIIF_INT8_CALIBRATE'):
        os.environ.pop(v, None)

    out_path = os.path.join(REPO, 'experiments',
                            'measure_flagship_precision.json')
    with open(out_path, 'w') as f:
        json.dump(results, f, indent=1)
    print('wrote', out_path)


if __name__ == '__main__':
    main()
