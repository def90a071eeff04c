"""Tune the device quantifier's labeling loops on real TPU (round 3).

Measures, on a real ROI-scale seg canvas (tiled reference Seg output):
  * XLA label_components at sweeps_per_jump 8/16/32 (8-conn cells and
    4-conn flood masks)
  * Pallas sweep-kernel variant at the same settings
  * posneg+flood and full compute_final_results_device e2e
Writes experiments/tune_devquant.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from deepliif_tpu.ops import labeling as lb

SEG_DIR = '/root/reference/Datasets/Sample_Dataset/test_DeepLIIF_results'
out = {}


def timeit(fn, *args, iters=4):
    r = fn(*args)
    jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].item()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].item()
        ts.append(time.perf_counter() - t0)
    return min(ts)


segs = sorted(f for f in os.listdir(SEG_DIR) if f.endswith('_fake_B_5.png'))
tile = np.asarray(Image.open(os.path.join(SEG_DIR, segs[0])).convert('RGB'))
canvas = np.tile(tile, (3, 3, 1))[:1536, :1280]
seg = jnp.asarray(canvas)
print('canvas', canvas.shape, flush=True)

mask = jax.jit(lambda s: lb.flood_background(lb.posneg_mask(s, 120)))(seg)
fg_cells = jnp.asarray(np.asarray(mask) != lb.LABEL_BACKGROUND)
unk = jnp.asarray(np.asarray(
    jax.jit(lambda s: lb.posneg_mask(s, 120))(seg)) == lb.LABEL_UNKNOWN)

ref_lab = None
for sweeps in (8, 16, 32):
    f = jax.jit(lambda fg, s=sweeps: lb.label_components(
        fg, conn8=True, sweeps_per_jump=s))
    t = timeit(f, fg_cells)
    lab = np.asarray(f(fg_cells))
    if ref_lab is None:
        ref_lab = lab
    assert (lab == ref_lab).all(), f'xla sweeps={sweeps} labels differ'
    out[f'xla_cells_s{sweeps}'] = round(t, 4)
    print(f'xla cells sweeps={sweeps}: {t:.3f}s', flush=True)

for sweeps in (8, 16, 32, 64):
    try:
        f = jax.jit(lambda fg, s=sweeps: lb.label_components_pallas(
            fg, sweeps_per_call=s))
        t = timeit(f, fg_cells)
        lab = np.asarray(f(fg_cells))
        assert (lab == ref_lab).all(), f'pallas sweeps={sweeps} labels differ'
        out[f'pallas_cells_s{sweeps}'] = round(t, 4)
        print(f'pallas cells sweeps={sweeps}: {t:.3f}s', flush=True)
    except Exception as e:  # noqa: BLE001
        out[f'pallas_cells_s{sweeps}'] = f'FAILED: {type(e).__name__}: {e}'
        print(out[f'pallas_cells_s{sweeps}'][:200], flush=True)

# flood mask labeling (4-conn over the unknown mask — the big component)
ref4 = None
for sweeps in (8, 32):
    f = jax.jit(lambda fg, s=sweeps: lb.label_components(
        fg, conn8=False, sweeps_per_jump=s))
    t = timeit(f, unk)
    lab = np.asarray(f(unk))
    if ref4 is None:
        ref4 = lab
    assert (lab == ref4).all()
    out[f'xla_flood_s{sweeps}'] = round(t, 4)
    print(f'xla flood sweeps={sweeps}: {t:.3f}s', flush=True)

for sweeps in (16, 32, 64):
    try:
        f = jax.jit(lambda fg, s=sweeps: lb.label_components_pallas(
            fg, sweeps_per_call=s, conn8=False))
        t = timeit(f, unk)
        lab = np.asarray(f(unk))
        assert (lab == ref4).all(), f'pallas flood sweeps={sweeps} differ'
        out[f'pallas_flood_s{sweeps}'] = round(t, 4)
        print(f'pallas flood sweeps={sweeps}: {t:.3f}s', flush=True)
    except Exception as e:  # noqa: BLE001
        out[f'pallas_flood_s{sweeps}'] = f'FAILED: {type(e).__name__}: {e}'
        print(out[f'pallas_flood_s{sweeps}'][:200], flush=True)

# full orchestrator e2e (current wiring)
marker_name = segs[0].replace('_fake_B_5', '_fake_B_4')
marker = np.asarray(Image.open(os.path.join(SEG_DIR, marker_name)).convert('L'))
marker_canvas = np.tile(marker, (3, 3))[:1536, :1280]
orig = np.zeros_like(canvas)


def e2e():
    return lb.compute_final_results_device(orig, canvas, marker_canvas, '40x')


r = e2e()
t0 = time.perf_counter(); r = e2e(); t = time.perf_counter() - t0
out['orchestrator_e2e_s'] = round(t, 4)
out['counts'] = {'num_pos': r[2]['num_pos'], 'num_neg': r[2]['num_neg']}
print('orchestrator e2e:', t, r[2]['num_pos'], r[2]['num_neg'], flush=True)

with open(os.path.join(os.path.dirname(__file__), 'tune_devquant.json'), 'w') as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
