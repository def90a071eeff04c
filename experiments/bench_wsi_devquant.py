"""Round-4 measurement (VERDICT r3 item 5): WSI-scale quantification on
real TPU hardware. Times compute_final_results_device vs the host
quantifier at canvas sizes from ROI (~2 MPx) up to the largest WSI region
that fits (target 20000px, the reference's region default, cli.py:928),
and records the device-vs-host crossover to calibrate
models._resolve_device_quant (currently a 1.5 MPx guess).

Run on the real chip:  python experiments/bench_wsi_devquant.py

Three timings per size:
  host_s        — postprocessing.compute_final_results, numpy path
  dev_compute_s — jitted program until the scoring scalars are on host
                  (overlay/refined stay device-resident; this is the cost
                  the fused-stitch product path pays before any fetch)
  dev_e2e_s     — full _finish incl. overlay+refined canvas fetch (skipped
                  above a size cap when d2h is tunnel-slow; recorded as the
                  PCIe-projected time = dev_compute_s + bytes/bw otherwise)
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

from deepliif_tpu import postprocessing as pp
from deepliif_tpu.ops import labeling as lb

SEG_DIR = '/root/reference/Datasets/Sample_Dataset/test_DeepLIIF_results'
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'bench_wsi_devquant.json')

print('devices:', jax.devices(), flush=True)

segs = sorted(f for f in os.listdir(SEG_DIR) if f.endswith('_fake_B_5.png'))
seg_tile = np.asarray(Image.open(os.path.join(SEG_DIR, segs[0])).convert('RGB'))
orig_name = segs[0].replace('_fake_B_5', '_real_A')
orig_tile = np.asarray(Image.open(os.path.join(SEG_DIR, orig_name)).convert('RGB'))
mk_name = segs[0].replace('_fake_B_5', '_fake_B_4')
mk_tile = np.asarray(Image.open(os.path.join(SEG_DIR, mk_name)).convert('RGB')).max(axis=2)
th, tw = seg_tile.shape[:2]


def canvases(h, w):
    ry, rx = -(-h // th), -(-w // tw)
    seg = np.tile(seg_tile, (ry, rx, 1))[:h, :w]
    orig = np.tile(orig_tile, (ry, rx, 1))[:h, :w]
    mk = np.tile(mk_tile, (ry, rx))[:h, :w]
    return seg, orig, mk


def d2h_bw():
    x = jnp.zeros((8 * 1024 * 1024,), jnp.uint8) + 1
    np.asarray(x)
    t0 = time.perf_counter()
    np.asarray(x + 1)
    return 8.0 / max(time.perf_counter() - t0, 1e-6)


BW = d2h_bw()
print(f'd2h bandwidth ~{BW:.0f} MB/s', flush=True)

results = {'d2h_mbps': round(BW, 1), 'sizes': []}
# (h, w, fetch_canvases?)
SIZES = [(1280, 1536, True), (2560, 2560, True), (4096, 4096, BW > 200),
         (8192, 8192, BW > 200), (12800, 12800, BW > 200),
         (16384, 16384, BW > 200), (20000, 20000, BW > 200)]

for h, w, fetch in SIZES:
    row = {'h': h, 'w': w, 'mpx': round(h * w / 1e6, 1)}
    print(f'--- {h}x{w} ({row["mpx"]} MPx)', flush=True)
    try:
        seg, orig, mk = canvases(h, w)

        # host path (once is enough at big sizes; it has no warmup)
        t0 = time.perf_counter()
        _, _, sc_h = pp.compute_final_results(
            Image.fromarray(orig), Image.fromarray(seg), mk, '40x',
            'default', None, None, 120)
        row['host_s'] = round(time.perf_counter() - t0, 3)
        row['host_scoring'] = {k: sc_h[k] for k in
                               ('num_total', 'num_pos', 'num_neg')}
        print('  host', row['host_s'], 's', row['host_scoring'], flush=True)

        # device: first call (compile + run), then steady-state
        t0 = time.perf_counter()
        ov, rf, sc_d = lb.compute_final_results_device(
            orig, seg, mk, '40x', size_thresh='default', seg_thresh=120,
            mesh=None)
        first = time.perf_counter() - t0
        row['dev_scoring'] = {k: sc_d[k] for k in
                              ('num_total', 'num_pos', 'num_neg')}
        row['dev_first_s'] = round(first, 3)
        row['counts_match'] = row['dev_scoring'] == row['host_scoring']
        print(f'  dev first {first:.2f}s counts_match={row["counts_match"]}',
              flush=True)

        if fetch:
            t0 = time.perf_counter()
            lb.compute_final_results_device(orig, seg, mk, '40x',
                                            size_thresh='default',
                                            seg_thresh=120, mesh=None)
            row['dev_e2e_s'] = round(time.perf_counter() - t0, 3)

        # compute-only steady state: call the cached jitted program
        # directly, fetch just the scalars (what the product path needs
        # before deciding any canvas fetch)
        key = next(iter(lb._RUN_CACHE))
        for key in lb._RUN_CACHE:
            pass  # keep the most recent key
        run = lb._RUN_CACHE[key]
        ph, pw_ = (-h) % 256, (-w) % 256
        seg_d = jnp.asarray(np.pad(seg, ((0, ph), (0, pw_), (0, 0))))
        orig_d = jnp.asarray(np.pad(orig, ((0, ph), (0, pw_), (0, 0))))
        mk_d = jnp.asarray(np.pad(mk, ((0, ph), (0, pw_))))
        out = run(seg_d, orig_d, mk_d)
        int(out['num_pos'])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(seg_d, orig_d, mk_d)
            int(out['num_pos']); int(out['num_neg'])
            int(out['size_thresh']); int(out['marker_thresh'])
            ts.append(time.perf_counter() - t0)
        row['dev_compute_s'] = round(min(ts), 3)
        canvas_mb = 2 * h * w * 3 / 1e6
        row['dev_pcie_projected_s'] = round(min(ts) + canvas_mb / 800.0, 3)
        print(f'  dev compute {row["dev_compute_s"]}s '
              f'(pcie-projected e2e {row["dev_pcie_projected_s"]}s)',
              flush=True)
        del seg_d, orig_d, mk_d, out
    except Exception as e:  # noqa: BLE001
        row['error'] = f'{type(e).__name__}: {e}'[:300]
        print('  ERROR', row['error'], flush=True)
    results['sizes'].append(row)
    with open(OUT, 'w') as f:
        json.dump(results, f, indent=1)

print(json.dumps(results, indent=1))
