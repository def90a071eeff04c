"""Round-5 measurement (VERDICT r4 next #4): ONE real multi-region
`test-wsi` invocation on TPU hardware.

Builds a synthetic 24000x24000 slide (2x2 regions at the reference's
20000 px default region size, models/__init__.py:663-727) by tiling a
REAL Sample_Dataset IHC tile, a flagship-shaped model dir (4x
resnet_9blocks + 5x unet_512, ngf 64, bf16), then runs the actual CLI
under /usr/bin/time -v and records wall-clock, peak RSS, per-region
timings and the scoring json.

  python experiments/bench_wsi_e2e.py           # on the TPU rig
"""
import json
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REAL_TILE = ('/root/reference/Datasets/Sample_Dataset/test_DeepLIIF_results/'
             '22_2_real_A.png')
SLIDE = 24000          # 2x2 regions at region_size 20000
OUT = os.path.join(REPO, 'experiments', 'bench_wsi_e2e.json')


def build_slide(slide_dir):
    """Tile the real IHC tile across a 24000^2 canvas (memmap) and write
    a deflate BigTIFF pyramid; a band of blank (white) tiles exercises
    the empty-tile short-circuit like real tissue borders do."""
    from deepliif_tpu.utils.tiff import write_pyramid_tiff
    tile = np.asarray(Image.open(REAL_TILE).convert('RGB'))  # 512^2
    path = os.path.join(slide_dir, 'slide.tif')
    canvas = np.memmap(os.path.join(slide_dir, 'canvas.raw'), np.uint8,
                       'w+', shape=(SLIDE, SLIDE, 3))
    t0 = time.time()
    th, tw = tile.shape[:2]
    for y in range(0, SLIDE, th):
        row = np.tile(tile, (1, (SLIDE + tw - 1) // tw, 1))[:, :SLIDE]
        if (y // th) % 7 == 0:
            row = np.full_like(row, 241)   # blank band (background)
        canvas[y:y + th] = row[:min(th, SLIDE - y)]
    t_fill = time.time() - t0
    t0 = time.time()
    write_pyramid_tiff(path, canvas, levels=(1, 2, 4, 8), tile=256,
                       compression=True,
                       description='Aperio Fake |AppMag = 40')
    t_write = time.time() - t0
    del canvas
    os.unlink(os.path.join(slide_dir, 'canvas.raw'))
    return path, t_fill, t_write


def build_model(md):
    from tests.test_flagship_import_parity import build_flagship_dir, \
        FLAGSHIP_CFG
    build_flagship_dir(md)
    cfg = dict(FLAGSHIP_CFG)
    cfg['precision'] = 'bfloat16'
    with open(os.path.join(md, 'config.json'), 'w') as f:
        json.dump(cfg, f)


def main():
    work = tempfile.mkdtemp(prefix='wsi_e2e_')
    slide_dir = os.path.join(work, 'slides')
    out_dir = os.path.join(work, 'out')
    md = os.path.join(work, 'model')
    os.makedirs(slide_dir)
    os.makedirs(md)

    results = {'slide_px': SLIDE, 'region_size': 20000}
    print('building slide...')
    path, t_fill, t_write = build_slide(slide_dir)
    results['slide_build_fill_s'] = round(t_fill, 1)
    results['slide_build_write_s'] = round(t_write, 1)
    results['slide_bytes'] = os.path.getsize(path)
    print(f'slide ready: {results["slide_bytes"]/1e9:.2f} GB '
          f'(fill {t_fill:.0f}s write {t_write:.0f}s)')

    print('building flagship model dir...')
    t0 = time.time()
    build_model(md)
    results['model_build_s'] = round(time.time() - t0, 1)

    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    cmd = ['/usr/bin/time', '-v', sys.executable, '-m', 'deepliif_tpu.cli',
           'test-wsi', '--input-dir', slide_dir, '--filename', 'slide.tif',
           '--output-dir', out_dir, '--model-dir', md, '--tile-size', '512']
    print('running:', ' '.join(cmd))
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=7200)
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-4000:])
    assert proc.returncode == 0, proc.returncode
    results['wall_s'] = round(wall, 1)
    m = re.search(r'Maximum resident set size \(kbytes\): (\d+)', proc.stderr)
    if m:
        results['peak_rss_gb'] = round(int(m.group(1)) / 1e6, 2)
    m = re.search(r'Elapsed \(wall clock\) time.*: (.*)', proc.stderr)
    if m:
        results['time_v_elapsed'] = m.group(1).strip()
    with open(os.path.join(out_dir, 'slide.json')) as f:
        results['scoring'] = json.load(f)
    results['outputs'] = sorted(os.listdir(out_dir))
    results['output_bytes'] = {f: os.path.getsize(os.path.join(out_dir, f))
                               for f in results['outputs']}
    mp_per_s = SLIDE * SLIDE / 1e6 / wall
    results['megapixels_per_s'] = round(mp_per_s, 1)
    with open(OUT, 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    print('wrote', OUT)


if __name__ == '__main__':
    main()
