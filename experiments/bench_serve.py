"""Round-5 measurement (VERDICT r4 next #5): serving under concurrent
load on TPU hardware.

Starts the REST server (flagship-shaped model dir, bf16) and drives it
with N concurrent HTTP clients posting a mix of 512^2 and 1024^2 IHC
images (the sizes the reference cloud/ImageJ clients send), measuring
requests/s, p50/p90/p99 latency, and the dispatcher's coalescing stats
from /healthz — the numbers that justify the micro-batched dispatch
design vs TorchServe workers (reference model-server/config.properties).

  python experiments/bench_serve.py [--clients 1 2 4 8] [--requests 24]
"""
import argparse
import io
import json
import os
import statistics
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REAL_TILE = ('/root/reference/Datasets/Sample_Dataset/test_DeepLIIF_results/'
             '22_2_real_A.png')
OUT = os.path.join(REPO, 'experiments', 'bench_serve.json')
PORT = 18093


def _png_bytes(size):
    tile = np.asarray(Image.open(REAL_TILE).convert('RGB'))
    reps = (size + 511) // 512
    canvas = np.tile(tile, (reps, reps, 1))[:size, :size]
    buf = io.BytesIO()
    Image.fromarray(canvas).save(buf, format='PNG')
    return buf.getvalue()


def _multipart(field, fname, payload):
    boundary = 'deepliifbench'
    body = (f'--{boundary}\r\nContent-Disposition: form-data; '
            f'name="{field}"; filename="{fname}"\r\n'
            'Content-Type: image/png\r\n\r\n').encode() + payload + \
        f'\r\n--{boundary}--\r\n'.encode()
    return body, f'multipart/form-data; boundary={boundary}'


def _post_infer(png, timeout=300):
    body, ctype = _multipart('img', 'x.png', png)
    req = urllib.request.Request(
        f'http://127.0.0.1:{PORT}/api/infer?resolution=40x&slim=true',
        data=body, headers={'Content-Type': ctype})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        doc = json.loads(r.read())
    dt = time.perf_counter() - t0
    assert 'scoring' in doc, doc.keys()
    return dt


def _healthz():
    with urllib.request.urlopen(f'http://127.0.0.1:{PORT}/healthz',
                                timeout=30) as r:
        return json.loads(r.read())


def bench(n_clients, n_requests, pngs):
    lat, errs = [], []
    lock = threading.Lock()
    idx = {'i': 0}

    def worker():
        while True:
            with lock:
                i = idx['i']
                if i >= n_requests:
                    return
                idx['i'] += 1
            try:
                dt = _post_infer(pngs[i % len(pngs)])
                with lock:
                    lat.append(dt)
            except Exception as e:  # noqa: BLE001
                with lock:
                    errs.append(str(e))

    threads = [threading.Thread(target=worker) for _ in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()

    def pct(p):
        return round(lat[min(len(lat) - 1, int(p / 100 * len(lat)))], 2)

    return {'clients': n_clients, 'requests': len(lat), 'errors': errs,
            'wall_s': round(wall, 1),
            'req_per_s': round(len(lat) / wall, 2),
            'p50_s': pct(50), 'p90_s': pct(90), 'p99_s': pct(99)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--clients', nargs='*', type=int, default=[1, 2, 4, 8])
    ap.add_argument('--requests', type=int, default=24)
    args = ap.parse_args()

    md = tempfile.mkdtemp(prefix='serve_model_')
    from tests.test_flagship_import_parity import build_flagship_dir, \
        FLAGSHIP_CFG
    print('building flagship model dir...')
    build_flagship_dir(md)
    cfg = dict(FLAGSHIP_CFG)
    cfg['precision'] = 'bfloat16'
    with open(os.path.join(md, 'config.json'), 'w') as f:
        json.dump(cfg, f)

    from deepliif_tpu.serve import serve
    srv = threading.Thread(target=serve,
                           args=(md, '127.0.0.1', PORT),
                           daemon=True)
    srv.start()
    for _ in range(120):
        try:
            _healthz()
            break
        except Exception:  # noqa: BLE001
            time.sleep(1)

    pngs = [_png_bytes(512), _png_bytes(512), _png_bytes(1024)]
    print('warmup (compiles)...')
    t0 = time.time()
    _post_infer(pngs[0], timeout=3600)
    _post_infer(pngs[2], timeout=3600)
    print(f'warmup done in {time.time()-t0:.0f}s')

    results = {'mix': '2x 512^2 + 1x 1024^2 round-robin',
               'requests_per_point': args.requests, 'runs': []}
    h0 = _healthz().get('dispatch', {})
    for n in args.clients:
        r = bench(n, args.requests, pngs)
        h1 = _healthz().get('dispatch', {})
        r['dispatch_delta'] = {k: h1.get(k, 0) - h0.get(k, 0)
                               for k in ('device_calls', 'coalesced_calls')}
        h0 = h1
        results['runs'].append(r)
        print(json.dumps(r))
    results['healthz'] = _healthz()
    with open(OUT, 'w') as f:
        json.dump(results, f, indent=1)
    print('wrote', OUT)


if __name__ == '__main__':
    main()
