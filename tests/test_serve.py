"""REST API tests: the reference cloud contract (README.md:308-463) against
a live server with a tiny model."""

import base64
import io
import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

import jax

from deepliif_tpu.models import deepliif as dl
from deepliif_tpu.serve import make_handler, parse_multipart
from deepliif_tpu.utils import checkpoints

TINY_CFG = {
    'model': 'DeepLIIF', 'modalities_no': 2, 'seg_gen': True, 'seg_no': 1,
    'input_no': 1, 'netG': 'resnet_6blocks', 'net_gs': 'unet_32', 'ngf': 8,
    'ndf': 8, 'norm': 'batch', 'no_dropout': False, 'padding': 'zero',
    'upsample': 'convtranspose', 'scale_size': 64,
    'seg_weights': [0.4, 0.3, 0.3],
    'modalities_names': ['IHC', 'ModA', 'Marker'],
    'background_colors': [(201, 211, 208), (10, 10, 10)],
}


@pytest.fixture(scope='module')
def model_dir(tmp_path_factory):
    md = tmp_path_factory.mktemp('serve_model')
    d = dl.DeepLIIFDef(modalities_no=2, net_g=('resnet_6blocks',) * 2,
                       net_gs=('unet_32',) * 3, ngf=8, ndf=8,
                       seg_weights=(0.4, 0.3, 0.3))
    params = dl.init_params(jax.random.PRNGKey(7), d, with_discriminators=False)
    checkpoints.save_networks(str(md), params)
    with open(md / 'config.json', 'w') as f:
        json.dump(TINY_CFG, f)
    return str(md)


@pytest.fixture(scope='module')
def server(model_dir):
    srv = ThreadingHTTPServer(('127.0.0.1', 0), make_handler(model_dir))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{srv.server_address[1]}'
    srv.shutdown()


def _multipart(files):
    boundary = 'testboundary123'
    body = b''
    for name, data in files.items():
        body += (f'--{boundary}\r\nContent-Disposition: form-data; '
                 f'name="{name}"; filename="{name}.png"\r\n'
                 f'Content-Type: image/png\r\n\r\n').encode() + data + b'\r\n'
    body += f'--{boundary}--\r\n'.encode()
    return body, f'multipart/form-data; boundary={boundary}'


def _png_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='PNG')
    return buf.getvalue()


def _post(url, files, timeout=600):
    body, ctype = _multipart(files)
    req = urllib.request.Request(url, data=body, method='POST',
                                 headers={'Content-Type': ctype})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + '/healthz') as r:
        assert json.loads(r.read())['status'] == 'ok'


def test_infer_endpoint(server):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    # tile size forced small via resolution=10x -> 128 still > img; use 40x
    status, data = _post(server + '/api/infer?resolution=40x&prob_thresh=150',
                         {'img': _png_bytes(img)})
    assert status == 200, data
    assert 'images' in data and 'scoring' in data
    assert 'SegRefined' in data['images']
    decoded = Image.open(io.BytesIO(
        base64.b64decode(data['images']['SegRefined'])))
    assert decoded.size == (64, 64)
    assert {'num_total', 'num_pos', 'num_neg'} <= set(data['scoring'])


def test_infer_slim_returns_only_refined(server):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    status, data = _post(server + '/api/infer?slim', {'img': _png_bytes(img)})
    assert status == 200
    assert set(data['images']) == {'SegRefined'}


def test_infer_missing_img_is_400(server):
    status, data = _post(server + '/api/infer', {'other': b'abc'})
    assert status == 400
    assert 'img' in data['error']


def test_postprocess_endpoint(server):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    seg = np.zeros((64, 64, 3), np.uint8)
    seg[10:20, 10:20] = (200, 0, 0)   # positive blob
    seg[40:50, 40:50] = (0, 0, 200)   # negative blob
    status, data = _post(
        server + '/api/postprocess?prob_thresh=150&size_thresh=0',
        {'img': _png_bytes(img), 'seg_img': _png_bytes(seg)})
    assert status == 200, data
    assert data['scoring']['num_pos'] == 1
    assert data['scoring']['num_neg'] == 1


def test_unknown_endpoint_404(server):
    status, data = _post(server + '/api/bogus', {'img': b'x'})
    assert status == 404


def test_multipart_parser_roundtrip():
    body, ctype = _multipart({'a': b'hello', 'b': b'\x00\x01binary\xff'})
    fields = parse_multipart(body, ctype)
    assert fields['a'] == b'hello'
    assert fields['b'] == b'\x00\x01binary\xff'


def test_batch_infer_poll_contract(server):
    """The ImageJ plugin flow: POST /api/batch/infer -> task_id; GET
    /api/batch/infer/<id> until state SUCCESS with the result payload."""
    import time
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    status, data = _post(server + '/api/batch/infer?resolution=40x&pil=true',
                         {'img': _png_bytes(img)})
    assert status == 200 and 'task_id' in data
    tid = data['task_id']
    for _ in range(120):
        with urllib.request.urlopen(f'{server}/api/batch/infer/{tid}') as r:
            st = json.loads(r.read())
        if st['state'] == 'SUCCESS':
            break
        assert st['state'] == 'PENDING', st
        time.sleep(1)
    assert st['state'] == 'SUCCESS'
    assert 'SegRefined' in st['result']['images']


def test_batch_infer_unknown_task_404(server):
    try:
        urllib.request.urlopen(server + '/api/batch/infer/deadbeef')
        raise AssertionError('expected 404')
    except urllib.error.HTTPError as e:
        assert e.code == 404


# ---------------------------------------------------------------------------
# concurrency (round-3: replaces the round-2 global session_lock; reference
# gets this from TorchServe parallel workers, model-server/config.properties)
# ---------------------------------------------------------------------------

class _FakeSession:
    """Deterministic stand-in for InferenceSession: output == input tiles,
    with a sleep long enough that concurrent callers pile up in the queue."""

    def __init__(self, max_batch=64, delay=0.15):
        self.opt = None
        self.d = None
        self.family = 'deepliif'
        self.model_dir = 'fake'
        self.max_batch = max_batch
        self.delay = delay
        self.batch_sizes = []

    def run_tiles(self, tiles, seg_weights=None, seg_only=False,
                  mod_only=False, return_intermediate=False, device_keys=()):
        import time
        self.batch_sizes.append(len(tiles))
        time.sleep(self.delay)
        return {'G1': tiles.copy()}


def test_dispatch_session_coalesces_concurrent_requests():
    """While one device call runs, queued requests must be coalesced into
    ONE shared call, and every caller must get exactly its own tiles back."""
    from deepliif_tpu.serve.dispatch import DispatchSession
    fake = _FakeSession()
    ds = DispatchSession(fake)
    n_clients, tiles_each = 6, 3
    rng = np.random.default_rng(0)
    inputs = [rng.integers(0, 255, (tiles_each, 8, 8, 3), np.uint8)
              for _ in range(n_clients)]
    results = [None] * n_clients

    def client(i):
        results[i] = ds.run_tiles(inputs[i])

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    for i in range(n_clients):
        np.testing.assert_array_equal(results[i]['G1'], inputs[i])
    # 6 requests in << 6 device calls: at least one call served >1 request
    assert ds.stats['coalesced_calls'] >= 1, (ds.stats, fake.batch_sizes)
    assert ds.stats['max_requests_per_call'] > 1
    assert sum(fake.batch_sizes) == n_clients * tiles_each
    assert len(fake.batch_sizes) < n_clients
    ds.close()


def test_dispatch_session_respects_max_batch():
    """Coalescing must never exceed the session's max_batch."""
    from deepliif_tpu.serve.dispatch import DispatchSession
    fake = _FakeSession(max_batch=4, delay=0.1)
    ds = DispatchSession(fake)
    rng = np.random.default_rng(1)
    inputs = [rng.integers(0, 255, (3, 8, 8, 3), np.uint8) for _ in range(5)]
    threads = [threading.Thread(target=lambda i=i: ds.run_tiles(inputs[i]))
               for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert all(b <= 4 for b in fake.batch_sizes), fake.batch_sizes
    ds.close()


def test_dispatch_session_close_during_traffic_terminates_thread():
    """close() racing live traffic: the dispatcher must serve everything it
    accepted, then EXIT — the sentinel can be consumed inside the drain
    loop, which used to leave the thread blocked on q.get() forever
    (round-4 review finding)."""
    from deepliif_tpu.serve.dispatch import DispatchSession
    fake = _FakeSession(delay=0.05)
    ds = DispatchSession(fake)
    rng = np.random.default_rng(2)
    inputs = [rng.integers(0, 255, (2, 8, 8, 3), np.uint8) for _ in range(4)]
    results = [None] * 4
    errors = [None] * 4

    def client(i):
        try:
            results[i] = ds.run_tiles(inputs[i])
        except Exception as e:  # noqa: BLE001 — close() may reject late ones
            errors[i] = e

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    time.sleep(0.02)          # let work land in the queue mid-device-call
    ds.close()
    for t in threads:
        t.join(timeout=30)
    ds._thread.join(timeout=10)
    assert not ds._thread.is_alive(), \
        'dispatcher thread leaked after close() during traffic'
    for i in range(4):
        assert (results[i] is not None) or (errors[i] is not None), i
        if results[i] is not None:
            np.testing.assert_array_equal(results[i]['G1'], inputs[i])


def test_concurrent_http_infer(server):
    """N concurrent /api/infer clients all succeed with identical-per-input
    results, and the server reports dispatcher activity on /healthz."""
    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(4)]
    out = [None] * 4

    def client(i):
        out[i] = _post(server + '/api/infer?resolution=40x',
                       {'img': _png_bytes(imgs[i])})

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for status, data in out:
        assert status == 200, data
        assert 'SegRefined' in data['images']
    # same image posted twice -> identical payload (batch-composition
    # invariance through the dispatcher)
    s1, d1 = _post(server + '/api/infer?resolution=40x',
                   {'img': _png_bytes(imgs[0])})
    assert s1 == 200
    assert d1['images'] == out[0][1]['images']
    with urllib.request.urlopen(server + '/healthz') as r:
        health = json.loads(r.read())
    assert health['dispatch']['device_calls'] >= 1


def test_batch_task_eviction(model_dir):
    """Completed batch tasks are evicted beyond max_retained_tasks — the
    tasks dict cannot grow without bound under sustained use."""
    import time
    srv = ThreadingHTTPServer(
        ('127.0.0.1', 0), make_handler(model_dir, max_retained_tasks=3))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        rng = np.random.default_rng(3)
        tids = []
        for i in range(6):
            img = rng.integers(0, 255, (64, 64, 3), np.uint8)
            status, data = _post(base + '/api/batch/infer?resolution=40x',
                                 {'img': _png_bytes(img)})
            assert status == 200
            tids.append(data['task_id'])
        # wait for all to complete (poll the most recent)
        deadline = time.time() + 600
        while time.time() < deadline:
            states = []
            for tid in tids:
                try:
                    with urllib.request.urlopen(
                            f'{base}/api/batch/infer/{tid}') as r:
                        states.append(json.loads(r.read())['state'])
                except urllib.error.HTTPError:
                    states.append('EVICTED')
            if 'PENDING' not in states:
                break
            time.sleep(0.5)
        assert 'PENDING' not in states
        # at least 6-3 of the oldest completed tasks are gone
        assert states.count('EVICTED') >= 3, states
    finally:
        srv.shutdown()


def test_oversized_image_is_400(model_dir):
    """The reference cloud's own clients are bounded at 4096x4096
    (DeepliifClient.java:23-24); the server enforces the same cap with a
    clean 400 instead of grinding through a giant tile batch (round-3
    VERDICT item 6). Cap lowered here so the test image stays small."""
    srv = ThreadingHTTPServer(
        ('127.0.0.1', 0), make_handler(model_dir, max_image_dim=128))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        img = np.zeros((256, 256, 3), np.uint8)
        status, data = _post(base + '/api/infer', {'img': _png_bytes(img)})
        assert status == 400
        assert '128x128' in data['error']
        # postprocess enforces the same bound
        status, data = _post(base + '/api/postprocess',
                             {'img': _png_bytes(img),
                              'seg_img': _png_bytes(img)})
        assert status == 400
        # ... on EVERY image in the body: a small 'img' must not smuggle an
        # oversized seg_img/marker_img past the gate (round-4 review)
        small = np.zeros((64, 64, 3), np.uint8)
        status, data = _post(base + '/api/postprocess',
                             {'img': _png_bytes(small),
                              'seg_img': _png_bytes(img)})
        assert status == 400 and 'seg_img' in data['error']
        status, data = _post(base + '/api/postprocess',
                             {'img': _png_bytes(small),
                              'seg_img': _png_bytes(small),
                              'marker_img': _png_bytes(img)})
        assert status == 400 and 'marker_img' in data['error']
    finally:
        srv.shutdown()


def test_oversized_body_is_413(model_dir):
    """Bodies beyond max_body_bytes are refused from the Content-Length
    header, before the server buffers anything."""
    srv = ThreadingHTTPServer(
        ('127.0.0.1', 0), make_handler(model_dir, max_body_bytes=1024))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        img = np.random.default_rng(0).integers(
            0, 255, (64, 64, 3), np.uint8)  # PNG ~ 12 KB > 1 KB cap
        status, data = _post(base + '/api/infer', {'img': _png_bytes(img)})
        assert status == 413
        assert 'limit' in data['error']
    finally:
        srv.shutdown()


def test_request_timeout_is_504(model_dir):
    """Per-request budget -> 504, the reference cloud contract beyond its
    ~60 s budget (reference README.md:406). Budget shrunk to make any real
    inference exceed it."""
    srv = ThreadingHTTPServer(
        ('127.0.0.1', 0), make_handler(model_dir, request_timeout=1e-3))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        img = np.zeros((64, 64, 3), np.uint8)
        status, data = _post(base + '/api/infer', {'img': _png_bytes(img)})
        assert status == 504
        assert 'budget' in data['error']
    finally:
        srv.shutdown()


def test_dispatch_fairness_oldest_first():
    """Group leaders are served strictly oldest-first: a request with an
    unusual config (different tile shape) becomes the NEXT device call as
    soon as it is the oldest waiter — it cannot be leapfrogged by a stream
    of coalescable traffic (round-3 VERDICT weak 6: the old dispatcher
    re-queued non-coalescable requests at the BACK of the shared queue,
    behind later arrivals)."""
    import time
    from deepliif_tpu.serve.dispatch import DispatchSession
    fake = _FakeSession(max_batch=8, delay=0.25)
    ds = DispatchSession(fake)
    done = []

    def client(tag, shape, delay):
        time.sleep(delay)
        ds.run_tiles(np.zeros((2,) + shape + (3,), np.uint8))
        done.append(tag)

    threads = [
        # A0 occupies the device; B arrives before A1/A2 but cannot share
        # their calls (different tile shape)
        threading.Thread(target=client, args=('A0', (8, 8), 0.0)),
        threading.Thread(target=client, args=('B', (4, 4), 0.08)),
        threading.Thread(target=client, args=('A1', (8, 8), 0.14)),
        threading.Thread(target=client, args=('A2', (8, 8), 0.17)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    ds.close()
    # B was the oldest waiter when A0's call finished, so it led call 2;
    # A1+A2 coalesced into call 3 behind it
    assert done[0] == 'A0'
    assert done[1] == 'B', (done, fake.batch_sizes)
    assert len(fake.batch_sizes) == 3, fake.batch_sizes


def test_dispatch_fairness_under_sustained_load():
    """Under a sustained stream of coalescable requests, one odd-config
    request completes within a bounded number of device calls (no
    starvation/aging hazard)."""
    import time
    from deepliif_tpu.serve.dispatch import DispatchSession
    fake = _FakeSession(max_batch=16, delay=0.04)
    ds = DispatchSession(fake)
    stop = threading.Event()

    def hog():
        while not stop.is_set():
            ds.run_tiles(np.zeros((2, 8, 8, 3), np.uint8))

    hogs = [threading.Thread(target=hog, daemon=True) for _ in range(4)]
    for t in hogs:
        t.start()
    time.sleep(0.2)                       # stream established
    t0 = time.time()
    out = ds.run_tiles(np.zeros((1, 4, 4, 3), np.uint8))
    b_latency = time.time() - t0
    stop.set()
    for t in hogs:
        t.join(timeout=10)
    ds.close()
    assert out['G1'].shape == (1, 4, 4, 3)
    # oldest-first: served within ~2 device calls (80 ms) + scheduling slack
    assert b_latency < 1.0, b_latency


def test_batch_pending_cap_rejects(model_dir):
    """PENDING tasks are bounded independently of the completed-task LRU:
    beyond max_pending_tasks, submits get 503 instead of queueing the
    request bodies without bound."""
    srv = ThreadingHTTPServer(
        ('127.0.0.1', 0), make_handler(model_dir, max_pending_tasks=0))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f'http://127.0.0.1:{srv.server_address[1]}'
    try:
        img = np.zeros((64, 64, 3), np.uint8)
        status, data = _post(base + '/api/batch/infer?resolution=40x',
                             {'img': _png_bytes(img)})
        assert status == 503
        assert 'retry' in data['error']
    finally:
        srv.shutdown()
