"""Profiling / hardware observability.

Replaces the reference's nvidia-smi poller and NVTX ranges
(reference util/util.py:13-22, 174-206; NVTX in tests/test_cli_inference.py):
  * timeit decorator (same usage),
  * device_memory_stats / DeviceStatus: 1 Hz sampler of TPU HBM usage via
    jax Device.memory_stats(),
  * trace(): context manager around jax.profiler for capturing device
    traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import functools
import threading
import time


def timeit(f):
    @functools.wraps(f)
    def wrap(*args, **kw):
        ts = time.time()
        result = f(*args, **kw)
        te = time.time()
        print(f'func:{f.__name__} took: {te - ts:2.4f} sec')
        return result
    return wrap


def device_memory_stats(device=None):
    """Bytes in use / limit for a device (None = first)."""
    import jax
    dev = device or jax.local_devices()[0]
    stats = dev.memory_stats() or {}
    return {
        'bytes_in_use': stats.get('bytes_in_use'),
        'peak_bytes_in_use': stats.get('peak_bytes_in_use'),
        'bytes_limit': stats.get('bytes_limit'),
        'device': str(dev),
    }


class DeviceStatus:
    """Background 1 Hz sampler of device memory (HardwareStatus analog)."""

    def __init__(self, interval=1.0, device=None):
        self.interval = interval
        self.device = device
        self.samples = []
        self._stop = threading.Event()
        self._thread = None

    def start(self):
        def run():
            while not self._stop.is_set():
                try:
                    s = device_memory_stats(self.device)
                    s['t'] = time.time()
                    self.samples.append(s)
                except Exception:
                    pass
                self._stop.wait(self.interval)
        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        return self.samples

    def peak_bytes(self):
        vals = [s['peak_bytes_in_use'] for s in self.samples
                if s.get('peak_bytes_in_use')]
        return max(vals) if vals else None


@contextlib.contextmanager
def trace(log_dir='/tmp/jax-trace'):
    """Capture a device trace (XProf/TensorBoard viewable)."""
    import jax
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
