"""Benchmark: 512x512 tiles/sec/chip for the full DeepLIIF ensemble
(4x resnet_9blocks translators + 5x unet_512 seg generators + weighted
aggregation) — the BASELINE.json headline metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Timing note: on the experimental axon TPU platform, block_until_ready is
deferred — execution only happens on host fetch. The benchmarked function
therefore reduces its outputs to a scalar that is fetched (float()) each
iteration, so every timed iteration runs the full ensemble on device.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator is an analytic estimate of the PyTorch reference ensemble on
a V100-class GPU: ~1.8 TFLOPs/tile at ~30% f32 utilization ~= 2.5 tiles/sec.
"""

import json
import statistics
import time

# jax is imported lazily in main(): during a TPU-tunnel outage the axon
# sitecustomize can hang `import jax` ITSELF (not just backend init), so
# the availability probe must run in a watchdogged subprocess before this
# process touches jax at all (verify skill, round-3 outage recipe)
jax = None
jnp = None

BASELINE_TORCH_GPU_TPS = 2.5  # estimated reference throughput (see docstring)
BATCH = 128                   # best measured throughput point on v5e (round 2)
WARMUP = 2
ITERS = 6


def _bench(dtype, batch, int8_resblocks=False):
    from deepliif_tpu.models import deepliif as dl

    d = dl.DeepLIIFDef(dtype=dtype, quant_int8=int8_resblocks)
    params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    if int8_resblocks:
        # production config: --precision int8 + DEEPLIIF_INT8_SCOPE=resblocks
        # (fused Pallas int8 trunk, everything else bf16). Scale value is a
        # placeholder — throughput is scale-independent; fidelity uses
        # calibrated scales (docs/Performance.md, tests/test_precision.py)
        from deepliif_tpu.nets import layers as L
        params = L.quantize_conv_tree_int8(params, act_scales=4.0,
                                           scope='resblocks')

    @jax.jit
    def fwd(params, x):
        mods, seg = dl.generator_forward(params, x, d)
        # scalar checksum: forces full execution on fetch, transfers ~nothing
        return mods.sum() + seg.sum()

    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 512, 512, 3),
                           jnp.float32, -1, 1)
    if dtype is not None:
        x = x.astype(dtype)

    for _ in range(WARMUP):
        float(fwd(params, x))
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fwd(params, x))
        times.append(time.perf_counter() - t0)
    return batch / statistics.median(times)


def _probe_backend(seconds):
    """`import jax; jax.devices()` in a watchdogged SUBPROCESS — both the
    import and backend init can hang indefinitely during a tunnel outage,
    and a structured error line beats a driver-visible stall."""
    import subprocess
    import sys
    try:
        proc = subprocess.run(
            [sys.executable, '-c',
             'import jax; print("BENCH_BACKEND_OK", len(jax.devices()))'],
            capture_output=True, text=True, timeout=seconds)
    except subprocess.TimeoutExpired:
        raise RuntimeError(f'backend init did not complete in {seconds}s '
                           f'(TPU tunnel down?)')
    if 'BENCH_BACKEND_OK' not in proc.stdout:
        raise RuntimeError(proc.stderr.strip().splitlines()[-1]
                           if proc.stderr.strip() else 'backend init failed')


def main():
    import os
    try:
        _probe_backend(
            int(os.environ.get('DEEPLIIF_BENCH_INIT_TIMEOUT', '600')))
    except RuntimeError as e:
        print(json.dumps({
            'metric': '512x512 tiles/sec/chip (4-modality+seg ensemble, bf16)',
            'value': 0.0, 'unit': 'tiles/sec/chip', 'vs_baseline': 0.0,
            'error': f'TPU backend unavailable: {e}; last recorded result '
                     f'in BENCH_r02.json (71.7 tiles/s)'}))
        return
    global jax, jnp
    import jax                      # noqa: F811
    import jax.numpy as jnp         # noqa: F811
    dev = jax.devices()[0]
    batch = BATCH
    try:
        tps_bf16 = _bench(jnp.bfloat16, batch)
    except Exception:
        # HBM headroom at compile varies with libtpu version; the 48-tile
        # bucket is the conservative fallback (docs/Performance.md)
        batch = 48
        tps_bf16 = _bench(jnp.bfloat16, batch)
    extra = {
        'batch': batch,
        'device': str(dev),
        'baseline_note': 'denominator is an analytic V100-class torch '
                         'estimate (2.5 tiles/s); reference repo publishes '
                         'no throughput numbers',
    }
    if os.environ.get('DEEPLIIF_BENCH_F32', '0') == '1':
        extra['f32_tiles_per_sec_b16'] = round(_bench(None, 16), 3)
    # the fastest production config: int8-resblock trunk (fused Pallas
    # kernel, --precision int8 + DEEPLIIF_INT8_SCOPE=resblocks), measured
    # 95.0 vs 72.0 bf16 at batch 128 (experiments/bench_int8_fused.json).
    # Fidelity gates: tests/test_precision.py + tests/test_tpu_hardware.py.
    metric = '512x512 tiles/sec/chip (4-modality+seg ensemble, bf16)'
    tps = tps_bf16
    try:
        tps_int8 = _bench(jnp.bfloat16, batch, int8_resblocks=True)
        if tps_int8 > tps_bf16:
            metric = ('512x512 tiles/sec/chip (4-modality+seg ensemble, '
                      'int8-resblock trunk + bf16)')
            tps = tps_int8
            extra['bf16_tiles_per_sec'] = round(tps_bf16, 3)
    except Exception as e:  # Mosaic/libtpu variance: bf16 number stands
        extra['int8_fused_error'] = f'{type(e).__name__}: {str(e)[:120]}'
    print(json.dumps({
        'metric': metric,
        'value': round(tps, 3),
        'unit': 'tiles/sec/chip',
        'vs_baseline': round(tps / BASELINE_TORCH_GPU_TPS, 2),
        'extra': extra,
    }))


if __name__ == '__main__':
    main()
