"""Benchmark: 512x512 tiles/sec/chip for the full DeepLIIF ensemble
(4x resnet_9blocks translators + 5x unet_512 seg generators + weighted
aggregation) — the BASELINE.json headline metric.

Runs on whatever jax.devices() provides (the driver runs it on one real TPU
chip). Prints ONE JSON line:
  {"metric": ..., "value": tiles/sec, "unit": ..., "vs_baseline": ...}

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the denominator is an analytic estimate of the PyTorch reference ensemble on
a V100-class GPU: ~1.8 TFLOPs/tile at ~30% f32 utilization ~= 2.5 tiles/sec.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_TORCH_GPU_TPS = 2.5  # estimated reference throughput (see docstring)
BATCH = 16
WARMUP = 2
ITERS = 8


def main():
    from deepliif_tpu.models import deepliif as dl

    dev = jax.devices()[0]
    results = {}
    for precision, dtype in (('bf16', jnp.bfloat16), ('f32', None)):
        d = dl.DeepLIIFDef(dtype=dtype)
        params = dl.init_params(jax.random.PRNGKey(0), d,
                                with_discriminators=False)
        if dtype is not None:
            params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

        @jax.jit
        def fwd(params, x):
            mods, seg = dl.generator_forward(params, x, d)
            return mods, seg

        x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 512, 512, 3),
                               jnp.float32, -1, 1)
        if dtype is not None:
            x = x.astype(dtype)

        for _ in range(WARMUP):
            jax.block_until_ready(fwd(params, x))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fwd(params, x)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        results[precision] = BATCH * ITERS / dt

    tps = results['bf16']
    print(json.dumps({
        'metric': '512x512 tiles/sec/chip (4-modality+seg ensemble, bf16)',
        'value': round(tps, 3),
        'unit': 'tiles/sec/chip',
        'vs_baseline': round(tps / BASELINE_TORCH_GPU_TPS, 2),
        'extra': {
            'f32_tiles_per_sec': round(results['f32'], 3),
            'batch': BATCH,
            'device': str(dev),
            'baseline_note': 'denominator is an analytic V100-class torch '
                             'estimate (2.5 tiles/s); reference repo publishes '
                             'no throughput numbers',
        },
    }))


if __name__ == '__main__':
    main()
