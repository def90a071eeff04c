"""A/B: flagship ensemble, dynamic-quant int8 (round-3 negative result)
vs STATIC-scale int8 (calibrated activation scales, no max-abs reduction).

The round-3 e2e loss for int8 (47-51 vs 71.7 tiles/s bf16) was traced to
dynamic per-sample quantization: the max-abs reduction forces the conv
input to fully materialize (b>=64 OOMs at compile) and triples HBM
round-trips. Static scales turn the quantize into a pure elementwise op
fused into the producer — int8 inputs stream at HALF the bf16 bytes and
run the MXU at 543 TF/s (3.5x bf16). This probe uses a placeholder scale
(numerics not meaningful) purely to measure the throughput envelope.
Same harness as bench.py: scalar-checksum fetch per iteration.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

WARMUP = 2
ITERS = 6


def bench(batch, mode, min_ch=16, static_spatial=None):
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import layers as L

    if static_spatial is not None:
        L._INT8_STATIC_MAX_SPATIAL = static_spatial

    d = dl.DeepLIIFDef(dtype=jnp.bfloat16, quant_int8=(mode != 'bf16'))
    params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    if mode == 'int8_dynamic':
        params = L.quantize_conv_tree_int8(params, min_ch=min_ch)
    elif mode == 'int8_static':
        params = L.quantize_conv_tree_int8(params, min_ch=min_ch,
                                           act_scales=4.0)

    @jax.jit
    def fwd(params, x):
        mods, seg = dl.generator_forward(params, x, d)
        return mods.sum() + seg.sum()

    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 512, 512, 3),
                           jnp.float32, -1, 1).astype(jnp.bfloat16)
    for _ in range(WARMUP):
        float(fwd(params, x))
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fwd(params, x))
        times.append(time.perf_counter() - t0)
    return batch / statistics.median(times)


def main():
    out = {}

    def run(key, **kw):
        try:
            out[key] = round(bench(**kw), 2)
            print(key, out[key], 'tiles/s', flush=True)
        except Exception as e:  # noqa: BLE001
            out[key] = f'FAILED: {type(e).__name__}: {str(e)[:200]}'
            print(key, out[key][:160], flush=True)
        path = os.path.join(os.path.dirname(__file__),
                            'bench_int8_static.json')
        with open(path, 'w') as f:
            json.dump({'tiles_per_sec': out}, f, indent=2)

    run('int8_static_b32', batch=32, mode='int8_static')
    run('int8_static_b64', batch=64, mode='int8_static')
    run('int8_static_b128', batch=128, mode='int8_static')
    # interior-only static (same conv set as the dynamic round-3 probe)
    run('int8_static_interior_b128', batch=128, mode='int8_static',
        static_spatial=256 * 256)
    if os.environ.get('SKIP_BF16') != '1':
        run('bf16_b128', batch=128, mode='bf16')
    print(json.dumps(out))


if __name__ == '__main__':
    main()
