"""A/B: flagship ensemble throughput, bf16 vs int8 interior convs (v5e).

Round-3 probe measured raw 3x3x256 conv at 543 TF/s int8 vs 156 TF/s bf16
on this chip. This benchmarks the real ensemble (4x resnet_9blocks + 5x
unet_512 + aggregation) with layers.quantize_conv_tree_int8 applied, same
harness as bench.py (scalar-checksum fetch per iteration).
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


def bench(quant, batch):
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import layers as L

    d = dl.DeepLIIFDef(dtype=jnp.bfloat16, quant_int8=quant)
    params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    if quant:
        params = L.quantize_conv_tree_int8(params)

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
    if os.environ.get('SKIP_BF16') != '1':
        try:
            out['bf16_b128'] = round(bench(False, 128), 2)
            print('bf16 b128', out['bf16_b128'], 'tiles/s', flush=True)
        except Exception as e:  # noqa: BLE001
            out['bf16_b128'] = f'FAILED: {type(e).__name__}: {str(e)[:300]}'
    for batch in (128, 64):
        try:
            tps = bench(True, batch)
        except Exception as e:  # noqa: BLE001
            out[f'int8_b{batch}'] = f'FAILED: {type(e).__name__}: {str(e)[:300]}'
            print(out[f'int8_b{batch}'], flush=True)
            continue
        out[f'int8_b{batch}'] = round(tps, 2)
        print(f'int8 b{batch}', round(tps, 2), 'tiles/s', flush=True)
        break
    path = os.path.join(os.path.dirname(__file__), 'bench_int8.json')
    with open(path, 'w') as f:
        json.dump({'tiles_per_sec': out}, f, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
