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


def bench(quant, batch, min_ch=16):
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import layers as L

    d = dl.DeepLIIFDef(dtype=jnp.bfloat16, quant_int8=quant)
    params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    if quant:
        params = L.quantize_conv_tree_int8(params, min_ch=min_ch)

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

    def run(key, quant, batch, min_ch=16):
        try:
            out[key] = round(bench(quant, batch, min_ch), 2)
            print(key, out[key], 'tiles/s', flush=True)
        except Exception as e:  # noqa: BLE001
            out[key] = f'FAILED: {type(e).__name__}: {str(e)[:300]}'
            print(out[key][:160], flush=True)

    # every row of the docs/Performance.md int8 table, in one runnable place
    if os.environ.get('SKIP_BF16') != '1':
        run('bf16_b128', False, 128)
        run('bf16_b32', False, 32)
    run('int8_b32_minch16', True, 32, min_ch=16)     # interior convs
    run('int8_b32_minch256', True, 32, min_ch=256)   # resblocks only
    # larger int8 batches fail to compile on this rig — record the mode
    run('int8_b64_minch16', True, 64, min_ch=16)
    path = os.path.join(os.path.dirname(__file__), 'bench_int8.json')
    with open(path, 'w') as f:
        json.dump({'tiles_per_sec': out}, f, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
