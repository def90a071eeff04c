"""Static int8 sweep 2: find the largest compilable batch per quant scope.

Sweep 1 (bench_int8_static.py): static b32 = 59.07 > bf16 b32 = 57.37
(dynamic was 47.83) — static scales fix the quantization overhead — but
every b>=64 config failed to compile: the int8 convs' int32 outputs add
~1 GB-scale HBM temps and b128 bf16 was already within ~1.5 GB of the
ceiling. This sweep narrows the quantized set (resblocks only, 128^2
spatial => small int32 temps) and the batch to find a net win.
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


def bench(batch, min_ch=16, static_spatial=None):
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import layers as L

    if static_spatial is not None:
        L._INT8_STATIC_MAX_SPATIAL = static_spatial

    d = dl.DeepLIIFDef(dtype=jnp.bfloat16, quant_int8=True)
    params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    params = L.quantize_conv_tree_int8(params, min_ch=min_ch, act_scales=4.0)

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
            out[key] = f'FAILED: {type(e).__name__}: {str(e)[:160]}'
            print(key, out[key][:120], flush=True)
        with open(os.path.join(os.path.dirname(__file__),
                               'bench_int8_static2.json'), 'w') as f:
            json.dump({'tiles_per_sec': out}, f, indent=2)

    run('resblock_static_b128', batch=128, min_ch=256)
    run('resblock_static_b96', batch=96, min_ch=256)
    run('interior_static_b64', batch=64, min_ch=16,
        static_spatial=256 * 256)
    run('interior_static_b48', batch=48, min_ch=16,
        static_spatial=256 * 256)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
