"""Single-tile inference latency (batch 1) for the flagship ensemble.

Complements bench.py (throughput at the best batch): this is the
serving-latency floor a single `/api/infer` request sees on an idle chip —
one 512x512 tile through all 9 nets, including the rig's ~30 ms fixed
dispatch overhead and the scalar fetch. The reference's only comparable
number is the deepliif.org cloud budget of ~60 s/request (BASELINE.md).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

WARMUP = 3
ITERS = 20
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'bench_latency.json')


def bench(dtype):
    from deepliif_tpu.models import deepliif as dl

    d = dl.DeepLIIFDef(dtype=dtype)
    params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    if dtype is not None:
        params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

    @jax.jit
    def fwd(params, x):
        mods, seg = dl.generator_forward(params, x, d)
        return mods.sum() + seg.sum()

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 512, 3),
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
    return {'median_ms': round(statistics.median(times) * 1e3, 1),
            'p90_ms': round(sorted(times)[int(0.9 * ITERS)] * 1e3, 1)}


def main():
    out = {'device': str(jax.devices()[0])}
    out['bf16_b1'] = bench(jnp.bfloat16)
    print('bf16_b1', out['bf16_b1'], flush=True)
    out['f32_b1'] = bench(None)
    print('f32_b1', out['f32_b1'], flush=True)
    with open(OUT, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
