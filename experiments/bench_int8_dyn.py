"""Round-5 A/B on hardware: fused int8 resblock chain with per-chunk
DYNAMIC activation scales vs the calibrated STATIC scales, plus the
full-ensemble headline config under both (batch 128, 512^2,
scope=resblocks, everything else bf16).

The dynamic kernel adds a per-chunk VMEM max-reduce + scalar reciprocal
per conv; this measures whether that costs throughput (expected: noise —
the reduce is ~0.05% of the chunk's MXU work).

  python experiments/bench_int8_dyn.py          # on the TPU rig
"""
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ['DEEPLIIF_INT8_SCOPE'] = 'resblocks'

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
import numpy as np              # noqa: E402

from deepliif_tpu.models import deepliif as dl          # noqa: E402
from deepliif_tpu.nets import layers as L               # noqa: E402

WARMUP, ITERS = 2, 6
OUT = os.path.join(REPO, 'experiments', 'bench_int8_dyn.json')


def bench_ensemble(params, d, batch):
    @jax.jit
    def fwd(params, x):
        mods, seg = dl.generator_forward(params, x, d)
        return mods.sum() + seg.sum()

    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 512, 512, 3),
                           jnp.bfloat16, -1, 1)
    for _ in range(WARMUP):
        float(fwd(params, x))
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fwd(params, x))
        times.append(time.perf_counter() - t0)
    return batch / statistics.median(times)


def main():
    assert jax.default_backend() == 'tpu', jax.default_backend()
    d = dl.DeepLIIFDef(dtype=jnp.bfloat16, quant_int8=True)
    raw = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    raw = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), raw)

    results = {}
    batch = 128

    # dynamic: plain quantization, per-chunk scales in-kernel
    os.environ['DEEPLIIF_INT8_DYN'] = '1'
    p_dyn = L.quantize_conv_tree_int8(raw, scope='resblocks')
    t0 = time.time()
    results['int8_dynamic_b128'] = round(bench_ensemble(p_dyn, d, batch), 2)
    print('dynamic', results['int8_dynamic_b128'], 'tiles/s',
          f'({time.time()-t0:.0f}s incl. compile)')

    # static: calibrated-style scales (placeholder value; throughput is
    # scale-independent)
    os.environ['DEEPLIIF_INT8_DYN'] = '0'
    p_st = L.quantize_conv_tree_int8(raw, act_scales=4.0, scope='resblocks')
    t0 = time.time()
    results['int8_static_b128'] = round(bench_ensemble(p_st, d, batch), 2)
    print('static', results['int8_static_b128'], 'tiles/s',
          f'({time.time()-t0:.0f}s incl. compile)')

    with open(OUT, 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    print('wrote', OUT)


if __name__ == '__main__':
    main()
