"""TPU benchmark: fused Pallas resblock path vs unfused XLA path.

1. one resnet_9blocks translator, bf16 batch 32 @ 512^2
2. numerics check fused vs unfused
3. full ensemble with the fused path
"""

import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 32
DTYPE = jnp.bfloat16
WARMUP = 2
ITERS = 6


def timed(fn, *args):
    for _ in range(WARMUP):
        float(fn(*args))
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import resnet

    results = {}
    d = dl.DeepLIIFDef(dtype=DTYPE)
    params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    params = jax.tree_util.tree_map(lambda a: a.astype(DTYPE), params)
    p1 = jax.tree_util.tree_map(lambda a: a[0], params['G'])
    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 512, 512, 3),
                           jnp.float32, -1, 1).astype(DTYPE)

    def run_translator(p, x):
        return resnet.apply(p, x, n_blocks=9, norm='batch',
                            padding_type='reflect')

    # numerics check first at batch 2 (small compile)
    os.environ['DEEPLIIF_FUSED'] = '1'
    yf = np.asarray(jax.jit(run_translator)(p1, x[:2]).astype(jnp.float32))
    os.environ['DEEPLIIF_FUSED'] = '0'
    yu = np.asarray(jax.jit(run_translator)(p1, x[:2]).astype(jnp.float32))
    results['numerics_maxdiff_tanh'] = float(np.abs(yf - yu).max())
    print('numerics max|diff|', results['numerics_maxdiff_tanh'], flush=True)

    for tag in ('0', '1'):
        os.environ['DEEPLIIF_FUSED'] = tag

        @jax.jit
        def one(p, x):
            return run_translator(p, x).sum()

        t = timed(one, p1, x)
        results[f'one_translator_fused{tag}'] = round(t, 4)
        print(f'one_translator fused={tag}: {t:.4f}s '
              f'({BATCH/t:.1f} tiles/s)', flush=True)

    for tag in ('0', '1'):
        os.environ['DEEPLIIF_FUSED'] = tag

        @jax.jit
        def full(params, x):
            mods, seg = dl.generator_forward(params, x, d)
            return mods.sum() + seg.sum()

        t = timed(full, params, x)
        results[f'full_ensemble_fused{tag}'] = round(t, 4)
        results[f'tiles_per_sec_fused{tag}'] = round(BATCH / t, 1)
        print(f'full_ensemble fused={tag}: {t:.4f}s '
              f'({BATCH/t:.1f} tiles/s)', flush=True)

    with open('/root/repo/experiments/bench_fused.json', 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
