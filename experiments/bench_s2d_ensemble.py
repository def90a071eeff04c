"""Full-ensemble effect of the s2d tail conv (DEEPLIIF_S2D) at batch 32/48."""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DTYPE = jnp.bfloat16


def timed(fn, *args, iters=6):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    from deepliif_tpu.models import deepliif as dl

    results = {}
    d = dl.DeepLIIFDef(dtype=DTYPE)
    params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    params = jax.tree_util.tree_map(lambda a: a.astype(DTYPE), params)

    x2 = jax.random.uniform(jax.random.PRNGKey(1), (2, 512, 512, 3),
                            jnp.float32, -1, 1).astype(DTYPE)
    # numerics: s2d on vs off (small batch)
    outs = {}
    for tag in ('0', '1'):
        os.environ['DEEPLIIF_S2D'] = tag

        @jax.jit
        def fwd(params, x):
            return dl.generator_forward(params, x, d)

        mods, seg = fwd(params, x2)
        outs[tag] = np.asarray(mods.astype(jnp.float32))
    results['numerics_maxdiff'] = float(np.abs(outs['0'] - outs['1']).max())
    print('maxdiff', results['numerics_maxdiff'], flush=True)

    for batch in (32, 48):
        x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 512, 512, 3),
                               jnp.float32, -1, 1).astype(DTYPE)
        for tag in ('0', '1'):
            os.environ['DEEPLIIF_S2D'] = tag

            @jax.jit
            def full(params, x):
                mods, seg = dl.generator_forward(params, x, d)
                return mods.sum() + seg.sum()

            t = timed(full, params, x)
            results[f'b{batch}_s2d{tag}_s'] = round(t, 4)
            results[f'b{batch}_s2d{tag}_tiles_per_s'] = round(batch / t, 1)
            print(f'batch {batch} s2d={tag}: {t:.4f}s ({batch/t:.1f} tiles/s)',
                  flush=True)

    with open('/root/repo/experiments/bench_s2d_ensemble.json', 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
