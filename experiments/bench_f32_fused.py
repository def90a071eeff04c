"""Can the f32 parity mode take the fused resblock kernel at a short row
chunk?

The fused kernel's scoped-VMEM stack is ~14.7 MB at bf16/chunk-16 and
~2x that at f32, which fails Mosaic's 16 MB limit — so f32 inference
(the strict-reference-parity mode, 35.1 tiles/s) runs the XLA resblock
path today (docs/Performance.md). Halving or quartering the row chunk
shrinks the out/scratch share roughly linearly; this probe forces
DEEPLIIF_FUSED=1 with chunk 8 and 4 at f32 batch 16 and reports whether
the compile fits and what it buys. bf16 chunk-16 reference row included.
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


def bench(dtype, batch, chunk=None, fused=None):
    from deepliif_tpu.models import deepliif as dl

    if chunk is not None:
        os.environ['DEEPLIIF_FUSED_CHUNK'] = str(chunk)
    else:
        os.environ.pop('DEEPLIIF_FUSED_CHUNK', None)
    if fused is not None:
        os.environ['DEEPLIIF_FUSED'] = fused
    else:
        os.environ.pop('DEEPLIIF_FUSED', None)
    try:
        d = dl.DeepLIIFDef(dtype=dtype)
        params = dl.init_params(jax.random.PRNGKey(0), d,
                                with_discriminators=False)
        if dtype is not None:
            params = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                            params)

        @jax.jit
        def fwd(params, x):
            mods, seg = dl.generator_forward(params, x, d)
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
    finally:
        os.environ.pop('DEEPLIIF_FUSED_CHUNK', None)
        os.environ.pop('DEEPLIIF_FUSED', None)


def main():
    out = {}
    path = os.path.join(os.path.dirname(__file__), 'bench_f32_fused.json')

    def run(key, **kw):
        try:
            out[key] = round(bench(**kw), 2)
            print(key, out[key], 'tiles/s', flush=True)
        except Exception as e:  # noqa: BLE001
            out[key] = f'FAILED: {type(e).__name__}: {str(e)[:200]}'
            print(key, out[key][:160], flush=True)
        with open(path, 'w') as f:
            json.dump({'tiles_per_sec': out}, f, indent=2)

    run('f32_xla_b16', dtype=None, batch=16)             # today's parity mode
    run('f32_fused_chunk8_b16', dtype=None, batch=16, chunk=8, fused='1')
    run('f32_fused_chunk4_b16', dtype=None, batch=16, chunk=4, fused='1')
    print(json.dumps(out))


if __name__ == '__main__':
    main()
