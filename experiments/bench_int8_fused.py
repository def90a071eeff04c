"""A/B: flagship ensemble with the FUSED int8 resblock kernel
(ops/fused_resblock.py::resblock_chain_int8) vs the bf16 fused path.

The XLA --precision int8 path loses end-to-end (docs/Performance.md
'int8 quantized inference'): quantize/dequant round-trips HBM and int32
conv outputs materialize, capping the batch at 32. The fused kernel keeps
the quantized contraction in VMEM, so with DEEPLIIF_INT8_SCOPE=resblocks
the program carries no XLA int8 temps at all and should compile at the
bf16 batch ceiling (128) while running the resblock matmuls at the int8
MXU rate. This probe measures that hypothesis. Placeholder activation
scale (numerics indicative only; fidelity is gated separately in
tests/test_precision.py / calibrated scales in production).

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


def build(mode):
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import layers as L

    d = dl.DeepLIIFDef(dtype=jnp.bfloat16, quant_int8=(mode != 'bf16'))
    params = dl.init_params(jax.random.PRNGKey(0), d,
                            with_discriminators=False)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    if mode.startswith('int8'):
        scope = 'resblocks' if 'resblocks' in mode else 'all'
        params = L.quantize_conv_tree_int8(params, act_scales=4.0,
                                           scope=scope)
    return d, params


def bench(batch, mode):
    from deepliif_tpu.models import deepliif as dl
    d, params = build(mode)

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


def drift(mode, batch=2):
    """max|diff| and per-pixel-u8 drift vs the bf16 fused path on the same
    random params/input (indicative; golden fidelity is tested separately)."""
    import numpy as np
    from deepliif_tpu.models import deepliif as dl
    d_q, params_q = build(mode)
    d_f, params_f = build('bf16')
    # the bf16 reference must run the FLOAT param tree: path selection is
    # param-driven ('w_q' in the conv dict), so feeding it the quantized
    # tree would compare the int8 path against itself (always-zero drift)
    x = jax.random.uniform(jax.random.PRNGKey(2), (batch, 512, 512, 3),
                           jnp.float32, -1, 1).astype(jnp.bfloat16)
    mq, sq = jax.jit(lambda p, x: dl.generator_forward(p, x, d_q))(params_q, x)
    mf, sf = jax.jit(lambda p, x: dl.generator_forward(p, x, d_f))(params_f, x)
    to_u8 = lambda t: np.asarray(((jnp.asarray(t, jnp.float32) + 1) * 127.5)
                                 .clip(0, 255).astype(jnp.uint8))
    du8 = max(np.abs(to_u8(mq).astype(int) - to_u8(mf).astype(int)).max(),
              np.abs(to_u8(sq).astype(int) - to_u8(sf).astype(int)).max())
    return {'max_u8_diff': int(du8),
            'max_f_diff': float(jnp.abs(mq - mf).max())}


def main():
    out = {}
    path = os.path.join(os.path.dirname(__file__), 'bench_int8_fused.json')

    def run(key, fn, **kw):
        try:
            out[key] = fn(**kw)
            if isinstance(out[key], float):
                out[key] = round(out[key], 2)
            print(key, out[key], flush=True)
        except Exception as e:  # noqa: BLE001
            out[key] = f'FAILED: {type(e).__name__}: {str(e)[:200]}'
            print(key, out[key][:160], flush=True)
        with open(path, 'w') as f:
            json.dump(out, f, indent=2)

    run('int8_fused_resblocks_b32', bench, batch=32,
        mode='int8_fused_resblocks')
    run('int8_fused_resblocks_b128', bench, batch=128,
        mode='int8_fused_resblocks')
    if os.environ.get('SKIP_BF16') != '1':
        run('bf16_b128', bench, batch=128, mode='bf16')
    # int8 frees ~1.2 MB of resident VMEM (int8 weights + q blocks), so a
    # taller row chunk may fit where bf16's could not — fewer grid steps,
    # less per-step Mosaic overhead
    for chunk in ('8', '32'):
        os.environ['DEEPLIIF_FUSED_CHUNK'] = chunk
        try:
            run(f'int8_fused_resblocks_b128_chunk{chunk}', bench,
                batch=128, mode='int8_fused_resblocks')
        finally:
            os.environ.pop('DEEPLIIF_FUSED_CHUNK', None)
    run('drift_resblocks', drift, mode='int8_fused_resblocks')
    print(json.dumps(out))


if __name__ == '__main__':
    main()
