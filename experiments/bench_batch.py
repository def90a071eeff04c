"""Ensemble throughput vs batch size (bf16), fused path on."""
import os, statistics, time, json
os.environ.setdefault('DEEPLIIF_FUSED', 'auto')
import jax, jax.numpy as jnp
from deepliif_tpu.models import deepliif as dl

d = dl.DeepLIIFDef(dtype=jnp.bfloat16)
params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

@jax.jit
def fwd(params, x):
    mods, seg = dl.generator_forward(params, x, d)
    return mods.sum() + seg.sum()

out = {}
for b in (32, 48, 64):
    x = jax.random.uniform(jax.random.PRNGKey(1), (b, 512, 512, 3),
                           jnp.float32, -1, 1).astype(jnp.bfloat16)
    try:
        float(fwd(params, x)); float(fwd(params, x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); float(fwd(params, x)); ts.append(time.perf_counter()-t0)
        t = statistics.median(ts)
        out[b] = round(b / t, 1)
        print(f'batch {b}: {t:.3f}s -> {b/t:.1f} tiles/s', flush=True)
    except Exception as e:
        out[b] = f'fail: {type(e).__name__}'
        print(f'batch {b}: FAILED {type(e).__name__} {str(e)[:120]}', flush=True)
print(json.dumps(out))
