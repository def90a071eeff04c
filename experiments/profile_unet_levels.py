"""Where do the 16 ms of a unet_512 forward go? Truncated U-Nets by depth:
cost(depth k) - cost(depth k-1) isolates each level pair (down+up)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepliif_tpu.nets import unet

B = 32
DT = jnp.bfloat16
K = 4
out = {}


def marginal(f, shape, key):
    xs = jax.random.normal(key, (2 * K,) + shape, DT)

    def chain(n):
        @jax.jit
        def g(xs):
            def body(i, acc):
                r = f(jax.lax.dynamic_index_in_dim(xs, i, keepdims=False))
                return acc + r.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        float(g(xs))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(g(xs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (chain(2 * K) - chain(K)) / K


os.environ['DEEPLIIF_S2D'] = 'auto'
prev = None
for nd in (5, 7, 9):
    size = 2 ** nd
    p = jax.tree_util.tree_map(lambda a: a.astype(DT),
                               unet.init(jax.random.PRNGKey(0), 3, 3, nd))
    t = marginal(lambda x, p=p, nd=nd: unet.apply(p, x, num_downs=nd,
                                                  train=False),
                 (B, 512, 512, 3), jax.random.PRNGKey(nd))
    out[f'unet_{size}_on_512input'] = round(t * 1000, 1)
    print(f'unet num_downs={nd} (input 512^2): {t*1000:.1f} ms', flush=True)

print(json.dumps(out))
