"""Marginal per-stage cost of the new fused Pallas kernels vs XLA paths."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepliif_tpu.nets import layers as L
from deepliif_tpu.labs import fused_stages as FS

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
                return acc + jax.tree_util.tree_leaves(r)[0].astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        float(g(xs))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(g(xs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (chain(2 * K) - chain(K)) / K


kk = jax.random.PRNGKey
w_d0 = 0.05 * jax.random.normal(kk(1), (3, 3, 64, 128), DT)
w_d1 = 0.05 * jax.random.normal(kk(2), (3, 3, 128, 256), DT)
w_u0 = 0.05 * jax.random.normal(kk(3), (3, 3, 256, 128), DT)
w_u1 = 0.05 * jax.random.normal(kk(4), (3, 3, 128, 64), DT)
w_t = 0.05 * jax.random.normal(kk(5), (7, 7, 64, 3), DT)
sc64 = jnp.ones((B, 64), jnp.float32)
bi64 = jnp.zeros((B, 64), jnp.float32)
sc128 = jnp.ones((B, 128), jnp.float32)
bi128 = jnp.zeros((B, 128), jnp.float32)

cases = {
    'down0_pallas': ((512, 512, 64), lambda x: FS.conv3x3_s2_stats(x, w_d0, in_scale=sc64, in_bias=bi64, in_relu=True)[0]),
    'down1_pallas': ((256, 256, 128), lambda x: FS.conv3x3_s2_stats(x, w_d1, in_scale=sc128, in_bias=bi128, in_relu=True)[0]),
    'up0_pallas': ((128, 128, 256), lambda x: FS.convtranspose3_s2_stats(x, w_u0)[0]),
    'up1_pallas': ((256, 256, 128), lambda x: FS.convtranspose3_s2_stats(x, w_u1, in_scale=sc128, in_bias=bi128, in_relu=True)[0]),
    'tail_pallas': ((512, 512, 64), lambda x: FS.tail_s2d_fused(x, {'w': w_t}, in_scale=sc64, in_bias=bi64, in_relu=True, padding='reflect')),
    'tail_pallas_zero': ((512, 512, 64), lambda x: FS.tail_s2d_fused(x, {'w': w_t}, in_scale=sc64, in_bias=bi64, in_relu=True, padding='zero')),
}

which = sys.argv[1:] or list(cases)
for name in which:
    shape, f = cases[name]
    t = marginal(f, (B,) + shape, kk(abs(hash(name)) % 2**31))
    out[name] = round(t, 4)
    print(name, round(t * 1000, 1), 'ms', flush=True)

print(json.dumps(out))
with open(os.path.join(os.path.dirname(__file__), 'profile_fused_stages.json'), 'w') as fh:
    json.dump(out, fh, indent=1)
