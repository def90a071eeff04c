"""Isolate conv vs norm cost inside the slow 512^2 translator stages."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepliif_tpu.nets import layers as L
from deepliif_tpu.nets import resnet

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
                return acc + f(jax.lax.dynamic_index_in_dim(xs, i, keepdims=False)).astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        float(g(xs))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(g(xs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (chain(2 * K) - chain(K)) / K


kp = jax.random.PRNGKey(1)
p = jax.tree_util.tree_map(lambda a: a.astype(DT), resnet.init(kp, 3, 3))

cases = {
    # head: conv alone, then conv+norm, then pad+conv+norm+relu
    'head_conv': ((512, 512, 3), lambda x: L.conv2d(L.pad2d(x, 3, 'reflect'), p['head_conv'], 1, 0)),
    'head_norm_only': ((512, 512, 64), lambda x: L.apply_norm(x, p['head_norm'], 'batch', False)),
    'down0_conv': ((512, 512, 64), lambda x: L.conv2d(x, p['down0_conv'], 2, 1)),
    'down0_norm_only': ((256, 256, 128), lambda x: L.apply_norm(x, p['down0_norm'], 'batch', False)),
    'up1_conv': ((256, 256, 128), lambda x: L.conv_transpose2d(x, p['up1_conv'], 2, 1, 1)),
    'up1_norm_only': ((512, 512, 64), lambda x: L.apply_norm(x, p['up1_norm'], 'batch', False)),
    'relu_512_64': ((512, 512, 64), lambda x: L.relu(x)),
}

for name, (shape, f) in cases.items():
    t = marginal(f, (B,) + shape, jax.random.PRNGKey(abs(hash(name)) % 2**31))
    out[name] = round(t, 4)
    print(name, round(t * 1000, 1), 'ms', flush=True)

print(json.dumps(out))
with open(os.path.join(os.path.dirname(__file__), 'profile_stage_parts.json'), 'w') as fh:
    json.dump(out, fh, indent=1)
