"""Measure the space-to-depth tail conv (layers.conv2d_s2d) vs the direct
7x7 64->3 conv on the real chip, then the effect on one translator and the
full ensemble. Run on TPU: python experiments/bench_s2d.py"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepliif_tpu.nets import layers as L

BATCH = 32
out = {}


def timeit(fn, *args, iters=10):
    r = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
    # block_until_ready is a no-op on axon: fetch a scalar
    jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].item()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].item()
    return (time.perf_counter() - t0) / iters


key = jax.random.PRNGKey(0)
p = {'w': 0.02 * jax.random.normal(key, (7, 7, 64, 3), jnp.float32),
     'b': jnp.zeros((3,), jnp.float32)}
x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 518, 518, 64), jnp.bfloat16)

direct = jax.jit(lambda x: L.conv2d(x, p, 1, 0))
s2d = jax.jit(lambda x: L.conv2d_s2d(x, p))

d = direct(x)
s = s2d(x)
out['maxdiff'] = float(jnp.max(jnp.abs(d.astype(jnp.float32) - s.astype(jnp.float32))))
out['tail_direct_s'] = timeit(direct, x)
out['tail_s2d_s'] = timeit(s2d, x)

# one full translator, fused resblocks on, s2d auto (TPU)
from deepliif_tpu.nets import resnet

tp = resnet.init(jax.random.PRNGKey(2), 3, 3)
xt = jax.random.normal(jax.random.PRNGKey(3), (BATCH, 512, 512, 3), jnp.bfloat16)


def trans(x, allow_fused=True):
    return resnet.apply(tp, x, train=False, dtype=jnp.bfloat16, allow_fused=allow_fused)


os.environ['DEEPLIIF_S2D'] = '0'
t_off = timeit(jax.jit(lambda x: trans(x)), xt)
out['translator_s2d_off_s'] = t_off

os.environ['DEEPLIIF_S2D'] = 'auto'
t_on = timeit(jax.jit(lambda x: resnet.apply(tp, x, train=False, dtype=jnp.bfloat16,
                                             allow_fused=True, n_blocks=9)), xt)
out['translator_s2d_on_s'] = t_on

print(json.dumps(out, indent=1))
with open(os.path.join(os.path.dirname(__file__), 'bench_s2d.json'), 'w') as f:
    json.dump(out, f, indent=1)
