"""Per-stage translator/seg-net cost on the real chip, overhead-free.

Each stage f is applied K and 2K times inside one jit over distinct input
slices (fori_loop, no CSE); marginal cost = t(2K) - t(K). Avoids the ~30 ms
fixed per-call dispatch overhead of this platform.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepliif_tpu.nets import layers as L
from deepliif_tpu.nets import resnet, unet

B = 32
DT = jnp.bfloat16
K = 4
out = {}


def run(fn, x):
    r = fn(x)
    return float(r)


def marginal(f, shape, key):
    """f: x -> array; returns marginal seconds per application at batch B."""
    xs = jax.random.normal(key, (2 * K,) + shape, DT)

    def chain(n):
        @jax.jit
        def g(xs):
            def body(i, acc):
                return acc + f(jax.lax.dynamic_index_in_dim(xs, i, keepdims=False)).astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        # warm
        run(g, xs)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(g, xs)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = chain(K), chain(2 * K)
    return (t2 - t1) / K


key = jax.random.PRNGKey(0)
kp = jax.random.PRNGKey(1)
p = jax.tree_util.tree_map(lambda a: a.astype(DT), resnet.init(kp, 3, 3))

stages = {}

stages['head'] = (
    (512, 512, 3),
    lambda x: L.relu(L.apply_norm(L.conv2d(L.pad2d(x, 3, 'reflect'), p['head_conv'], 1, 0), p['head_norm'], 'batch', False)))
stages['down0'] = (
    (512, 512, 64),
    lambda x: L.relu(L.apply_norm(L.conv2d(x, p['down0_conv'], 2, 1), p['down0_norm'], 'batch', False)))
stages['down1'] = (
    (256, 256, 128),
    lambda x: L.relu(L.apply_norm(L.conv2d(x, p['down1_conv'], 2, 1), p['down1_norm'], 'batch', False)))


def reschain(x):
    from deepliif_tpu.ops import fused_resblock as FR
    blocks = [{'w1': p[f'res{i}_conv1']['w'].astype(x.dtype), 'norm1': p[f'res{i}_norm1'],
               'w2': p[f'res{i}_conv2']['w'].astype(x.dtype), 'norm2': p[f'res{i}_norm2']}
              for i in range(9)]
    return FR.resblock_chain(x, blocks, padding='reflect', interpret=False)


stages['res9_fused'] = ((128, 128, 256), reschain)
stages['up0'] = (
    (128, 128, 256),
    lambda x: L.relu(L.apply_norm(L.conv_transpose2d(x, p['up0_conv'], 2, 1, 1), p['up0_norm'], 'batch', False)))
stages['up1'] = (
    (256, 256, 128),
    lambda x: L.relu(L.apply_norm(L.conv_transpose2d(x, p['up1_conv'], 2, 1, 1), p['up1_norm'], 'batch', False)))
stages['tail_s2d'] = (
    (512, 512, 64),
    lambda x: jnp.tanh(L.conv2d_s2d(L.pad2d(x, 3, 'reflect'), p['tail_conv'])))
stages['tail_direct'] = (
    (512, 512, 64),
    lambda x: jnp.tanh(L.conv2d(L.pad2d(x, 3, 'reflect'), p['tail_conv'], 1, 0)))

pu = jax.tree_util.tree_map(lambda a: a.astype(DT), unet.init(jax.random.PRNGKey(2), 3, 3, 9))
os.environ['DEEPLIIF_S2D'] = '1'
stages['unet512_s2d'] = ((512, 512, 3), lambda x: unet.apply(pu, x, num_downs=9, train=False))

which = sys.argv[1:] or list(stages)
for name in which:
    shape, f = stages[name]
    t = marginal(lambda x: f(x), (B,) + shape, jax.random.PRNGKey(hash(name) % 2**31))
    out[name] = round(t, 4)
    print(name, round(t * 1000, 1), 'ms', flush=True)

# unet with s2d off
if 'unet512_s2d' in which:
    os.environ['DEEPLIIF_S2D'] = '0'
    t = marginal(lambda x: unet.apply(pu, x, num_downs=9, train=False),
                 (B, 512, 512, 3), jax.random.PRNGKey(9))
    out['unet512_nos2d'] = round(t, 4)
    print('unet512_nos2d', round(t * 1000, 1), 'ms', flush=True)

print(json.dumps(out))
with open(os.path.join(os.path.dirname(__file__), 'profile_stages.json'), 'w') as fh:
    json.dump(out, fh, indent=1)
