"""down0 (3x3 stride-2 64->128 @512^2) XLA variants: native strided conv vs
column-packed reshape + 2-matmul-group conv (stride-2 rows via slicing)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 32
DT = jnp.bfloat16
K = 4
DN = ('NHWC', 'HWIO', 'NHWC')


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


w = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 128), DT)


def native(x):
    return jax.lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                        dimension_numbers=DN)


# packed: (B,512,512,64) -> (B,512,256,128); rows strided by slicing; cols
# folded into weights (body covers 2q/2q+1, left covers 2q-1)
zero = jnp.zeros_like(w[:, 0])
wb = jnp.concatenate([w[:, 1], w[:, 2]], axis=1)   # (3, 128, 128)
wl = jnp.concatenate([zero, w[:, 0]], axis=1)
# fold the dy taps as a (2,1)-spatial conv over row-pairs? simpler: 3 row
# shifts at stride 2 in one conv via kernel height 3 with lhs stride 2:
wb3 = wb[:, None]                                   # (3, 1, 128, 128)
wl3 = wl[:, None]


def packed(x):
    xp = x.reshape(B, 512, 256, 128)
    body = jax.lax.conv_general_dilated(xp, jnp.transpose(wb3, (0, 1, 2, 3)),
                                        (2, 1), [(1, 1), (0, 0)],
                                        dimension_numbers=DN)
    zc = jnp.zeros_like(xp[:, :, :1])
    left = jnp.concatenate([zc, xp[:, :, :-1]], axis=2)
    lft = jax.lax.conv_general_dilated(left, jnp.transpose(wl3, (0, 1, 2, 3)),
                                       (2, 1), [(1, 1), (0, 0)],
                                       dimension_numbers=DN)
    return body + lft


out = {}
ref = jax.jit(native)(jax.random.normal(jax.random.PRNGKey(9), (B, 512, 512, 64), DT))
y2 = jax.jit(packed)(jax.random.normal(jax.random.PRNGKey(9), (B, 512, 512, 64), DT))
print('shapes', ref.shape, y2.shape)
import numpy as np
d = float(jnp.abs(ref.astype(jnp.float32) - y2.astype(jnp.float32)).max())
print('maxdiff', d)
out['maxdiff'] = d
out['native_ms'] = round(marginal(native, (B, 512, 512, 64), jax.random.PRNGKey(2)) * 1000, 1)
print('native', out['native_ms'], 'ms', flush=True)
out['packed_ms'] = round(marginal(packed, (B, 512, 512, 64), jax.random.PRNGKey(3)) * 1000, 1)
print('packed', out['packed_ms'], 'ms', flush=True)
print(json.dumps(out))
