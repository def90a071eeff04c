"""Decompose the s2d tail conv cost: transpose vs matmul."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 32
out = {}


def timeit(fn, *args, iters=10):
    r = fn(*args)
    jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].item()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].item()
    return (time.perf_counter() - t0) / iters


x = jax.random.normal(jax.random.PRNGKey(0), (B, 518, 518, 64), jnp.bfloat16)
w3 = 0.02 * jax.random.normal(jax.random.PRNGKey(1), (2, 2, 4096, 192), jnp.bfloat16)


@jax.jit
def s2d_transpose(x):
    xp = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
    x2 = xp.reshape(B, 65, 8, 65, 8, 64)
    return jnp.transpose(x2, (0, 1, 3, 2, 4, 5)).reshape(B, 65, 65, 4096)


x2 = s2d_transpose(x)
out['transpose_s'] = timeit(s2d_transpose, x)


@jax.jit
def blockconv(x2):
    return jax.lax.conv_general_dilated(x2, w3, (1, 1), 'VALID',
                                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


out['blockconv_s'] = timeit(blockconv, x2)


@jax.jit
def blockdot(x2):
    # 4 explicit matmuls instead of the 2x2 conv
    y = None
    for ty in (0, 1):
        for tx in (0, 1):
            sl = x2[:, ty:ty + 64, tx:tx + 64, :].reshape(-1, 4096)
            t = sl @ w3[ty, tx]
            y = t if y is None else y + t
    return y.reshape(B, 64, 64, 192)


out['blockdot_s'] = timeit(blockdot, x2)


@jax.jit
def fused_all(x):
    return blockdot(s2d_transpose(x))


out['fused_transpose_dot_s'] = timeit(fused_all, x)

# pure matmul reference at the same FLOP count
a = jax.random.normal(jax.random.PRNGKey(2), (B * 64 * 64, 4096), jnp.bfloat16)
bm = jax.random.normal(jax.random.PRNGKey(3), (4096, 192), jnp.bfloat16)
out['ref_matmul_x4_s'] = timeit(jax.jit(lambda a: ((a @ bm) + (a @ bm) + (a @ bm) + (a @ bm))), a)

print(json.dumps(out, indent=1))
