"""Try XLA lowering variants for the tail conv (7x7, 64->3 @512^2, batch 32).
Baseline direct: ~83ms. stride-8 expanded: ~53ms. Goal: <15ms."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 32
DN = ('NHWC', 'HWIO', 'NHWC')
out = {}


def timeit(fn, *args, iters=10):
    r = fn(*args)
    jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].item()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].item()
    return (time.perf_counter() - t0) / iters


key = jax.random.PRNGKey(0)
w = 0.02 * jax.random.normal(key, (7, 7, 64, 3), jnp.float32)
x = jax.random.normal(jax.random.PRNGKey(1), (B, 518, 518, 64), jnp.bfloat16)


def ref(x):
    return jax.lax.conv_general_dilated(x, w.astype(x.dtype), (1, 1), 'VALID',
                                        dimension_numbers=DN)


gold = jax.jit(ref)(x)
out['direct_s'] = timeit(jax.jit(ref), x)


def make_w2(block):
    # W2[a+i, b+j, :, (a*block+b)*3+co] = w[i,j,:,co]; shape (block+6, block+6, 64, block^2*3)
    rows = []
    for a in range(block):
        cols = []
        for b in range(block):
            cols.append(jnp.pad(w, ((a, block - 1 - a), (b, block - 1 - b), (0, 0), (0, 0))))
        rows.append(jnp.stack(cols))
    w2 = jnp.transpose(jnp.stack(rows), (2, 3, 4, 0, 1, 5))
    return w2.reshape(block + 6, block + 6, 64, block * block * 3)


def d2s(y, block):
    n, hb, wb, _ = y.shape
    y = y.reshape(n, hb, wb, block, block, 3)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(n, hb * block, wb * block, 3)


# v1: stride-8 14x14 (prev best 53ms)
w2_8 = make_w2(8).astype(jnp.bfloat16)


def v1(x):
    y = jax.lax.conv_general_dilated(x, w2_8, (8, 8), 'VALID', dimension_numbers=DN)
    return d2s(y, 8)


r = jax.jit(v1)(x)
out['v1_maxdiff'] = float(jnp.max(jnp.abs(gold.astype(jnp.float32) - r.astype(jnp.float32))))
out['v1_stride8_s'] = timeit(jax.jit(v1), x)

# v2: 4 non-overlapping 8x8 stride-8 patch convs at offsets, summed.
# W2 (14,14) split into quadrants [0:8,8:16) x [0:8,8:16); pad x to 520.
w2_16 = jnp.pad(w2_8, ((0, 2), (0, 2), (0, 0), (0, 0)))


def v2(x):
    xp = jnp.pad(x, ((0, 0), (0, 10), (0, 10), (0, 0)))  # 518 -> 528 (64 blocks + halo block)
    y = None
    for ty in (0, 1):
        for tx in (0, 1):
            sub = w2_16[ty * 8:(ty + 1) * 8, tx * 8:(tx + 1) * 8]
            t = jax.lax.conv_general_dilated(
                xp[:, ty * 8:ty * 8 + 512, tx * 8:tx * 8 + 512, :], sub, (8, 8),
                'VALID', dimension_numbers=DN)
            y = t if y is None else y + t
    return d2s(y, 8)


r = jax.jit(v2)(x)
out['v2_maxdiff'] = float(jnp.max(jnp.abs(gold.astype(jnp.float32) - r.astype(jnp.float32))))
out['v2_quadpatch_s'] = timeit(jax.jit(v2), x)

# v3: block=16 stride-16 (N=768, kernel 22x22): fewer, bigger tiles
w2_16b = make_w2(16).astype(jnp.bfloat16)


def v3(x):
    # (518 - 22) / 16 + 1 = 32 blocks of 16 = 512 outputs, no padding needed
    y = jax.lax.conv_general_dilated(x, w2_16b, (16, 16), 'VALID', dimension_numbers=DN)
    return d2s(y, 16)


r = jax.jit(v3)(x)
out['v3_maxdiff'] = float(jnp.max(jnp.abs(gold.astype(jnp.float32) - r.astype(jnp.float32))))
out['v3_block16_s'] = timeit(jax.jit(v3), x)

# v4: conv_general_dilated_patches + dot
def v4(x):
    p = jax.lax.conv_general_dilated_patches(x, (7, 7), (1, 1), 'VALID',
                                             dimension_numbers=DN)  # (B,512,512,64*49)
    return (p.reshape(-1, 64 * 49) @ w.astype(x.dtype).reshape(-1, 3).reshape(49 * 64, 3)
            ).reshape(B, 512, 512, 3)


# NOTE patches layout: (..., C*kh*kw) with C major? verify numerics
try:
    r = jax.jit(v4)(x)
    wq = jnp.transpose(w.astype(x.dtype), (2, 0, 1, 3)).reshape(64 * 49, 3)

    def v4b(x):
        p = jax.lax.conv_general_dilated_patches(x, (7, 7), (1, 1), 'VALID',
                                                 dimension_numbers=DN)
        return (p.reshape(-1, 64 * 49) @ wq).reshape(B, 512, 512, 3)

    r = jax.jit(v4b)(x)
    out['v4_maxdiff'] = float(jnp.max(jnp.abs(gold.astype(jnp.float32) - r.astype(jnp.float32))))
    out['v4_patches_s'] = timeit(jax.jit(v4b), x)
except Exception as e:  # noqa: BLE001
    out['v4_error'] = str(e)[:200]

print(json.dumps(out, indent=1))
