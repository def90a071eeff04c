"""Matmul rate vs N (lane fill) on v5e: (131072, 4096) x (4096, N) bf16."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

out = {}


def timeit(fn, *args, iters=8):
    r = fn(*args)
    jnp.asarray(r).ravel()[0].item()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        jnp.asarray(r).ravel()[0].item()
    return (time.perf_counter() - t0) / iters


M, K = 131072, 4096
a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
for N in (128, 192, 256, 512, 1024, 4096):
    b = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    t = timeit(f, a, b)
    out[f'N{N}_s'] = round(t, 5)
    out[f'N{N}_tfs'] = round(2 * M * K * N / t / 1e12, 1)

# smaller M
for (m, n) in ((8192, 192), (8192, 4096)):
    a2 = jax.random.normal(jax.random.PRNGKey(2), (m, K), jnp.bfloat16)
    b2 = jax.random.normal(jax.random.PRNGKey(3), (K, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    t = timeit(f, a2, b2)
    out[f'M{m}_N{n}_tfs'] = round(2 * m * K * n / t / 1e12, 1)

print(json.dumps(out, indent=1))
