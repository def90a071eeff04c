"""Micro-benchmark: fused resblock chain at flagship shape vs the unfused
XLA path, on the real chip. FLOPs = 18 convs x B x 128^2 x 256^2 x 9 x 2."""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from deepliif_tpu.ops import fused_resblock as FR
from deepliif_tpu.nets import layers as L

B, H, W, C = 32, 128, 128, 256
NB = 9
DTYPE = jnp.bfloat16


def timed(fn, *args, iters=6):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (B, H, W, C)).astype(np.float32)).astype(DTYPE)
    blocks = []
    for _ in range(NB):
        blocks.append({
            'w1': jnp.asarray(rng.normal(0, 0.02, (3, 3, C, C)).astype(np.float32)).astype(DTYPE),
            'norm1': {'scale': jnp.ones((C,), jnp.float32),
                      'bias': jnp.zeros((C,), jnp.float32)},
            'w2': jnp.asarray(rng.normal(0, 0.02, (3, 3, C, C)).astype(np.float32)).astype(DTYPE),
            'norm2': {'scale': jnp.ones((C,), jnp.float32),
                      'bias': jnp.zeros((C,), jnp.float32)},
        })

    def unfused(x, blocks):
        for b in blocks:
            h = L.conv2d(x, {'w': b['w1']}, 1, 1)
            h = L.batch_stat_norm(h, b['norm1'], per_sample=True)
            h = L.relu(h)
            h = L.conv2d(h, {'w': b['w2']}, 1, 1)
            h = L.batch_stat_norm(h, b['norm2'], per_sample=True)
            x = x + h
        return x

    flops = NB * 2 * B * H * W * C * C * 9 * 2

    @jax.jit
    def f_unfused(x, blocks):
        return unfused(x, blocks).astype(jnp.float32).sum()

    t = timed(f_unfused, x, blocks)
    print(f'unfused XLA:  {t*1000:.1f} ms -> {flops/t/1e12:.1f} TF/s', flush=True)

    chunks = [int(a) for a in (sys.argv[1:] or [16, 32])]
    for ch in chunks:
        @jax.jit
        def f_fused(x, blocks):
            return FR.resblock_chain(x, blocks, padding='zero',
                                     chunk_rows=ch).astype(jnp.float32).sum()
        t = timed(f_fused, x, blocks)
        print(f'fused ch={ch}: {t*1000:.1f} ms -> {flops/t/1e12:.1f} TF/s',
              flush=True)


if __name__ == '__main__':
    main()
