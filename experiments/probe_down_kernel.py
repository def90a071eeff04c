"""Bisect what makes conv3x3_s2_stats slow (31 TF/s vs resblock's 160)."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, CIN, COUT = 32, 512, 512, 64, 128
DT = jnp.bfloat16
K = 4
out = {}


def marginal(f, xs):
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


def make_kernel(variant, ch=16):
    wo = W // 2

    def kern(x_ref, wb_ref, wl_ref, y_ref, blk, sem):
        s = pl.program_id(0)
        r = pl.program_id(1)
        n_r = pl.num_programs(1)
        t = s * n_r + r
        slot = jax.lax.rem(t, 2)
        nslot = jax.lax.rem(t + 1, 2)

        def dmas(slot_i, s_i, r_i):
            i0 = 2 * r_i * ch
            top = jnp.maximum(i0 - 1, 0)
            return (pltpu.make_async_copy(x_ref.at[s_i, pl.ds(i0, 2 * ch)],
                                          blk.at[slot_i, pl.ds(1, 2 * ch)],
                                          sem.at[slot_i, 0]),
                    pltpu.make_async_copy(x_ref.at[s_i, pl.ds(top, 1)],
                                          blk.at[slot_i, pl.ds(0, 1)],
                                          sem.at[slot_i, 1]))

        @pl.when(t == 0)
        def _():
            for d in dmas(slot, s, r):
                d.start()

        r_next = jnp.where(r + 1 < n_r, r + 1, 0)
        s_next = jnp.where(r + 1 < n_r, s, s + 1)

        @pl.when(t + 1 < B * n_r)
        def _():
            for d in dmas(nslot, s_next, r_next):
                d.start()

        for d in dmas(slot, s, r):
            d.wait()

        u = blk[slot]
        dn = (((2,), (0,)), ((), ()))
        if variant == 'no_stride':
            # contiguous rows, no strided selection (WRONG numerics, perf probe)
            rows = (u[0:ch], u[1:ch + 1], u[2:ch + 2])
            rows = [x.reshape(ch, wo, 2 * CIN) for x in rows]
        else:
            v1 = u[0:2 * ch].reshape(ch, 2, W // 2, 2 * CIN)
            v2 = u[1:2 * ch + 1].reshape(ch, 2, W // 2, 2 * CIN)
            rows = (v1[:, 0], v1[:, 1], v2[:, 1])

        acc = jnp.zeros((ch, wo, COUT), jnp.float32)
        for dy in range(3):
            body = rows[dy]
            acc = acc + jax.lax.dot_general(body, wb_ref[dy], dimension_numbers=dn,
                                            preferred_element_type=jnp.float32)
            if variant != 'no_left':
                zcol = jnp.zeros_like(body[:, :1])
                left = jnp.concatenate([zcol, body[:, :-1]], axis=1)
                acc = acc + jax.lax.dot_general(left, wl_ref[dy], dimension_numbers=dn,
                                                preferred_element_type=jnp.float32)
        y_ref[0] = acc.astype(DT)

    def run(x):
        x2 = x.reshape(B, H, W // 2, 2 * CIN)
        wb = jnp.zeros((3, 2 * CIN, COUT), DT)
        wl = jnp.zeros((3, 2 * CIN, COUT), DT)
        return pl.pallas_call(
            kern,
            grid=(B, (H // 2) // ch),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec((3, 2 * CIN, COUT), lambda s, r: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((3, 2 * CIN, COUT), lambda s, r: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, ch, W // 2, COUT), lambda s, r: (s, r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, COUT), DT),
            scratch_shapes=[pltpu.VMEM((2, 2 * ch + 1, W // 2, 2 * CIN), DT),
                            pltpu.SemaphoreType.DMA((2, 2))],
        )(x2, wb, wl)
    return run


xs = jax.random.normal(jax.random.PRNGKey(0), (2 * K, B, H, W, CIN), DT)
for variant in ('base', 'no_left', 'no_stride'):
    t = marginal(make_kernel(variant), xs)
    out[variant] = round(t * 1000, 2)
    print(variant, out[variant], 'ms', flush=True)
for ch in (8, 32):
    t = marginal(make_kernel('base', ch=ch), xs)
    out[f'base_ch{ch}'] = round(t * 1000, 2)
    print(f'base_ch{ch}', out[f'base_ch{ch}'], 'ms', flush=True)
print(json.dumps(out))
