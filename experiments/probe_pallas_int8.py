"""Go/no-go probe: can Mosaic lower int8 x int8 -> int32 dot_general on
this v5e, and at what marginal rate vs bf16?

Round-3 context: XLA int8 convs hit 543 TF/s raw but lose end-to-end
(docs/Performance.md) because dynamic/static quantization adds HBM traffic
and int32 conv outputs materialize. The identified fix is a fused
quantized-conv Pallas kernel (quantize in the epilogue, dequant in the
epilogue, VMEM-resident intermediates). This probe answers the
prerequisite: Mosaic int8 MXU support.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_i8(x_ref, w_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[...] = acc


def _kernel_i8_loop(x_ref, w_ref, o_ref, *, reps):
    # chained int8 matmuls to measure a marginal MXU rate inside one kernel
    def body(i, acc):
        a = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        # fold to int8 again so every rep is an int8 matmul
        return acc + a
    acc = jax.lax.fori_loop(0, reps, body, jnp.zeros_like(o_ref))
    o_ref[...] = acc


def main():
    m = k = n = 512
    x = (np.random.randn(m, k) * 20).clip(-127, 127).astype(np.int8)
    w = (np.random.randn(k, n) * 20).clip(-127, 127).astype(np.int8)

    # 1. correctness
    f = pl.pallas_call(
        _kernel_i8,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    y = jax.jit(f)(x, w)
    ref = x.astype(np.int32) @ w.astype(np.int32)
    ok = np.array_equal(np.asarray(y), ref)
    print('int8 dot exact:', ok)

    # 2. marginal rate: K vs 2K reps inside one kernel
    def rate(reps):
        g = pl.pallas_call(
            functools.partial(_kernel_i8_loop, reps=reps),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(g)
        jf(x, w).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            float(jf(x, w)[0, 0])
        return (time.perf_counter() - t0) / 10

    t1, t2 = rate(256), rate(512)
    dt = (t2 - t1) / 256
    ops = 2 * m * k * n
    print(f'marginal int8 matmul: {dt*1e6:.1f} us -> {ops/dt/1e12:.1f} TOP/s')

    # 3. same shape in bf16 for comparison
    def _kernel_bf(x_ref, w_ref, o_ref, *, reps):
        def body(i, acc):
            return acc + jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = jax.lax.fori_loop(0, reps, body, jnp.zeros_like(o_ref))

    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    def rate_bf(reps):
        g = pl.pallas_call(
            functools.partial(_kernel_bf, reps=reps),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(g)
        jf(xb, wb).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            float(jf(xb, wb)[0, 0])
        return (time.perf_counter() - t0) / 10

    t1, t2 = rate_bf(256), rate_bf(512)
    dt = (t2 - t1) / 256
    print(f'marginal bf16 matmul: {dt*1e6:.1f} us -> {ops/dt/1e12:.1f} TF/s')

    # 4. quantize + clip + round inside a kernel (the epilogue ops we need)
    def _kernel_q(x_ref, o_ref):
        u = x_ref[...]
        q = jnp.clip(jnp.round(u * 0.33), -127, 127).astype(jnp.int8)
        o_ref[...] = q

    fq = pl.pallas_call(
        _kernel_q,
        out_shape=jax.ShapeDtypeStruct((m, k), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    qy = jax.jit(fq)(xb.astype(jnp.bfloat16))
    qref = np.clip(np.rint(np.asarray(xb, np.float32) * np.float32(
        jnp.bfloat16(0.33))), -127, 127).astype(np.int8)
    print('quantize epilogue lowers:', qy.shape, qy.dtype,
          'max|diff|', int(np.abs(qy.astype(np.int32) - qref).max()))


if __name__ == '__main__':
    main()
