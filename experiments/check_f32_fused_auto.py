"""Validate the automatic f32 fused-resblock path on hardware: with no
env overrides the gate now admits f32 (chunk auto-clamped to 8); this
checks the flagship generator compiles and matches the unfused XLA path
bit-for-bit-ish (f32 accumulation-order tolerance) at batch 2."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(fused):
    os.environ['DEEPLIIF_FUSED'] = 'auto' if fused else '0'
    from deepliif_tpu.models import deepliif as dl
    d = dl.DeepLIIFDef(dtype=None)
    params = dl.init_params(jax.random.PRNGKey(0), d,
                            with_discriminators=False)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 512, 512, 3),
                           jnp.float32, -1, 1)

    def fwd(params, x):
        mods, seg = dl.generator_forward(params, x, d)
        return mods, seg

    mods, seg = jax.jit(fwd)(params, x)
    return np.asarray(mods), np.asarray(seg)


m0, s0 = run(False)
m1, s1 = run(True)
print('mods max|diff|', float(np.abs(m0 - m1).max()),
      'seg max|diff|', float(np.abs(s0 - s1).max()))
assert np.abs(m0 - m1).max() < 2e-4, 'translator drift too large'
assert np.abs(s0 - s1).max() < 2e-4, 'seg drift too large'
print('F32_FUSED_AUTO_OK')
