"""Probe: does splitting the ensemble into two jitted phases (translators,
then seg nets) reduce peak HLO temps enough to compile batch > 128?

RESULT (round 3, v5e): NO — b192 and b160 both fail compile with the same
HBM OOM as the single-program ensemble. The binding temporaries live inside
a single phase (U-Net skip activations and the resblock chain), not across
the translator/seg boundary, so batch 128 is the practical ceiling either
way (see docs/Performance.md "Why ~72 tiles/s is the practical ceiling").
"""

import statistics
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deepliif_tpu.models import deepliif as dl
from deepliif_tpu.models.deepliif import _g_net, _gs_net, _run_translators


def main():
    d = dl.DeepLIIFDef(dtype=jnp.bfloat16)
    params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    net_g = _g_net(d, d.net_g[0])
    net_gs = _gs_net(d, d.net_gs[0])

    @jax.jit
    def phase1(p, x):
        return _run_translators(p['G'], x, d, net_g)

    @jax.jit
    def phase2(p, x, mods):
        seg_in = jnp.concatenate([x[None].astype(mods.dtype), mods], axis=0)
        segs = jax.vmap(lambda q, xi: net_gs.apply(q, xi))(p['GS'], seg_in)
        w = jnp.asarray(d.seg_weights, segs.dtype)
        return jnp.tensordot(w, segs, axes=1)

    def run(x):
        mods = phase1(params, x)
        return mods.sum() + phase2(params, x, mods).sum()

    for batch in (192, 160, 128):
        x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 512, 512, 3),
                               jnp.float32, -1, 1).astype(jnp.bfloat16)
        try:
            float(run(x)); float(run(x))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(run(x))
                ts.append(time.perf_counter() - t0)
            print(f'phase-split b{batch}: '
                  f'{batch / statistics.median(ts):.1f} tiles/s', flush=True)
            break
        except Exception as e:  # noqa: BLE001
            print(f'phase-split b{batch}: FAILED {str(e)[:150]}', flush=True)


if __name__ == '__main__':
    main()
