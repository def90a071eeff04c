"""Profile where the bf16 batch-32 ensemble call spends its time on the
real TPU: translators-only vs segs-only vs full, plus XLA cost analysis.

Run on the axon chip:  python experiments/profile_ensemble.py
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp

from deepliif_tpu.models import deepliif as dl

BATCH = 32
WARMUP = 2
ITERS = 6
DTYPE = jnp.bfloat16


def timed(fn, *args):
    for _ in range(WARMUP):
        float(fn(*args))
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def cost(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return {'gflops': round(c.get('flops', 0) / 1e9, 1),
                'gbytes': round(c.get('bytes accessed', 0) / 1e9, 2)}
    except Exception as e:
        return {'error': str(e)[:200]}


def main():
    d = dl.DeepLIIFDef(dtype=DTYPE)
    params = dl.init_params(jax.random.PRNGKey(0), d, with_discriminators=False)
    params = jax.tree_util.tree_map(lambda a: a.astype(DTYPE), params)

    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 512, 512, 3),
                           jnp.float32, -1, 1).astype(DTYPE)

    net_g = dl._g_net(d, d.net_g[0])
    net_gs = dl._gs_net(d, d.net_gs[0])

    @jax.jit
    def translators(params, x):
        mods = jax.vmap(lambda p: net_g.apply(p, x))(params['G'])
        return mods.sum()

    @jax.jit
    def one_translator(params, x):
        p1 = jax.tree_util.tree_map(lambda a: a[0], params['G'])
        return net_g.apply(p1, x).sum()

    @jax.jit
    def segs(params, seg_in):
        out = jax.vmap(lambda p, xi: net_gs.apply(p, xi))(params['GS'], seg_in)
        return out.sum()

    @jax.jit
    def one_seg(params, x):
        p1 = jax.tree_util.tree_map(lambda a: a[0], params['GS'])
        return net_gs.apply(p1, x).sum()

    @jax.jit
    def full(params, x):
        mods, seg = dl.generator_forward(params, x, d)
        return mods.sum() + seg.sum()

    seg_in = jnp.broadcast_to(x[None], (d.modalities_no + 1,) + x.shape)

    results = {}
    for name, fn, args in (
        ('one_translator', one_translator, (params, x)),
        ('translators_x4', translators, (params, x)),
        ('one_seg_unet', one_seg, (params, x)),
        ('segs_x5', segs, (params, seg_in)),
        ('full_ensemble', full, (params, x)),
    ):
        t = timed(fn, *args)
        results[name] = {'sec': round(t, 4),
                         'tiles_per_sec': round(BATCH / t, 1)}
        print(name, results[name], flush=True)

    # cost analysis on the full graph pieces
    results['cost_translators'] = cost(
        lambda p, xx: jax.vmap(lambda q: net_g.apply(q, xx))(p['G']).sum(),
        params, x)
    results['cost_segs'] = cost(
        lambda p, s: jax.vmap(lambda q, xi: net_gs.apply(q, xi))(p['GS'], s).sum(),
        params, seg_in)
    print(json.dumps(results, indent=1))
    with open('/root/repo/experiments/profile_ensemble.json', 'w') as f:
        json.dump(results, f, indent=1)


if __name__ == '__main__':
    main()
