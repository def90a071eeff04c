"""Stage-level cost of the on-device quantifier on a realistic ROI-size seg
canvas (1536x1280, tiled from a real reference Seg output)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from deepliif_tpu.ops import labeling as lb

SEG_DIR = '/root/reference/Datasets/Sample_Dataset/test_DeepLIIF_results'
out = {}


def timeit(fn, *args, iters=5):
    r = fn(*args)
    jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].item()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].item()
        ts.append(time.perf_counter() - t0)
    return min(ts)


segs = [f for f in os.listdir(SEG_DIR) if f.endswith('_fake_B_5.png')]
tile = np.asarray(Image.open(os.path.join(SEG_DIR, segs[0])).convert('RGB'))
canvas = np.tile(tile, (3, 3, 1))[:1536, :1280]
seg = jnp.asarray(canvas)
print('canvas', canvas.shape, flush=True)

mask_f = jax.jit(lambda s: lb.flood_background(lb.posneg_mask(s, 120)))
mask = mask_f(seg)
out['posneg_flood_s'] = timeit(mask_f, seg)

fg = np.asarray(mask) != lb.LABEL_BACKGROUND
fgj = jnp.asarray(fg)

lab_f = jax.jit(lambda f: lb.label_components(f, conn8=True))
lab = lab_f(fgj)
out['label_components_s'] = timeit(lab_f, fgj)

# iteration count of the while loop (host replication)
def count_iters(fg):
    h, w = fg.shape
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab = jnp.where(fg, idx, lb.INF)
    it = 0
    step = jax.jit(lambda l, f: lb._neighbor_min(l, f, True))
    while True:
        new = step(lab, fg)
        flat = new.reshape(-1)
        jumped = jnp.where(flat == lb.INF, lb.INF, flat[jnp.clip(flat, 0, h * w - 1)])
        new = jnp.minimum(new, jumped.reshape(h, w))
        it += 1
        if not bool(jnp.any(new != lab)):
            return it
        lab = new


out['cc_iters'] = count_iters(fgj)

flat = lab.reshape(-1)
n = seg.shape[0] * seg.shape[1] + 1

scat = jax.jit(lambda f: jnp.zeros(n, jnp.int32).at[f].add(jnp.ones_like(f)))
_ = scat(flat)
out['one_scatter_add_s'] = timeit(scat, flat)

gath = jax.jit(lambda f: f[jnp.clip(f, 0, n - 2)].sum())
out['one_gather_s'] = timeit(gath, flat)

sizes = scat(flat)
kde = jax.jit(lambda s: lb.auto_size_threshold(s, '40x'))
_ = kde(sizes)
out['kde_s'] = timeit(kde, sizes)

srt = jax.jit(lambda f: jax.lax.sort((f, f, f, f), num_keys=1)[0].sum())
out['sort4_s'] = timeit(srt, flat)

cum = jax.jit(lambda f: jnp.cumsum(f).sum())
out['cumsum_s'] = timeit(cum, flat)

ov = jax.jit(lambda o, c: lb.overlay_images(o, c))
cls = jnp.where(fgj, jnp.uint8(1), jnp.uint8(0))
_ = ov(seg, cls)
out['overlay_s'] = timeit(ov, seg, cls)

print(json.dumps(out, indent=1))
with open(os.path.join(os.path.dirname(__file__), 'profile_devquant.json'), 'w') as f:
    json.dump(out, f, indent=1)
