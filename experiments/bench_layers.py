"""Per-layer timing of the non-resblock translator layers at flagship shape."""
import statistics, time
import jax, jax.numpy as jnp
import numpy as np
from deepliif_tpu.nets import layers as L

B = 32
DT = jnp.bfloat16
rng = np.random.default_rng(0)

def t(fn, *args, iters=5):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); float(fn(*args)); ts.append(time.perf_counter()-t0)
    return statistics.median(ts) * 1000

def mk(shape):
    return jnp.asarray(rng.normal(0, 0.5, shape).astype(np.float32)).astype(DT)

cases = {
  'head 7x7 3->64 @512 (pad3)': (mk((B,518,518,3)), mk((7,7,3,64)), 1, 0),
  'down0 3x3 s2 64->128 @512': (mk((B,512,512,64)), mk((3,3,64,128)), 2, 1),
  'down1 3x3 s2 128->256 @256': (mk((B,256,256,128)), mk((3,3,128,256)), 2, 1),
  'tail 7x7 64->3 @512 (pad3)': (mk((B,518,518,64)), mk((7,7,64,3)), 1, 0),
}
for name, (x, w, s, pad) in cases.items():
    @jax.jit
    def f(x, w, s=s, pad=pad):
        return jax.lax.conv_general_dilated(x, w, (s,s), [(pad,pad)]*2,
            dimension_numbers=('NHWC','HWIO','NHWC')).astype(jnp.float32).sum()
    ms = t(f, x, w)
    print(f'{name}: {ms:.1f} ms', flush=True)

for name, (cin, cout, hw) in {'up0 convT 256->128 @128->256': (256,128,128),
                              'up1 convT 128->64 @256->512': (128,64,256)}.items():
    x = mk((B,hw,hw,cin)); w = mk((3,3,cin,cout))
    @jax.jit
    def f(x, w):
        return L.conv_transpose2d(x, {'w': w}, 2, 1, 1).astype(jnp.float32).sum()
    ms = t(f, x, w)
    print(f'{name}: {ms:.1f} ms', flush=True)

# norms at the big shapes (head/down/up activations)
for name, shape in {'norm @512x64': (B,512,512,64), 'norm @256x128': (B,256,256,128)}.items():
    x = mk(shape)
    p = {'scale': jnp.ones((shape[-1],), jnp.float32), 'bias': jnp.zeros((shape[-1],), jnp.float32)}
    @jax.jit
    def f(x):
        return L.batch_stat_norm(x, p, per_sample=True).astype(jnp.float32).sum()
    ms = t(f, x)
    print(f'{name}: {ms:.1f} ms', flush=True)
