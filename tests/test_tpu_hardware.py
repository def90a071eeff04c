"""Opt-in real-TPU compile/run checks for the Pallas kernels.

The default suite forces an 8-device CPU platform (conftest.py), so the
Pallas kernels are only exercised in interpret mode there. Setting
DEEPLIIF_TPU_TESTS=1 runs this module's subprocess checks on the real chip:
each spawns a clean Python (no forced-CPU env) and asserts the fused
resblock kernel and the s2d tail lowerings compile, execute, and match the
XLA path on hardware. Slow (~minutes of TPU compiles) — excluded from the
default run by the env gate, not by marks, so `pytest tests/` stays fast.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get('DEEPLIIF_TPU_TESTS') != '1',
    reason='set DEEPLIIF_TPU_TESTS=1 to run real-TPU kernel checks')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_on_tpu(code):
    # undo the conftest CPU forcing for the child, but keep the platform
    # plugin selection (JAX_PLATFORMS=axon + its sitecustomize PYTHONPATH)
    env = {k: v for k, v in os.environ.items() if k != 'XLA_FLAGS'}
    orig = env.pop('DEEPLIIF_ORIG_JAX_PLATFORMS', None)
    if env.get('JAX_PLATFORMS') == 'cpu':
        # restore the rig's real platform (recorded by conftest before it
        # forced cpu); plain deletion would fall back to cpu when the
        # platform is an opt-in plugin (axon)
        if orig:
            env['JAX_PLATFORMS'] = orig
        else:
            del env['JAX_PLATFORMS']
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    proc = subprocess.run([sys.executable, '-c', code], env=env,
                          capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_fused_resblock_compiles_on_tpu():
    out = _run_on_tpu('''
import jax, jax.numpy as jnp, numpy as np
assert jax.default_backend() == 'tpu', jax.default_backend()
from deepliif_tpu.ops import fused_resblock as FR
x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128, 256), jnp.bfloat16)
blocks = [{'w1': 0.05 * jax.random.normal(jax.random.PRNGKey(1), (3, 3, 256, 256), jnp.bfloat16),
           'norm1': {'scale': jnp.ones(256), 'bias': jnp.zeros(256)},
           'w2': 0.05 * jax.random.normal(jax.random.PRNGKey(2), (3, 3, 256, 256), jnp.bfloat16),
           'norm2': {'scale': jnp.ones(256), 'bias': jnp.zeros(256)}}]
y = FR.resblock_chain(x, blocks, padding='reflect', interpret=False)
print('resblock ok', np.asarray(y.astype(jnp.float32)).std())
''')
    assert 'resblock ok' in out


def test_pallas_labeling_matches_xla_on_tpu():
    """The label-propagation sweep kernel (int8 mask + aliasing) compiles
    and matches the XLA path on hardware at a VMEM-fitting canvas size
    (whole-ROI canvases exceed scoped VMEM — documented negative result)."""
    out = _run_on_tpu('''
import jax, jax.numpy as jnp, numpy as np
from deepliif_tpu.ops.labeling import label_components, label_components_pallas
rng = np.random.default_rng(3)
fg = jnp.asarray(rng.random((256, 256)) < 0.4)
ref = np.asarray(jax.jit(lambda f: label_components(f))(fg))
pal = np.asarray(jax.jit(lambda f: label_components_pallas(f))(fg))
assert (ref == pal).all()
pal4 = np.asarray(jax.jit(lambda f: label_components_pallas(f, conn8=False))(fg))
ref4 = np.asarray(jax.jit(lambda f: label_components(f, conn8=False))(fg))
assert (ref4 == pal4).all()
print('pallas labeling ok')
''')
    assert 'pallas labeling ok' in out


def test_int8_conv_matches_f32_on_tpu():
    """The int8 MXU conv path produces the expected numerics on hardware."""
    out = _run_on_tpu('''
import jax, jax.numpy as jnp, numpy as np
from deepliif_tpu.nets import layers as L
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((2, 64, 64, 64)), jnp.float32)
p = {'w': jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.float32)}
ref = np.asarray(jax.jit(lambda x: L.conv2d(x, p, 1, 1))(x))
q = L.quantize_conv_int8(p)
out = np.asarray(jax.jit(lambda x: L.conv2d(x, q, 1, 1))(x))
rel = float(np.abs(out - ref).mean() / np.abs(ref).mean())
assert rel < 0.03, rel
print('int8 conv ok', rel)
''')
    assert 'int8 conv ok' in out


def test_s2d_tail_matches_direct_on_tpu():
    out = _run_on_tpu('''
import os
import jax, jax.numpy as jnp, numpy as np
from deepliif_tpu.nets import layers as L
p = {'w': 0.05 * jax.random.normal(jax.random.PRNGKey(0), (7, 7, 64, 3), jnp.bfloat16),
     'b': jnp.zeros(3, jnp.bfloat16)}
x = jax.random.normal(jax.random.PRNGKey(1), (2, 518, 518, 64), jnp.bfloat16)
a = jax.jit(lambda x: L.conv2d(x, p, 1, 0))(x)
b = jax.jit(lambda x: L.conv2d_s2d(x, p))(x)
d = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
assert d < 0.05, d
print('s2d ok', d)
''')
    assert 's2d ok' in out


def test_fused_int8_resblock_matches_reference_on_tpu():
    """The fused int8 kernel lowers through Mosaic (int8 MXU dot,
    in-kernel quantize) and matches the plain-XLA reference of the same
    contract exactly on hardware — the integer contraction admits no
    rounding drift."""
    out = _run_on_tpu('''
import jax, jax.numpy as jnp, numpy as np
assert jax.default_backend() == 'tpu', jax.default_backend()
from deepliif_tpu.ops import fused_resblock as FR
rng = np.random.default_rng(0)
c = 256
x = jnp.asarray(rng.normal(0, 1, (2, 128, 128, c)), jnp.bfloat16)
w = rng.normal(0, 0.02, (3, 3, c, c)).astype(np.float32)
ws = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12)
wq = jnp.asarray(np.clip(np.rint(w / ws), -127, 127).astype(np.int8))
a = np.float32(2.0 / 127.0)
deq = jnp.asarray((a * ws).astype(np.float32))
y, st = jax.jit(lambda x: FR.conv3x3_stats_int8(
    x, wq, deq, 1.0 / a, padding='reflect'))(x)
# reference: same quantization lattice in plain XLA
q = jnp.clip(jnp.round(x * jnp.float32(1.0 / a).astype(x.dtype)),
             -127, 127).astype(jnp.int8)
qp = jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')
dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ('NHWC', 'HWIO', 'NHWC'))
y32 = jax.lax.conv_general_dilated(qp, wq, (1, 1), 'VALID',
                                   dimension_numbers=dn,
                                   preferred_element_type=jnp.int32)
yr = (y32.astype(jnp.float32) * deq).astype(x.dtype)
d = float(jnp.abs(y.astype(jnp.float32) - yr.astype(jnp.float32)).max())
assert d == 0.0, d
print('fused int8 ok', d)
''')
    assert 'fused int8 ok' in out


def test_fused_int8_dynamic_resblock_on_tpu():
    """The round-5 per-chunk DYNAMIC int8 kernel (in-VMEM max + scalar
    reciprocal + dequant-by-chunk-scale) lowers through Mosaic and
    recovers the chunk scale exactly: with an identity int8 kernel and
    deq=1, the dequantized argmax value equals the chunk max bit-for-bit,
    and a full quantized conv tracks the f32 conv within the int8 error
    bound."""
    out = _run_on_tpu('''
import jax, jax.numpy as jnp, numpy as np
assert jax.default_backend() == 'tpu', jax.default_backend()
from deepliif_tpu.ops import fused_resblock as FR
rng = np.random.default_rng(0)
c = 256
x = jnp.asarray(rng.normal(0, 1, (2, 128, 128, c)), jnp.bfloat16)

# scale exactness via identity kernel (chunk = 16 rows)
wq_i = np.zeros((3, 3, c, c), np.int8)
wq_i[1, 1] = np.eye(c, dtype=np.int8)
y, _ = jax.jit(lambda x: FR.conv3x3_stats_int8(
    x, jnp.asarray(wq_i), jnp.ones((c,), jnp.float32), 1.0,
    padding='zero', dynamic=True))(x)
xf = np.asarray(x.astype(jnp.float32))
yf = np.asarray(y.astype(jnp.float32))
for s in range(2):
    for r in range(128 // 16):
        blk = xf[s, r * 16:(r + 1) * 16]
        m_host = float(np.abs(blk).max())
        m_kern = float(np.abs(yf[s, r * 16:(r + 1) * 16]).max())
        assert m_kern == m_host, (s, r, m_kern, m_host)

# full conv tracks f32 within the int8 bound
w = rng.normal(0, 0.02, (3, 3, c, c)).astype(np.float32)
ws = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12)
wq = jnp.asarray(np.clip(np.rint(w / ws), -127, 127).astype(np.int8))
y8, _ = jax.jit(lambda x: FR.conv3x3_stats_int8(
    x, wq, jnp.asarray(ws.astype(np.float32)), 1.0,
    padding='reflect', dynamic=True))(x)
dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ('NHWC', 'HWIO', 'NHWC'))
xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)),
             mode='reflect')
yf32 = jax.lax.conv_general_dilated(xp, jnp.asarray(w), (1, 1), 'VALID',
                                    dimension_numbers=dn)
err = float(jnp.abs(y8.astype(jnp.float32) - yf32).max())
# per-element bound: ~9 taps x (half a weight step x |x| + half an act
# step x |w|); empirically well under 0.2 for N(0,1)/0.02 data
assert err < 0.2, err
print('fused int8 dynamic ok', err)
''')
    assert 'fused int8 dynamic ok' in out


def test_fused_kernels_in_shard_map_on_tpu():
    """Round-4 mesh path: pallas_call inside jax.shard_map must lower
    through Mosaic on the real backend (the multi-chip product path,
    parallel.make_sharded_forward). Only one physical chip exists here,
    so this runs the exact shard_map+jit wrapper on a 1-device mesh —
    same lowering pipeline a v5e-8 takes per chip — and asserts both the
    bf16 and int8 fused chains compile, execute, and match the direct
    jit byte-for-byte."""
    out = _run_on_tpu('''
import jax, jax.numpy as jnp, numpy as np
assert jax.default_backend() == 'tpu', jax.default_backend()
from deepliif_tpu.ops import fused_resblock as FR
from deepliif_tpu import parallel

rng = np.random.default_rng(3)
c = 256
blocks = [{'w1': jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)), jnp.bfloat16),
           'norm1': {'scale': jnp.ones(c), 'bias': jnp.zeros(c)},
           'w2': jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)), jnp.bfloat16),
           'norm2': {'scale': jnp.ones(c), 'bias': jnp.zeros(c)}}]
x = jnp.asarray(rng.normal(0, 1, (2, 128, 128, c)), jnp.bfloat16)

def fwd(params, x):
    return FR.resblock_chain(x, params, padding='reflect', interpret=False)

mesh = parallel.get_mesh(1)
sharded = parallel.make_sharded_forward(fwd, mesh)
y_mesh = np.asarray(sharded(blocks, x).astype(jnp.float32))
y_jit = np.asarray(jax.jit(fwd)(blocks, x).astype(jnp.float32))
np.testing.assert_array_equal(y_mesh, y_jit)
print('shard_map bf16 ok')

ws = np.maximum(np.abs(np.asarray(blocks[0]["w1"], np.float32)).max(axis=(0, 1, 2)) / 127.0, 1e-12)
a = np.float32(2.0 / 127.0)
def q(w):
    return jnp.asarray(np.clip(np.rint(np.asarray(w, np.float32) / ws), -127, 127), jnp.int8)
qb = [{'w1q': q(b['w1']), 'w1s': jnp.asarray(ws, jnp.float32), 'a1': jnp.float32(a),
       'w2q': q(b['w2']), 'w2s': jnp.asarray(ws, jnp.float32), 'a2': jnp.float32(a),
       'norm1': b['norm1'], 'norm2': b['norm2']} for b in blocks]

def fwd_q(params, x):
    return FR.resblock_chain_int8(x, params, padding='reflect', interpret=False)

sharded_q = parallel.make_sharded_forward(fwd_q, mesh)
yq_mesh = np.asarray(sharded_q(qb, x).astype(jnp.float32))
yq_jit = np.asarray(jax.jit(fwd_q)(qb, x).astype(jnp.float32))
np.testing.assert_array_equal(yq_mesh, yq_jit)
print('shard_map int8 ok')
''')
    assert 'shard_map bf16 ok' in out and 'shard_map int8 ok' in out
