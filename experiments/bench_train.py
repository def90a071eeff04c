"""Training-step throughput of the flagship DeepLIIF config on one chip.

The reference's paper setting trains the 9-net ensemble (4x resnet_9blocks
+ 5x unet_512 + 9 PatchGAN discriminators + VGG feature loss) at batch 1
on a GPU (BASELINE.md "Training schedule"); it publishes no training
throughput. This measures the jitted alternating G/D step
(models/deepliif.py::make_train_step, remat on) at 512^2 across batch
sizes, reporting samples/s/chip. Timing per the rig's rules: one scalar
loss fetch per step forces execution (block_until_ready is a no-op on
axon); median over ITERS steps after WARMUP.
"""

import json
import os
import statistics
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

WARMUP = 2
ITERS = 5
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'bench_train.json')


def bench(batch, size=512):
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.nets import vgg

    d = dl.DeepLIIFDef()
    opt = SimpleNamespace(optimizer='adam', beta1=0.5, lr_policy='linear',
                          n_epochs=100, n_epochs_decay=100, epoch_count=1)
    state, g_tx, d_tx = dl.create_train_state(jax.random.PRNGKey(0), d, opt)
    vgg_params = vgg.init()
    step = dl.make_train_step(d, g_tx, d_tx, vgg_params)

    k = jax.random.PRNGKey(1)
    batch_data = {
        'A': jax.random.uniform(k, (batch, size, size, 3), jnp.float32, -1, 1),
        'B_mods': jax.random.uniform(k, (d.modalities_no, batch, size, size, 3),
                                     jnp.float32, -1, 1),
        'B_seg': jax.random.uniform(k, (batch, size, size, 3),
                                    jnp.float32, -1, 1),
    }
    rng = jax.random.PRNGKey(2)

    t0 = time.perf_counter()
    for _ in range(WARMUP):
        state, metrics, _ = step(state, batch_data, rng)
        float(metrics['loss_G'])
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        state, metrics, _ = step(state, batch_data, rng)
        float(metrics['loss_G'])
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    return {'samples_per_sec': round(batch / med, 3),
            'step_s': round(med, 3), 'compile_s': round(compile_s, 1)}


def main():
    out = {'device': str(jax.devices()[0])}
    for batch in (1, 2, 4, 8, 16):
        key = f'flagship_512_b{batch}'
        try:
            out[key] = bench(batch)
            print(key, out[key], flush=True)
        except Exception as e:  # noqa: BLE001
            out[key] = f'FAILED: {type(e).__name__}: {str(e)[:160]}'
            print(key, out[key][:120], flush=True)
            with open(OUT, 'w') as f:
                json.dump(out, f, indent=2)
            break  # larger batches will only be worse
        with open(OUT, 'w') as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
