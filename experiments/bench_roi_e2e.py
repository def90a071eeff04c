"""End-to-end ROI benchmark on the real chip: Sample_Large_Tissues/ROI_1
(1381x949) tile -> ensemble -> stitch -> quantify, host vs device quant.

Uses randomly initialized flagship weights (timing-only; counts are not
meaningful). Matches the round-1 Performance.md measurement protocol.
"""

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

ROI = '/root/reference/Sample_Large_Tissues/ROI_1.png'


def main():
    import jax
    from deepliif_tpu.models import deepliif as dl
    from deepliif_tpu.models import infer_modalities, init_nets
    from deepliif_tpu.utils import checkpoints

    md = os.path.join(tempfile.gettempdir(), 'flagship_bench_model')
    if not os.path.exists(os.path.join(md, 'config.json')):
        os.makedirs(md, exist_ok=True)
        d = dl.DeepLIIFDef(dtype=None)
        params = dl.init_params(jax.random.PRNGKey(0), d,
                                with_discriminators=False)
        # store f32 (npz has no bf16); 'precision: bfloat16' in the config
        # makes the session compute in bf16
        checkpoints.save_networks(md, params)
        with open(os.path.join(md, 'config.json'), 'w') as f:
            json.dump({'model': 'DeepLIIF', 'modalities_no': 4,
                       'seg_gen': True, 'seg_no': 1, 'input_no': 1,
                       'netG': 'resnet_9blocks', 'net_gs': 'unet_512',
                       'ngf': 64, 'ndf': 64, 'norm': 'batch',
                       'no_dropout': False, 'padding': 'zero',
                       'upsample': 'convtranspose', 'scale_size': 512,
                       'precision': 'bfloat16',
                       'seg_weights': [0.25, 0.15, 0.25, 0.1, 0.25],
                       'modalities_names': ['IHC', 'Hema', 'DAPI', 'Lap2',
                                            'Marker']}, f)
    img = Image.open(ROI).convert('RGB')
    print(f'ROI_1: {img.size}', flush=True)

    results = {}
    for tag, dq in (('host_quant', False), ('device_quant', True)):
        # warm (compile)
        infer_modalities(img, 512, md, device_quant=dq)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            images, scoring = infer_modalities(img, 512, md, device_quant=dq)
            ts.append(time.perf_counter() - t0)
        results[tag] = round(statistics.median(ts), 3)
        print(f'{tag}: {results[tag]} s  scoring={scoring}', flush=True)

    with open('/root/repo/experiments/bench_roi_e2e.json', 'w') as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
