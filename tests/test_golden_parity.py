"""Pixel-parity contract against the pretrained reference model.

The reference's central fidelity contract is SSIM >= 0.9997 per modality vs
the shipped golden outputs (reference tests/test_cli_inference.py:8,365-500;
goldens at Datasets/Sample_Dataset/test_DeepLIIF_results/). No pretrained
weights exist in this environment, so the test SKIPS unless a pretrained
DeepLIIF model dir is available — point DEEPLIIF_MODEL_DIR at a torch-era
dir (latest_net_G*.pth / G*.pt + train_opt.txt) or a dir produced by
`deepliif-tpu import-model`. The test is then one weights-download away
from executing.
"""

import os

import numpy as np
import pytest
from PIL import Image

GOLDEN_DIR = '/root/reference/Datasets/Sample_Dataset/test_DeepLIIF_results'
TOLERANCE = 0.0003       # 1 - SSIM, per modality (reference contract)
TOLERANCE_SEG = 0.05     # Seg exempt: CLI default seg weights differ from
                         # training-style aggregation (reference comment at
                         # test_cli_inference.py:502-506)

_CANDIDATES = [
    os.environ.get('DEEPLIIF_MODEL_DIR', ''),
    './model-server/DeepLIIF_Latest_Model',
    '/root/checkpoints/DeepLIIF_Latest_Model',
]


def _find_model_dir():
    for d in _CANDIDATES:
        if d and os.path.isdir(d) and any(
                f.startswith(('latest_net_G', 'G1', 'latest_net_G1'))
                or f.endswith('.npz') for f in os.listdir(d)):
            return d
    return None


MODEL_DIR = _find_model_dir()

pytestmark = pytest.mark.skipif(
    MODEL_DIR is None or not os.path.isdir(GOLDEN_DIR),
    reason='pretrained DeepLIIF model dir not present '
           '(set DEEPLIIF_MODEL_DIR to activate the golden-parity contract)')


def _ssim(a, b):
    from deepliif_tpu import stats
    return stats.ssim(np.asarray(a), np.asarray(b), data_range=255)


def test_bf16_golden_counts_match_f32():
    """The headline benchmark runs bf16; with pretrained weights the bf16
    path must reproduce the f32 golden cell counts exactly and stay within
    SSIM >= 0.999 of the f32 outputs per modality (round-2 VERDICT item 7;
    the always-on reduced-scale gate lives in tests/test_precision.py)."""
    from deepliif_tpu.models import infer_modalities

    src = os.path.join(GOLDEN_DIR, '22_2_real_A.png')
    if not os.path.exists(src):
        pytest.skip('golden input missing')
    img = Image.open(src).convert('RGB')
    images32, scoring32 = infer_modalities(img, 512, MODEL_DIR,
                                           precision='float32')
    images16, scoring16 = infer_modalities(img, 512, MODEL_DIR,
                                           precision='bfloat16')
    for key in ('num_total', 'num_pos', 'num_neg'):
        assert scoring16[key] == scoring32[key], (key, scoring16, scoring32)
    for name in images32:
        if name.startswith('mod') or name == 'Seg':
            s = _ssim(images16[name], images32[name])
            assert s >= 0.999, (name, s)


@pytest.mark.parametrize('stem', ['22_2_real_A', '34_3_real_A'])
def test_golden_ssim(stem):
    from deepliif_tpu.models import infer_modalities

    src = os.path.join(GOLDEN_DIR, f'{stem}.png')
    if not os.path.exists(src):
        pytest.skip(f'golden input {src} missing')
    img = Image.open(src).convert('RGB')
    images, _ = infer_modalities(img, 512, MODEL_DIR)

    # CLI names mod{i}-{Name} map to golden fake_B_{i}; Seg -> fake_B_5
    failures = []
    for name, im in images.items():
        if name.startswith('mod'):
            idx = int(name[3:].split('-')[0])
            golden = os.path.join(GOLDEN_DIR, f'{stem}_fake_B_{idx}.png')
            tol = TOLERANCE
        elif name == 'Seg':
            golden = os.path.join(GOLDEN_DIR, f'{stem}_fake_B_5.png')
            tol = TOLERANCE_SEG
        else:
            continue
        if not os.path.exists(golden):
            continue
        s = _ssim(im, Image.open(golden).convert('RGB'))
        if 1 - s >= tol:
            failures.append((name, s))
    assert not failures, f'SSIM contract violated: {failures}'
