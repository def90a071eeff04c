"""Offline tooling: augmentation, dataset builders, stain deconvolution,
registration."""

import os

import numpy as np
import pytest
from PIL import Image

from deepliif_tpu.utils.augmentation import (Augmentation, augment_dataset,
                                             create_training_dataset_from_stains,
                                             stain_deconvolution)
from deepliif_tpu.utils.registration import (apply_affine, register_pair,
                                             register_translation)


def test_augmentation_coupled_and_shapes():
    rng = np.random.default_rng(0)
    imgs = {i: rng.integers(0, 255, (96, 96, 3), np.uint8) for i in range(3)}
    aug = Augmentation(dict(imgs), tile_size=96, rng=np.random.RandomState(1))
    out = aug.pipeline()
    assert set(out) == set(imgs)
    for v in out.values():
        assert v.shape == (96, 96, 3)
    # deterministic under fixed rng
    out2 = Augmentation(dict(imgs), tile_size=96,
                        rng=np.random.RandomState(1)).pipeline()
    for k in out:
        np.testing.assert_array_equal(out[k], out2[k])


def test_stain_deconvolution_separates_dab():
    # pure DAB-brown pixels should activate the D channel more than H
    brown = np.full((8, 8, 3), (120, 80, 40), np.uint8)
    h, e, d = stain_deconvolution(brown)
    assert d.mean() > 0


def test_dataset_builder_and_augment(tmp_path):
    rng = np.random.default_rng(2)
    src = tmp_path / 'src'
    src.mkdir()
    for stain in ('IHC', 'DAPI', 'Hema', 'Lap2', 'Marker', 'Seg'):
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), np.uint8)).save(
            src / f'a_{stain}.png')
    out = tmp_path / 'ds'
    n = create_training_dataset_from_stains(str(src), str(out), tile_size=48,
                                            subsets={'train': 1.0})
    assert n == 1
    row = np.asarray(Image.open(out / 'train' / 'a.png'))
    assert row.shape == (48, 48 * 6, 3)
    aug_out = tmp_path / 'aug'
    na = augment_dataset(str(out / 'train'), str(aug_out), aug_no=2)
    assert na == 2 and len(os.listdir(aug_out)) == 3


def test_registration_recovers_translation():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (96, 96, 3), np.uint8)
    moved = np.roll(np.roll(base, 5, axis=0), -9, axis=1)
    dx, dy, score = register_translation(base, moved)
    assert (dx, dy) == (9, -5)
    assert score > 0.9
    aligned, info = register_pair(base, moved)
    assert aligned.size == (96, 96)


def test_apply_affine_translate():
    img = Image.fromarray(np.full((10, 10, 3), 200, np.uint8))
    out = np.asarray(apply_affine(img, translate=(3, 2), output_size=(10, 10)))
    assert (out[:2] == 0).all()        # shifted down by 2
    assert (out[2:, 3:] == 200).all()


# ---------------------------------------------------------------------------
# round 2: benchmark-dataset readers + log-area error maps + visualize replay
# ---------------------------------------------------------------------------

def test_pathonet_points_reader(tmp_path):
    from deepliif_tpu.stats.adapters import read_pathonet_points
    pts = tmp_path / 'img_points.txt'
    np.savetxt(pts, [[10, 20, 1], [30, 40, 2], [50, 60, 1]])
    pos, neg = read_pathonet_points(str(pts))
    assert neg == [(10, 20), (50, 60)]
    assert pos == [(30, 40)]


def test_bcdata_points_npy_fallback(tmp_path):
    from deepliif_tpu.stats.adapters import read_bcdata_points, points_to_mask
    np.save(tmp_path / 'pos.npy', np.array([[5, 7], [9, 11]]))
    np.save(tmp_path / 'neg.npy', np.array([[1, 2]]))
    pos, neg = read_bcdata_points(str(tmp_path / 'pos.npy'),
                                  str(tmp_path / 'neg.npy'))
    assert pos == [(5, 7), (9, 11)] and neg == [(1, 2)]
    mask = points_to_mask(pos, (16, 16))
    assert mask[7, 5] == 255 and mask[11, 9] == 255
    assert mask.sum() == 2 * 255


def test_bcdata_points_native_h5(tmp_path):
    """The primary BCData path: real .h5 annotation files (reference
    HelperFunctions.py:51-66 reads f['coordinates'] via h5py)."""
    h5py = pytest.importorskip('h5py')
    from deepliif_tpu.stats.adapters import read_bcdata_points
    with h5py.File(tmp_path / 'pos.h5', 'w') as f:
        f.create_dataset('coordinates', data=np.array([[5, 7], [9, 11]]))
    with h5py.File(tmp_path / 'neg.h5', 'w') as f:
        f.create_dataset('coordinates', data=np.array([[1, 2]]))
    pos, neg = read_bcdata_points(str(tmp_path / 'pos.h5'),
                                  str(tmp_path / 'neg.h5'))
    assert pos == [(5, 7), (9, 11)] and neg == [(1, 2)]


def test_nuclick_mask_reader(tmp_path):
    from deepliif_tpu.stats.adapters import read_nuclick_mask
    lab = np.zeros((32, 32), np.int32)
    lab[4:12, 4:12] = 1
    lab[16:28, 10:22] = 2
    np.save(tmp_path / 'm.npy', lab)
    rgb = read_nuclick_mask(str(tmp_path / 'm.npy'))
    assert rgb.shape == (32, 32, 3)
    # interior blue, boundary white, background black
    assert tuple(rgb[8, 8]) == (0, 0, 255)
    assert tuple(rgb[4, 4]) == (255, 255, 255)
    assert tuple(rgb[0, 0]) == (0, 0, 0)


def test_instance_mask_dir_reader(tmp_path):
    from deepliif_tpu.stats.adapters import read_instance_mask_dir
    from PIL import Image
    # layout '<image>_<class>_<score>.png' (image name = parts[:-2])
    for cls, score, box in (('1', '0.90', (2, 10)), ('2', '0.85', (20, 28))):
        img = np.zeros((32, 32, 3), np.uint8)
        img[box[0]:box[1], box[0]:box[1]] = 255
        Image.fromarray(img).save(tmp_path / f'case_A_7_{cls}_{score}.png')
    seg = read_instance_mask_dir(str(tmp_path), 32, mode='segmentation')
    assert list(seg) == ['case_A_7']
    m = seg['case_A_7']
    assert m['positive'][5, 5] == 1 and m['negative'][25, 25] == 1
    det = read_instance_mask_dir(str(tmp_path), 32, mode='detection')
    assert det['case_A_7']['positive'] == [(5, 5)]
    assert det['case_A_7']['negative'] == [(23, 23)]


def test_log_area_error_map():
    from deepliif_tpu.stats.adapters import (log_area_error_map,
                                             log_area_colormap_legend)
    pred = np.zeros((32, 32, 3), np.uint8)
    gt = np.zeros((32, 32, 3), np.uint8)
    # matched same-size positive cell -> red
    pred[2:8, 2:8, 0] = 255
    gt[2:8, 2:8, 0] = 255
    # unmatched positive cell -> yellow sentinel
    pred[20:24, 20:24, 0] = 255
    # negative cell predicted 4x larger than gt -> dark blue shade
    pred[10:18, 10:18, 2] = 255
    gt[12:14, 12:14, 2] = 255
    out = log_area_error_map(pred, gt)
    assert tuple(out[4, 4]) == (255, 0, 0)        # exact match, positive
    assert tuple(out[21, 21]) == (255, 255, 0)    # unmatched
    b = out[11, 11]
    assert b[2] > 0 and b[0] == 0 and b[2] < 255  # overpredicted negative
    legend = log_area_colormap_legend('positive')
    assert legend.shape == (100, 400, 3)


def test_visualize_replays_image_grid(tmp_path):
    """The remote pickle now carries the visuals; replay writes the gallery
    (reference visualizer.py:90-161 + cli.py:1018-1052)."""
    import pickle
    from deepliif_tpu.cli import replay_display_snapshot
    rng = np.random.default_rng(0)
    disp = {'epoch': 3,
            'visuals': {'real_A': rng.integers(0, 255, (16, 16, 3), np.uint8),
                        'fake_B_1': rng.integers(0, 255, (16, 16, 3), np.uint8)}}
    with open(tmp_path / 'display_current_results.pickle', 'wb') as f:
        pickle.dump(disp, f)
    replay_display_snapshot(str(tmp_path), disp)
    assert (tmp_path / 'web' / 'images' / 'epoch003_real_A.png').exists()
    assert (tmp_path / 'web' / 'index.html').exists()


def test_visualizer_snapshot_contains_images(tmp_path):
    """display_current_results remote snapshots must carry the image data."""
    import pickle
    from types import SimpleNamespace
    from deepliif_tpu.utils.visualizer import Visualizer
    opt = SimpleNamespace(checkpoints_dir=str(tmp_path), name='exp',
                          remote=True, remote_transfer_cmd=None)
    vis = Visualizer(opt)
    rng = np.random.default_rng(1)
    vis.display_current_results(
        {'real_A': rng.integers(0, 255, (8, 8, 3), np.uint8)}, 1, True)
    p = tmp_path / 'exp' / 'pickle' / 'display_current_results.pickle'
    with open(p, 'rb') as f:
        snap = pickle.load(f)
    assert snap['epoch'] == 1
    assert snap['visuals']['real_A'].shape == (8, 8, 3)


def test_multichannel_ome_roundtrip_and_dataset_builder(tmp_path):
    """write_ome_multichannel_tiff channels read back exactly per page, and
    the OME->training-tiles builder tiles them with DAPI gating (reference
    Image_Processing_Helper_Functions.py:451-521)."""
    from deepliif_tpu.utils.tiff import (TiledTiffReader,
                                         write_ome_multichannel_tiff)
    from deepliif_tpu.utils.augmentation import (
        create_dataset_from_multichannel_ome)

    rng = np.random.default_rng(0)
    C, H, W = 5, 96, 128
    stack = rng.integers(1, 255, (C, H, W), np.uint8)
    stack[0, :48] = 0  # DAPI empty in the top half -> those tiles skipped
    ome_dir = tmp_path / 'omes'
    ome_dir.mkdir()
    p = str(ome_dir / 'case1.ome.tiff')
    write_ome_multichannel_tiff(p, stack,
                                channel_names=['DAPI', 'Lap2', 'R', 'G', 'B'])

    r = TiledTiffReader(p)
    assert len(r.pages) == C
    assert 'DAPI' in (r.read_description() or '')
    for c in range(C):
        np.testing.assert_array_equal(
            r.read_region(0, 0, W, H, level=c)[:, :, 0], stack[c])
    r.close()

    out = tmp_path / 'tiles'
    n = create_dataset_from_multichannel_ome(
        str(ome_dir), str(out), tile_size=48,
        img_channel_modality={'DAPI': 0, 'Lap2': 1, 'IHC': [2, 3, 4]})
    files = sorted(os.listdir(out))
    # bottom row of 48px tiles has DAPI content; top row skipped
    assert n == 2, files
    assert any(f.endswith('_IHC.png') for f in files)
    from PIL import Image as _I
    ihc = np.asarray(_I.open(out / [f for f in files if 'IHC' in f][0]))
    assert ihc.shape == (48, 48, 3)


def test_register_cli_auto_and_manual(tmp_path):
    """`deepliif-tpu register` — headless equivalent of the reference's
    Tk registration app (Registration/Registration_App.py:22-281): auto
    FFT phase-correlation recovers a known shift; manual controls apply
    an explicit transform."""
    import json
    import subprocess
    import sys
    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (96, 96, 3), np.uint8)
    shifted = np.roll(base, (7, -5), axis=(0, 1))
    Image.fromarray(base).save(tmp_path / 'fixed.png')
    Image.fromarray(shifted).save(tmp_path / 'moving.png')
    env = {'JAX_PLATFORMS': 'cpu', 'PATH': '/usr/bin:/bin:/opt/venv/bin'}
    out = tmp_path / 'aligned.png'
    res = subprocess.run(
        [sys.executable, '-m', 'deepliif_tpu.cli', 'register',
         '--fixed', str(tmp_path / 'fixed.png'),
         '--moving', str(tmp_path / 'moving.png'), '--output', str(out)],
        capture_output=True, text=True, cwd='/root/repo', timeout=180,
        env=env)
    assert res.returncode == 0, res.stderr[-500:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert (info['dx'], info['dy']) == (5, -7)
    aligned = np.asarray(Image.open(out))
    h, w = base.shape[:2]
    np.testing.assert_array_equal(aligned[10:h - 10, 10:w - 10],
                                  base[10:h - 10, 10:w - 10])
    res2 = subprocess.run(
        [sys.executable, '-m', 'deepliif_tpu.cli', 'register',
         '--fixed', str(tmp_path / 'fixed.png'),
         '--moving', str(tmp_path / 'moving.png'),
         '--output', str(out), '--translate', '5,-7'],
        capture_output=True, text=True, cwd='/root/repo', timeout=180,
        env=env)
    assert res2.returncode == 0, res2.stderr[-500:]
    info2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert info2['scale'] == 1.0 and (info2['dx'], info2['dy']) == (5, -7)
