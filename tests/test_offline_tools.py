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
