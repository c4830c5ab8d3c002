"""RawPatchReader: pad-by-repetition / uniform-subsample semantics on a fake slide."""

import os

import numpy as np
import pytest

from sml_tpu.data.datasets import RawPatchReader


@pytest.fixture()
def fake_slide(tmp_path):
    from PIL import Image

    cohort = tmp_path / "cohort"
    wsi_root = tmp_path / "wsi"
    (cohort / "read_details").mkdir(parents=True)
    slide = "S0"
    sdir = wsi_root / slide
    sdir.mkdir(parents=True)
    coords = np.array([[i, i * 10] for i in range(3)], dtype=object)
    np.save(cohort / "read_details" / f"{slide}.npy",
            np.array([coords], dtype=object), allow_pickle=True)
    for i in range(3):
        img = np.full((224, 224, 3), i * 40, np.uint8)
        Image.fromarray(img).save(sdir / f"{i}_{i * 10}.jpg")
    return str(cohort), str(wsi_root), slide


def test_pad_by_repetition(fake_slide):
    cohort, wsi_root, slide = fake_slide
    reader = RawPatchReader(cohort, wsi_root, fixdim=8)
    bag = reader(slide)
    assert bag.shape == (8, 224 * 224 * 3)
    # 3 patches -> 2 full copies + first 2: pattern 0,1,2,0,1,2,0,1 by mean value
    means = bag.mean(axis=1)
    expected_idx = [0, 1, 2, 0, 1, 2, 0, 1]
    base = [means[0], means[1], means[2]]
    for pos, e in enumerate(expected_idx):
        assert abs(means[pos] - base[e]) < 1e-6
    assert bag.max() <= 1.0 and bag.min() >= 0.0


def test_uniform_subsample(fake_slide):
    cohort, wsi_root, slide = fake_slide
    reader = RawPatchReader(cohort, wsi_root, fixdim=2)
    bag = reader(slide)
    assert bag.shape == (2, 224 * 224 * 3)
