"""Data pipeline tests: synthetic zip dataset -> clip loader -> normalized
device batches (reference cityscapes.py:300-326 semantics)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from vae2_tpu.config import get_default_config
from vae2_tpu.data.loader import ClipLoader, denormalize_clips, normalize_clips
from vae2_tpu.data.video import (CityscapesSequence, IMAGENET_MEAN,
                                 IMAGENET_STD, make_dataset, split_clips)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    subprocess.run(
        [sys.executable, "tools/gen_synthetic_data.py", "--out", str(root),
         "--num-videos", "6", "--width", "64", "--height", "32"],
        check=True, cwd=os.path.dirname(os.path.dirname(__file__)))
    return str(root)


def test_dataset_shapes_and_determinism(synth_root):
    ds = CityscapesSequence(
        root=synth_root, list_path=os.path.join(synth_root, "train_list.txt"),
        crop_size=(32, 64), clip_length=3, clip_num=3, random_pos=False)
    assert len(ds) == 5  # 6 videos, int(6*0.25)=1 test -> 5 train
    clips, name = ds[0]
    assert clips.shape == (32, 64, 27)  # 9 frames x RGB
    assert clips.dtype == np.uint8
    clips2, _ = ds[0]
    np.testing.assert_array_equal(clips, clips2)  # fixed pos deterministic
    assert name.startswith("synthetic_")


def test_fixed_position_matches_reference_formula(synth_root):
    ds = CityscapesSequence(
        root=synth_root, list_path=os.path.join(synth_root, "train_list.txt"),
        crop_size=(32, 64), random_pos=False)
    # reference: max(0, 30 - 3*3 - 1) = 20 (cityscapes.py:304)
    assert ds.sample_position(30) == 20


def test_split_clips():
    x = np.arange(27)[None, None, :] * np.ones((4, 4, 1))
    clips = split_clips(x, clip_length=3, clip_num=3)
    assert len(clips) == 3
    np.testing.assert_array_equal(clips[1][0, 0], np.arange(9, 18))


def test_loader_batches_and_epoch_shuffle(synth_root):
    ds = CityscapesSequence(
        root=synth_root, list_path=os.path.join(synth_root, "train_list.txt"),
        crop_size=(32, 64), random_pos=True)
    loader = ClipLoader(ds, batch_size=2, shuffle=True, num_threads=2, seed=0,
                        drop_last=False)
    assert len(loader) == 3  # 5 items -> 2+2+1
    batches = list(loader)
    assert len(batches) == 3
    batch, names = batches[0]
    assert set(batch.keys()) == {"xt", "x2t", "x3t"}
    assert batch["xt"].shape == (2, 32, 64, 9)
    assert batch["xt"].dtype == np.uint8
    assert len(names) == 2
    assert batches[-1][0]["xt"].shape[0] == 1  # remainder batch kept

    order0 = [n for _, ns in batches for n in ns]
    loader.set_epoch(1)
    order1 = [n for _, ns in list(loader) for n in ns]
    assert sorted(order0) == sorted(order1)
    assert order0 != order1  # epoch reshuffle


def test_loader_host_sharding(synth_root):
    ds = CityscapesSequence(
        root=synth_root, list_path=os.path.join(synth_root, "train_list.txt"),
        crop_size=(32, 64))
    l0 = ClipLoader(ds, batch_size=1, shuffle=False, process_index=0,
                    process_count=2)
    l1 = ClipLoader(ds, batch_size=1, shuffle=False, process_index=1,
                    process_count=2)
    n0 = [n for _, ns in l0 for n in ns]
    n1 = [n for _, ns in l1 for n in ns]
    assert not set(n0) & set(n1)
    assert len(n0) + len(n1) == len(ds)


def test_normalize_clips_matches_reference_math():
    x = np.random.RandomState(0).randint(0, 256, (2, 4, 4, 9), np.uint8)
    out = np.asarray(normalize_clips(x))
    mean = np.tile(IMAGENET_MEAN, 3)
    std = np.tile(IMAGENET_STD, 3)
    expected = (x.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out, expected, rtol=1e-6)
    # round trip
    back = np.asarray(denormalize_clips(out))
    np.testing.assert_allclose(back, x.astype(np.float32), atol=1e-3)


@pytest.fixture(scope="module")
def ucf_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ucf")
    subprocess.run(
        [sys.executable, "tools/gen_synthetic_data.py", "--out", str(root),
         "--num-videos", "4", "--width", "64", "--height", "32",
         "--layout", "ucf"],
        check=True, cwd=os.path.dirname(os.path.dirname(__file__)))
    return str(root)


def test_ucf_dataset(ucf_root):
    from vae2_tpu.data.video import UcfSequence

    ds = UcfSequence(
        root=ucf_root, list_path=os.path.join(ucf_root, "train_list.txt"),
        crop_size=(32, 64), clip_length=3, clip_num=3, random_pos=False,
        fixed_length=True)
    assert len(ds) == 3
    clips, name = ds[0]
    assert clips.shape == (32, 64, 27)
    assert clips.dtype == np.uint8
    assert name.startswith("v_synth_")
    # eval position keeps a margin of 3 for non-baseline (ucf101.py:102)
    assert ds.sample_position(30) == 20


def test_make_dataset_from_config(synth_root):
    cfg = get_default_config()
    cfg.DATASET.ROOT = synth_root
    cfg.TRAIN.IMAGE_SIZE = [64, 32]
    ds = make_dataset(cfg, os.path.join(synth_root, "test_list.txt"),
                      random_pos=False)
    assert isinstance(ds, CityscapesSequence)
    clips, _ = ds[0]
    assert clips.shape == (32, 64, 27)
