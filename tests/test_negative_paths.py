"""Negative-path audit of the config/data seam (VERDICT r4 item 8).

Every config-vs-data or config-vs-config mismatch a new user can hit must
die with a named-flag/named-subject message — not a backend traceback and
never silent corruption.  The silent case was real: numpy slicing
truncates out-of-range crops, so a shape-mismatched label volume used to
produce wrong-shaped label patches without any error.
"""

import argparse

import h5py
import numpy as np
import pytest

from tpu_mednet.config import validate_task_config
from tpu_mednet.data.patch_sampler import PatchSampler
from tpu_mednet.data.readers import HDF5Reader, MemoryReader


@pytest.fixture()
def store(tmp_path):
    path = tmp_path / "neg.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("images/s0", data=np.zeros((1, 24, 24, 24), np.float16))
        f.create_dataset("labels/s0", data=np.zeros((1, 24, 24, 24), np.uint8))
        f.create_dataset("heatmaps/s0", data=np.zeros((2, 24, 24, 24), np.uint8))
        f.create_dataset("images/s1", data=np.zeros((1, 24, 24, 24), np.float16))
        f.create_dataset("labels/s1", data=np.zeros((1, 16, 16, 16), np.uint8))
        f.create_dataset("heatmaps/s1", data=np.zeros((2, 16, 16, 16), np.uint8))
    return path


# -- reader: missing keys / groups die with named context ------------------


def test_missing_subject_names_store_group_and_key(store):
    with pytest.raises(KeyError, match="'missing' not found in group 'images'"):
        PatchSampler(store, ["s0", "missing"], 1, (16, 16, 16))


def test_missing_subject_lists_available_keys(store):
    r = HDF5Reader(store)
    with pytest.raises(KeyError, match="stale keyfile") as exc:
        list(r.read(["nope"], "images"))
    assert "s0" in str(exc.value)  # example keys shown
    r.close()


def test_missing_group_names_flags_and_groups(store):
    r = HDF5Reader(store)
    with pytest.raises(KeyError, match="--image_group") as exc:
        r.get_data_shape(["s0"], "imagez")
    assert "images" in str(exc.value)
    r.close()


def test_memory_reader_missing_subject(store):
    r = MemoryReader({"images": {"s0": np.zeros((1, 8, 8, 8))}})
    with pytest.raises(KeyError, match="'s9' not found in group 'images'"):
        r.get_data_shape(["s9"], "images")


# -- sampler: per-subject shape mismatches are errors, never silent --------


def test_label_shape_mismatch_fails_fast(store):
    with pytest.raises(ValueError, match="'s1'.*label volume extent"):
        PatchSampler(store, ["s0", "s1"], 1, (16, 16, 16))


def test_heatmap_shape_mismatch_fails_fast(tmp_path):
    path = tmp_path / "hm.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("images/s0", data=np.zeros((1, 24, 24, 24), np.float16))
        f.create_dataset("labels/s0", data=np.zeros((1, 24, 24, 24), np.uint8))
        f.create_dataset("heatmaps/s0", data=np.zeros((2, 16, 16, 16), np.uint8))
    with pytest.raises(ValueError, match="'s0'.*heatmap volume extent"):
        PatchSampler(path, ["s0"], 1, (16, 16, 16), heatmap_group="heatmaps")


def test_device_sampler_shape_mismatch_fails_fast(store):
    from tpu_mednet.data.device_sampler import DevicePatchSampler

    with pytest.raises(ValueError, match="'s1'.*label volume extent"):
        DevicePatchSampler(store, ["s0", "s1"], 1, (16, 16, 16))


def test_matching_store_still_loads(store):
    s = PatchSampler(store, ["s0"], 2, (16, 16, 16),
                     heatmap_group="heatmaps")
    out = s.sample(0)
    assert out["data"].shape == (1, 16, 16, 16)
    assert out["label"].shape == (3, 16, 16, 16)  # 2 heatmaps + class map


# -- config-vs-config: named-flag SystemExit before any jit ----------------


def _hp(**kw):
    ns = argparse.Namespace(batch_size=8, out_channels=3, loss_weight=None,
                            class_probabilities=None)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_seg_loss_weight_length_vs_out_channels():
    with pytest.raises(SystemExit, match="--loss_weight has 2 entries.*--out_channels is 3"):
        validate_task_config(_hp(loss_weight=[1.0, 2.0]), "seg")
    validate_task_config(_hp(loss_weight=[1.0, 2.0, 3.0]), "seg")


def test_ldmk_out_channels_must_exceed_heatmaps():
    hp = _hp(out_channels=3, loss_regression_weight=[0.1] * 3,
             loss_class_weight=None)
    with pytest.raises(SystemExit, match="--out_channels 3 must exceed"):
        validate_task_config(hp, "ldmk")


def test_ldmk_class_weight_length_vs_class_head():
    hp = _hp(out_channels=8, loss_regression_weight=[0.1] * 6,
             loss_class_weight=[0.05, 1.0, 1.0])
    with pytest.raises(SystemExit, match="--loss_class_weight has 3 entries"):
        validate_task_config(hp, "ldmk")
    hp.loss_class_weight = [0.05, 1.0]
    validate_task_config(hp, "ldmk")


def test_class_probabilities_length_vs_classes(caplog):
    import logging

    # MORE entries than classes: probabilities for classes the model
    # cannot output — refused
    with pytest.raises(SystemExit, match="--class_probabilities has 4 entries"):
        validate_task_config(
            _hp(class_probabilities=[0.25, 0.25, 0.25, 0.25]), "seg")
    validate_task_config(_hp(class_probabilities=[0.2, 0.4, 0.4]), "seg")
    # FEWER is a meaningful center-sampling choice (seg_brats_bf16.yaml
    # ships 3 entries for 4 classes) — warned, not refused
    with caplog.at_level(logging.WARNING):
        validate_task_config(_hp(class_probabilities=[0.5, 0.5]), "seg")
    assert "never be drawn as patch centers" in caplog.text
    # ldmk: classes = out_channels - heatmaps
    hp = _hp(out_channels=8, loss_regression_weight=[0.1] * 6,
             loss_class_weight=None, class_probabilities=[0.5, 0.5])
    validate_task_config(hp, "ldmk")


def test_batch_size_vs_mesh():
    with pytest.raises(SystemExit, match="--batch_size 9 is not divisible"):
        validate_task_config(_hp(batch_size=9), "seg", n_data=4)
    validate_task_config(_hp(batch_size=8), "seg", n_data=4)
    validate_task_config(_hp(batch_size=9), "seg", n_data=1)


# -- CLI e2e: the ldmk store-vs-config heatmap count check -----------------


def test_train_ldmks_heatmap_count_mismatch(store, tmp_path):
    from tpu_mednet.cli.train_ldmks import main

    keys = tmp_path / "keys.txt"
    keys.write_text("s0\n")
    with pytest.raises(SystemExit, match="2 heatmap channels.*3 entries"):
        main([
            "--data_path", str(store), "--train_set", str(keys),
            "--model_dir", str(tmp_path / "m"),
            "--patch_size", "16", "16", "16",
            "--out_channels", "5", "--loss_regression_weight", "0.1", "0.1",
            "0.1", "--loss_class_weight", "0.05", "1.0",
            "--max_epochs", "1",
        ])
