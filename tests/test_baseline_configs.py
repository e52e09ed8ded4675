"""BASELINE configs 4 and 5 execute as written (shrunk clones on CPU).

The driver's contract is five configs; `configs/seg_brats_bf16.yaml`
(4-modality bf16 BraTS-style seg, BASELINE.json configs[3]) and
`configs/multitask_dp.yaml` (6-heatmap multitask over an 8-device
data-parallel mesh, configs[4]) must not be never-driven templates.  Each
test parses the REAL YAML through the real CLI (`-c` + documented
CLI-override semantics — only size/duration knobs are overridden, every
semantic key comes from the file as written) and drives a fit end-to-end:
4-channel input changes the first-conv shape and 4x the input-pipeline
bytes; `gpus: 8` runs the global-batch dp mesh on the virtual 8-device CPU
platform (conftest).  Full-size drives on the real chip are recorded in
docs/PERFORMANCE.md.

Reference: `/root/reference/examples/train_seg.py:122-132`,
`/root/reference/examples/train_ldmks.py:94-103`.
"""

import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

h5py = pytest.importorskip("h5py")

from tpu_mednet.cli.demo import write_dataset
from tpu_mednet.cli.train_ldmks import build_parser as ldmks_parser
from tpu_mednet.cli.train_ldmks import main as train_ldmks_main
from tpu_mednet.cli.train_seg import build_parser as seg_parser
from tpu_mednet.cli.train_seg import main as train_seg_main
from tpu_mednet.config import parse_with_config

REPO = Path(__file__).resolve().parents[1]
BRATS = REPO / "configs" / "seg_brats_bf16.yaml"
MULTITASK = REPO / "configs" / "multitask_dp.yaml"

SHRINK = ["--patch_size", "16", "16", "16", "--fmaps", "8",
          "--patches_per_subject", "4", "--max_epochs", "1",
          "--limit_train_batches", "2", "--limit_val_batches", "1"]


def _stage_data(tmp_path, monkeypatch, store, stem, fmt="h5", **demo_kw):
    """Demo store + keyfiles under $DATA with the names the YAMLs use."""
    data = tmp_path / "data"
    data.mkdir()
    write_dataset(data, fmt, n_train=4, n_val=2, n_test=0, size=32,
                  sigma=3.0, spacing=1.0, seed=0, **demo_kw)
    (data / f"data.{fmt}").rename(data / f"{store}.{fmt}")
    for src, dst in (("train.txt", f"{stem}_train.txt"),
                     ("val.txt", f"{stem}_val.txt")):
        (data / src).rename(data / dst)
    monkeypatch.setenv("DATA", str(data))
    monkeypatch.setenv("MODEL", str(tmp_path / "model"))
    return data


def _read_metrics(log_dir):
    rows = [json.loads(line)
            for line in (log_dir / "metrics.jsonl").read_text().splitlines()]
    assert rows, "no metrics logged"
    return rows


def test_seg_brats_bf16_parses_as_written(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA", "/data")
    monkeypatch.setenv("MODEL", "/model")
    hp = parse_with_config(seg_parser(), ["-c", str(BRATS)])
    assert hp.in_channels == 4 and hp.out_channels == 4
    assert hp.patch_size == [128, 128, 128]
    assert hp.class_probabilities == [0.3, 0.35, 0.35]
    assert hp.data_augmentation is True and hp.bf16 is True
    assert hp.remat == 1  # without it the step OOMs a v5e (memory.py)
    assert hp.packed is False  # z-packed at 128^3 OOMs (PERFORMANCE.md r4)
    assert hp.loss == "DICE" and hp.learning_rate == 0.0005
    assert hp.batch_size == 2 and hp.fmaps == 32 and hp.max_epochs == 150
    assert hp.data_path == "/data/brats.h5"
    assert hp.model_dir == "/model/brats"


def test_multitask_dp_parses_as_written(tmp_path, monkeypatch):
    monkeypatch.setenv("DATA", "/data")
    monkeypatch.setenv("MODEL", "/model")
    hp = parse_with_config(ldmks_parser(), ["-c", str(MULTITASK)])
    assert hp.gpus == 8 and hp.batch_size == 32
    assert hp.out_channels == 8 and hp.heatmap_group == "heatmaps"
    assert hp.loss_regression_weight == [0.001, 0.015, 0.015, 0.015,
                                         0.001, 0.001]
    assert hp.loss_class == "DICE" and hp.loss_class_weight == [0.05, 1.0]
    assert hp.loss_regression == "L2"
    assert hp.patch_size == [96, 96, 96] and hp.fmaps == 32
    assert hp.data_path == "/data/multitask.zarr"


def test_seg_brats_bf16_drives(tmp_path, monkeypatch):
    """Config 4: 4-modality store, first conv at in_channels=4, bf16,
    on-device augmentation — a real (shrunk) fit through the seg CLI."""
    _stage_data(tmp_path, monkeypatch, "brats", "brats", modalities=4,
                classes=3)
    rc = train_seg_main(["-c", str(BRATS)] + SHRINK)
    assert not rc
    model_dir = tmp_path / "model" / "brats"
    assert any(model_dir.iterdir()), "no checkpoint written"
    rows = _read_metrics(model_dir / "logs")
    assert any("train_loss" in r for r in rows)
    assert any("val_loss" in r for r in rows)
    # the 4-modality first conv really saw 4 channels: restore hparams
    from tpu_mednet.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(model_dir)
    try:
        hp = mgr.restore_hparams()
    finally:
        mgr.close()
    assert int(hp["in_channels"]) == 4 and int(hp["out_channels"]) == 4


def test_multitask_dp_drives(tmp_path, monkeypatch):
    """Config 5: 6-heatmap multitask, global batch sharded over the
    8-device 'data' mesh axis (virtual CPU devices), per-host prefetch."""
    import jax

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    # zarr store: BASELINE config 5 is "sharded ZARR patch streaming"
    _stage_data(tmp_path, monkeypatch, "multitask", "mt", fmt="zarr",
                modalities=1, n_heatmaps=6, classes=2)
    # global batch 32 -> 8 (divisible by the 8-device data axis)
    rc = train_ldmks_main(["-c", str(MULTITASK), "--batch_size", "8"]
                          + SHRINK)
    assert not rc
    model_dir = tmp_path / "model" / "multitask"
    assert any(model_dir.iterdir()), "no checkpoint written"
    rows = _read_metrics(model_dir / "logs")
    train_rows = [r for r in rows if "train_loss" in r]
    assert train_rows and all(np.isfinite(r["train_loss"])
                              for r in train_rows)
    # the reference's split scalar names (landmarks.py:80-83,164-174)
    assert any("val_class_loss" in r for r in rows)
    assert any("val_regression_loss" in r for r in rows)
