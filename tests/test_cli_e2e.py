"""End-to-end CLI tests: train_seg -> checkpoint -> predict on synthetic HDF5.

The CLI-level analogue of BASELINE config 1 (tiny U-Net, one small volume,
CPU) plus the sliding-window predict flow of config 3.
"""

import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import yaml

h5py = pytest.importorskip("h5py")

from tpu_mednet.cli.predict import main as predict_main
from tpu_mednet.cli.train_ldmks import main as train_ldmks_main
from tpu_mednet.cli.train_seg import main as train_seg_main


@pytest.fixture
def workspace(tmp_path):
    """Synthetic dataset: 3 subjects with a bright class-1 cube + heatmaps."""
    rng = np.random.default_rng(0)
    data_path = tmp_path / "data.h5"
    shape = (32, 32, 32)
    with h5py.File(data_path, "w") as hf:
        for i in range(3):
            img = rng.normal(0, 0.1, size=(1, *shape)).astype(np.float32)
            lbl = np.zeros((1, *shape), dtype=np.uint8)
            lbl[0, 8:20, 8:20, 8:20] = 1
            img[0, 8:20, 8:20, 8:20] += 2.0
            hm = np.zeros((2, *shape), dtype=np.uint8)
            hm[0, 10:14, 10:14, 10:14] = 200
            hm[1, 16:20, 16:20, 16:20] = 200
            ds = hf.create_dataset(f"images/subj{i}", data=img)
            ds.attrs["affine"] = np.eye(4)
            hf.create_dataset(f"labels/subj{i}", data=lbl)
            hf.create_dataset(f"heatmaps/subj{i}", data=hm)
    (tmp_path / "train.txt").write_text("subj0\nsubj1\n")
    (tmp_path / "val.txt").write_text("subj2\n")
    return tmp_path


def seg_args(ws, **extra):
    args = {
        "data_path": str(ws / "data.h5"),
        "train_set": str(ws / "train.txt"),
        "val_set": str(ws / "val.txt"),
        "model_dir": str(ws / "model"),
        "log_dir": str(ws / "logs"),
        "patch_size": [16, 16, 16],
        "patches_per_subject": 2,
        "max_epochs": 1,
        "batch_size": 2,
        "fmaps": 4,
        "in_channels": 1,
        "out_channels": 2,
        "loss": "CE",
        "learning_rate": 0.001,
        "no_bf16": True,
    }
    args.update(extra)
    argv = []
    for k, v in args.items():
        if isinstance(v, bool):
            if v:
                argv.append(f"--{k}")
        elif isinstance(v, list):
            argv.append(f"--{k}")
            argv.extend(str(x) for x in v)
        else:
            argv.extend([f"--{k}", str(v)])
    return argv


def test_train_seg_cli_end_to_end(workspace):
    rc = train_seg_main(seg_args(workspace))
    assert rc == 0
    # metrics written with the reference scalar names
    metrics = [
        json.loads(l)
        for l in (workspace / "logs" / "metrics.jsonl").read_text().splitlines()
    ]
    keys = set().union(*[set(m) for m in metrics])
    assert {"train_loss", "val_loss", "val_dice0", "val_dice1"} <= keys
    # checkpoint directory has a step
    assert any((workspace / "model").iterdir())


def test_train_seg_cli_with_yaml_config(workspace):
    cfg = {
        "data_path": str(workspace / "data.h5"),
        "train_set": str(workspace / "train.txt"),
        "val_set": str(workspace / "val.txt"),
        "model_dir": str(workspace / "model2"),
        "log_dir": str(workspace / "logs2"),
        "patch_size": [16, 16, 16],
        "patches_per_subject": 2,
        "max_epochs": 1,
        "batch_size": 2,
        "fmaps": 4,
        "out_channels": 2,
        "loss": "DICE",
    }
    cfg_path = workspace / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    # CLI override beats the config file (ConfigArgParse merge semantics)
    rc = train_seg_main(["-c", str(cfg_path), "--max_epochs", "1", "--no_bf16"])
    assert rc == 0
    assert (workspace / "logs2" / "metrics.jsonl").exists()


def test_predict_cli_end_to_end(workspace):
    train_seg_main(seg_args(workspace))
    (workspace / "test.txt").write_text("subj0\nsubj2\n")
    pred_cfg = {
        "base": {"data": str(workspace / "data.h5"), "image_group": "images",
                 "sigma": None},
        "prediction": {
            "test_set": str(workspace / "test.txt"),
            "patch_size": [16, 16, 16],
            "patch_overlap": [4, 4, 4],
            "channel_selection": None,
            "batch_size": 4,
            "data": str(workspace / "pred.h5"),
            "group": "prediction",
            "checkpoint": str(workspace / "model"),
            "chunk_size": 2,
            "model": "SegmentationNet",
        },
    }
    cfg_path = workspace / "predict.yaml"
    cfg_path.write_text(yaml.safe_dump(pred_cfg))
    rc = predict_main(["-c", str(cfg_path)])
    assert rc == 0
    with h5py.File(workspace / "pred.h5") as hf:
        for key in ["subj0", "subj2"]:
            seg = hf[f"prediction/{key}"][:]
            assert seg.shape == (1, 32, 32, 32)
            assert seg.dtype == np.uint8
            assert np.asarray(hf[f"prediction/{key}"].attrs["affine"]).shape == (4, 4)

    # same predict, zarr output store (reference predict.py:100-115's other
    # branch; runs on the bundled zarrlite store when zarr is absent) —
    # reuses the checkpoint and jit cache, then must match the h5 results
    rc = predict_main(["-c", str(cfg_path),
                       f"prediction.data={workspace / 'pred.zarr'}"])
    assert rc == 0
    from tpu_mednet.data.readers import ZarrReader
    zr = ZarrReader(workspace / "pred.zarr")
    vols = list(zr.read(["subj0", "subj2"], "prediction", dtype=np.uint8))
    with h5py.File(workspace / "pred.h5") as hf:
        for key, vol in zip(["subj0", "subj2"], vols):
            np.testing.assert_array_equal(vol, hf[f"prediction/{key}"][:])
    affs = zr.get_data_attribute(["subj0"], "prediction", "affine")
    assert np.asarray(affs["subj0"]).shape == (4, 4)

    # prediction.landmarks on a segmentation checkpoint is refused (no
    # heatmap channels to read coordinates out of)
    with pytest.raises(ValueError, match="no heatmap channels"):
        predict_main(["-c", str(cfg_path),
                      f"prediction.landmarks={workspace / 'lm.json'}"])


def test_train_ldmks_cli_end_to_end(workspace):
    argv = seg_args(
        workspace,
        model_dir=str(workspace / "model_ldmk"),
        log_dir=str(workspace / "logs_ldmk"),
        out_channels=4,  # 2 heatmaps + 2 classes
    )
    # swap seg-only flags for landmark flags
    argv = [a for a in argv if a not in ("--loss", "CE")]
    argv += ["--loss_class", "DICE", "--loss_regression", "L2",
             "--loss_regression_weight", "0.01", "0.01",
             "--heatmap_group", "heatmaps"]
    rc = train_ldmks_main(argv)
    assert rc == 0
    metrics = [
        json.loads(l)
        for l in (workspace / "logs_ldmk" / "metrics.jsonl").read_text().splitlines()
    ]
    keys = set().union(*[set(m) for m in metrics])
    assert {"train_loss", "class_loss", "regression_loss",
            "val_class_loss", "val_regression_loss"} <= keys


def test_predict_cli_device_stitch_matches_crop(workspace):
    train_seg_main(seg_args(workspace))
    (workspace / "test.txt").write_text("subj0\n")
    base_cfg = {
        "base": {"data": str(workspace / "data.h5"), "image_group": "images",
                 "sigma": None},
        "prediction": {
            "test_set": str(workspace / "test.txt"),
            "patch_size": [16, 16, 16],
            "patch_overlap": [4, 4, 4],
            "channel_selection": None,
            "batch_size": 4,
            "data": str(workspace / "pred_crop.h5"),
            "group": "prediction",
            "checkpoint": str(workspace / "model"),
            "chunk_size": 2,
            "model": "SegmentationNet",
        },
    }
    cfg_path = workspace / "predict2.yaml"
    cfg_path.write_text(yaml.safe_dump(base_cfg))
    assert predict_main(["-c", str(cfg_path)]) == 0
    assert predict_main(["-c", str(cfg_path), "prediction.stitch=device",
                         f"prediction.data={workspace/'pred_dev.h5'}"]) == 0
    with h5py.File(workspace / "pred_crop.h5") as a, \
            h5py.File(workspace / "pred_dev.h5") as b:
        np.testing.assert_array_equal(a["prediction/subj0"][:],
                                      b["prediction/subj0"][:])


def test_predict_cli_tta(workspace):
    """prediction.tta=true: mirror TTA engages in the device stitch mode and
    matches the library-level tta_flips oracle."""
    import types
    from tpu_mednet.cli.predict import _coerce
    from tpu_mednet.data.readers import HDF5Reader
    from tpu_mednet.inference.device_sliding import predict_volumes_on_device
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.train import create_train_state, load_for_inference
    from tpu_mednet.train.checkpoint import CheckpointManager

    train_seg_main(seg_args(workspace))
    (workspace / "test.txt").write_text("subj0\n")
    cfg = {
        "base": {"data": str(workspace / "data.h5"), "image_group": "images",
                 "sigma": None},
        "prediction": {
            "test_set": str(workspace / "test.txt"),
            "patch_size": [16, 16, 16],
            "patch_overlap": [4, 4, 4],
            "channel_selection": None,
            "batch_size": 4,
            "data": str(workspace / "pred_tta.h5"),
            "group": "prediction",
            "checkpoint": str(workspace / "model"),
            "chunk_size": 2,
            "model": "SegmentationNet",
            "stitch": "device",
            "tta": True,
        },
    }
    cfg_path = workspace / "predict_tta.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    assert predict_main(["-c", str(cfg_path)]) == 0

    mgr = CheckpointManager(str(workspace / "model"))
    hp = mgr.restore_hparams()
    mgr.close()
    task = SegmentationTask.from_hparams(
        types.SimpleNamespace(**{k: _coerce(v) for k, v in hp.items()})
    )
    template = create_train_state(
        task.model, (1, 16, 16, 16, task.model.config.in_channels), 1e-3
    )
    variables, _ = load_for_inference(str(workspace / "model"), template)
    ref = predict_volumes_on_device(
        task, variables, str(workspace / "data.h5"), ["subj0"],
        patch_size=[16, 16, 16], patch_overlap=[4, 4, 4], batch_size=4,
        reader_cls=HDF5Reader, tta_flips=(0, 1, 2),
    )
    with h5py.File(workspace / "pred_tta.h5") as f:
        np.testing.assert_array_equal(
            f["prediction/subj0"][:], np.asarray(ref["subj0"])
        )


def test_predict_cli_gaussian_stitch(workspace):
    """stitch=gaussian runs the on-device weighted path end-to-end and
    matches the host-accumulation oracle."""
    from tpu_mednet.inference.weighted import predict_volumes_weighted
    from tpu_mednet.data.readers import HDF5Reader

    train_seg_main(seg_args(workspace))
    (workspace / "test.txt").write_text("subj0\n")
    cfg = {
        "base": {"data": str(workspace / "data.h5"), "image_group": "images",
                 "sigma": None},
        "prediction": {
            "test_set": str(workspace / "test.txt"),
            "patch_size": [16, 16, 16],
            "patch_overlap": [4, 4, 4],
            "channel_selection": None,
            "batch_size": 4,
            "data": str(workspace / "pred_gauss.h5"),
            "group": "prediction",
            "checkpoint": str(workspace / "model"),
            "chunk_size": 2,
            "model": "SegmentationNet",
            "stitch": "gaussian",
        },
    }
    cfg_path = workspace / "predict_gauss.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    assert predict_main(["-c", str(cfg_path)]) == 0

    # host-accumulation oracle on the same checkpoint
    import types
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.train import create_train_state, load_for_inference
    from tpu_mednet.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(workspace / "model"))
    hp = mgr.restore_hparams()
    mgr.close()
    from tpu_mednet.cli.predict import _coerce
    task = SegmentationTask.from_hparams(
        types.SimpleNamespace(**{k: _coerce(v) for k, v in hp.items()})
    )
    template = create_train_state(
        task.model, (1, 16, 16, 16, task.model.config.in_channels), 1e-3
    )
    variables, _ = load_for_inference(str(workspace / "model"), template)
    ref = predict_volumes_weighted(
        task, variables, str(workspace / "data.h5"), ["subj0"],
        patch_size=[16, 16, 16], patch_overlap=[4, 4, 4], batch_size=4,
        reader_cls=HDF5Reader, pad_mode="constant",
    )
    with h5py.File(workspace / "pred_gauss.h5") as f:
        np.testing.assert_array_equal(
            f["prediction/subj0"][:], np.asarray(ref["subj0"])
        )


def test_export_serving_cli_end_to_end(workspace, tmp_path):
    """train_seg -> mednet-export-serving -> deserialize -> call == predict."""
    train_seg_main(seg_args(workspace))
    from tpu_mednet.cli.export_serving import main as export_main

    artifact = tmp_path / "model.jaxep"
    rc = export_main([
        "--checkpoint", str(workspace / "model"),
        "--out", str(artifact),
        "--patch_size", "16", "16", "16",
    ])
    assert rc == 0 and artifact.stat().st_size > 0

    # serve-side: only jax + the bytes
    import jax
    import jax.numpy as jnp
    loaded = jax.export.deserialize(artifact.read_bytes())
    with h5py.File(workspace / "data.h5") as hf:
        img = hf["images/subj0"][:, :16, :16, :16]
    x = jnp.asarray(np.moveaxis(img, 0, -1)[None].astype(np.float32))
    out = np.asarray(loaded.call(x))
    assert out.shape == (1, 16, 16, 16, 1) and out.dtype == np.uint8

    # equals the in-process predict step on the same checkpoint
    import types
    from tpu_mednet.cli.predict import _coerce
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.train import create_train_state, load_for_inference
    from tpu_mednet.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(workspace / "model"))
    hp = mgr.restore_hparams()
    mgr.close()
    task = SegmentationTask.from_hparams(
        types.SimpleNamespace(**{k: _coerce(v) for k, v in hp.items()})
    )
    template = create_train_state(task.model, (1, 16, 16, 16, 1), 1e-3)
    variables, _ = load_for_inference(str(workspace / "model"), template)
    logits = task.model.apply(
        variables, x.astype(task.model.config.dtype), train=False
    )
    want = np.asarray(task.predict_postprocess(logits))
    np.testing.assert_array_equal(out, want)


def test_predict_cli_autodetects_landmark_task(workspace):
    """prediction.model omitted -> detected from hparams; mismatch refused."""
    argv = seg_args(
        workspace,
        model_dir=str(workspace / "model_ldmk2"),
        log_dir=str(workspace / "logs_ldmk2"),
        out_channels=4,
    )
    argv = [a for a in argv if a not in ("--loss", "CE")]
    argv += ["--loss_class", "DICE", "--loss_regression", "L2",
             "--loss_regression_weight", "0.01", "0.01",
             "--heatmap_group", "heatmaps"]
    assert train_ldmks_main(argv) == 0

    (workspace / "test.txt").write_text("subj0\n")
    pred_cfg = {
        "base": {"data": str(workspace / "data.h5"), "image_group": "images",
                 "sigma": [4.0, 4.0]},  # 2 heatmaps
        "prediction": {
            "test_set": str(workspace / "test.txt"),
            "patch_size": [16, 16, 16],
            "patch_overlap": [4, 4, 4],
            "batch_size": 4,
            "data": str(workspace / "pred_ldmk.h5"),
            "group": "prediction",
            "checkpoint": str(workspace / "model_ldmk2"),
            "chunk_size": 2,
            "stitch": "device",
            "landmarks": str(workspace / "landmarks.json"),
            # no "model" key: auto-detected as LandmarkNet from hparams
        },
    }
    cfg_path = workspace / "predict_ldmk.yaml"
    cfg_path.write_text(yaml.safe_dump(pred_cfg))
    assert predict_main(["-c", str(cfg_path)]) == 0
    with h5py.File(workspace / "pred_ldmk.h5") as hf:
        out = hf["prediction/subj0"][:]
        # 2 heatmap channels + class map last (landmark postprocess)
        assert out.shape == (3, 32, 32, 32)
        assert out.dtype == np.uint8
        expected = np.asarray(out[:2], np.float32)

    # coordinate readout: argmax of the saved heatmap channels, physical
    # coords through the identity affine the fixture stores
    from tpu_mednet.utils.evaluation import heatmap_peaks
    lm = json.loads((workspace / "landmarks.json").read_text())
    assert set(lm) == {"subj0"} and len(lm["subj0"]) == 2
    peaks = heatmap_peaks(expected)
    for i, row in enumerate(lm["subj0"]):
        assert row["voxel"] == [float(v) for v in peaks[i]]
        assert row["physical"] == row["voxel"]  # identity affine
        assert 0.0 <= row["peak"] <= 255.0

    # CSV flavor: one row per (subject, landmark)
    assert predict_main([
        "-c", str(cfg_path),
        f"prediction.landmarks={workspace / 'landmarks.csv'}",
    ]) == 0
    lines = (workspace / "landmarks.csv").read_text().strip().splitlines()
    assert lines[0].startswith("subject,landmark,x_vox")
    assert len(lines) == 3  # header + 2 landmarks

    # channel_selection subsets the saved channels, so the heatmaps-first
    # readout indexing would be wrong — the combination is refused
    with pytest.raises(ValueError, match="channel_selection"):
        predict_main(["-c", str(cfg_path),
                      "prediction.channel_selection=[2]"])

    # explicit wrong model refused (would bake the wrong postprocess)
    with pytest.raises(ValueError, match="trained as 'LandmarkNet'"):
        predict_main(["-c", str(cfg_path),
                      "prediction.model=SegmentationNet",
                      f"prediction.data={workspace / 'pred_wrong.h5'}"])
