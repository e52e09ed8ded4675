"""Sliding-window prediction CLI.

Config parity with the reference hydra entry point
(`/root/reference/examples/predict.py:20-115`): a YAML config with
``base.*`` / ``prediction.*`` groups plus dotted ``key=value`` overrides.
Subjects are processed in chunks to bound host memory (predict.py:41-42);
heatmap channels are clipped to uint8 and the class channel is
softmax/argmax'd on device; assembled volumes persist to HDF5 or zarr
(with the reference's ``.stem``-vs-``.suffix`` save bug fixed).
"""

from __future__ import annotations

import argparse
import logging
import sys
from typing import Optional, Sequence

import numpy as np

from tpu_mednet.config import load_dotenv, load_yaml_config, read_keyfile, replace_env


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--config", required=True,
                        help="YAML config with base.* / prediction.* groups")
    parser.add_argument("overrides", nargs="*",
                        help="dotted overrides, e.g. prediction.batch_size=16")
    parser.add_argument("--log_level", type=str, default="INFO")
    return parser


def main(argv: Optional[Sequence[str]] = None) -> int:
    load_dotenv()
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=args.log_level)
    logging.getLogger("absl").setLevel(logging.WARNING)
    logger = logging.getLogger("predict")

    # multi-host: initialize jax.distributed BEFORE first backend use
    # (no-op single-host; env-driven, SURVEY §5.8)
    from tpu_mednet.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()

    cfg = load_yaml_config(args.config, args.overrides)

    base = cfg.get("base", {})
    pred = cfg.get("prediction", {})
    data_path = replace_env(base["data"])
    image_group = base.get("image_group", "images")
    num_heatmaps = len(base.get("sigma") or [])
    test_set = replace_env(pred["test_set"])
    patch_size = pred.get("patch_size", [96, 96, 96])
    patch_overlap = pred.get("patch_overlap", [16, 16, 16])
    channel_selection = pred.get("channel_selection")
    batch_size = pred.get("batch_size", 8)
    prediction_path = pred.get("data")
    prediction_group = pred.get("group", "prediction")
    # landmark models can also emit coordinates directly: a .json/.csv
    # path gets one argmax readout per (subject, landmark) with the peak
    # amplitude and, when the volumes carry affines, physical coordinates
    landmarks_path = pred.get("landmarks")
    checkpoint_path = replace_env(pred["checkpoint"])
    # optional: pin a saved step (default latest). 'best' is a DIRECTORY
    # (<model_dir>/best), so point prediction.checkpoint at it instead.
    checkpoint_step = pred.get("checkpoint_step")
    chunk_size = pred.get("chunk_size", 16)
    model_name = pred.get("model")  # default: auto-detect from hparams
    stitch = pred.get("stitch", "crop")  # 'crop' (reference) | 'gaussian' | 'device'
    # HBM guard for the on-device stitch paths: 'warn' (default) estimates
    # each volume's footprint and falls back to host stitching for volumes
    # that would OOM the chip; 'error' fails fast with the numbers; 'off'
    # forces the attempt (utils/memory.py)
    hbm_guard = pred.get("hbm_guard", "warn")
    n_devices = pred.get("gpus", 1)  # data-parallel inference mesh size
    # EMA checkpoints predict with the averaged weights unless
    # prediction.use_ema=false asks for the raw final params
    use_ema = bool(pred.get("use_ema", True))
    # mirror test-time augmentation: true (all spatial axes) | [axes 0..2]
    from tpu_mednet.inference.common import normalize_tta
    tta_flips = normalize_tta(pred.get("tta", False))
    if tta_flips:
        logger.info("mirror TTA on axes %s (%d forwards per patch)",
                    tta_flips, 2 ** len(tta_flips))

    from tpu_mednet.inference.sliding_window import predict_volumes
    from tpu_mednet.inference.weighted import predict_volumes_weighted_on_device
    from tpu_mednet.inference.device_sliding import predict_volumes_on_device
    from tpu_mednet.tasks import LandmarkTask, SegmentationTask
    from tpu_mednet.train import create_train_state, load_for_inference
    import types

    test_keys = read_keyfile(test_set)
    logger.info("total number of keys %d", len(test_keys))
    chunk_num = max(len(test_keys) // chunk_size, 1)
    chunks = np.array_split(np.asarray(test_keys), chunk_num)

    # restore hparams first (stored beside the weights, the functional
    # analogue of load_from_checkpoint), then rebuild the task from them
    logger.info("loading model from %s ...", checkpoint_path)
    # hparams are needed to size the real template; read them via a cheap
    # JSON-only restore path
    from tpu_mednet.train.checkpoint import CheckpointManager
    if checkpoint_step is not None:
        try:
            checkpoint_step = int(checkpoint_step)
        except (TypeError, ValueError):
            raise ValueError(
                f"prediction.checkpoint_step must be an integer step, got "
                f"{checkpoint_step!r} (for the best-val checkpoint point "
                f"prediction.checkpoint at <model_dir>/best)"
            )
    mgr = CheckpointManager(checkpoint_path)
    try:
        hp_restored = mgr.restore_hparams(step=checkpoint_step)
    finally:
        mgr.close()
    if hp_restored is None:
        raise ValueError(
            f"checkpoint at {checkpoint_path} has no hparams side-car; "
            "predict needs the training hparams to rebuild the model"
        )
    hparams = types.SimpleNamespace(**{
        k: _coerce(v) for k, v in (hp_restored or {}).items()
    })

    from tpu_mednet.inference.serving import detect_task_name
    detected = detect_task_name(hp_restored)
    if model_name is None:
        model_name = detected
        logger.info("prediction.model not set; detected %s from the "
                    "checkpoint hparams", model_name)
    elif model_name != detected:
        raise ValueError(
            f"prediction.model={model_name!r} but the checkpoint hparams "
            f"say it was trained as {detected!r} (loss_regression_weight "
            f"{'present' if detected == 'LandmarkNet' else 'absent'}); "
            f"restoring into the wrong task silently bakes the wrong "
            f"postprocess — fix prediction.model or the checkpoint path"
        )
    if model_name == "LandmarkNet":
        task = LandmarkTask.from_hparams(hparams)
    else:
        task = SegmentationTask.from_hparams(hparams)
    if landmarks_path and getattr(task, "num_heatmaps", 0) == 0:
        raise ValueError(
            "prediction.landmarks is set but the checkpoint is a "
            f"{model_name} with no heatmap channels — coordinates can only "
            "be read out of a landmark model's predictions"
        )
    if landmarks_path and channel_selection is not None:
        raise ValueError(
            "prediction.landmarks needs the full heatmaps-first channel "
            "layout; drop prediction.channel_selection (the readout would "
            "index the wrong channels of a subset)"
        )

    mesh = None
    devices = None
    if n_devices and n_devices > 1:
        import jax
        if stitch in ("device", "gaussian"):
            # on-device pipelines parallelize by dealing whole volumes
            # round-robin across chips; they need ADDRESSABLE devices (a
            # process cannot commit arrays to another host's chips)
            local = jax.local_devices()
            devices = local[:min(n_devices, len(local))]
        else:
            from tpu_mednet.parallel.mesh import make_mesh
            mesh = make_mesh(n_data=min(n_devices, len(jax.devices())))

    in_ch = task.model.config.in_channels
    template = create_train_state(
        task.model, (1, *patch_size, in_ch), learning_rate=1e-3,
    )
    variables, _ = load_for_inference(checkpoint_path, template,
                                      step=checkpoint_step, use_ema=use_ema)

    placement = None
    if devices:
        # place the weights on every device ONCE — the per-chunk pipeline
        # calls reuse the resident copies instead of re-uploading
        from tpu_mednet.inference.common import (
            RoundRobinPlacement,
            round_robin_placement,
        )
        devs, per_dev, _ = round_robin_placement(variables, devices)
        placement = RoundRobinPlacement(devs, per_dev)

    all_landmarks: dict = {}
    for c, chunk in enumerate(chunks):
        logger.info("chunk %d/%d", c, chunk_num)
        if stitch == "device":
            results = predict_volumes_on_device(
                task, variables, data_path, list(chunk),
                patch_size=patch_size, patch_overlap=patch_overlap,
                batch_size=batch_size, image_group=image_group,
                pad_mode="constant", devices=placement, tta_flips=tta_flips,
                hbm_guard=hbm_guard,
            )
        elif stitch == "gaussian":
            # on-device accumulate (equivalence-tested vs the host
            # accumulation oracle in tests/test_device_sampler.py)
            results = predict_volumes_weighted_on_device(
                task, variables, data_path, list(chunk),
                patch_size=patch_size, patch_overlap=patch_overlap,
                batch_size=batch_size, image_group=image_group,
                pad_mode="constant", devices=placement, tta_flips=tta_flips,
                hbm_guard=hbm_guard,
            )
        else:
            results = predict_volumes(
                task, variables, data_path, list(chunk),
                patch_size=patch_size, patch_overlap=patch_overlap,
                batch_size=batch_size,
                out_channels=num_heatmaps + 1,
                channel_selection=channel_selection,
                image_group=image_group,
                pad_mode="constant",
                mesh=mesh,
                tta_flips=tta_flips,
            )
        if prediction_path:
            results.save(replace_env(prediction_path), group=prediction_group)
            logger.info("saved %d volumes to %s", len(results), prediction_path)
        if landmarks_path:
            from tpu_mednet.utils.evaluation import landmark_readout
            for key, ds in results.items():
                all_landmarks[key] = landmark_readout(
                    np.asarray(ds.array), task.num_heatmaps,
                    affine=ds.attrs.get("affine"),
                )
    if landmarks_path:
        _write_landmarks(replace_env(landmarks_path), all_landmarks)
        logger.info("wrote landmark coordinates for %d subjects to %s",
                    len(all_landmarks), landmarks_path)
    return 0


def _write_landmarks(path: str, per_subject: dict) -> None:
    """Write {subject: [readouts]} as JSON, or flat rows as CSV."""
    import csv
    import json as _json

    if str(path).endswith(".csv"):
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            header = ["subject", "landmark", "x_vox", "y_vox", "z_vox",
                      "peak", "x_mm", "y_mm", "z_mm"]
            w.writerow(header)
            for key, rows in per_subject.items():
                for i, r in enumerate(rows):
                    phys = r.get("physical", [None, None, None])
                    w.writerow([key, i, *r["voxel"], r["peak"], *phys])
    else:
        with open(path, "w") as f:
            _json.dump(per_subject, f, indent=2)


def _coerce(v):
    """JSON round-trip turns tuples into lists and numbers into str at
    times; best-effort numeric coercion for hparams fields (recursing into
    lists so stringified list elements round-trip too)."""
    if isinstance(v, list):
        return [_coerce(x) for x in v]
    if isinstance(v, str):
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
        if v in ("True", "False"):
            return v == "True"
        if v == "None":
            return None
    return v


if __name__ == "__main__":
    sys.exit(main())
