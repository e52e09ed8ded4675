"""Segmentation training CLI.

CLI/config-semantics parity with the reference entry point
(`/root/reference/examples/train_seg.py`): same flag surface (`-c` YAML
config + CLI overrides, ``$DATA``/``$MODEL`` expansion, key files, optional
augmentation, resume), targeting the TPU-native Trainer.
"""

from __future__ import annotations

import argparse
import logging
import sys
from typing import Optional, Sequence

import numpy as np

from tpu_mednet.config import (
    add_common_train_args,
    add_seg_model_args,
    load_dotenv,
    parse_with_config,
    read_keyfile,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser)
    add_seg_model_args(parser)
    return parser


def main(argv: Optional[Sequence[str]] = None) -> int:
    load_dotenv()
    hparams = parse_with_config(build_parser(), argv)
    logging.basicConfig(level=hparams.log_level)
    logging.getLogger("absl").setLevel(logging.WARNING)
    logger = logging.getLogger("train_seg")

    # multi-host: initialize jax.distributed BEFORE first backend use
    # (no-op single-host; env-driven, SURVEY §5.8)
    from tpu_mednet.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()

    # heavyweight imports after arg parsing so --help stays fast
    from tpu_mednet.data import PatchSampler
    from tpu_mednet.data.device_sampler import DevicePatchSampler
    from tpu_mednet.parallel.mesh import shard_subject_keys
    from tpu_mednet.ops.augment import AugmentConfig
    from tpu_mednet.parallel.mesh import make_mesh
    from tpu_mednet.tasks import SegmentationTask
    from tpu_mednet.train import NonFiniteError, OptimizerConfig, Trainer
    from tpu_mednet.utils.plots import make_seg_sample_visualizer
    from tpu_mednet.utils.neptune_logger import maybe_create_neptune_run
    import jax

    np.random.seed(hparams.seed)
    neptune_sink = maybe_create_neptune_run(
        hparams.neptune_project, hparams.experiment_name,
        hparams=vars(hparams), source_files=[__file__] +
        ([hparams.config] if hparams.config else []),
    )

    # per-host key shard for multi-host input pipelines (identity on 1 host)
    train_keys = shard_subject_keys(read_keyfile(hparams.train_set))
    val_keys = shard_subject_keys(read_keyfile(hparams.val_set)) \
        if hparams.val_set else []
    logger.info("train keys: %d, val keys: %d", len(train_keys), len(val_keys))
    SamplerClass = DevicePatchSampler if hparams.device_sampler else PatchSampler

    n_devices = min(hparams.gpus, len(jax.devices())) or 1
    n_space = max(hparams.spatial_shards, 1)
    if n_devices % n_space:
        raise SystemExit(
            f"--spatial_shards {n_space} must divide the device count "
            f"({n_devices})"
        )
    mesh = make_mesh(n_data=n_devices // n_space, n_space=n_space)
    from tpu_mednet.config import validate_task_config
    validate_task_config(hparams, "seg", n_data=mesh.shape["data"])
    # on a multi-device mesh, replicate the HBM volume store so gathered
    # batches don't pin everything to device 0 and reshard every step
    sampler_extra = {}
    if hparams.device_sampler:
        if n_devices > 1:
            from tpu_mednet.parallel.mesh import replicated
            sampler_extra["sharding"] = replicated(mesh)
    else:
        sampler_extra["transform"] = None  # host transform hook; default off

    # reference Compose (train_seg.py:84-86) on device when
    # --data_augmentation; --aug_* flags extend it (mirror/noise/elastic/
    # rotate/scale) and imply augmentation on
    from tpu_mednet.config import augment_config_from_hparams
    augment = augment_config_from_hparams(hparams)

    train_ds = SamplerClass(
        hparams.data_path, train_keys, hparams.patches_per_subject,
        hparams.patch_size, image_group=hparams.image_group,
        label_group=hparams.label_group, heatmap_group=None,
        class_probabilities=hparams.class_probabilities,
        seed=hparams.seed, **sampler_extra,
    )
    val_ds = None
    if val_keys:
        val_ds = SamplerClass(
            hparams.data_path, val_keys, hparams.patches_per_subject,
            hparams.patch_size, image_group=hparams.image_group,
            label_group=hparams.label_group, heatmap_group=None,
            class_probabilities=None,
            seed=hparams.seed + 1,
            **{k: v for k, v in sampler_extra.items() if k != "transform"},
        )

    task = SegmentationTask.from_hparams(hparams)
    trainer = Trainer(
        task, train_ds, val_sampler=val_ds,
        batch_size=hparams.batch_size,
        max_epochs=hparams.max_epochs,
        learning_rate=hparams.learning_rate,
        model_dir=hparams.model_dir,
        log_dir=hparams.log_dir,
        augment=augment,
        mesh=mesh,
        seed=hparams.seed,
        log_interval=hparams.log_interval,
        sample_visualizer=make_seg_sample_visualizer(hparams.log_vis_mip),
        hparams=vars(hparams),
        metric_sinks=(neptune_sink,),
        native_loader=hparams.native_loader,
        optim=OptimizerConfig.from_hparams(hparams),
        check_val_every_n_epoch=hparams.check_val_every_n_epoch,
        early_stop_patience=hparams.early_stop_patience,
        early_stop_min_delta=hparams.early_stop_min_delta,
        limit_train_batches=hparams.limit_train_batches,
        limit_val_batches=hparams.limit_val_batches,
        nonfinite=hparams.nonfinite,
        track_grad_norm=hparams.track_grad_norm,
        keep_checkpoints=hparams.keep_checkpoints,
    )
    try:
        trainer.fit(resume=hparams.resume)
    except NonFiniteError as exc:
        # clean stop, not a crash: the last checkpoint holds finite params
        logger.error("training stopped: %s", exc)
        return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
