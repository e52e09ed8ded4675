"""Landmark training CLI.

CLI/config-semantics parity with the reference entry point
(`/root/reference/examples/train_ldmks.py`): same flag surface, heatmap
group plumbed into the sampler (heatmap channels concatenated before the
class map, dataset.py:322-330), always-on augmentation matching the
reference (train_ldmks.py:82-84).
"""

from __future__ import annotations

import argparse
import logging
import sys
from typing import Optional, Sequence

import numpy as np

from tpu_mednet.config import (
    add_common_train_args,
    add_landmark_model_args,
    load_dotenv,
    parse_with_config,
    read_keyfile,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_train_args(parser)
    add_landmark_model_args(parser)
    return parser


def main(argv: Optional[Sequence[str]] = None) -> int:
    load_dotenv()
    hparams = parse_with_config(build_parser(), argv)
    logging.basicConfig(level=hparams.log_level)
    logging.getLogger("absl").setLevel(logging.WARNING)
    logger = logging.getLogger("train_ldmks")

    # multi-host: initialize jax.distributed BEFORE first backend use
    # (no-op single-host; env-driven, SURVEY §5.8)
    from tpu_mednet.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()

    from tpu_mednet.data import PatchSampler
    from tpu_mednet.data.device_sampler import DevicePatchSampler
    from tpu_mednet.parallel.mesh import shard_subject_keys
    from tpu_mednet.ops.augment import AugmentConfig
    from tpu_mednet.parallel.mesh import make_mesh
    from tpu_mednet.tasks import LandmarkTask
    from tpu_mednet.train import NonFiniteError, OptimizerConfig, Trainer
    from tpu_mednet.utils.plots import make_landmark_sample_visualizer
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

    # the reference always augments for landmarks (train_ldmks.py:82-84);
    # --aug_* flags extend the pipeline (mirror/noise/elastic/rotate/scale)
    # — the intensity chain stays on either way
    from tpu_mednet.config import augment_config_from_hparams
    augment = augment_config_from_hparams(hparams) or AugmentConfig()

    if hparams.landmark_group and not hparams.device_sampler:
        raise SystemExit("--landmark_group (on-device heatmap synthesis) "
                         "requires --device_sampler")
    if hparams.landmark_group:
        extra = {"landmark_group": hparams.landmark_group,
                 "heatmap_sigma": hparams.heatmap_sigma, "heatmap_group": None}
    else:
        extra = {"heatmap_group": hparams.heatmap_group}

    n_devices = min(hparams.gpus, len(jax.devices())) or 1
    n_space = max(hparams.spatial_shards, 1)
    if n_devices % n_space:
        raise SystemExit(
            f"--spatial_shards {n_space} must divide the device count "
            f"({n_devices})"
        )
    mesh = make_mesh(n_data=n_devices // n_space, n_space=n_space)
    from tpu_mednet.config import validate_task_config
    validate_task_config(hparams, "ldmk", n_data=mesh.shape["data"])
    if hparams.device_sampler and n_devices > 1:
        # replicate the HBM volume store over the mesh (don't pin device 0)
        from tpu_mednet.parallel.mesh import replicated
        extra["sharding"] = replicated(mesh)

    train_ds = SamplerClass(
        hparams.data_path, train_keys, hparams.patches_per_subject,
        hparams.patch_size, image_group=hparams.image_group,
        label_group=hparams.label_group,
        class_probabilities=hparams.class_probabilities,
        seed=hparams.seed, **extra,
    )
    val_ds = None
    if val_keys:
        val_ds = SamplerClass(
            hparams.data_path, val_keys, hparams.patches_per_subject,
            hparams.patch_size, image_group=hparams.image_group,
            label_group=hparams.label_group,
            class_probabilities=None,
            seed=hparams.seed + 1, **extra,
        )

    task = LandmarkTask.from_hparams(hparams)
    # store-vs-config seam: the network's first num_heatmaps channels are
    # split off as heatmap regressors (landmarks.py:74-75) — a store whose
    # heatmap group carries a different channel count would otherwise die
    # as a shape error inside jit tracing
    n_hm_store = getattr(train_ds, "num_heatmap_channels", None)
    if n_hm_store is None:
        hm = getattr(train_ds, "heatmaps", None)  # PatchSampler deque
        if hm is not None:
            n_hm_store = int(hm[0].shape[0])
    if n_hm_store is not None and n_hm_store != task.num_heatmaps:
        raise SystemExit(
            f"store group {hparams.landmark_group or hparams.heatmap_group!r} "
            f"has {n_hm_store} heatmap channels/landmarks per subject but "
            f"--loss_regression_weight has {task.num_heatmaps} entries — "
            f"one weight per heatmap channel")
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
        sample_visualizer=make_landmark_sample_visualizer(
            task.num_heatmaps, hparams.log_vis_mip
        ),
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
